"""Full-workflow integration: raw corpus -> preprocess (prosody features)
-> split + speaker-normalize -> train WITH the generated control columns ->
say with controls. This is the reference's complete L0->L1->L3 path
(SURVEY §3.2/§3.5) in one test."""

import json
import os

import numpy as np
import pytest

from tacotron2_tpu.audio.io import read_wav, write_wav
from tacotron2_tpu.config import config_from_dict

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"


def _speechlike(sr, f0, dur, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    sig = sum((1.0 / k) * np.sin(2 * np.pi * f0 * k * t) for k in range(1, 5))
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2
    return (0.2 * env * sig + 0.002 * rng.standard_normal(len(t))).astype(np.float32)


def test_preprocess_split_train_say(tmp_path):
    # --- L0: raw LJSpeech-layout corpus -------------------------------
    speech = tmp_path / "LJ"
    (speech / "wavs").mkdir(parents=True)
    lines = []
    for i in range(12):
        wav = _speechlike(22050, 110 + 15 * i, 0.5, i)
        write_wav(str(speech / "wavs" / f"LJ{i:03d}.wav"), wav, 22050)
        lines.append(f"LJ{i:03d}|Raw text {i}|utterance number {i} spoken")
    with open(speech / "metadata.csv", "w") as f:
        f.write("\n".join(lines) + "\n")

    from preprocessing.ljspeech import do_preprocess

    csv_path = do_preprocess(str(speech), str(tmp_path), "itest", n_jobs=1)

    # --- split + speaker normalization --------------------------------
    from preprocessing.splits import split_ljspeech

    outs = {s: str(tmp_path / f"{s}.csv") for s in ("train", "val", "test")}
    split_ljspeech(csv_path, outs["train"], outs["val"], outs["test"],
                   val_size=2, test_size=2, random_state=9001)

    # --- train with controls from the generated normalized columns ----
    features = ["pitch_mean_speaker_norm_clip", "rate_speaker_norm_clip"]
    raw_cfg = {
        "dataset": {"train": outs["train"], "val": outs["val"], "test": outs["test"],
                     "preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                        "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "pipeline",
                     "args": {"max_steps": 2}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {"speaker_tokens": {"active": False},
                        "controls": {"active": True, "features": features}},
    }
    cfg = config_from_dict(raw_cfg)
    from run.train import do_train

    ckpt = do_train(cfg, raw_cfg, 0, str(speech), str(tmp_path / "r"), None, log_every=10)
    assert ckpt.endswith("final.ckpt")

    # --- say with user-space control values ----------------------------
    from run.say import do_say

    out_wav = str(tmp_path / "c.wav")
    do_say(cfg, 0, ckpt, "controlled speech", out_wav, random_seed=1,
           controls="0.5,-0.5", max_len_override=16)
    _, sr = read_wav(out_wav)
    assert sr == 22050
