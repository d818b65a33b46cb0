"""Extended driver coverage: multi-speaker + controls training e2e, the
finetune protocol (freeze + lr/10 + batch x2 + finetuned.ckpt), and loading
an actual reference-format Lightning .ckpt file through the say path."""

import json
import os
import sys

import numpy as np
import pytest

import jax

from tacotron2_tpu.audio.io import read_wav, write_wav
from tacotron2_tpu.config import config_from_dict

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"


@pytest.fixture(scope="module")
def speaker_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("spk")
    speech = root / "speech"
    speech.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        dur = 0.25 + 0.05 * i
        wav = (0.3 * np.sin(2 * np.pi * (180 + 50 * i) * np.arange(int(22050 * dur)) / 22050)).astype(np.float32)
        write_wav(str(speech / f"s{i}.wav"), wav, 22050)
        rows.append(
            f"utterance {i} here|s{i}.wav|{i % 2}|{rng.uniform(-1, 1):.3f}|{rng.uniform(-1, 1):.3f}"
        )
    header = "text|wav|speaker_id|a_speaker_norm_clip|b_speaker_norm_clip"
    for split, sel in [("train", rows), ("val", rows[:2]), ("test", rows[2:])]:
        with open(root / f"{split}.csv", "w") as f:
            f.write(header + "\n" + "\n".join(sel) + "\n")

    raw_cfg = {
        "dataset": {
            "train": str(root / "train.csv"),
            "val": str(root / "val.csv"),
            "test": str(root / "test.csv"),
            "preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                               "num_mels": 16, "trim": False, "cache": False},
        },
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 1e-6,
                     "precision": "32-true", "name": "spk-e2e",
                     "args": {"max_steps": 3}},
        "model": {"scheduler_milestones": [0.5],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {
            "speaker_tokens": {"active": True, "num_speakers": 2},
            "controls": {"active": True,
                          "features": ["a_speaker_norm_clip", "b_speaker_norm_clip"]},
        },
    }
    return root, speech, raw_cfg


def test_multispeaker_controls_train_say_finetune(speaker_project, tmp_path):
    root, speech, raw_cfg = speaker_project
    cfg = config_from_dict(raw_cfg)
    from run.train import do_train

    ckpt = do_train(cfg, raw_cfg, 0, str(speech), str(tmp_path / "r"), None, log_every=10)
    assert ckpt.endswith("final.ckpt")

    # say with speaker + controls
    from run.say import do_say

    out_wav = str(tmp_path / "s.wav")
    do_say(cfg, 0, ckpt, "hello speakers", out_wav, random_seed=1,
           speaker_id=1, controls="0.3,-0.2", max_len_override=16)
    # a barely-trained model may fire its gate immediately (degenerate
    # output, same as the reference); the pipeline must still produce a
    # valid wav file
    wav, sr = read_wav(out_wav)
    assert sr == 22050

    # finetune: freezes encoder + speaker embedding, saves finetuned.ckpt
    ft = do_train(cfg, raw_cfg, 0, str(speech), str(tmp_path / "ft"), ckpt,
                  finetune=True, finetune_steps=2, log_every=10)
    assert ft.endswith("finetuned.ckpt")
    from tacotron2_tpu.training.checkpoint import load_model

    p0, _, _ = load_model(ckpt)
    p1, _, _ = load_model(ft)
    np.testing.assert_array_equal(  # frozen by the finetune protocol
        p0["encoder"]["embedding"]["table"], p1["encoder"]["embedding"]["table"]
    )
    np.testing.assert_array_equal(
        p0["speaker_embedding"]["table"], p1["speaker_embedding"]["table"]
    )
    assert not np.allclose(p0["decoder"]["gate"]["w"], p1["decoder"]["gate"]["w"])


def test_descriptions_train_e2e(tmp_path):
    """Description-embedding training path (run/train.py:85-107): per-row
    .npy embedding files (NaN -> zeros fallback), model concat conditioning."""
    speech = tmp_path / "speech"
    speech.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        wav = (0.3 * np.sin(2 * np.pi * (200 + 30 * i) * np.arange(7000) / 22050)).astype(np.float32)
        write_wav(str(speech / f"d{i}.wav"), wav, 22050)
        if i < 2:
            np.save(speech / f"emb{i}.npy", rng.standard_normal(16).astype(np.float32))
            emb = f"emb{i}.npy"
        else:
            emb = ""  # missing -> zeros (tts_dataset.py:289-291)
        rows.append(f"described utterance {i}|d{i}.wav|{emb}")
    header = "text|wav|description_embedding"
    for split, sel in (("train", rows), ("val", rows[:2])):
        with open(tmp_path / f"{split}.csv", "w") as f:
            f.write(header + "\n" + "\n".join(sel) + "\n")

    raw_cfg = {
        "dataset": {"train": str(tmp_path / "train.csv"), "val": str(tmp_path / "val.csv"),
                     "preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                        "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "desc-e2e",
                     "args": {"max_steps": 2}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5,
                           "description_embeddings": True,
                           "description_embeddings_dim": 16}},
        "extensions": {"speaker_tokens": {"active": False}, "controls": {"active": False},
                        "descriptions": {"bert_embeddings": True, "finetuneable": False}},
    }
    cfg = config_from_dict(raw_cfg)
    from run.train import do_train

    ckpt = do_train(cfg, raw_cfg, 0, str(speech), str(tmp_path / "r"), None, log_every=10)
    assert ckpt.endswith("final.ckpt")
    from tacotron2_tpu.training.checkpoint import load_model

    p, _, _ = load_model(ckpt)
    assert "description_linear" in p  # the concat-conditioning path trained


def test_say_from_lightning_ckpt_file(tmp_path):
    """A reference-format Lightning .ckpt FILE must load and synthesize
    (converted on the fly — run/common.load_tacotron_checkpoint)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from model.tacotron2 import Tacotron2 as TorchTacotron2

    torch.manual_seed(0)
    tm = TorchTacotron2(
        num_chars=len(LJ_CHARS) + 1, encoded_dim=16, encoder_kernel_size=5,
        num_mels=16, prenet_dim=8, att_rnn_dim=16, att_dim=8,
        rnn_hidden_dim=16, postnet_dim=8, dropout=0.1,
    )
    with torch.no_grad():  # keep the gate open so synthesis runs > 1 frame
        tm.decoder.gate.bias.fill_(3.0)
    sd = {f"tacotron2.{k}": v for k, v in tm.state_dict().items()}
    ckpt_path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "hyper_parameters": {"lr": 1e-3}}, ckpt_path)

    raw_cfg = {
        "dataset": {"preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                        "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "ref-ckpt",
                     "args": {"max_steps": 1}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {"speaker_tokens": {"active": False}, "controls": {"active": False}},
    }
    cfg = config_from_dict(raw_cfg)
    from run.say import do_say

    out_wav = str(tmp_path / "ref.wav")
    do_say(cfg, 0, ckpt_path, "from a lightning checkpoint", out_wav,
           random_seed=5, max_len_override=16)
    wav, sr = read_wav(out_wav)
    assert sr == 22050 and len(wav) > 0


def test_say_with_hifigan_checkpoint_file(tmp_path):
    """say --hifi-gan-checkpoint: the upstream hifi-gan checkpoint format
    ({'generator': state_dict} + side config.json, run/say.py:62-90) loads,
    converts (weight-norm folding) and vocodes on-device."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from model.hifi_gan import Generator as TorchGenerator
    from model.tacotron2 import Tacotron2 as TorchTacotron2

    h = {"resblock": "1", "upsample_rates": [8, 2], "upsample_kernel_sizes": [16, 4],
         "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
         "resblock_dilation_sizes": [[1, 3, 5]], "num_mels": 16}

    class AttrDict(dict):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.__dict__ = self

    torch.manual_seed(0)
    gen = TorchGenerator(AttrDict(dict(h, num_mels=80)))  # ctor ignores num_mels
    # shrink conv_pre input to 16 mels for the tiny tacotron
    gen.conv_pre = torch.nn.utils.weight_norm(torch.nn.Conv1d(16, 16, 7, 1, padding=3))
    hdir = tmp_path / "hifi"
    hdir.mkdir()
    torch.save({"generator": gen.state_dict()}, str(hdir / "g_00000001"))
    with open(hdir / "config.json", "w") as f:
        json.dump(h, f)

    torch.manual_seed(1)
    tm = TorchTacotron2(
        num_chars=len(LJ_CHARS) + 1, encoded_dim=16, encoder_kernel_size=5,
        num_mels=16, prenet_dim=8, att_rnn_dim=16, att_dim=8,
        rnn_hidden_dim=16, postnet_dim=8, dropout=0.1,
    )
    with torch.no_grad():
        tm.decoder.gate.bias.fill_(3.0)
    ckpt_path = str(tmp_path / "t.ckpt")
    torch.save({"state_dict": {f"tacotron2.{k}": v for k, v in tm.state_dict().items()}}, ckpt_path)

    raw_cfg = {
        "dataset": {"preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                        "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "hifi-say",
                     "args": {"max_steps": 1}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {"speaker_tokens": {"active": False}, "controls": {"active": False}},
    }
    cfg = config_from_dict(raw_cfg)
    from run.say import do_say

    out_wav = str(tmp_path / "v.wav")
    do_say(cfg, 0, ckpt_path, "vocoded with hifi gan", out_wav,
           hifi_gan_checkpoint=str(hdir / "g_00000001"),
           random_seed=5, max_len_override=16)
    wav, sr = read_wav(out_wav)
    assert sr == 22050
    # upsample factor 16: (n_frames - 1) * 16 samples
    assert len(wav) % 16 == 0 and len(wav) > 0


def test_convert_cli_roundtrip(tmp_path):
    """main.py convert: Lightning .ckpt -> Orbax dir, loadable."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from model.tacotron2 import Tacotron2 as TorchTacotron2

    torch.manual_seed(1)
    tm = TorchTacotron2(
        num_chars=10, encoded_dim=16, encoder_kernel_size=5, num_mels=16,
        prenet_dim=8, att_rnn_dim=16, att_dim=8, rnn_hidden_dim=16,
        postnet_dim=8, dropout=0.1,
    )
    src = str(tmp_path / "in.ckpt")
    torch.save({"state_dict": {f"tacotron2.{k}": v for k, v in tm.state_dict().items()}}, src)

    from tacotron2_tpu.convert import load_lightning_checkpoint
    from tacotron2_tpu.training.checkpoint import load_model, save_checkpoint

    params, state, hparams = load_lightning_checkpoint(src)
    out = str(tmp_path / "out.ckpt")
    save_checkpoint(out, params, state, {"hyper_parameters": hparams})
    p2, s2, meta = load_model(out)
    np.testing.assert_array_equal(
        np.asarray(p2["encoder"]["embedding"]["table"]),
        np.asarray(params["encoder"]["embedding"]["table"]),
    )
