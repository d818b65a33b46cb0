"""Controls-path driver tests: the controllability sweep (run/
test_correlation.py rebuild) end-to-end on a tiny controls+speaker model."""

import json
import os

import numpy as np
import pytest

import jax

from run.test_correlation import control_overrides
from tacotron2_tpu.audio.io import write_wav
from tacotron2_tpu.config import config_from_dict

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"


def test_control_overrides_grid():
    """The deduped one-hot sweep (reference: run/test_correlation.py:43-49):
    each dim swept over -1..1 step 0.2, zero vector deduped."""
    ov = control_overrides(2)
    assert (0.0, 0.0) in ov
    assert (1.0, 0.0) in ov and (0.0, -1.0) in ov
    assert (-0.2, 0.0) in ov
    # 10 non-zero values per dim x 2 dims + 1 shared zero vector
    assert len(ov) == 21
    ov5 = control_overrides(5)
    assert len(ov5) == 5 * 10 + 1


def test_test_correlation_driver(tmp_path):
    # corpus with 2 speakers + 2 control feature columns
    speech = tmp_path / "speech"
    speech.mkdir()
    rows = []
    rng = np.random.default_rng(0)
    for i in range(4):
        wav = (0.3 * np.sin(2 * np.pi * (180 + 40 * i) * np.arange(6000) / 22050)).astype(np.float32)
        write_wav(str(speech / f"c{i}.wav"), wav, 22050)
        rows.append(
            f"utterance number {i}|c{i}.wav|{i % 2}|{rng.uniform(-1, 1):.3f}|{rng.uniform(-1, 1):.3f}"
        )
    test_csv = tmp_path / "test.csv"
    with open(test_csv, "w") as f:
        f.write("text|wav|speaker_id|a_speaker_norm_clip|b_speaker_norm_clip\n")
        f.write("\n".join(rows) + "\n")

    raw_cfg = {
        "dataset": {
            "test": str(test_csv),
            "preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                               "num_mels": 16, "trim": False, "cache": False},
        },
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "ctrl",
                     "args": {"max_steps": 4}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": {
            "speaker_tokens": {"active": True, "num_speakers": 2},
            "controls": {"active": True,
                          "features": ["a_speaker_norm_clip", "b_speaker_norm_clip"]},
        },
    }
    cfg = config_from_dict(raw_cfg)

    from run.common import build_model
    from tacotron2_tpu.training.checkpoint import save_checkpoint

    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, params, state, raw_cfg)

    from run import test_correlation as tc

    # shrink the sweep for test speed: 1 utterance/speaker, short decode
    results = tc.do_test_correlation(
        cfg, 0, str(speech), ckpt, None,
        results_dir=str(tmp_path / "corr"),
        utterances_per_speaker=1, batch_size=2, max_len_override=16,
    )
    dirs = sorted(d for d in os.listdir(results)
                  if os.path.isdir(os.path.join(results, d)))
    assert len(dirs) == 21  # the deduped 2-dim sweep
    # beyond-reference analysis runs by default over the sweep
    assert os.path.exists(os.path.join(results, "correlations.csv"))
    assert str(tuple([0.0, 0.0])) in dirs
    # every override dir has outputs (wavs) or logged degenerates
    total_wavs = sum(
        len([f for f in os.listdir(os.path.join(results, d)) if f.endswith(".wav")])
        for d in dirs
    )
    assert total_wavs > 0


def test_analyze_correlations_synthetic(tmp_path):
    """The beyond-reference correlation analysis: a synthetic sweep where
    utterance DURATION grows with control dim 0 (and is flat in dim 1)
    must yield a strong positive duration correlation for dim 0 and a ~0
    correlation for dim 1; degenerate/non-sweep dirs are skipped."""
    import os

    import numpy as np

    from run.test_correlation import analyze_correlations
    from tacotron2_tpu.audio.io import write_wav

    sr = 22050
    rng = np.random.default_rng(0)
    overrides = [(0.0, 0.0)] + [(v, 0.0) for v in (-0.8, -0.4, 0.4, 0.8)] + [
        (0.0, v) for v in (-0.8, 0.8)
    ]
    for ov in overrides:
        d = tmp_path / str(tuple(ov))
        d.mkdir()
        for u in range(2):
            dur = 0.35 + 0.15 * ov[0] + 0.01 * u
            t = np.arange(int(sr * dur)) / sr
            wav = (0.3 * np.sin(2 * np.pi * 180 * t)
                   + 0.01 * rng.standard_normal(t.shape)).astype(np.float32)
            write_wav(str(d / f"{u}.wav"), wav, sr)
    (tmp_path / "(not, a, sweep, dir)").mkdir()  # two-hot -> skipped shape
    (tmp_path / "junk").mkdir()

    out = analyze_correlations(str(tmp_path), ["ctl_a", "ctl_b"])
    assert os.path.basename(out) == "correlations.csv"
    import csv

    rows = list(csv.reader(open(out), delimiter="|"))[1:]
    table = {(c, f): float(r) for c, f, r, n in rows}
    assert table[("ctl_a", "duration")] > 0.95
    assert abs(table[("ctl_b", "duration")]) < 0.5
