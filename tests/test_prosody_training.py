"""Prosody-model capability tests: predictor training driver, checkpoint
round-trip, and the frozen perceptual ("style") loss phase in the TTS
trainer (reference: model/prosodic_features/prosody_detector.py:158-255 and
the commented wiring run/train.py:188-208 / model/tts_model.py:204-225)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.audio.io import write_wav
from tacotron2_tpu.config import config_from_dict

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"

FEATS = ["pitch_mean_norm_clip", "rate_norm_clip"]


def _tiny_corpus(tmp_path, n=4):
    speech = tmp_path / "speech"
    speech.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        wav = (0.3 * np.sin(2 * np.pi * (180 + 40 * i) * np.arange(6000) / 22050)).astype(np.float32)
        write_wav(str(speech / f"p{i}.wav"), wav, 22050)
        rows.append(
            f"utterance number {i}|p{i}.wav|{rng.uniform(-1, 1):.3f}|{rng.uniform(-1, 1):.3f}"
        )
    csv = tmp_path / "prosody.csv"
    with open(csv, "w") as f:
        f.write("text|wav|" + "|".join(FEATS) + "\n")
        f.write("\n".join(rows) + "\n")
    return speech, csv


def _raw_cfg(csv, extra_ext=None):
    ext = {"prosody_model": {"active": False, "features": FEATS}}
    if extra_ext:
        ext.update(extra_ext)
    return {
        "dataset": {
            "train": str(csv), "val": str(csv),
            "preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                               "num_mels": 16, "trim": False, "cache": False},
        },
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "prosody-test",
                     "args": {"max_steps": 4}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 8, "att_rnn_dim": 16, "att_dim": 8,
                           "rnn_hidden_dim": 16, "postnet_dim": 8, "dropout": 0.1,
                           "encoded_dim": 16, "encoder_kernel_size": 5}},
        "extensions": ext,
    }


def test_ccc_per_feature():
    """Per-column CCC: 1.0 on identical columns; matches the closed-form
    biased-moment definition torchmetrics reduces to."""
    from tacotron2_tpu.training.losses import ccc_per_feature

    rng = np.random.default_rng(1)
    y = rng.normal(size=(64, 3)).astype(np.float32)
    p = y.copy()
    p[:, 1] = 0.5 * y[:, 1] + 0.1 * rng.normal(size=64)
    p[:, 2] = rng.normal(size=64)
    ccc = np.asarray(ccc_per_feature(jnp.asarray(p), jnp.asarray(y)))
    assert ccc[0] == pytest.approx(1.0, abs=1e-5)

    def ref_ccc(a, b):
        am, bm = a.mean(), b.mean()
        cov = ((a - am) * (b - bm)).mean()
        return 2 * cov / (a.var() + b.var() + (am - bm) ** 2)

    for j in range(3):
        assert ccc[j] == pytest.approx(ref_ccc(p[:, j], y[:, j]), abs=1e-4)
    assert abs(ccc[2]) < 0.5  # uncorrelated column


def test_train_prosody_driver_and_checkpoint_roundtrip(tmp_path):
    """train_prosody end-to-end on a tiny corpus: loss finite, checkpoint
    saved and loadable by the TTS trainer's loader."""
    speech, csv = _tiny_corpus(tmp_path)
    raw = _raw_cfg(csv)
    cfg = config_from_dict(raw)

    from run.train_prosody import do_train_prosody

    out = do_train_prosody(
        cfg, raw, 0, str(speech), str(tmp_path / "results"),
        steps=2, lr=1e-4, batch_size=2,
    )
    assert os.path.isdir(out)

    from run.common import load_prosody_checkpoint

    predictor, params = load_prosody_checkpoint(out)
    assert predictor.num_features == len(FEATS)
    assert predictor.num_mels == 16
    assert predictor.conv_out_dim == (16 // 4) * 256 // 2

    mels = jnp.zeros((2, 32, 16), jnp.float32)
    lens = jnp.asarray([32, 20])
    feats, low, mid, high = predictor.apply(params, mels, lens)
    assert feats.shape == (2, len(FEATS))
    assert np.all(np.isfinite(np.asarray(feats)))

    # saved hparams record the feature names (the "save_hyperparameters"
    # analog, prosody_detector.py:181)
    with open(os.path.join(out, "config.json")) as f:
        saved = json.load(f)
    assert saved["prosody_predictor"]["features"] == FEATS


def test_style_loss_step_composition(tmp_path):
    """The style-loss step = base step + prosody term: same batch/state, the
    prosody-enabled step reports loss == tacotron_loss + style_loss and a
    base step's loss == tacotron_loss (reference tts_model.py:204-225)."""
    speech, csv = _tiny_corpus(tmp_path)
    raw = _raw_cfg(csv)
    cfg = config_from_dict(raw)

    from run.common import build_model
    from tacotron2_tpu.models.prosody import ProsodyPredictor
    from tacotron2_tpu.training.optimizer import make_optimizer
    from tacotron2_tpu.training.step import build_train_step
    from tacotron2_tpu.training.train_state import TrainState

    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 0.0)
    ts = TrainState.create(params, state, tx)

    predictor = ProsodyPredictor(num_features=2, num_mels=16)
    p_params = predictor.init(jax.random.PRNGKey(1))

    B, L, T, M = 2, 8, 16, 16
    rng = np.random.default_rng(2)
    batch = {
        "chars_idx": rng.integers(1, 10, size=(B, L)),
        "chars_len": np.asarray([8, 6], np.int64),
        "mel": rng.normal(size=(B, T, M)).astype(np.float32),
        "mel_len": np.asarray([16, 12], np.int64),
        "gate": np.ones((B, T, 1), np.float32),
    }

    # jit: build_train_step returns the PURE step — running it eagerly
    # executes the full fwd+bwd+optimizer graph op-by-op (~45 s on this
    # 1-core host); jitted it compiles once into the persistent cache
    base_step = jax.jit(build_train_step(model, tx))
    style_step = jax.jit(
        build_train_step(model, tx, prosody=(predictor, p_params, "mse"))
    )

    key = jax.random.PRNGKey(3)
    _, m_base = base_step(ts, batch, key)
    _, m_style = style_step(ts, batch, key)

    assert "style_loss" not in m_base
    assert float(m_base["loss"]) == pytest.approx(float(m_base["tacotron_loss"]), rel=1e-6)
    style = float(m_style["style_loss"])
    assert style > 0.0
    assert float(m_style["loss"]) == pytest.approx(
        float(m_style["tacotron_loss"]) + style, rel=1e-5
    )
    # the tacotron term itself is identical across the two steps
    assert float(m_style["tacotron_loss"]) == pytest.approx(
        float(m_base["tacotron_loss"]), rel=1e-5
    )


def test_train_driver_prosody_phase(tmp_path):
    """do_train with extensions.prosody_model.active: requires the
    checkpoint, then trains through the active_after boundary."""
    speech, csv = _tiny_corpus(tmp_path)

    # 1) train a tiny predictor
    raw_p = _raw_cfg(csv)
    from run.train_prosody import do_train_prosody

    prosody_ckpt = do_train_prosody(
        config_from_dict(raw_p), raw_p, 0, str(speech),
        str(tmp_path / "prosody_results"), steps=1, batch_size=2,
    )

    # 2) TTS training with the style-loss phase from 50% of 4 steps
    raw = _raw_cfg(csv, extra_ext={
        "prosody_model": {"active": True, "active_after": 0.5, "features": FEATS},
    })
    cfg = config_from_dict(raw)

    from run.train import do_train

    with pytest.raises(ValueError, match="no prosody model checkpoint"):
        do_train(cfg, raw, 0, str(speech), str(tmp_path / "r_fail"), None)

    out = do_train(
        cfg, raw, 0, str(speech), str(tmp_path / "r_ok"), None,
        log_every=1, prosody_model_checkpoint=prosody_ckpt,
    )
    assert os.path.isdir(out)
