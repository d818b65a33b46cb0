"""GST wired as optional Tacotron2 conditioning (SURVEY §7 step 7 — the
reference keeps GST dormant; here it is a live optional block)."""

import numpy as np

import jax
import jax.numpy as jnp

from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tacotron2_tpu.training.optimizer import make_optimizer
from tacotron2_tpu.training.step import make_train_step
from tacotron2_tpu.training.train_state import TrainState

CFG = Tacotron2Config(
    num_chars=12, encoded_dim=32, encoder_kernel_size=5, num_mels=16,
    prenet_dim=16, att_rnn_dim=32, att_dim=16, rnn_hidden_dim=32,
    postnet_dim=16, dropout=0.0, gst=True, gst_token_embedding_size=64,
)


def _batch(B=2, L=8, T=64, M=16, seed=0):
    rng = np.random.default_rng(seed)
    gate = np.ones((B, T, 1), np.float32)
    gate[:, -1] = 0.0
    return {
        "chars_idx": jnp.asarray(rng.integers(1, 12, size=(B, L)).astype(np.int64)),
        "chars_len": jnp.full((B,), L, dtype=jnp.int64),
        "mel": jnp.asarray(rng.standard_normal((B, T, M)).astype(np.float32)),
        "mel_len": jnp.full((B,), T, dtype=jnp.int64),
        "gate": jnp.asarray(gate),
    }


def test_gst_widens_memory_and_trains():
    assert CFG.encoded_full_dim == 32 + 64
    model = Tacotron2(CFG)
    params, state = model.init(jax.random.PRNGKey(0))
    assert "gst" in params and "gst" in state
    tx, _ = make_optimizer(1e-3, 0.0, scheduler_milestones=[])
    ts = TrainState.create(params, state, tx)
    step = make_train_step(model, tx, donate=False)
    ts2, metrics = step(ts, _batch(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # the style tokens receive gradient
    assert not np.allclose(
        np.asarray(ts2.params["gst"]["stl"]["embed"]),
        np.asarray(params["gst"]["stl"]["embed"]),
    )


def test_gst_inference_reference_mel_changes_output():
    model = Tacotron2(CFG)
    params, state = model.init(jax.random.PRNGKey(0))
    params["decoder"]["gate"]["b"] = jnp.full_like(params["decoder"]["gate"]["b"], 3.0)
    b = _batch()
    rng = jax.random.PRNGKey(2)

    neutral = model.forward_infer(
        params, state, b["chars_idx"], b["chars_len"], 16, rng=rng, prenet_dropout=False
    )
    styled = model.forward_infer(
        params, state, b["chars_idx"], b["chars_len"], 16, rng=rng,
        prenet_dropout=False, gst_reference_mel=b["mel"],
    )
    # different reference audio -> different style -> different mels
    assert not np.allclose(np.asarray(neutral.mels), np.asarray(styled.mels))
    # deterministic given the same reference
    styled2 = model.forward_infer(
        params, state, b["chars_idx"], b["chars_len"], 16, rng=rng,
        prenet_dropout=False, gst_reference_mel=b["mel"],
    )
    np.testing.assert_allclose(
        np.asarray(styled.mels), np.asarray(styled2.mels), atol=1e-6
    )


def test_say_gst_reference_cli(tmp_path):
    """VERDICT r2 missing #3: GST drivable from the say CLI. Two different
    reference wavs (same seed) must synthesize different audio; no
    --gst-reference keeps the neutral zeros-style path; the flag on a
    non-GST config is a clear error."""
    import os

    from run.common import build_model
    from run.say import do_say
    from tacotron2_tpu.audio.io import read_wav, write_wav
    from tacotron2_tpu.config import config_from_dict
    from tacotron2_tpu.training import checkpoint as ckpt_lib

    LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"
    raw_cfg = {
        "dataset": {"preprocessing": {"allowed_chars": LJ_CHARS, "end_token": "^",
                                       "num_mels": 16, "trim": False, "cache": False}},
        "training": {"lr": 1e-3, "batch_size": 2, "weight_decay": 0.0,
                     "precision": "32-true", "name": "gst-say", "args": {"max_steps": 1}},
        "model": {"scheduler_milestones": [],
                  "args": {"prenet_dim": 16, "att_rnn_dim": 32, "att_dim": 16,
                           "rnn_hidden_dim": 32, "postnet_dim": 16, "dropout": 0.1,
                           "encoded_dim": 32, "encoder_kernel_size": 5}},
        "extensions": {"speaker_tokens": {"active": False}, "controls": {"active": False},
                        "descriptions": {"bert_embeddings": False},
                        "gst": {"active": True, "token_embedding_size": 64}},
    }
    cfg = config_from_dict(raw_cfg)
    model = build_model(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    # keep the untrained gate from firing instantly so the decode runs
    params["decoder"]["gate"]["b"] = jnp.full_like(params["decoder"]["gate"]["b"], 10.0)
    ckpt = ckpt_lib.save_checkpoint(str(tmp_path / "m.ckpt"), params, state, raw_cfg)

    sr = 22050
    t = np.arange(sr // 2) / sr
    write_wav(str(tmp_path / "refA.wav"), (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    write_wav(str(tmp_path / "refB.wav"),
              (0.2 * np.sin(2 * np.pi * 880 * t) * np.exp(-3 * t)).astype(np.float32), sr)

    outs = {}
    for name, ref in (("A", str(tmp_path / "refA.wav")),
                      ("B", str(tmp_path / "refB.wav")), ("none", None)):
        o = str(tmp_path / f"{name}.wav")
        do_say(cfg, 0, ckpt, "style transfer", o, random_seed=5,
               gst_reference=ref, max_len_override=12)
        outs[name], _ = read_wav(o)

    assert not np.array_equal(outs["A"], outs["B"])  # style changes audio
    assert not np.array_equal(outs["A"], outs["none"])  # neutral differs too

    # non-GST config + the flag -> clear error
    raw2 = {k: (dict(v) if isinstance(v, dict) else v) for k, v in raw_cfg.items()}
    raw2["extensions"] = {"speaker_tokens": {"active": False}, "controls": {"active": False}}
    cfg2 = config_from_dict(raw2)
    model2 = build_model(cfg2)
    p2, s2 = model2.init(jax.random.PRNGKey(0))
    ckpt2 = ckpt_lib.save_checkpoint(str(tmp_path / "m2.ckpt"), p2, s2, raw2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="gst"):
        do_say(cfg2, 0, ckpt2, "x", str(tmp_path / "x.wav"), random_seed=1,
               gst_reference=str(tmp_path / "refA.wav"), max_len_override=4)
