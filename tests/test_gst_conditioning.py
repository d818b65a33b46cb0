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
