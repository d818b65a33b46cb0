"""Hoisted-dW decode scan (ops/train_scan.py) vs the standard autodiff
path: forward equivalence and gradient equivalence on the full
teacher-forced training loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tacotron2_tpu.training.losses import tacotron2_loss

CFG = dict(
    num_chars=16, encoded_dim=32, encoder_kernel_size=5, num_mels=16,
    prenet_dim=16, att_rnn_dim=32, att_dim=16, rnn_hidden_dim=32,
    postnet_dim=16, dropout=0.0,
)


def _setup(policy="32-true", **ext):
    model = Tacotron2(Tacotron2Config(**CFG, **ext), Policy.from_string(policy))
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, L, T = 2, 9, 24
    batch = {
        "chars_idx": jnp.asarray(rng.integers(1, 16, size=(B, L)).astype(np.int64)),
        "chars_len": jnp.asarray([9, 6]),
        "mel": jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32) * 0.5),
        "mel_len": jnp.asarray([T, T - 6]),
        "gate": jnp.ones((B, T, 1), jnp.float32),
    }
    return model, params, state, batch


def _loss_fn(model, state, batch, dw_hoist, train=True, **fkw):
    def f(params, rng):
        out, _ = model.forward_teacher(
            params, state, batch["chars_idx"], batch["chars_len"],
            batch["mel"], batch["mel_len"], rng=rng, train=train,
            dw_hoist=dw_hoist, **fkw,
        )
        loss, _ = tacotron2_loss(
            out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
        )
        return loss
    return f


def test_forward_equivalence():
    model, params, state, batch = _setup()
    key = jax.random.PRNGKey(3)
    for train in (False, True):
        out_std, _ = model.forward_teacher(
            params, state, batch["chars_idx"], batch["chars_len"],
            batch["mel"], batch["mel_len"], rng=key, train=train,
        )
        out_h, _ = model.forward_teacher(
            params, state, batch["chars_idx"], batch["chars_len"],
            batch["mel"], batch["mel_len"], rng=key, train=train, dw_hoist=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_h.mels), np.asarray(out_std.mels), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_h.gates), np.asarray(out_std.gates), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_h.alignments), np.asarray(out_std.alignments), atol=2e-5
        )


def test_grad_equivalence():
    """The custom VJP must reproduce jax.grad of the standard scan over the
    FULL param tree (incl. encoder via d_encoded, attention smalls, biases,
    prenet via d_decoder_in), with train-mode dropout active."""
    model, params, state, batch = _setup()
    key = jax.random.PRNGKey(7)

    g_std = jax.grad(_loss_fn(model, state, batch, dw_hoist=False))(params, key)
    g_h = jax.grad(_loss_fn(model, state, batch, dw_hoist=True))(params, key)

    flat_s = jax.tree_util.tree_leaves_with_path(g_std)
    flat_h = jax.tree.leaves(g_h)
    assert len(flat_s) == len(flat_h)
    for (path, a), b in zip(flat_s, flat_h):
        name = jax.tree_util.keystr(path)
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale + 1e-7,
            err_msg=f"grad mismatch at {name}",
        )


def test_grad_equivalence_with_controls_and_speaker():
    model, params, state, batch = _setup(
        speaker_tokens=True, num_speakers=3, controls=True, controls_dim=4
    )
    rng = np.random.default_rng(5)
    extra = dict(
        speaker_id=jnp.asarray([0, 2]),
        controls=jnp.asarray(rng.uniform(-1, 1, (2, 4)).astype(np.float32)),
    )
    key = jax.random.PRNGKey(11)
    g_std = jax.grad(_loss_fn(model, state, batch, False, **extra))(params, key)
    g_h = jax.grad(_loss_fn(model, state, batch, True, **extra))(params, key)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_std), jax.tree.leaves(g_h)
    ):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale + 1e-7,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_bf16_policy_finite_and_trains():
    """Under the bf16 policy the hoisted path runs, grads are finite, and a
    few optimization steps reduce the loss."""
    import optax

    from tacotron2_tpu.training.optimizer import make_optimizer

    model, params, state, batch = _setup(policy="bf16-mixed")
    tx, _ = make_optimizer(3e-3, 0.0)
    opt = tx.init(params)
    f = _loss_fn(model, state, batch, dw_hoist=True)

    @jax.jit
    def step(p, o, rng):
        l, g = jax.value_and_grad(f)(p, rng)
        u, o = tx.update(g, o, p)
        return l, optax.apply_updates(p, u), o

    key = jax.random.PRNGKey(2)
    first = None
    for i in range(25):
        l, params, opt = step(params, opt, key)
        if first is None:
            first = float(l)
    assert np.isfinite(float(l))
    assert float(l) < first
