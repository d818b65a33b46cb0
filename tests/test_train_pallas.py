"""Fused Pallas training forward (ops/train_decode_pallas.py, interpret
mode on CPU) vs the standard autodiff scan: forward equivalence and
gradient equivalence over the full param tree — the same gate the XLA
hoisted-dW path passes (tests/test_train_scan.py)."""

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


def _loss_fn(model, state, batch, train=True, **fkw):
    def f(params, rng):
        out, _ = model.forward_teacher(
            params, state, batch["chars_idx"], batch["chars_len"],
            batch["mel"], batch["mel_len"], rng=rng, train=train,
            dw_hoist=True, **fkw,
        )
        loss, _ = tacotron2_loss(
            out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
        )
        return loss
    return f


def test_pallas_forward_matches_standard():
    model, params, state, batch = _setup()
    key = jax.random.PRNGKey(3)
    for train in (False, True):
        out_std, _ = model.forward_teacher(
            params, state, batch["chars_idx"], batch["chars_len"],
            batch["mel"], batch["mel_len"], rng=key, train=train,
        )
        out_p, _ = model.forward_teacher(
            params, state, batch["chars_idx"], batch["chars_len"],
            batch["mel"], batch["mel_len"], rng=key, train=train,
            dw_hoist=True, pallas_train=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_p.mels), np.asarray(out_std.mels), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out_p.gates), np.asarray(out_std.gates), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out_p.alignments), np.asarray(out_std.alignments), atol=2e-5
        )


def test_pallas_grad_matches_standard():
    """The Pallas forward + XLA hoisted backward must reproduce jax.grad of
    the plain scan over the FULL param tree, train-mode dropout active."""
    model, params, state, batch = _setup()
    key = jax.random.PRNGKey(7)

    def std_loss(params, rng):
        out, _ = model.forward_teacher(
            params, state, batch["chars_idx"], batch["chars_len"],
            batch["mel"], batch["mel_len"], rng=rng, train=True,
        )
        loss, _ = tacotron2_loss(
            out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
        )
        return loss

    g_std = jax.grad(std_loss)(params, key)
    g_p = jax.grad(_loss_fn(model, state, batch, pallas_train=True))(params, key)

    flat_s = jax.tree_util.tree_leaves_with_path(g_std)
    flat_p = jax.tree.leaves(g_p)
    assert len(flat_s) == len(flat_p)
    for (path, a), b in zip(flat_s, flat_p):
        name = jax.tree_util.keystr(path)
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale + 1e-7,
            err_msg=f"grad mismatch at {name}",
        )


def test_pallas_grad_with_controls_and_speaker():
    model, params, state, batch = _setup(
        speaker_tokens=True, num_speakers=3, controls=True, controls_dim=4
    )
    rng = np.random.default_rng(5)
    extra = dict(
        speaker_id=jnp.asarray([0, 2]),
        controls=jnp.asarray(rng.uniform(-1, 1, (2, 4)).astype(np.float32)),
    )
    key = jax.random.PRNGKey(11)
    g_std = jax.grad(_loss_fn(model, state, batch, pallas_train=False, **extra))(
        params, key
    )
    g_p = jax.grad(_loss_fn(model, state, batch, pallas_train=True, **extra))(
        params, key
    )
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_std), jax.tree.leaves(g_p)
    ):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale + 1e-7,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pallas_bwd_modes_agree():
    """ops-level: the Pallas reverse-scan kernel (bwd="pallas") and the XLA
    hoisted reverse scan (bwd="xla") produce matching gradients behind the
    same Pallas forward — over the decoder params AND the encoder-side
    inputs (d_enc, d_attenc, d_prenet, d_ctrl returns)."""
    from tacotron2_tpu.ops.train_decode_pallas import run_decode_scan_pallas
    from tacotron2_tpu.models import decoder as decoder_mod

    ext = dict(controls=True, controls_dim=4)
    model, params, state, batch = _setup(**ext)
    key = jax.random.PRNGKey(13)
    B, T = 2, 24
    H, D, P = 32, 32, 16
    enc0 = jax.random.normal(jax.random.PRNGKey(1), (B, 9, D))
    att0 = jax.random.normal(jax.random.PRNGKey(2), (B, 9, 16))
    din0 = jax.random.normal(jax.random.PRNGKey(3), (T, B, P))
    ctl0 = jax.random.normal(jax.random.PRNGKey(4), (B, 4))
    mask = jnp.arange(9)[None, :] >= jnp.asarray([9, 6])[:, None]
    keys = jax.random.split(key, T)
    st = decoder_mod.init_state(B, 9, H, D, H)

    def loss_with(bwd):
        def f(dec_params, enc, att_enc, dec_in, ctl):
            mels, gates, aligns = run_decode_scan_pallas(
                dec_params, st, dec_in, keys, enc, att_enc, mask, ctl,
                train=True, policy=model.policy, interpret=True, bwd=bwd,
            )
            return (
                jnp.sum(mels ** 2) + jnp.sum(gates ** 2)
                + jnp.sum(aligns * jnp.arange(9)[None, None, :])
            )
        return f

    # ground truth: jax.grad straight through the plain scan forward
    # (train_scan._fwd_impl is ordinary JAX — no custom VJP involved)
    from tacotron2_tpu.ops import train_scan

    def truth(dec_params, enc, att_enc, dec_in, ctl):
        w1, w2, small = train_scan._split_big_small(dec_params)
        (mels, gates, aligns), _ = train_scan._fwd_impl(
            model.policy, True, w1, w2, small, dec_in, keys, enc, att_enc,
            mask, ctl, st,
        )
        return (
            jnp.sum(mels ** 2) + jnp.sum(gates ** 2)
            + jnp.sum(aligns * jnp.arange(9)[None, None, :])
        )

    args = (params["decoder"], enc0, att0, din0, ctl0)
    g_t = jax.grad(truth, argnums=(0, 1, 2, 3, 4))(*args)
    g_x = jax.grad(loss_with("xla"), argnums=(0, 1, 2, 3, 4))(*args)
    g_p = jax.grad(loss_with("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
    for name, g in (("xla", g_x), ("pallas", g_p)):
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(g_t), jax.tree.leaves(g)
        ):
            scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-5 * scale + 1e-7,
                err_msg=f"{name} grad mismatch vs truth at {jax.tree_util.keystr(path)}",
            )


def test_pallas_grad_with_gst():
    """GST widens encoded_full_dim (style concat) — the kernels derive D
    from the actual arrays; gradients must still match the plain scan."""
    model, params, state, batch = _setup(
        gst=True, gst_token_embedding_size=16
    )
    key = jax.random.PRNGKey(17)
    g_std = jax.grad(_loss_fn(model, state, batch, pallas_train=False))(
        params, key
    )
    g_p = jax.grad(_loss_fn(model, state, batch, pallas_train=True))(
        params, key
    )
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_std), jax.tree.leaves(g_p)
    ):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        # absolute floor 5e-7: the GST reference-encoder bias grads are
        # cancellation-dominated (~1e-8 survivors of ~1e-4 terms), so the
        # 2-steps-per-grid-step accumulator reordering legitimately moves
        # them by ~1e-7 (steps=1 matches at 1e-7; verified, r4)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale + 5e-7,
            err_msg=f"gst grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_batch_aware_residency_default():
    """Flagship dims: B=1 keeps one streamed chunk (faster, measured),
    B>=8 goes FULL residency; tiny configs keep none."""
    from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
    from tacotron2_tpu.models.layers import Policy

    flagship = Tacotron2(
        Tacotron2Config(
            num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
            prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
            postnet_dim=512, dropout=0.5,
        ),
        Policy.from_string("bf16-mixed"),
    )
    assert flagship.default_resident_cols(False, batch=1) == 4 * 1024 - 128
    assert flagship.default_resident_cols(False, batch=8) == 4 * 1024
    assert flagship.default_resident_cols(False, batch=32) == 4 * 1024
    tiny = Tacotron2(Tacotron2Config(**CFG))
    assert tiny.default_resident_cols(False, batch=32) == 0


def test_pallas_bwd_modes_agree_bf16():
    """bf16-mixed: the Pallas backward's compute-dtype pull chain must
    stay within bf16-class agreement of the XLA hoisted backward (which
    recomputes through f32 attention). Gates the dt-uniform de_pre /
    d_attenc / window-backward traffic halving."""
    from tacotron2_tpu.ops.train_decode_pallas import run_decode_scan_pallas
    from tacotron2_tpu.models import decoder as decoder_mod

    model, params, state, batch = _setup(policy="bf16-mixed")
    key = jax.random.PRNGKey(23)
    B, T = 2, 24
    H, D, P = 32, 32, 16
    enc0 = jax.random.normal(jax.random.PRNGKey(1), (B, 9, D))
    att0 = jax.random.normal(jax.random.PRNGKey(2), (B, 9, 16))
    din0 = jax.random.normal(jax.random.PRNGKey(3), (T, B, P))
    mask = jnp.arange(9)[None, :] >= jnp.asarray([9, 6])[:, None]
    keys = jax.random.split(key, T)
    st = decoder_mod.init_state(B, 9, H, D, H)

    def loss_with(bwd):
        def f(dec_params, enc, att_enc, dec_in):
            mels, gates, aligns = run_decode_scan_pallas(
                dec_params, st, dec_in, keys, enc, att_enc, mask, None,
                train=True, policy=model.policy, interpret=True, bwd=bwd,
            )
            return (
                jnp.sum(mels ** 2) + jnp.sum(gates ** 2)
                + jnp.sum(aligns * jnp.arange(9)[None, None, :])
            )
        return f

    args = (params["decoder"], enc0, att0, din0)
    g_x = jax.grad(loss_with("xla"), argnums=(0, 1, 2, 3))(*args)
    g_p = jax.grad(loss_with("pallas"), argnums=(0, 1, 2, 3))(*args)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_x), jax.tree.leaves(g_p)
    ):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        # bf16-class budget: both backwards round differently; 2% of the
        # per-leaf max plus floor catches real regressions (sign flips,
        # dropped terms) while allowing rounding-order noise
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=0.02 * scale + 1e-6,
            err_msg=f"bf16 bwd-mode grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_pallas_bf16_policy_trains():
    """Under the bf16 policy the Pallas training path runs, grads are
    finite, and a few optimization steps reduce the loss."""
    import optax

    from tacotron2_tpu.training.optimizer import make_optimizer

    model, params, state, batch = _setup(policy="bf16-mixed")
    tx, _ = make_optimizer(3e-3, 0.0)
    opt = tx.init(params)
    f = _loss_fn(model, state, batch, pallas_train=True)

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


def test_vmem_guards_flagship():
    """Dispatch guards (ADVICE r2 #1): the forward guard admits the
    flagship up to B=128 at typical char lengths; the BACKWARD guard —
    whose resident set adds the f32 (A, B8*LB) attention planes — admits
    the measured peak config (B=32, ~128 chars) but falls back to the XLA
    reverse scan for long-char batches that would blow the 100 MB VMEM
    limit."""
    from tacotron2_tpu.ops.train_decode_pallas import (
        pallas_bwd_supported,
        pallas_train_supported,
    )

    flagship = Tacotron2Config(
        num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
        prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
        postnet_dim=512,
    )
    bf16 = Policy.from_string("bf16-mixed")
    assert pallas_train_supported(flagship, bf16, 32, max_chars=128)
    assert pallas_train_supported(flagship, bf16, 128, max_chars=128)
    assert pallas_bwd_supported(flagship, bf16, 32, max_chars=128)
    # long-char backward exceeds the budget -> XLA fallback
    assert not pallas_bwd_supported(flagship, bf16, 32, max_chars=512)
    # f32 policy never dispatches to the kernels
    assert not pallas_train_supported(flagship, Policy.from_string("32-true"), 32)


def test_pallas_bwd_batch_chunked_grads():
    """B > 32 backward: the Mosaic kernel is gated to B8<=32, so larger
    batches run as sequential <=32-row chunk launches whose weight grads
    sum and per-row cotangents concatenate (_bwd_impl_pallas). B=34 forces
    two UNEVEN chunks (32 + 2 -> repadded to 8); gradients must match the
    verified XLA hoisted reverse scan behind the same Pallas forward."""
    model = Tacotron2(Tacotron2Config(**CFG), Policy.from_string("32-true"))
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    B, L, T = 34, 9, 10
    batch = {
        "chars_idx": jnp.asarray(rng.integers(1, 16, size=(B, L)).astype(np.int64)),
        "chars_len": jnp.asarray([9, 6] * 17),
        "mel": jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32) * 0.5),
        "mel_len": jnp.asarray([T, T - 4] * 17),
        "gate": jnp.ones((B, T, 1), jnp.float32),
    }
    key = jax.random.PRNGKey(23)
    g_xla = jax.grad(_loss_fn(
        model, state, batch, pallas_train=True, pallas_bwd="xla"
    ))(params, key)
    g_chunk = jax.grad(_loss_fn(
        model, state, batch, pallas_train=True, pallas_bwd="pallas"
    ))(params, key)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_xla), jax.tree.leaves(g_chunk)
    ):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=3e-5 * scale + 1e-7,
            err_msg=f"chunked-bwd grad mismatch at {jax.tree_util.keystr(path)}",
        )
