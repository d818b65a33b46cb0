"""Fused Pallas decode-loop vs the XLA while_loop path (interpret mode on
CPU). Covers plain decode, early stop, inference dropout bit-match (same
PRNG derivation on both paths), and controls."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

CFG = dict(
    num_chars=20, encoded_dim=64, encoder_kernel_size=5, num_mels=16,
    prenet_dim=32, att_rnn_dim=128, att_dim=32, rnn_hidden_dim=128,
    postnet_dim=16, dropout=0.5,
)


def _setup(gate_bias, seed=0, **extensions):
    model = Tacotron2(Tacotron2Config(**CFG, **extensions))
    params, state = model.init(jax.random.PRNGKey(seed))
    params["decoder"]["gate"]["b"] = jnp.full_like(params["decoder"]["gate"]["b"], gate_bias)
    rng = np.random.default_rng(seed)
    chars = rng.integers(1, 21, size=(2, 9)).astype(np.int64)
    lens = np.array([9, 6], dtype=np.int64)
    chars[1, 6:] = 0
    return model, params, state, jnp.asarray(chars), jnp.asarray(lens)


def _compare(model, params, state, chars, lens, max_len, rng, dropout, **kw):
    ref = model.forward_infer(
        params, state, chars, lens, max_len, rng=rng, prenet_dropout=dropout, **kw
    )
    fused = model.forward_infer_fused(
        params, state, chars, lens, max_len, rng=rng, prenet_dropout=dropout,
        interpret=True, **kw
    )
    assert int(fused.n_frames) == int(ref.n_frames)
    np.testing.assert_array_equal(np.asarray(fused.lengths), np.asarray(ref.lengths))
    n = int(ref.n_frames)
    np.testing.assert_allclose(
        np.asarray(fused.mels)[:, :n], np.asarray(ref.mels)[:, :n], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(fused.mels_post)[:, :n], np.asarray(ref.mels_post)[:, :n], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(fused.gates)[:, :n], np.asarray(ref.gates)[:, :n], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(fused.alignments)[:, :n], np.asarray(ref.alignments)[:, :n], atol=1e-4
    )
    return ref, fused


def test_fused_matches_xla_no_dropout():
    model, params, state, chars, lens = _setup(gate_bias=3.0)
    _compare(model, params, state, chars, lens, 80, jax.random.PRNGKey(1), dropout=False)


def test_fused_matches_xla_with_dropout():
    # same PRNG derivation on both paths -> bit-comparable even with
    # AlwaysDropout active
    model, params, state, chars, lens = _setup(gate_bias=3.0)
    _compare(model, params, state, chars, lens, 70, jax.random.PRNGKey(7), dropout=True)


def test_fused_early_stop():
    model, params, state, chars, lens = _setup(gate_bias=-3.0)
    ref, fused = _compare(
        model, params, state, chars, lens, 128, jax.random.PRNGKey(2), dropout=False
    )
    assert int(fused.n_frames) == 1  # gate fires immediately
    # frames beyond the executed region stay masked
    assert np.all(np.asarray(fused.mels)[:, 1:] == 0.0)
    assert np.all(np.asarray(fused.gates)[:, 1:] == -1000.0)


def test_fused_int8_close_to_f32():
    """The int8-quantized fast mode: same step count, small bounded
    divergence from the f32 XLA path (weight per-column + activation
    per-row int8; NOT the parity path)."""
    model, params, state, chars, lens = _setup(gate_bias=3.0)
    ref = model.forward_infer(
        params, state, chars, lens, 70, rng=jax.random.PRNGKey(5), prenet_dropout=False
    )
    q = model.forward_infer_fused(
        params, state, chars, lens, 70, rng=jax.random.PRNGKey(5),
        prenet_dropout=False, interpret=True, quantize=True,
    )
    assert int(q.n_frames) == int(ref.n_frames)
    n = int(ref.n_frames)
    a = np.asarray(ref.mels_post)[:, :n]
    b = np.asarray(q.mels_post)[:, :n]
    rel = np.abs(a - b).mean() / max(np.abs(a).mean(), 1e-9)
    # REGRESSION GATE: budget documented in Tacotron2.forward_infer_fused's
    # docstring. Measured 0.19% on this config (0.28% flagship on hardware,
    # PERF.md); 1% trips on any real quantization regression while leaving
    # noise headroom.
    assert rel < 0.01, f"int8 divergence too large: {rel:.3%}"
    # gate logits must stay close enough to preserve stop decisions
    g = np.abs(np.asarray(ref.gates)[:, :n] - np.asarray(q.gates)[:, :n]).max()
    assert g < 0.05, f"int8 gate-logit divergence too large: {g}"


def test_fused_with_controls_and_speaker():
    ext = dict(speaker_tokens=True, num_speakers=3, controls=True, controls_dim=5)
    model, params, state, chars, lens = _setup(gate_bias=3.0, **ext)
    rng = np.random.default_rng(3)
    kw = dict(
        speaker_id=jnp.asarray([0, 2]),
        controls=jnp.asarray(rng.uniform(-1, 1, size=(2, 5)).astype(np.float32)),
    )
    _compare(model, params, state, chars, lens, 66, jax.random.PRNGKey(4), dropout=False, **kw)


def test_fused_resident_split_matches():
    """resident_cols > 0: part of the weight stream lives in VMEM across
    the launch; results must match the fully-streamed kernel exactly."""
    model, params, state, chars, lens = _setup(gate_bias=3.0)
    rng = jax.random.PRNGKey(11)
    ref = model.forward_infer(
        params, state, chars, lens, 70, rng=rng, prenet_dropout=False
    )
    # rc == 4H (512 here) is the FULL-residency production mode: nothing
    # streams per frame, grid degenerates to (T, 2)
    for rc in (128, 256, 512):
        fused = model.forward_infer_fused(
            params, state, chars, lens, 70, rng=rng, prenet_dropout=False,
            interpret=True, resident_cols=rc,
        )
        assert int(fused.n_frames) == int(ref.n_frames)
        n = int(ref.n_frames)
        np.testing.assert_allclose(
            np.asarray(fused.mels)[:, :n], np.asarray(ref.mels)[:, :n], atol=2e-4
        )

    # quantized + resident (incl. FULL): same budget as the streamed int8 gate
    for rc in (256, 512):
        q = model.forward_infer_fused(
            params, state, chars, lens, 70, rng=rng, prenet_dropout=False,
            interpret=True, quantize=True, resident_cols=rc,
        )
        n = int(min(q.n_frames, ref.n_frames))
        a = np.asarray(ref.mels_post)[:, :n]
        b = np.asarray(q.mels_post)[:, :n]
        rel = np.abs(a - b).mean() / max(np.abs(a).mean(), 1e-9)
        assert rel < 0.01, f"int8+resident(rc={rc}) divergence too large: {rel:.3%}"


def test_fused_decode_batch_chunked_matches_single():
    """Batch-chunked fused decode (bf16 kernel's B8=128 compile ceiling —
    larger batches run sequential <=cap-row launches, per-launch early
    stop): outputs must equal the single-launch path. cap=4 on B=10 forces
    uneven chunks (4+4+2); dropout off for exactness."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

    cfg = Tacotron2Config(
        num_chars=12, encoded_dim=32, encoder_kernel_size=5, num_mels=16,
        prenet_dim=16, att_rnn_dim=32, att_dim=16, rnn_hidden_dim=32,
        postnet_dim=16, dropout=0.0,
    )
    model = Tacotron2(cfg)
    params, state = model.init(jax.random.PRNGKey(4))
    params["decoder"]["gate"]["b"] = jnp.full_like(params["decoder"]["gate"]["b"], 5.0)
    rng = np.random.default_rng(6)
    chars = jnp.asarray(rng.integers(1, 12, size=(10, 8)))
    lens = jnp.asarray([8, 6, 8, 5, 8, 7, 8, 8, 4, 8])

    single = model.forward_infer_fused(
        params, state, chars, lens, 16, rng=jax.random.PRNGKey(0),
        prenet_dropout=False, interpret=True,
    )
    chunked = model.forward_infer_fused(
        params, state, chars, lens, 16, rng=jax.random.PRNGKey(0),
        prenet_dropout=False, interpret=True, batch_kernel_cap=4,
    )
    np.testing.assert_array_equal(np.asarray(single.lengths), np.asarray(chunked.lengths))
    np.testing.assert_allclose(
        np.asarray(chunked.mels_post), np.asarray(single.mels_post), atol=2e-5
    )

    # int8 kernel: same chunking guarantee past ITS measured ceiling
    # (B=128 on hardware; cap=4 on B=10 here forces uneven 4+4+2 chunks).
    # Per-chunk quantization scales are computed from the same full weight
    # block, so chunked must equal single-launch bit-for-bit in interpret.
    q_single = model.forward_infer_fused(
        params, state, chars, lens, 16, rng=jax.random.PRNGKey(0),
        prenet_dropout=False, interpret=True, quantize=True,
    )
    q_chunked = model.forward_infer_fused(
        params, state, chars, lens, 16, rng=jax.random.PRNGKey(0),
        prenet_dropout=False, interpret=True, quantize=True,
        int8_batch_kernel_cap=4,
    )
    np.testing.assert_array_equal(
        np.asarray(q_single.lengths), np.asarray(q_chunked.lengths)
    )
    np.testing.assert_allclose(
        np.asarray(q_chunked.mels_post), np.asarray(q_single.mels_post), atol=2e-5
    )


def _first_fire(out, b):
    """Per-row frame cut at the row's first gate<0 — the batch-invariant
    bookkeeping the warm server uses (run/server.py::_synthesize_batch)."""
    g = np.asarray(out.gates)[b, :, 0]
    neg = g < 0.0
    return int(neg.argmax()) if neg.any() else g.shape[0]


@pytest.mark.parametrize("gate_bias", [3.0, 0.0])
@pytest.mark.parametrize("fused", [False, True])
def test_row_rngs_batch_invariant(gate_bias, fused):
    """row_rngs contract (server dynamic batching): with independent
    per-row PRNG streams, each batch row decodes identically to a
    batch-of-1 run seeded with that row's key — batch composition cannot
    change a request's audio. The PRNG mask streams are bit-identical by
    construction; the numeric tolerance (1e-6 abs) only absorbs XLA's
    batch-shape-dependent vectorization of row-independent math (measured
    ≤7e-8 — a dropout-stream mismatch would be O(1)). Covers both the XLA
    while_loop and the fused kernel (interpret), with AlwaysDropout ACTIVE
    (the hard case: the per-row (1, P) mask draws must match the
    scalar-rng chain exactly)."""
    model, params, state, chars, lens = _setup(gate_bias=gate_bias)
    keys = jnp.stack([jax.random.PRNGKey(11), jax.random.PRNGKey(22)])

    def run(c, l, rr):
        kw = {"interpret": True} if fused else {}
        fn = model.forward_infer_fused if fused else model.forward_infer
        return fn(params, state, c, l, 40, rng=rr[0], row_rngs=rr,
                  prenet_dropout=True, **kw)

    batched = run(chars, lens, keys)
    for b in range(2):
        single = run(chars[b : b + 1], lens[b : b + 1], keys[b : b + 1])
        cb, cs = _first_fire(batched, b), _first_fire(single, 0)
        assert cb == cs, f"row {b}: first gate fire moved {cs} -> {cb} in batch"
        cut = max(min(cb, int(single.n_frames) - 1), 1)
        np.testing.assert_allclose(
            np.asarray(batched.mels_post)[b, :cut],
            np.asarray(single.mels_post)[0, :cut],
            atol=1e-6, rtol=0,
            err_msg=f"row {b} mel changed under batching",
        )
        np.testing.assert_allclose(
            np.asarray(batched.alignments)[b, :cut],
            np.asarray(single.alignments)[0, :cut],
            atol=1e-6, rtol=0,
        )
