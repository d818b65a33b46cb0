"""Teacher-forced decode scan as ONE Pallas kernel with LAUNCH-RESIDENT
weights — the training-side counterpart of the fused decode kernel.

Why: the XLA training scan (standard or hoisted-dW, ops/train_scan.py)
re-streams both fat LSTM matrices from HBM every frame — ~36 MB/step bf16
in the forward and ~72 MB/step in the backward's recompute + dx products
(PERF.md "where the training time goes"). This kernel holds the entire
packed weight block (~42 MB bf16 at flagship dims) in VMEM for the whole
launch — the per-frame weight traffic disappears; what remains per frame is
batch-proportional (~1 MB at B=32: dropout masks in, residual stacks out).

How it composes with the hoisted-dW backward: the kernel's forward emits
exactly the per-step residual stacks that ``train_scan._vjp_bwd`` consumes
(compute-dtype LSTM inputs xh1/xh2, pre-step cell states, pre-step
attention weights, step keys), so this module's ``custom_vjp`` pairs the
Pallas forward with the ALREADY-VERIFIED XLA reverse scan — gradients are
checked against ``jax.grad`` of the standard scan in
tests/test_train_pallas.py, the same gate as the XLA hoisted path.

Per-step math is bit-comparable with ``train_scan._fwd_impl``'s scan body
(same f32 LSTM epilogues, same dropout-mask values from the same PRNG
derivation, same compute-dtype casts); the only reordering is the
location-attention epilogue, which runs in the decode kernel's
lane-flattened batched layout (bf16 matmul-class divergence only — the
fold of location conv+dense is forward-only, the backward recomputes
through the unfolded XLA attention).

Reference behavior being trained: model/tacotron2.py:276-317 (teacher-
forced Python loop); this is purely an optimization of HOW the same math
executes on a TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tacotron2_tpu.models.decoder import DecoderState
from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.ops.decoder_loop_pallas import (
    _round_up,
    batched_location_attention,
)
from tacotron2_tpu.ops import train_scan


def _teacher_step_kernel(
    # per-t inputs
    decoder_in, dm1, dm2,
    # resident weights
    w_res, b_stream, wq, w_loc_win, wv, w_out, b_out,
    # resident memory
    encoded, att_enc_cat, valid, controls, block_expand,
    # initial state (zeros for teacher forcing, but kept general)
    in_att_h, in_att_c, in_ctx, in_att_w, in_att_w_cum, in_rnn_h, in_rnn_c,
    # per-t outputs: step outputs + backward residuals (pre-step state)
    out_mel_gate, out_align, out_xh1, out_xh2,
    out_c_att_prev, out_c_rnn_prev, out_w_prev, out_cum_prev,
    # state scratch (persists across the grid)
    s_att_h, s_att_c, s_ctx, s_att_w, s_att_w_cum, s_rnn_h, s_rnn_c,
    gates, xh, wpadP, wpadC,
    *, H: int, D: int, P: int, M: int, L: int, E: int, R1: int, LB: int,
    BA: int,
):
    t = pl.program_id(0)
    B8 = in_att_h.shape[0]
    f32 = jnp.float32
    dt = w_res.dtype

    @pl.when(t == 0)
    def _init():
        s_att_h[:] = in_att_h[:]
        s_att_c[:] = in_att_c[:]
        s_ctx[:] = in_ctx[:]
        s_att_w[:] = in_att_w[:]
        s_att_w_cum[:] = in_att_w_cum[:]
        s_rnn_h[:] = in_rnn_h[:]
        s_rnn_c[:] = in_rnn_c[:]
        wpadP[:, :] = jnp.zeros(wpadP.shape, f32)
        wpadC[:, :] = jnp.zeros(wpadC.shape, f32)

    # residuals FIRST: the backward needs the PRE-step state
    out_c_att_prev[0] = s_att_c[:]
    out_c_rnn_prev[0] = s_rnn_c[:]
    out_w_prev[0] = s_att_w[:]
    out_cum_prev[0] = s_att_w_cum[:]

    # ---- attention LSTM: xh1 = [prenet | ctx | att_h] ---------------------
    xh[:, :P] = decoder_in[0]
    xh[:, P : P + D] = s_ctx[:]
    xh[:, P + D : R1] = s_att_h[:]
    xh[:, R1:] = jnp.zeros((B8, xh.shape[1] - R1), f32)
    xh1_c = xh[:, :R1].astype(dt)
    out_xh1[0] = xh1_c
    g = jnp.dot(xh[:].astype(dt), w_res[:, : 4 * H], preferred_element_type=f32)
    gates[:, :] = g + b_stream[:, : 4 * H]

    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    gg = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_att = f * s_att_c[:] + i * gg
    h_att = o * jnp.tanh(c_att)
    h_att_d = h_att * dm1[0]
    s_att_c[:] = c_att
    s_att_h[:] = h_att_d  # post-dropout carry (decoder.py:138)

    # ---- location attention (shared batched epilogue; the DIRECT flat
    # window build avoids the B8-part relayout fan-out that crashes the
    # Mosaic compile helper at large batch) ---------------------------------
    w = batched_location_attention(
        h_att_d, wpadP, wpadC, s_att_w[:], s_att_w_cum[:],
        w_loc_win, wq, wv, att_enc_cat, valid, encoded, block_expand,
        s_ctx, B8=B8, BA=BA, L=L, LB=LB, dt=dt, flat_build=True,
    )
    s_att_w_cum[:] = s_att_w_cum[:] + w
    s_att_w[:] = w
    out_align[0] = w

    # ---- decoder LSTM: xh2 = [att_h_d | ctx | controls | rnn_h] -----------
    xh[:, :H] = h_att_d
    xh[:, H : H + D] = s_ctx[:]
    xh[:, H + D : H + D + E] = controls[:]
    xh[:, H + D + E :] = s_rnn_h[:]
    xh2_c = xh[:].astype(dt)
    out_xh2[0] = xh2_c
    g = jnp.dot(xh2_c, w_res[:, 4 * H :], preferred_element_type=f32)
    gates[:, :] = g + b_stream[:, 4 * H :]

    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    gg = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_rnn = f * s_rnn_c[:] + i * gg
    h_rnn = o * jnp.tanh(c_rnn)
    rnn_h_d = h_rnn * dm2[0]
    s_rnn_c[:] = c_rnn
    s_rnn_h[:] = rnn_h_d

    # ---- heads -------------------------------------------------------------
    out = (
        jnp.dot(rnn_h_d.astype(dt), w_out[:H], preferred_element_type=f32)
        + jnp.dot(s_ctx[:].astype(dt), w_out[H : H + D], preferred_element_type=f32)
        + jnp.dot(controls[:].astype(dt), w_out[H + D :], preferred_element_type=f32)
        + b_out[:, :]
    )
    out_mel_gate[0] = out


def _pack_training_weights(w1, w2, small, *, H, D, P, E, C, M, dt):
    """Kernel layouts from the hoisted-dW param split (train_scan
    _split_big_small): one unified resident block [att 4H | dec 4H] with
    att rows zero-padded into the dec row space and controls rows padded
    C -> E; heads packed as [mel | gate | pad] into 128 columns; location
    conv+dense FOLDED into the (64, A) window matrix (forward only — the
    backward differentiates through the unfolded XLA attention)."""
    R1 = P + D + H
    R2k = 2 * H + D + E
    w1p = jnp.pad(w1, ((0, R2k - R1), (0, 0)))
    # w2 rows: [att_h H | ctx D | controls C | rnn_h H] -> pad C -> E
    w2p = jnp.concatenate(
        [w2[: H + D], jnp.pad(w2[H + D : H + D + C], ((0, E - C), (0, 0))), w2[H + D + C :]],
        axis=0,
    )
    w_res = jnp.concatenate([w1p, w2p], axis=1).astype(dt)  # (R2k, 8H)
    b_stream = jnp.concatenate([small["b1"], small["b2"]])[None, :].astype(jnp.float32)

    att = small["attention"]
    w_loc = att["location_conv"]["w"]  # (31, 2, 32)
    dense = att["location_dense"]["w"]  # (32, A)
    A = dense.shape[1]
    w_loc_win = jnp.zeros((64, A), jnp.float32)
    w_loc_win = w_loc_win.at[0:31].set(w_loc[:, 0, :] @ dense)
    w_loc_win = w_loc_win.at[32:63].set(w_loc[:, 1, :] @ dense)

    mel_w = small["mel_out"]["w"]  # (H + D + C, M)
    mel_w = jnp.concatenate(
        [mel_w[: H + D], jnp.pad(mel_w[H + D :], ((0, E - C), (0, 0)))], axis=0
    )
    gate_w = jnp.pad(small["gate"]["w"], ((0, E), (0, 0)))
    w_out = jnp.zeros((H + D + E, 128), jnp.float32)
    w_out = w_out.at[:, :M].set(mel_w).at[:, M : M + 1].set(gate_w)
    b_out = jnp.zeros((1, 128), jnp.float32)
    b_out = b_out.at[0, :M].set(small["mel_out"]["b"]).at[0, M].set(small["gate"]["b"][0])

    return dict(
        w_res=w_res, b_stream=b_stream,
        wq=att["query"]["w"].astype(dt), w_loc_win=w_loc_win.astype(dt),
        wv=att["v"]["w"].astype(jnp.float32),
        w_out=w_out.astype(dt), b_out=b_out,
    )


def _fwd_impl(policy, train, interpret, w1, w2, small, decoder_in, step_keys,
              encoded, att_encoded, mask, controls, init_state):
    """Run the kernel; return (outs, res, stash): ``res`` in the exact
    shapes/dtypes of train_scan._fwd_impl (so train_scan._vjp_bwd consumes
    it as-is) and ``stash`` the kernel-native padded stacks for the Pallas
    backward kernel (no re-padding in the backward)."""
    T, B, P = decoder_in.shape
    H = init_state.att_h.shape[-1]
    D = encoded.shape[-1]
    M = small["mel_out"]["w"].shape[1]
    C = 0 if controls is None else controls.shape[-1]
    E = _round_up(max(C, 1), 16)
    Lc = encoded.shape[1]
    L = _round_up(Lc, 128)
    LB = _round_up(L + 47, 128)
    B8 = _round_up(B, 8)
    R1 = P + D + H
    R2k = 2 * H + D + E
    f32 = jnp.float32
    dt = policy.compute_dtype

    packed = _pack_training_weights(w1, w2, small, H=H, D=D, P=P, E=E, C=C, M=M, dt=dt)

    # dropout masks OUTSIDE the kernel, same derivation as the XLA scan body
    # (train_scan._dropout_masks over the same step keys) — the backward's
    # recompute regenerates bit-identical masks from the keys
    def masks_for(key):
        return train_scan._dropout_masks(key, (B, H), train)

    dm1, dm2 = jax.vmap(masks_for)(step_keys)  # (T, B, H) each

    def pad_to(x, axis, size):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, size - x.shape[axis])
        return jnp.pad(x, pad)

    dm1 = pad_to(dm1, 1, B8)
    dm2 = pad_to(dm2, 1, B8)

    dec_in = pad_to(decoder_in.astype(f32), 1, B8)  # (T, B8, P)

    enc = pad_to(pad_to(encoded, 1, L), 0, B8).astype(dt)
    # attention memory in the COMPUTE dtype (the kernel upcasts at the
    # energies add): halves the resident VMEM at large batch; exact under
    # the f32 policy, bf16-matmul-class under bf16-mixed (the backward
    # recomputes through the f32 XLA attention either way)
    att = pad_to(pad_to(att_encoded, 1, LB), 0, B8).astype(dt)
    att_cat = jnp.transpose(att, (2, 0, 1)).reshape(att.shape[2], B8 * LB)
    valid = pad_to(pad_to((~mask).astype(f32), 1, LB), 0, B8)
    valid = valid.at[:, 0].set(jnp.maximum(valid[:, 0], 1e-6))
    if controls is not None:
        ctrl = pad_to(pad_to(controls.astype(f32), 1, E), 0, B8)
    else:
        ctrl = jnp.zeros((B8, E), f32)
    # 0/1 mask — exact in bf16; compute dtype halves its resident VMEM
    block_expand = jnp.kron(
        jnp.eye(B8, dtype=f32), jnp.ones((1, LB), f32)
    ).astype(dt)

    st = [
        pad_to(getattr(init_state, k).astype(f32), 0, B8)
        for k in ("att_h", "att_c", "att_context")
    ] + [
        pad_to(pad_to(getattr(init_state, k).astype(f32), 1, L), 0, B8)
        for k in ("att_weights", "att_weights_cum")
    ] + [
        pad_to(getattr(init_state, k).astype(f32), 0, B8)
        for k in ("rnn_h", "rnn_c")
    ]

    A = packed["wq"].shape[1]
    kernel = functools.partial(
        _teacher_step_kernel, H=H, D=D, P=P, M=M, L=L, E=E, R1=R1, LB=LB,
        BA=min(B, B8),
    )

    def resident(*shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM)

    def per_t(*shape):
        return pl.BlockSpec(
            (1,) + shape, lambda t: (t,) + (0,) * len(shape), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T,),
        scratch_shapes=[
            pltpu.VMEM((B8, H), f32), pltpu.VMEM((B8, H), f32),  # s_att_h/c
            pltpu.VMEM((B8, D), f32),  # s_ctx
            pltpu.VMEM((B8, L), f32), pltpu.VMEM((B8, L), f32),  # att_w / cum
            pltpu.VMEM((B8, H), f32), pltpu.VMEM((B8, H), f32),  # s_rnn_h/c
            pltpu.VMEM((B8, 4 * H), f32),  # gates
            pltpu.VMEM((B8, R2k), f32),  # xh
            pltpu.VMEM((B8, LB), f32), pltpu.VMEM((B8, LB), f32),  # wpadP/C
        ],
        in_specs=[
            per_t(B8, P),  # decoder_in
            per_t(B8, H), per_t(B8, H),  # dm1, dm2
            resident(R2k, 8 * H),  # w_res
            resident(1, 8 * H),  # b_stream
            resident(H, A), resident(64, A), resident(A, 1),  # wq, w_loc_win, wv
            resident(H + D + E, 128), resident(1, 128),  # w_out, b_out
            resident(B8, L, D),  # encoded
            resident(A, B8 * LB),  # att_enc_cat
            resident(B8, LB),  # valid
            resident(B8, E),  # controls
            resident(B8, B8 * LB),  # block_expand
            resident(B8, H), resident(B8, H), resident(B8, D),
            resident(B8, L), resident(B8, L), resident(B8, H), resident(B8, H),
        ],
        out_specs=[
            per_t(B8, 128),  # mel_gate
            per_t(B8, L),  # align
            per_t(B8, R1),  # xh1 (compute dtype)
            per_t(B8, R2k),  # xh2 (compute dtype)
            per_t(B8, H), per_t(B8, H),  # c_att_prev, c_rnn_prev
            per_t(B8, L), per_t(B8, L),  # w_prev, cum_prev
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((T, B8, 128), f32),
        jax.ShapeDtypeStruct((T, B8, L), f32),
        jax.ShapeDtypeStruct((T, B8, R1), dt),
        jax.ShapeDtypeStruct((T, B8, R2k), dt),
        jax.ShapeDtypeStruct((T, B8, H), f32),
        jax.ShapeDtypeStruct((T, B8, H), f32),
        jax.ShapeDtypeStruct((T, B8, L), f32),
        jax.ShapeDtypeStruct((T, B8, L), f32),
    ]

    # Mosaic rejects dots traced under jax_default_matmul_precision="high"
    # (the train driver's torch-parity setting, run/train.py:85-91); pin
    # DEFAULT inside the kernel — a no-op for bf16 operands
    with jax.default_matmul_precision("default"):
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(100 * 1024 * 1024),
            ),
        )(
            dec_in, dm1, dm2,
            packed["w_res"], packed["b_stream"], packed["wq"],
            packed["w_loc_win"], packed["wv"], packed["w_out"],
            packed["b_out"],
            enc, att_cat, valid, ctrl, block_expand, *st,
        )
    (mel_gate, align, xh1_s, xh2_s, c_att_prev_s, c_rnn_prev_s,
     w_prev_s, cum_prev_s) = outs

    mels = mel_gate[:, :B, :M]
    gates_out = mel_gate[:, :B, M]
    aligns = align[:, :B, :Lc]

    # residual stacks in train_scan._vjp_bwd's exact layout: real batch
    # rows, real char length, controls rows un-padded (E -> C)
    xh1_r = xh1_s[:, :B]
    if C:
        xh2_r = jnp.concatenate(
            [xh2_s[:, :B, : H + D + C], xh2_s[:, :B, H + D + E :]], axis=-1
        )
    else:
        xh2_r = jnp.concatenate(
            [xh2_s[:, :B, : H + D], xh2_s[:, :B, H + D + E :]], axis=-1
        )
    res = (
        xh1_r, xh2_r,
        c_att_prev_s[:, :B], c_rnn_prev_s[:, :B],
        w_prev_s[:, :B, :Lc], cum_prev_s[:, :B, :Lc],
        # rnn_h_prev is carried in the res tuple for layout parity but the
        # backward never reads it — pass zeros instead of materializing it
        jnp.zeros((T, B, H), f32),
        step_keys,
    )
    stash = dict(
        xh1=xh1_s, xh2=xh2_s, c_att_prev=c_att_prev_s, c_rnn_prev=c_rnn_prev_s,
        w_prev=w_prev_s, cum_prev=cum_prev_s, align=align, step_keys=step_keys,
        # the dropout masks are already materialized for the kernel's per-t
        # inputs — stash them so the backward reads instead of paying the
        # (T, B, H)×2 threefry pass a second time (f32: bf16 would round
        # the 1/(1-p) scale and break XLA-path gradient agreement)
        dm1=dm1, dm2=dm2,
    )
    return (mels, gates_out, aligns), res, stash


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def decode_scan_pallas(
    policy: Policy,
    train: bool,
    interpret: bool,
    bwd: str,  # "pallas" | "xla"
    w1, w2, small,
    decoder_in,  # (T, B, P)
    step_keys,  # (T, 2) uint32
    encoded, att_encoded, mask, controls,
    init_state: DecoderState,
):
    outs, _, _ = _fwd_impl(
        policy, train, interpret, w1, w2, small, decoder_in, step_keys,
        encoded, att_encoded, mask, controls, init_state,
    )
    return outs


def _vjp_fwd(policy, train, interpret, bwd, w1, w2, small, decoder_in,
             step_keys, encoded, att_encoded, mask, controls, init_state):
    outs, res, stash = _fwd_impl(
        policy, train, interpret, w1, w2, small, decoder_in, step_keys,
        encoded, att_encoded, mask, controls, init_state,
    )
    if bwd == "pallas":
        # kernel-native padded stacks — the Pallas backward reads them
        # without any re-padding; the sliced `res` copies get DCE'd
        saved = (stash, w1, w2, small, encoded, att_encoded, mask, controls,
                 decoder_in.shape, controls is None)
    else:
        saved = (res, w1, w2, small, encoded, att_encoded, mask, controls)
    return outs, saved


def _vjp_bwd_dispatch(policy, train, interpret, bwd, saved, cots):
    if bwd == "pallas":
        return _bwd_impl_pallas(policy, train, interpret, saved, cots)
    # the Pallas forward pairs with the VERIFIED XLA hoisted-dW reverse scan
    # (train_scan._vjp_bwd): it consumes only the residual stacks, which the
    # kernel emits in the identical layout
    return train_scan._vjp_bwd(policy, train, saved, cots)


decode_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd_dispatch)


def run_decode_scan_pallas(
    dec_params, init_state, decoder_in, step_keys, encoded, att_encoded,
    mask, controls, train: bool, policy: Policy, interpret: bool = False,
    bwd: str = "xla",
):
    """Pallas counterpart of train_scan.run_decode_scan:
    -> (mels (T,B,M), gates (T,B), aligns (T,B,L)).

    ``bwd="pallas"`` runs the reverse scan as a second launch-resident
    kernel (_teacher_bwd_kernel) — gradient-verified vs jax.grad in
    interpret mode (tests/test_train_pallas.py); ``bwd="xla"`` (the
    current production default) keeps the XLA hoisted-dW reverse scan
    (train_scan._vjp_bwd) behind the Pallas forward."""
    w1, w2, small = train_scan._split_big_small(dec_params)
    return decode_scan_pallas(
        policy, train, interpret, bwd, w1, w2, small, decoder_in, step_keys,
        encoded, att_encoded, mask, controls, init_state,
    )


def _dot_over_lanes(lhs, rhs, chunk: int = 8192):
    """dot_general contracting the LANE (last) dim of both operands,
    statically chunked at 8192 lanes (a no-op at B8<=32 where NL=8192).
    Tried as a fix for the B8=64 compile-helper crash in the pull section
    — it did NOT resolve it (the kernel stays gated to B<=32, see
    pallas_train dispatch); kept because it is cost-free and bounds the
    single-contraction size."""
    import jax as _jax
    import jax.numpy as _jnp

    NLd = lhs.shape[1]
    acc = None
    for c0 in range(0, NLd, chunk):
        c1 = min(c0 + chunk, NLd)
        part = _jax.lax.dot_general(
            lhs[:, c0:c1], rhs[:, c0:c1],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=_jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _teacher_bwd_kernel(
    # per-t inputs (time already REVERSED by the caller's flips)
    xh1_t, xh2_t, c_att_prev_t, c_rnn_prev_t, w_prev_t, cum_prev_t,
    dm1_t, dm2_t, d_mel_gate_t, d_align_t,
    # resident weights / memory (wq_T / wv_T / enc_T are transposed copies
    # so every contraction uses a Mosaic-proven pattern — "both-transposed"
    # dot_generals crash the compile helper)
    w_res, b_stream, wq, wq_T, w_loc_win, wv, wv_T, w_out,
    encoded_T, att_enc_cat, valid, block_expand,
    # per-t outputs (reverse maps -> stacks come out in forward time order)
    out_dg1, out_dg2, out_dprenet, out_dctx,
    # resident outputs: recurrent cotangent carries (final value = d_init)
    o_d_att_h, o_d_att_c, o_d_ctx, o_d_w, o_d_cum, o_d_rnn_h, o_d_rnn_c,
    # resident outputs: parameter-gradient accumulators
    o_d_attenc, o_d_ctrl, o_d_wq, o_d_wv, o_d_wlw, o_d_wout,
    # scratch
    xh, wpadP, wpadC, dwctx, acc_attenc,
    *, T: int, H: int, D: int, P: int, M: int, L: int, E: int, R1: int,
    LB: int, BA: int, steps: int = 1, level: int = 99,
):
    """Reverse scan of the teacher-forced decode as ONE kernel with the
    full weight block VMEM-resident: per step it RECOMPUTES the forward
    from the stored residuals (the weight reads are free — the block is
    already resident for the dx products) and hand-pulls the cotangents
    through heads -> decoder LSTM -> location attention -> attention LSTM,
    stacking the gate cotangents for the post-kernel dW einsums exactly
    like train_scan._vjp_bwd. The backward is LINEAR in the cotangents, so
    zero-padded batch rows / char lanes provably contribute exact zeros
    (cotangents enter zero and every pull is a product with them).

    ``steps`` consecutive (reversed) time rows run per grid step (VERDICT
    r3 #2, "2-steps-per-grid-step"): the recurrent cotangent carries flow
    through LOCALS between the unrolled sub-steps and every parameter-
    gradient accumulator is read-modify-written ONCE per grid step with
    the summed contribution — at steps=2 this halves the big-accumulator
    RMW traffic (the (A, B8*LB) acc_attenc chain that the r3 level profile
    charged ~6.4 ms of the 45.4 ms B=32 step). Grid must be T // steps;
    under a bisection ``level`` the remaining sub-steps of the grid step
    are skipped (debug-only, same triage value as the per-step returns)."""
    k = pl.program_id(0)
    B8 = dm1_t.shape[1]
    f32 = jnp.float32
    dt = w_res.dtype
    NL = att_enc_cat.shape[1]

    @pl.when(k == 0)
    def _init():
        for ref in (o_d_att_h, o_d_att_c, o_d_ctx, o_d_w, o_d_cum,
                    o_d_rnn_h, o_d_rnn_c, o_d_ctrl, o_d_wq,
                    o_d_wv, o_d_wlw, o_d_wout):
            ref[:, :] = jnp.zeros(ref.shape, f32)
        # d_attenc accumulates in SCRATCH: a read-modify-write on the big
        # (A, NL) OUTPUT ref crashes the Mosaic compile helper (bisected);
        # scratch RMW + one final copy compiles fine
        acc_attenc[:, :] = jnp.zeros(acc_attenc.shape, f32)
        wpadP[:, :] = jnp.zeros(wpadP.shape, f32)
        wpadC[:, :] = jnp.zeros(wpadC.shape, f32)

    if level <= 10:  # bisection: I/O skeleton only
        return

    # recurrent cotangent carries: ref -> local once per grid step
    d_att_h = o_d_att_h[:, :]
    d_att_c = o_d_att_c[:, :]
    d_ctx_c = o_d_ctx[:, :]
    d_w_c = o_d_w[:, :]
    d_cum_c = o_d_cum[:, :]
    d_rnn_h = o_d_rnn_h[:, :]
    d_rnn_c = o_d_rnn_c[:, :]
    accs = {}

    def _add(name, v):
        accs[name] = v if name not in accs else accs[name] + v

    for sub in range(steps - 1, -1, -1):
        # ============= phase B: recompute + pull =========================
        xh2 = xh2_t[sub]  # (B8, R2k) compute dtype
        g2 = jnp.dot(xh2, w_res[:, 4 * H :], preferred_element_type=f32) + b_stream[:, 4 * H :]
        i2 = jax.nn.sigmoid(g2[:, :H])
        f2 = jax.nn.sigmoid(g2[:, H : 2 * H])
        t2 = jnp.tanh(g2[:, 2 * H : 3 * H])
        o2 = jax.nn.sigmoid(g2[:, 3 * H :])
        c_rnn_prev = c_rnn_prev_t[sub]
        c_rnn = f2 * c_rnn_prev + i2 * t2
        tc2 = jnp.tanh(c_rnn)
        dm2 = dm2_t[sub]
        rnn_h_d = o2 * tc2 * dm2

        # heads backward (packed layout: one matmul against w_out^T)
        dmg = d_mel_gate_t[sub]  # (B8, 128) f32
        d_headin = jax.lax.dot_general(
            dmg.astype(dt), w_out[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )  # (B8, R3)
        headin = jnp.concatenate([rnn_h_d, xh2[:, H : H + D + E].astype(f32)], axis=1)
        _add("wout", jax.lax.dot_general(
            headin.astype(dt), dmg.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=f32,
        ))
        d_rnn_h_d = d_headin[:, :H] + d_rnn_h
        d_ctx_heads = d_headin[:, H : H + D]
        d_ctrl_step = d_headin[:, H + D :]

        # decoder-LSTM backward
        d_h2 = d_rnn_h_d * dm2
        d_o2 = d_h2 * tc2 * o2 * (1.0 - o2)
        d_c2 = d_rnn_c + d_h2 * o2 * (1.0 - tc2 * tc2)
        d_f2 = d_c2 * c_rnn_prev * f2 * (1.0 - f2)
        d_i2 = d_c2 * t2 * i2 * (1.0 - i2)
        d_g2 = d_c2 * i2 * (1.0 - t2 * t2)
        dg2 = jnp.concatenate([d_i2, d_f2, d_g2, d_o2], axis=1)
        d_rnn_c = d_c2 * f2
        out_dg2[sub] = dg2.astype(dt)
        dxh2 = jax.lax.dot_general(
            dg2.astype(dt), w_res[:, 4 * H :],
            dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=f32,
        )  # (B8, R2k)
        d_h_att_from2 = dxh2[:, :H]
        _add("ctrl", d_ctrl_step + dxh2[:, H + D : H + D + E])
        d_rnn_h = dxh2[:, H + D + E :]
        d_ctx_total = d_ctx_c + d_ctx_heads + dxh2[:, H : H + D]
        out_dctx[sub] = d_ctx_total

        if level <= 20:  # bisection: phase B only
            break
        # ============= phase A: recompute ================================
        xh[:, :R1] = xh1_t[sub].astype(f32)
        xh[:, R1:] = jnp.zeros((B8, xh.shape[1] - R1), f32)
        g1 = jnp.dot(xh[:].astype(dt), w_res[:, : 4 * H], preferred_element_type=f32) + b_stream[:, : 4 * H]
        i1 = jax.nn.sigmoid(g1[:, :H])
        f1 = jax.nn.sigmoid(g1[:, H : 2 * H])
        t1 = jnp.tanh(g1[:, 2 * H : 3 * H])
        o1 = jax.nn.sigmoid(g1[:, 3 * H :])
        c_att_prev = c_att_prev_t[sub]
        c_att = f1 * c_att_prev + i1 * t1
        tc1 = jnp.tanh(c_att)
        dm1 = dm1_t[sub]
        h_att_d = o1 * tc1 * dm1

        # attention recompute, keeping the intermediates the pull needs.
        # The window matrix is built DIRECTLY in the flat (64, NL) layout —
        # no (64*B8, LB) intermediate and no B8-part relayout concats (their
        # fan-out is what breaks the B=64 compile): each 64-row stripe of
        # block b holds wpad[b] (placed block-diagonally via repeat-tile ×
        # block-mask, collapsed by a ones-contraction, tiled to 64 rows), and
        # the per-row left-rolls are LEAK-SAFE across block seams because the
        # ≤31 lanes that cross a boundary land in / come from the zero pad
        # and masked (≥ L) tail lanes.
        wpadP[:, 15 : 15 + L] = w_prev_t[sub]
        wpadC[:, 15 : 15 + L] = cum_prev_t[sub]
        ones_b = jnp.ones((1, B8), f32)
        sP = pltpu.repeat(wpadP[:], B8, axis=1) * block_expand[:]  # (B8, NL)
        sC = pltpu.repeat(wpadC[:], B8, axis=1) * block_expand[:]
        pP = jax.lax.dot_general(
            ones_b, sP, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (1, NL)
        pC = jax.lax.dot_general(
            ones_b, sC, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        row = jax.lax.broadcasted_iota(jnp.int32, (64, NL), 0)
        w_rows = jnp.where(
            row < 32, pltpu.repeat(pP, 64, axis=0), pltpu.repeat(pC, 64, axis=0)
        )  # (64, NL)
        shift = row % 32
        for j in (16, 8, 4, 2, 1):
            w_rows = jnp.where(
                (shift & j) > 0, pltpu.roll(w_rows, NL - j, axis=1), w_rows
            )
        w_cat = w_rows.astype(dt)  # (64, NL)
        loc_cat = jax.lax.dot_general(
            w_loc_win[:].astype(dt), w_cat,
            dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        qT = jax.lax.dot_general(
            wq[:].astype(dt), h_att_d.astype(dt),
            dimension_numbers=(((0,), (1,)), ((), ())), preferred_element_type=f32,
        )  # (A, B8)
        q_cat = jax.lax.dot_general(
            qT.astype(dt), block_expand[:].astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=f32,
        )
        t_cat = jnp.tanh(loc_cat + q_cat + att_enc_cat[:].astype(f32))  # (A, NL)
        e_flat = jax.lax.dot_general(
            wv[:].astype(dt), t_cat.astype(dt),
            dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (1, NL)
        energ = jnp.concatenate(
            [e_flat[:, b * LB : (b + 1) * LB] for b in range(B8)], axis=0
        )
        e = jnp.where(valid[:] > 0, energ, -1e30)
        m = jnp.max(e, axis=1, keepdims=True)
        wfull = jnp.exp(e - m)
        wfull = wfull / jnp.sum(wfull, axis=1, keepdims=True)  # (B8, LB)

        if level <= 30:  # bisection: + attention recompute
            break
        # ============= phase A: pull =====================================
        # context = w @ enc  ->  d_w += d_ctx . enc^T (per active row; enc_T
        # is the pre-transposed (B8, D, L) copy so the contraction is
        # standard)
        for b in range(BA):
            dwctx[b : b + 1, :] = jax.lax.dot_general(
                d_ctx_total[b : b + 1, :].astype(dt), encoded_T[b].astype(dt),
                dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
        if BA < B8:
            dwctx[BA:, :] = jnp.zeros((B8 - BA, L), f32)
        if level <= 31:  # bisection: + d_w_from_ctx row loop
            break
        # cum = cum_prev + w folds d_cum into w's cotangent
        dw_soft_L = d_w_c + d_align_t[sub] + d_cum_c + dwctx[:]
        dw_soft = jnp.concatenate(
            [dw_soft_L, jnp.zeros((B8, LB - L), f32)], axis=1
        )
        s = jnp.sum(dw_soft * wfull, axis=1, keepdims=True)
        de = wfull * (dw_soft - s)  # (B8, LB); zero on pad lanes/rows
        if level <= 32:  # bisection: + softmax pull
            break
        # de placed BLOCK-DIAGONALLY in the flat lane layout:
        # S[b, b*LB + l] = de[b, l] — pltpu.repeat TILES ([de de ...]) and
        # block_expand masks everything outside a row's own block. This
        # avoids both Mosaic hazards found here: 1-sublane lane-concats and
        # K=1 contractions crash the compile helper, and mixed-dtype
        # broadcast lowerings fail verification — so everything stays f32
        # over proven primitives (repeat / elementwise / standard dots).
        S = pltpu.repeat(de, B8, axis=1) * block_expand[:]  # (B8, NL)
        wv_cols = pltpu.repeat(wv[:].astype(f32), B8, axis=1)  # (A, B8) tiled
        wv_de = jax.lax.dot_general(
            wv_cols, S,
            dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (A, NL) == wv ⊗ de_flat
        fac = 1.0 - t_cat * t_cat  # tanh'
        de_pre = wv_de * fac
        if level <= 33:  # bisection: + block-diagonal outer product
            break
        _add("attenc", de_pre)
        if level <= 34:  # bisection: + d_attenc accumulate
            break
        # d_wv per-batch columns (A, B8); the epilogue sums columns 0..B8
        _add("wv", _dot_over_lanes(t_cat, S))
        if level <= 35:  # bisection: + d_wv accumulate
            break
        # dq[b, a] = wv[a] * Σ_l de[b, l] * fac[a, b*LB+l]: contract S with
        # tanh' over lanes (the SAME op shape as the d_wv dot above, which
        # compiles at B8=64 — the original de_pre ⋅ block_expand formulation
        # crashed the compile helper there), then scale rows by wv^T
        dq = _dot_over_lanes(S, fac) * pltpu.repeat(
            wv_T[:].astype(f32), B8, axis=0
        )  # (B8, A)
        if level <= 36:  # bisection: + dq (probe write defeats DCE)
            _add("wq", jax.lax.dot_general(
                dq, jnp.ones((B8, H), f32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ))
            break
        d_h_from_q = jax.lax.dot_general(
            dq, wq_T[:].astype(f32),
            dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (B8, H)
        if level <= 37:  # bisection: + d_h_from_q (probe write defeats DCE)
            d_rnn_h = d_rnn_h + d_h_from_q
            break
        # d_wq accumulated TRANSPOSED as (A, H) — contraction over the batch
        # rows is the proven class; the XLA epilogue transposes once
        _add("wq", jax.lax.dot_general(
            dq, h_att_d,
            dimension_numbers=(((0,), (0,)), ((), ())), preferred_element_type=f32,
        ))  # (A, H)
        if level <= 38:  # bisection: + d_wq accumulate
            break
        _add("wlw", _dot_over_lanes(w_cat.astype(f32), de_pre))  # (64, A)
        if level <= 40:  # bisection: + softmax/energy pull, small param grads
            break
        # window backward: d_win = w_loc_win @ de_pre, RIGHT-roll each tap
        # row by its shift (directly in the flat (64, NL) layout —
        # seam-crossing lanes are zeros: de_pre is zero on each block's
        # masked ≥ L tail), then channel-sum the tap rows via selector
        # contractions
        d_win_cat = jax.lax.dot_general(
            w_loc_win[:].astype(f32), de_pre,
            dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (64, NL)
        for j in (16, 8, 4, 2, 1):
            d_win_cat = jnp.where(
                (shift & j) > 0, pltpu.roll(d_win_cat, j, axis=1), d_win_cat
            )
        rolled_cat = d_win_cat  # (64, NL)
        r64 = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
        selP = (r64 < 31).astype(f32)
        selC = jnp.logical_and(r64 >= 32, r64 < 63).astype(f32)
        sumP_flat = jax.lax.dot_general(
            selP, rolled_cat,
            dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (1, NL)
        sumC_flat = jax.lax.dot_general(
            selC, rolled_cat,
            dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=f32,
        )
        sumP = jnp.concatenate(
            [sumP_flat[:, b * LB : (b + 1) * LB] for b in range(B8)], axis=0
        )  # (B8, LB)
        sumC = jnp.concatenate(
            [sumC_flat[:, b * LB : (b + 1) * LB] for b in range(B8)], axis=0
        )
        d_w_c = sumP[:, 15 : 15 + L]
        d_cum_c = d_cum_c + sumC[:, 15 : 15 + L]

        if level <= 50:  # bisection: + window backward
            break
        # attention-LSTM backward
        d_hd1 = d_att_h + d_h_att_from2 + d_h_from_q
        d_h1 = d_hd1 * dm1
        d_o1 = d_h1 * tc1 * o1 * (1.0 - o1)
        d_c1 = d_att_c + d_h1 * o1 * (1.0 - tc1 * tc1)
        d_f1 = d_c1 * c_att_prev * f1 * (1.0 - f1)
        d_i1 = d_c1 * t1 * i1 * (1.0 - i1)
        d_g1 = d_c1 * i1 * (1.0 - t1 * t1)
        dg1 = jnp.concatenate([d_i1, d_f1, d_g1, d_o1], axis=1)
        d_att_c = d_c1 * f1
        out_dg1[sub] = dg1.astype(dt)
        dxh1 = jax.lax.dot_general(
            dg1.astype(dt), w_res[:, : 4 * H],
            dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=f32,
        )  # (B8, R2k); cols >= R1 are exact zeros (zero-padded weight rows)
        out_dprenet[sub] = dxh1[:, :P]
        d_ctx_c = dxh1[:, P : P + D]
        d_att_h = dxh1[:, P + D : R1]

    # carries: local -> ref once per grid step; accumulators: ONE
    # read-modify-write each with the summed sub-step contributions
    o_d_att_h[:, :] = d_att_h
    o_d_att_c[:, :] = d_att_c
    o_d_ctx[:, :] = d_ctx_c
    o_d_w[:, :] = d_w_c
    o_d_cum[:, :] = d_cum_c
    o_d_rnn_h[:, :] = d_rnn_h
    o_d_rnn_c[:, :] = d_rnn_c
    for name, ref in (("ctrl", o_d_ctrl), ("wq", o_d_wq), ("wv", o_d_wv),
                      ("wlw", o_d_wlw), ("wout", o_d_wout)):
        if name in accs:
            ref[:, :] = ref[:, :] + accs[name]
    if "attenc" in accs:
        acc_attenc[:, :] = acc_attenc[:, :] + accs["attenc"]

    @pl.when(k == T // steps - 1)
    def _flush_attenc():
        o_d_attenc[:, :] = acc_attenc[:, :]


def _bwd_impl_pallas(policy, train, interpret, saved, cots):
    """Pallas reverse scan + XLA epilogue. Returns the identical cotangent
    structure as train_scan._vjp_bwd.

    BATCH-CHUNKED past B=32: the Mosaic compile helper crashes on the
    B8=64 kernel (cumulative-complexity ceiling, CLAUDE.md), but the
    backward's per-batch-row work is INDEPENDENT — the recurrent carries
    are per-row and the weight-gradient accumulators are plain batch sums
    — so a large batch runs as ⌈B/32⌉ sequential calls of the verified
    B≤32 kernel: weight grads sum, per-row cotangents concatenate. Each
    chunk re-loads the ~42 MB weight block into VMEM (~50 µs at HBM
    bandwidth — negligible vs the ~20 ms chunk body). The one coupling is
    the LSTM dropout masks: they are drawn per step for the FULL batch
    (train_scan._dropout_masks over (B, H)), so chunks must see their
    ROWS of the full draw — masks are generated here once and sliced."""
    import numpy as np

    (stash, w1, w2, small, encoded, att_encoded, mask, controls,
     din_shape, _no_ctrl) = saved
    d_mels, d_gates_out, d_aligns = cots
    T, B, P = din_shape
    H = stash["c_att_prev"].shape[-1]

    # masks come from the stash (materialized by the forward; padded to the
    # full batch's B8) — no second threefry pass
    dm1 = stash["dm1"][:, :B]
    dm2 = stash["dm2"][:, :B]

    # pack the weight block ONCE — chunk-invariant, like the masks (don't
    # rely on XLA CSE to dedupe ceil(B/32) identical ~42 MB pack subgraphs)
    D = encoded.shape[-1]
    M = small["mel_out"]["w"].shape[1]
    C = 0 if controls is None else controls.shape[-1]
    E = _round_up(max(C, 1), 16)
    packed = _pack_training_weights(
        w1, w2, small, H=H, D=D, P=P, E=E, C=C, M=M, dt=policy.compute_dtype
    )

    if B <= 32:
        return _bwd_chunk(
            policy, interpret, stash, w1, w2, small, encoded, att_encoded,
            mask, controls, din_shape, dm1, dm2,
            d_mels, d_gates_out, d_aligns, packed,
        )

    chunks = []
    for c0 in range(0, B, 32):
        c1 = min(c0 + 32, B)
        stash_c = {
            k: (v if k == "step_keys" else v[:, c0:c1])
            for k, v in stash.items()
        }
        ctrl_c = None if controls is None else controls[c0:c1]
        chunks.append(_bwd_chunk(
            policy, interpret, stash_c, w1, w2, small,
            encoded[c0:c1], att_encoded[c0:c1], mask[c0:c1], ctrl_c,
            (T, c1 - c0, P), dm1[:, c0:c1], dm2[:, c0:c1],
            d_mels[:, c0:c1], d_gates_out[:, c0:c1], d_aligns[:, c0:c1],
            packed,
        ))

    def cat0(xs):
        return jnp.concatenate(xs, axis=0)

    dw1 = sum(c[0] for c in chunks[1:]) + chunks[0][0]
    dw2 = sum(c[1] for c in chunks[1:]) + chunks[0][1]
    d_small = jax.tree.map(lambda *xs: sum(xs[1:]) + xs[0], *[c[2] for c in chunks])
    d_prenet = jnp.concatenate([c[3] for c in chunks], axis=1)
    d_keys = chunks[0][4]
    d_enc = cat0([c[5] for c in chunks])
    d_attenc = cat0([c[6] for c in chunks])
    d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    d_ctrl = None if controls is None else cat0([c[8] for c in chunks])
    d_init_state = jax.tree.map(
        lambda *xs: jnp.concatenate(xs, axis=0), *[c[9] for c in chunks]
    )
    return (dw1, dw2, d_small, d_prenet, d_keys, d_enc, d_attenc, d_mask,
            d_ctrl, d_init_state)


def _bwd_chunk(policy, interpret, stash, w1, w2, small, encoded,
               att_encoded, mask, controls, din_shape, dm1, dm2,
               d_mels, d_gates_out, d_aligns, packed):
    """One ≤32-row backward kernel launch (see _bwd_impl_pallas). ``stash``
    arrays carry the chunk's batch rows (possibly already B8-padded when
    called unchunked); dropout masks and the packed weight block arrive
    pre-built (chunk-invariant)."""
    import numpy as np

    T, B, P = din_shape
    H = stash["c_att_prev"].shape[-1]
    D = encoded.shape[-1]
    M = small["mel_out"]["w"].shape[1]
    C = 0 if controls is None else controls.shape[-1]
    E = _round_up(max(C, 1), 16)
    Lc = encoded.shape[1]
    L = stash["w_prev"].shape[-1]
    LB = _round_up(L + 47, 128)
    B8 = _round_up(B, 8)
    R1 = P + D + H
    R2k = 2 * H + D + E
    R3 = H + D + E
    f32 = jnp.float32
    dt = policy.compute_dtype
    A = small["attention"]["query"]["w"].shape[1]

    step_keys = stash["step_keys"]

    def pad_to(x, axis, size):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, size - x.shape[axis])
        return jnp.pad(x, pad)

    # chunked calls pass real-row slices; pad the per-t stacks back to B8
    # (no-op when the stash arrives kernel-padded from the forward)
    stash = {
        k: (v if k == "step_keys" else pad_to(v, 1, B8))
        for k, v in stash.items()
    }

    dm1 = pad_to(dm1, 1, B8)
    dm2 = pad_to(dm2, 1, B8)

    d_mel_gate = jnp.zeros((T, B8, 128), f32)
    d_mel_gate = d_mel_gate.at[:, :B, :M].set(d_mels.astype(f32))
    d_mel_gate = d_mel_gate.at[:, :B, M].set(d_gates_out.astype(f32))
    d_align = pad_to(pad_to(d_aligns.astype(f32), 2, L), 1, B8)

    enc = pad_to(pad_to(encoded, 1, L), 0, B8).astype(dt)
    att = pad_to(pad_to(att_encoded, 1, LB), 0, B8).astype(f32)
    att_cat = jnp.transpose(att, (2, 0, 1)).reshape(att.shape[2], B8 * LB)
    valid = pad_to(pad_to((~mask).astype(f32), 1, LB), 0, B8)
    valid = valid.at[:, 0].set(jnp.maximum(valid[:, 0], 1e-6))
    block_expand = jnp.kron(jnp.eye(B8, dtype=f32), jnp.ones((1, LB), f32))

    import os

    # time reversal: either reverse index maps (T-1-t, ...) inside the
    # kernel (default — saves 14 stack flips per step), or outside flips
    # with monotonic maps (T2T_BWD_FLIP=1; kept as the triage fallback
    # from the compile-crash bisection, where flips were exonerated)
    use_flip = os.environ.get("T2T_BWD_FLIP") == "1"
    # 2-steps-per-grid-step (VERDICT r3 #2): TRIED and measured SLOWER —
    # 48.1 vs 45.3 ms at B=32/512f, 93.1 vs 88.1 at B=64 (same-process
    # A/B, identical losses). It compiles (the Mosaic complexity ceiling
    # does NOT trip at 2× body), but halving the accumulator RMW (~1 of
    # the ~6 (A, NL) passes) buys less than the doubled-body costs: fewer
    # and fatter pipeline stages with doubled per-t DMA blocks and 2×
    # sub-step live ranges. Default OFF; T2T_BWD_STEPS=2 opts in (even T,
    # default time path only) as the documented experiment (PERF.md).
    steps = 2 if (
        T % 2 == 0 and not use_flip
        and os.environ.get("T2T_BWD_STEPS", "1") == "2"
    ) else 1

    kernel = functools.partial(
        _teacher_bwd_kernel, T=T, H=H, D=D, P=P, M=M, L=L, E=E, R1=R1,
        LB=LB, BA=min(B, B8), steps=steps,
        # debug-only bisection knob for Mosaic compile triage; 99 = full body
        level=int(os.environ.get("T2T_BWD_LEVEL", "99")),
    )

    def resident(*shape):
        return pl.BlockSpec(shape, lambda t: (0,) * len(shape), memory_space=pltpu.VMEM)

    Tg = T // steps
    if use_flip:
        def rev_t(*shape):
            return pl.BlockSpec(
                (steps,) + shape, lambda t: (t,) + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        flip = lambda x: jnp.flip(x, axis=0)
    else:
        def rev_t(*shape):
            return pl.BlockSpec(
                (steps,) + shape, lambda t: (Tg - 1 - t,) + (0,) * len(shape),
                memory_space=pltpu.VMEM,
            )

        flip = lambda x: x

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Tg,),
        scratch_shapes=[
            pltpu.VMEM((B8, R2k), f32),  # xh
            pltpu.VMEM((B8, LB), f32), pltpu.VMEM((B8, LB), f32),  # wpadP/C
            pltpu.VMEM((B8, L), f32),  # dwctx
            pltpu.VMEM((A, B8 * LB), f32),  # acc_attenc (see kernel note)
        ],
        in_specs=[
            rev_t(B8, R1), rev_t(B8, R2k),
            rev_t(B8, H), rev_t(B8, H),
            rev_t(B8, L), rev_t(B8, L),
            rev_t(B8, H), rev_t(B8, H),
            rev_t(B8, 128), rev_t(B8, L),
            resident(R2k, 8 * H), resident(1, 8 * H),
            resident(H, A), resident(A, H), resident(64, A), resident(A, 1),
            resident(1, A),
            resident(R3, 128),
            resident(B8, D, L), resident(A, B8 * LB), resident(B8, LB),
            resident(B8, B8 * LB),
        ],
        out_specs=[
            rev_t(B8, 4 * H), rev_t(B8, 4 * H),
            rev_t(B8, P), rev_t(B8, D),
            resident(B8, H), resident(B8, H), resident(B8, D),
            resident(B8, L), resident(B8, L), resident(B8, H), resident(B8, H),
            resident(A, B8 * LB), resident(B8, E),
            resident(A, H), resident(A, B8), resident(64, A),
            resident(R3, 128),
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((T, B8, 4 * H), dt),
        jax.ShapeDtypeStruct((T, B8, 4 * H), dt),
        jax.ShapeDtypeStruct((T, B8, P), f32),
        jax.ShapeDtypeStruct((T, B8, D), f32),
        jax.ShapeDtypeStruct((B8, H), f32), jax.ShapeDtypeStruct((B8, H), f32),
        jax.ShapeDtypeStruct((B8, D), f32),
        jax.ShapeDtypeStruct((B8, L), f32), jax.ShapeDtypeStruct((B8, L), f32),
        jax.ShapeDtypeStruct((B8, H), f32), jax.ShapeDtypeStruct((B8, H), f32),
        jax.ShapeDtypeStruct((A, B8 * LB), f32),
        jax.ShapeDtypeStruct((B8, E), f32),
        jax.ShapeDtypeStruct((A, H), f32), jax.ShapeDtypeStruct((A, B8), f32),
        jax.ShapeDtypeStruct((64, A), f32),
        jax.ShapeDtypeStruct((R3, 128), f32),
    ]

    # precision pinned DEFAULT for the same reason as the forward call
    # (Mosaic rejects "high"-precision dots; no-op for bf16 operands)
    with jax.default_matmul_precision("default"):
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(100 * 1024 * 1024),
            ),
        )(
            flip(stash["xh1"]), flip(stash["xh2"]),
            flip(stash["c_att_prev"]), flip(stash["c_rnn_prev"]),
            flip(stash["w_prev"]), flip(stash["cum_prev"]),
            flip(dm1), flip(dm2), flip(d_mel_gate), flip(d_align),
            packed["w_res"], packed["b_stream"], packed["wq"],
            jnp.swapaxes(packed["wq"], 0, 1), packed["w_loc_win"],
            packed["wv"], jnp.swapaxes(packed["wv"], 0, 1), packed["w_out"],
            jnp.swapaxes(enc, 1, 2), att_cat, valid, block_expand,
        )
    outs = [flip(o) for o in outs[:4]] + list(outs[4:])
    (dg1_s, dg2_s, dprenet_s, dctx_s,
     o_d_att_h, o_d_att_c, o_d_ctx, o_d_w, o_d_cum, o_d_rnn_h, o_d_rnn_c,
     o_d_attenc, o_d_ctrl, o_d_wq, o_d_wv, o_d_wlw, o_d_wout) = outs

    # ---- dW: two post-scan MXU einsums with f32 accumulation (padded
    # batch rows / char lanes contribute exact zeros — see kernel doc) ----
    dw1 = jnp.einsum(
        "tbr,tbh->rh", stash["xh1"], dg1_s, preferred_element_type=f32
    ).astype(w1.dtype)
    dw2_pad = jnp.einsum(
        "tbr,tbh->rh", stash["xh2"], dg2_s, preferred_element_type=f32
    )
    dw2 = jnp.concatenate(
        [dw2_pad[: H + D], dw2_pad[H + D : H + D + C], dw2_pad[H + D + E :]],
        axis=0,
    ).astype(w2.dtype)

    db1 = jnp.sum(dg1_s, axis=(0, 1), dtype=f32)
    db2 = jnp.sum(dg2_s, axis=(0, 1), dtype=f32)

    # d_encoded from the stacked (weights, d_ctx) factors — one einsum,
    # identical to the XLA hoisted path
    d_enc = jnp.einsum(
        "tbl,tbd->bld", policy.cast(stash["align"]), dctx_s,
        preferred_element_type=f32,
    ).astype(f32)[:B, :Lc]

    # unfold the folded location window gradient back to conv + dense
    conv_w = small["attention"]["location_conv"]["w"]  # (31, 2, 32)
    dense_w = small["attention"]["location_dense"]["w"]  # (32, A)
    dP, dC_ = o_d_wlw[0:31], o_d_wlw[32:63]
    d_conv = jnp.stack(
        [dP @ dense_w.T, dC_ @ dense_w.T], axis=1
    )  # (31, 2, 32)
    d_dense = conv_w[:, 0, :].T @ dP + conv_w[:, 1, :].T @ dC_

    d_mel_w = jnp.concatenate(
        [o_d_wout[: H + D, :M], o_d_wout[H + D : H + D + C, :M]], axis=0
    )
    d_small = {
        "b1": db1,
        "b2": db2,
        "attention": {
            "query": {"w": o_d_wq.T},
            "v": {"w": jnp.sum(o_d_wv, axis=1, keepdims=True)},
            "location_conv": {"w": d_conv},
            "location_dense": {"w": d_dense},
        },
        "mel_out": {
            "w": d_mel_w,
            "b": jnp.sum(d_mels, axis=(0, 1), dtype=f32),
        },
        "gate": {
            "w": o_d_wout[: H + D, M : M + 1],
            "b": jnp.sum(d_gates_out, dtype=f32)[None],
        },
    }

    d_attenc = jnp.transpose(
        o_d_attenc.reshape(A, B8, LB), (1, 2, 0)
    )[:B, :Lc, :]
    d_ctrl = None if controls is None else o_d_ctrl[:B, :C]

    d_init_state = DecoderState(
        att_h=o_d_att_h[:B], att_c=o_d_att_c[:B], att_context=o_d_ctx[:B],
        att_weights=o_d_w[:B, :Lc], att_weights_cum=o_d_cum[:B, :Lc],
        rnn_h=o_d_rnn_h[:B], rnn_c=o_d_rnn_c[:B],
    )
    d_keys = np.zeros(step_keys.shape, jax.dtypes.float0)
    d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    return (
        dw1, dw2, d_small, dprenet_s[:, :B],
        d_keys, d_enc, d_attenc, d_mask, d_ctrl, d_init_state,
    )


def pallas_train_supported(cfg, policy: Policy, batch: int,
                           max_chars: int = 256) -> bool:
    """Dispatch guard for the fused training scan: bf16-mixed policy only
    (under "32-true" the XLA path keeps the torch-parity HIGH-precision f32
    matmuls, which Mosaic cannot express — the kernel pins DEFAULT), the
    kernel assumes att_rnn_dim == rnn_hidden_dim (true for every shipped
    config), batch <= 128 (the DIRECT flat window build compiles the
    forward to B8=128; flagship B=128 measured 191 ms vs 194 XLA), and the
    resident VMEM estimate (weights + encoded + attention memory + block
    mask + f32 scratch) must fit under the 100 MB limit with margin."""
    if cfg.att_rnn_dim != cfg.rnn_hidden_dim:
        return False
    if batch > 128:
        return False
    if policy.compute_dtype != jnp.bfloat16:
        return False
    H = cfg.att_rnn_dim
    A = cfg.att_dim
    D = cfg.encoded_full_dim
    E = _round_up(max(cfg.controls_dim, 1), 16)
    R2k = 2 * H + D + E
    B8 = _round_up(batch, 8)
    L = _round_up(max(max_chars, 1), 128)
    LB = _round_up(L + 47, 128)
    resident = 2 * (R2k * 8 * H + B8 * L * D + A * B8 * LB + B8 * B8 * LB)
    # f32 scratch: 4 LSTM state buffers (att_h/c, rnn_h/c), context, gates,
    # xh, two att-weight rows, two padded-weight rows, valid mask. The
    # (64, B8*LB) window-build intermediates are per-grid-step transients
    # inside the 100-88 MB margin (B=128 flagship measured working).
    scratch = 4 * B8 * (4 * H + R2k + 3 * LB + 4 * H + D + 2 * L)
    return resident + scratch <= 88 * 1024 * 1024


def pallas_bwd_supported(cfg, policy: Policy, batch: int,
                         max_chars: int = 256) -> bool:
    """VMEM estimate for the BACKWARD kernel's resident set, which is
    larger than the forward's: three f32 (A, B8*LB) attention planes
    (att_enc_cat input, acc_attenc scratch, o_d_attenc output), the f32
    block_expand, the transposed encoded, and the launch-resident weight
    block — a long-char B<=32 batch can pass the forward guard yet blow
    the 100 MB limit here (loud compile failure). Callers fall back to
    bwd="xla" (the verified hoisted reverse scan) when this returns False.
    The Mosaic compile-complexity ceiling (B8 > 32 crashes the compile
    helper — CLAUDE.md) is enforced by the caller's B <= 32 gate, not
    here; interpret mode (CPU) has no VMEM constraint and skips this
    guard entirely. Pure geometry — does NOT re-check policy/batch
    dispatch rules (callers may force pallas_train explicitly)."""
    H = cfg.att_rnn_dim
    A = cfg.att_dim
    D = cfg.encoded_full_dim
    E = _round_up(max(cfg.controls_dim, 1), 16)
    R2k = 2 * H + D + E
    R3 = H + D + E
    B8 = _round_up(batch, 8)
    L = _round_up(max(max_chars, 1), 128)
    LB = _round_up(L + 47, 128)
    # compute-dtype residents: weight block + transposed encoded (B8, D, L)
    dsize = 2 if policy.compute_dtype == jnp.bfloat16 else 4
    resident_bf16 = dsize * (R2k * 8 * H + 3 * A * H + 64 * A + R3 * 128 + B8 * D * L)
    # f32 residents: the (A, B8*LB) att_enc_cat input + o_d_attenc output
    # planes (the acc_attenc scratch plane is counted below) + block_expand
    # + valid + the resident d_state/d_weight outputs
    resident_f32 = 4 * (
        2 * A * B8 * LB
        + B8 * B8 * LB
        + B8 * LB
        + B8 * (6 * H + D + 2 * L + E)
        + A * (H + B8)
        + 64 * A
        + R3 * 128
    )
    # f32 scratch + the acc_attenc accumulator
    scratch = 4 * (B8 * (R2k + 2 * LB + L) + A * B8 * LB)
    # double-buffered per-t blocks, budgeted at the default 2-steps-per-
    # grid-step (each block holds `steps` time rows): xh1/xh2/dg1/dg2 in
    # compute dtype, the rest f32
    P = cfg.prenet_dim
    R1 = P + D + H
    per_row = dsize * B8 * (R1 + R2k + 8 * H) + 4 * B8 * (
        6 * H + 2 * L + 128 + L + P + D
    )
    per_t = 2 * 2 * per_row
    return resident_bf16 + resident_f32 + scratch + per_t <= 88 * 1024 * 1024
