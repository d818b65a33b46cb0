"""Teacher-forced decode scan with HOISTED weight gradients (custom VJP).

The training bottleneck after r2's weight pre-cast is the scan-transpose's
per-step dW accumulator read-modify-write: XLA carries a full (R, 4H)
gradient accumulator for each LSTM matrix through the backward loop
(~73 MB/step of HBM traffic at flagship dims — PERF.md "where the
remaining time goes"). This module removes it:

- FORWARD: one lax.scan that, besides the decoder outputs, stacks SMALL
  per-step residuals: the compute-dtype LSTM inputs xh1 (B, R1), the cell
  states, the previous attention weights, and the dropout keys' masks'
  seeds (~0.6 MB/step at B=32 vs the 73 MB/step RMW it replaces).
- BACKWARD: one REVERSE lax.scan that recomputes each step from the
  residuals (gate preactivations are recomputed from xh @ W — W is already
  being read for the dx product, so this costs MACs, not bytes), pulls
  cotangents through the two seamed step phases with jax.vjp, and stacks
  dgates1/dgates2 instead of accumulating dW.
- EPILOGUE: dW1 = einsum(xh1_stack, dgates1_stack), dW2 likewise — two
  big MXU matmuls with f32 accumulation (BETTER numerics than the scan
  transpose's bf16 accumulator under the pre-cast policy).

Semantics match tacotron2.forward_teacher's scan over decoder.step
bit-for-bit in the forward (same ops, same PRNG derivation); gradients are
verified against jax.grad of the standard path in
tests/test_train_scan.py.

Reference behavior being trained: model/tacotron2.py:276-317 (the
teacher-forced Python loop) — this is purely an optimization of HOW the
same math differentiates.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models import attention, layers
from tacotron2_tpu.models.decoder import DecoderState
from tacotron2_tpu.models.layers import F32, Policy


def _split_big_small(dec_params):
    """The two fat LSTM matrices get hoisted-dW treatment; everything else
    (attention conv/dense/query/v, heads, biases) differentiates normally
    (their accumulators are tiny)."""
    w1 = jnp.concatenate([dec_params["att_rnn"]["w_ih"], dec_params["att_rnn"]["w_hh"]], axis=0)
    w2 = jnp.concatenate([dec_params["lstm"]["w_ih"], dec_params["lstm"]["w_hh"]], axis=0)
    small = {
        "b1": dec_params["att_rnn"]["b_ih"] + dec_params["att_rnn"]["b_hh"],
        "b2": dec_params["lstm"]["b_ih"] + dec_params["lstm"]["b_hh"],
        "attention": dec_params["attention"],
        "mel_out": dec_params["mel_out"],
        "gate": dec_params["gate"],
    }
    return w1, w2, small


def _merge_dw(dec_params, dw1, dw2, dsmall):
    """Route (dw1, dw2, dsmall) back into the decoder param-tree structure.
    The combined bias b = b_ih + b_hh means db_ih = db_hh = db."""
    in1 = dec_params["att_rnn"]["w_ih"].shape[0]
    in2 = dec_params["lstm"]["w_ih"].shape[0]
    return {
        "att_rnn": {
            "w_ih": dw1[:in1], "w_hh": dw1[in1:],
            "b_ih": dsmall["b1"], "b_hh": dsmall["b1"],
        },
        "lstm": {
            "w_ih": dw2[:in2], "w_hh": dw2[in2:],
            "b_ih": dsmall["b2"], "b_hh": dsmall["b2"],
        },
        "attention": dsmall["attention"],
        "mel_out": dsmall["mel_out"],
        "gate": dsmall["gate"],
    }


def _lstm_epilogue(g, c_prev):
    i, f, gg, o = jnp.split(g, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(gg)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _dropout_masks(key, shape_h, train):
    """The exact PRNG derivation of decoder.step (split; dropout 0.1; split;
    dropout 0.1) as multiplicative masks."""
    if not train:
        ones = jnp.ones(shape_h, jnp.float32)
        return ones, ones
    key, sub1 = jax.random.split(key)
    key, sub2 = jax.random.split(key)
    m1 = jnp.where(jax.random.bernoulli(sub1, 0.9, shape_h), 1.0 / 0.9, 0.0)
    m2 = jnp.where(jax.random.bernoulli(sub2, 0.9, shape_h), 1.0 / 0.9, 0.0)
    return m1, m2


def _phase_a(small, g1, c_att_prev, w_prev, cum_prev, dm1, encoded, att_encoded, mask, policy):
    """Attention-LSTM epilogue + location attention (given gate preacts)."""
    h_att, c_att = _lstm_epilogue(g1, c_att_prev)
    h_att_d = h_att * dm1
    context, weights = attention.apply(
        small["attention"], h_att_d, encoded, att_encoded, w_prev, cum_prev, mask, policy
    )
    cum = cum_prev + weights
    return h_att_d, c_att, context, weights, cum


def _phase_b(small, g2, c_rnn_prev, context, dm2, controls, policy):
    """Decoder-LSTM epilogue + heads (given gate preacts)."""
    rnn_h, c_rnn = _lstm_epilogue(g2, c_rnn_prev)
    rnn_h_d = rnn_h * dm2
    gate_in = jnp.concatenate([rnn_h_d, context], axis=-1)
    gate_out = layers.linear_apply(small["gate"], gate_in, policy)
    mel_in = gate_in if controls is None else jnp.concatenate(
        [rnn_h_d, context, controls], axis=-1
    )
    mel_out = layers.linear_apply(small["mel_out"], mel_in, policy)
    return mel_out, gate_out, rnn_h_d, c_rnn


def _gates(xh_c, w_c, b):
    """w_c: PRE-CAST weights — the cast must live outside the scans or XLA
    streams f32 (the r2 precast lesson, PERF.md)."""
    return jnp.dot(xh_c, w_c, preferred_element_type=jnp.float32) + b


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def decode_scan_hoisted_dw(
    policy: Policy,
    train: bool,
    w1, w2, small,
    decoder_in,  # (T, B, P) prenet outputs
    step_keys,  # (T, 2) uint32
    encoded, att_encoded, mask, controls,
    init_state: DecoderState,
):
    outs, _ = _fwd_impl(
        policy, train, w1, w2, small, decoder_in, step_keys,
        encoded, att_encoded, mask, controls, init_state,
    )
    return outs


def _fwd_impl(policy, train, w1, w2, small, decoder_in, step_keys,
              encoded, att_encoded, mask, controls, init_state):
    w1_c = policy.cast(w1)
    w2_c = policy.cast(w2)

    def fstep(state, x):
        prenet_t, key_t = x
        dm1, dm2 = _dropout_masks(key_t, state.att_h.shape, train)
        xh1_c = policy.cast(
            jnp.concatenate([prenet_t, state.att_context, state.att_h], axis=-1)
        )
        g1 = _gates(xh1_c, w1_c, small["b1"])
        h_att_d, c_att, context, weights, cum = _phase_a(
            small, g1, state.att_c, state.att_weights, state.att_weights_cum,
            dm1, encoded, att_encoded, mask, policy,
        )
        parts = [h_att_d, context]
        if controls is not None:
            parts.append(controls)
        xh2_c = policy.cast(jnp.concatenate(parts + [state.rnn_h], axis=-1))
        g2 = _gates(xh2_c, w2_c, small["b2"])
        mel, gate, rnn_h_d, c_rnn = _phase_b(
            small, g2, state.rnn_c, context, dm2, controls, policy
        )
        new_state = DecoderState(
            att_h=h_att_d, att_c=c_att, att_context=context,
            att_weights=weights, att_weights_cum=cum,
            rnn_h=rnn_h_d, rnn_c=c_rnn,
        )
        res_t = (xh1_c, xh2_c, state.att_c, state.rnn_c,
                 state.att_weights, state.att_weights_cum, state.rnn_h, key_t)
        return new_state, ((mel, gate[:, 0], weights), res_t)

    final_state, (outs, res) = jax.lax.scan(fstep, init_state, (decoder_in, step_keys))
    return outs, res


def _vjp_fwd(policy, train, w1, w2, small, decoder_in, step_keys,
             encoded, att_encoded, mask, controls, init_state):
    outs, res = _fwd_impl(
        policy, train, w1, w2, small, decoder_in, step_keys,
        encoded, att_encoded, mask, controls, init_state,
    )
    saved = (res, w1, w2, small, encoded, att_encoded, mask, controls)
    return outs, saved


def _vjp_bwd(policy, train, saved, cots):
    res, w1, w2, small, encoded, att_encoded, mask, controls = saved
    d_mels, d_gates_out, d_aligns = cots
    (xh1_s, xh2_s, c_att_prev_s, c_rnn_prev_s, w_prev_s, cum_prev_s,
     rnn_h_prev_s, keys_s) = res

    B = xh1_s.shape[1]
    H = c_att_prev_s.shape[-1]
    f32 = jnp.float32
    zero_small = jax.tree.map(jnp.zeros_like, small)
    zero_att_enc = jnp.zeros_like(att_encoded, f32)
    zero_ctrl = None if controls is None else jnp.zeros_like(controls, f32)

    w1_c = policy.cast(w1)
    w2_c = policy.cast(w2)

    def bstep(carry, x):
        (d_att_h, d_att_c, d_ctx, d_w, d_cum, d_rnn_h, d_rnn_c,
         d_small_acc, d_attenc_acc, d_ctrl_acc) = carry
        # COUPLING NOTE: rnn_h_prev is unpacked for layout parity but never
        # read below (the xh2 stack already carries it). The Pallas forward
        # (ops/train_decode_pallas.py:_fwd_impl) relies on this and passes
        # ZEROS in its place — if a future edit starts consuming rnn_h_prev
        # here, the Pallas path would silently train on zeros.
        (xh1_c, xh2_c, c_att_prev, c_rnn_prev, w_prev, cum_prev,
         rnn_h_prev, key_t, dmel_t, dgate_t, dalign_t) = x

        dm1, dm2 = _dropout_masks(key_t, (B, H), train)

        # recompute phase A (bytes-free: W is read for the dx product anyway).
        # encoded is stop_gradient'd: its cotangent d_enc[b,l,:] =
        # w_t[b,l] * d_ctx_t[b,:] factors — we STACK (weights_t, d_ctx_t)
        # and form d_encoded with ONE post-scan einsum instead of carrying
        # a (B, L, D) accumulator through the reverse scan (that RMW undid
        # the hoisting win at large batch)
        g1 = _gates(xh1_c, w1_c, small["b1"])
        fA_full = lambda sm, g, ca, wp, cp, aenc: _phase_a(
            sm, g, ca, wp, cp, dm1, jax.lax.stop_gradient(encoded), aenc,
            mask, policy,
        )
        (h_att_d, c_att, context, weights, cum), pullA = jax.vjp(
            fA_full, small, g1, c_att_prev, w_prev, cum_prev, att_encoded
        )

        g2 = _gates(xh2_c, w2_c, small["b2"])
        # controls must be a DIFFERENTIATED vjp arg (not a closure): the
        # mel head consumes it directly, and closing over it silently
        # dropped that term from d_controls (latent — controls is a batch
        # input today — but wrong; caught by the Pallas-bwd cross-check,
        # tests/test_train_pallas.py::test_pallas_bwd_modes_agree)
        if controls is None:
            fB = lambda sm, g, cr, ctx: _phase_b(sm, g, cr, ctx, dm2, None, policy)
            (mel, gate, rnn_h_d, c_rnn), pullB = jax.vjp(
                fB, small, g2, c_rnn_prev, context
            )
        else:
            fB = lambda sm, g, cr, ctx, ctl: _phase_b(sm, g, cr, ctx, dm2, ctl, policy)
            (mel, gate, rnn_h_d, c_rnn), pullB = jax.vjp(
                fB, small, g2, c_rnn_prev, context, controls
            )

        # ---- pull through phase B ------------------------------------
        pulled_B = pullB((dmel_t, dgate_t[:, None], d_rnn_h, d_rnn_c))
        if controls is None:
            dsmB, dg2, dc_rnn_prev, d_ctx_B = pulled_B
            d_ctrl_head = None
        else:
            dsmB, dg2, dc_rnn_prev, d_ctx_B, d_ctrl_head = pulled_B
        # dg2 also carries the bias cotangent; xh2 cotangent via W2.
        # dot_general contracting W's dim 1 directly — an explicit .T would
        # materialize a second (transposed) weight copy and double the
        # backward's weight stream
        dxh2 = jax.lax.dot_general(
            dg2.astype(w2_c.dtype), w2_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        d_h_att_from2 = dxh2[:, :H]
        D = context.shape[-1]
        d_ctx_from2 = dxh2[:, H : H + D]
        off = H + D
        if controls is not None:
            C = controls.shape[-1]
            d_ctrl_t = dxh2[:, off : off + C]
            off += C
        d_rnn_h_prev = dxh2[:, off:]

        # ---- pull through phase A ------------------------------------
        d_ctx_total = d_ctx + d_ctx_B + d_ctx_from2
        dsmA, dg1, dc_att_prev, dw_prev, dcum_prev, d_attenc_t = pullA(
            (
                d_att_h + d_h_att_from2,
                d_att_c,
                d_ctx_total,
                d_w + dalign_t,
                d_cum,
            )
        )
        dxh1 = jax.lax.dot_general(
            dg1.astype(w1_c.dtype), w1_c,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        Pn = xh1_c.shape[-1] - D - H
        d_prenet_t = dxh1[:, :Pn]
        d_ctx_prev = dxh1[:, Pn : Pn + D]
        d_att_h_prev = dxh1[:, Pn + D :]

        d_small_acc = jax.tree.map(
            lambda a, x1, x2: a + x1 + x2, d_small_acc, dsmA, dsmB
        )
        # fold the combined-bias cotangents in via the dgates sums
        d_small_acc = dict(d_small_acc)
        d_small_acc["b1"] = d_small_acc["b1"] + jnp.sum(dg1, axis=0)
        d_small_acc["b2"] = d_small_acc["b2"] + jnp.sum(dg2, axis=0)
        d_attenc_acc = d_attenc_acc + d_attenc_t
        if controls is not None:
            d_ctrl_acc = d_ctrl_acc + d_ctrl_t + d_ctrl_head

        new_carry = (
            d_att_h_prev, dc_att_prev, d_ctx_prev, dw_prev, dcum_prev,
            d_rnn_h_prev, dc_rnn_prev,
            d_small_acc, d_attenc_acc, d_ctrl_acc,
        )
        # stack the gate cotangents in the compute dtype: the dW einsum
        # accumulates in f32 — strictly better numerics than the scan
        # transpose's compute-dtype accumulator
        return new_carry, (dg1.astype(policy.compute_dtype),
                           dg2.astype(policy.compute_dtype), d_prenet_t,
                           weights, d_ctx_total)

    T = xh1_s.shape[0]
    D_full = encoded.shape[-1]
    L = w_prev_s.shape[-1]
    init_carry = (
        jnp.zeros((B, H), f32), jnp.zeros((B, H), f32),
        jnp.zeros((B, D_full), f32), jnp.zeros((B, L), f32),
        jnp.zeros((B, L), f32), jnp.zeros((B, H), f32), jnp.zeros((B, H), f32),
        zero_small, zero_att_enc, zero_ctrl,
    )
    xs = (xh1_s, xh2_s, c_att_prev_s, c_rnn_prev_s, w_prev_s, cum_prev_s,
          rnn_h_prev_s, keys_s, d_mels, d_gates_out, d_aligns)
    carry, (dg1_s, dg2_s, d_prenet_s, w_s_stack, dctx_s) = jax.lax.scan(
        bstep, init_carry, xs, reverse=True
    )
    (d_att_h0, d_att_c0, d_ctx0, d_w0, d_cum0, d_rnn_h0, d_rnn_c0,
     d_small, d_attenc, d_ctrl) = carry

    # d_encoded assembled post-scan from the stacked per-step factors
    # (context = einsum(cast(w), cast(enc)) — mirror the casts)
    d_enc = jnp.einsum(
        "tbl,tbd->bld", policy.cast(w_s_stack), dctx_s,
        preferred_element_type=f32,
    ).astype(f32)

    # ---- the hoisted dW: two big MXU matmuls, f32 accumulation --------
    dw1 = jnp.einsum(
        "tbr,tbh->rh", xh1_s, dg1_s, preferred_element_type=f32
    ).astype(w1.dtype)
    dw2 = jnp.einsum(
        "tbr,tbh->rh", xh2_s, dg2_s, preferred_element_type=f32
    ).astype(w2.dtype)

    d_init_state = DecoderState(
        att_h=d_att_h0, att_c=d_att_c0, att_context=d_ctx0,
        att_weights=d_w0, att_weights_cum=d_cum0,
        rnn_h=d_rnn_h0, rnn_c=d_rnn_c0,
    )
    d_keys = np.zeros(keys_s.shape, jax.dtypes.float0)
    d_mask = np.zeros(mask.shape, jax.dtypes.float0)
    return (
        dw1, dw2, d_small, d_prenet_s,
        d_keys, d_enc, d_attenc, d_mask, d_ctrl, d_init_state,
    )


decode_scan_hoisted_dw.defvjp(_vjp_fwd, _vjp_bwd)


def run_decode_scan(
    dec_params, init_state, decoder_in, step_keys, encoded, att_encoded,
    mask, controls, train: bool, policy: Policy = F32,
):
    """Entry point used by tacotron2.forward_teacher(dw_hoist=True):
    -> (mels (T,B,M), gates (T,B), aligns (T,B,L))."""
    w1, w2, small = _split_big_small(dec_params)
    return decode_scan_hoisted_dw(
        policy, train, w1, w2, small, decoder_in, step_keys,
        encoded, att_encoded, mask, controls, init_state,
    )
