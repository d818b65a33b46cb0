"""Functional NN primitives (pytree params, pure apply functions).

TPU-first building blocks with PyTorch-compatible *math* so converted
reference checkpoints produce identical outputs (SURVEY §7 parity gate):

- weights are stored MXU-friendly: Linear (in, out), Conv1d (W, I, O) —
  the checkpoint converter transposes from torch's (out, in) / (O, I, W)
- LSTM cells use torch's i,f,g,o gate packing so converted weights drop in
- BatchNorm reproduces torch semantics exactly (eps 1e-5, momentum 0.1,
  biased variance for normalization, unbiased for the running update)
- initializers reproduce torch defaults (kaiming-uniform fan-in bounds) so
  from-scratch training matches the reference's initial loss statistics

A ``Policy`` threads the precision story: params live in f32, matmuls can
run in bf16 on the MXU with f32 accumulation — the TPU analog of the
reference's AMP "16-mixed" (run/train.py:239).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy: torch AMP "16-mixed" -> TPU bf16."""

    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_string(precision: str) -> "Policy":
        if precision in ("bf16-mixed", "16-mixed", "bf16"):
            return Policy(compute_dtype=jnp.bfloat16)
        if precision in ("32", "32-true", "float32", "fp32"):
            return Policy(compute_dtype=jnp.float32)
        raise ValueError(f"unknown precision {precision!r}")

    def cast(self, x):
        return x.astype(self.compute_dtype)


F32 = Policy()


def dot(x, w, policy: Policy = F32):
    """Matmul with policy-controlled input dtype, f32 accumulation (MXU)."""
    return jnp.dot(policy.cast(x), policy.cast(w), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Initializers (torch defaults)
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    params = {"w": _uniform(kw, (in_dim, out_dim), bound, dtype)}
    if bias:
        params["b"] = _uniform(kb, (out_dim,), bound, dtype)
    return params


def linear_apply(params, x, policy: Policy = F32):
    y = dot(x, params["w"], policy)
    if "b" in params:
        y = y + params["b"]
    return y


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True, dtype=jnp.float32):
    """torch nn.Conv1d default init; weight stored (W, I, O) for NWC convs."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_ch * kernel)
    params = {"w": _uniform(kw, (kernel, in_ch, out_ch), bound, dtype)}
    if bias:
        params["b"] = _uniform(kb, (out_ch,), bound, dtype)
    return params


def conv1d_apply(params, x, policy: Policy = F32, padding: str | int = "SAME", dilation: int = 1):
    """1-D convolution over (B, T, C) — channels-last NWC for TPU layout."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    elif padding == "SAME":
        k = params["w"].shape[0]
        eff = (k - 1) * dilation + 1
        pad = [((eff - 1) // 2, eff - 1 - (eff - 1) // 2)]
    else:
        pad = padding
    # NOTE: no preferred_element_type here — conv_general_dilated's
    # transpose (backward) rule requires uniform dtypes, so under a bf16
    # policy the conv emits bf16 (f32 MXU accumulation internally) and we
    # promote right after
    y = jax.lax.conv_general_dilated(
        policy.cast(x),
        policy.cast(params["w"]),
        window_strides=(1,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).astype(jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y


def conv1d_apply_taps(params, x, policy: Policy = F32, padding: str | int = "SAME",
                      dilation: int = 1):
    """Tap-sum rewrite of :func:`conv1d_apply` (same math, stride-1 only):
    ``y[t] = Σ_k x[t + k·d − pad] @ W[k]`` as K static slices of the
    zero-padded input, each contracted on the MXU with f32 accumulation.

    Why it exists (VERDICT r4 #7, postnet backward): differentiating THIS
    form gives K clean matmuls per layer — ``dW[k] = x_k^T @ dy`` and
    ``dx = Σ_k shift_k(dy) @ W[k]^T`` — instead of XLA's
    conv_general_dilated transpose rule; measured A/B of the full train
    step decides whether the postnet uses it (PERF.md "Postnet backward").
    Numerics: each tap accumulates f32 and the K partials sum in f32 (the
    conv path casts the finished conv to bf16 once) — same bf16 matmul
    class, not bit-equal under a bf16 policy."""
    w = params["w"]  # (K, Cin, Cout)
    K = w.shape[0]
    eff = (K - 1) * dilation + 1
    if padding == "SAME":
        lo = (eff - 1) // 2
    elif isinstance(padding, int):
        lo = padding
    else:
        raise ValueError(f"taps path supports SAME/int padding, got {padding}")
    hi = eff - 1 - lo if padding == "SAME" else lo
    T = x.shape[1]
    T_out = T + lo + hi - eff + 1
    xp = jnp.pad(policy.cast(x), ((0, 0), (lo, hi), (0, 0)))
    wc = policy.cast(w)
    y = None
    for k in range(K):
        xk = jax.lax.slice_in_dim(xp, k * dilation, k * dilation + T_out, axis=1)
        yk = jax.lax.dot_general(
            xk, wc[k], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = yk if y is None else y + yk
    if "b" in params:
        y = y + params["b"]
    return y


def conv_transpose1d_init(key, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32):
    """torch nn.ConvTranspose1d default init — torch computes fan_in from
    weight dim 1, i.e. out_ch * kernel for transposed convs. Weight stored
    (W, I, O), converted from torch's (I, O, W); ``apply`` flips W."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(out_ch * kernel)
    return {
        "w": _uniform(kw, (kernel, in_ch, out_ch), bound, dtype),
        "b": _uniform(kb, (out_ch,), bound, dtype),
    }


def conv_transpose1d_apply(params, x, stride: int, padding: int, policy: Policy = F32):
    """torch-equivalent ConvTranspose1d over (B, T, C).

    Lowered as lhs-dilated convolution: insert (stride-1) zeros between
    inputs, then correlate with the flipped kernel — exactly torch's
    transposed-conv semantics, and XLA maps it onto the MXU.
    out_len = (T-1)*stride - 2*padding + kernel.
    """
    k = params["w"].shape[0]
    # conv_general_dilated with lhs_dilation implements fractional stride;
    # torch's ConvTranspose correlates with the *flipped* kernel.
    w = jnp.flip(params["w"], axis=0)
    y = jax.lax.conv_general_dilated(
        policy.cast(x),
        policy.cast(w),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ).astype(jnp.float32)
    return y + params["b"]


def embedding_init(key, num_embeddings: int, dim: int, std: float = 0.5, padding_idx: Optional[int] = None, dtype=jnp.float32):
    """Reference inits embeddings N(0, 0.5) (model/encoder.py:26,
    model/tacotron2.py:65); torch zeroes the padding row."""
    table = jax.random.normal(key, (num_embeddings, dim), dtype) * std
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return {"table": table}


def embedding_apply(params, idx):
    return jnp.take(params["table"], idx, axis=0)


# ---------------------------------------------------------------------------
# BatchNorm1d (torch semantics)
# ---------------------------------------------------------------------------


def batchnorm_init(num_features: int, dtype=jnp.float32):
    params = {"scale": jnp.ones((num_features,), dtype), "bias": jnp.zeros((num_features,), dtype)}
    state = {
        "mean": jnp.zeros((num_features,), dtype),
        "var": jnp.ones((num_features,), dtype),
    }
    return params, state


def batchnorm_apply(
    params,
    state,
    x,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, dict]:
    """BatchNorm over the channel (last) axis of (B, T, C).

    torch BatchNorm1d treats (B, C, T) stats over (B, T) — same reduction.
    NOTE: like the reference, padded timesteps are *included* in batch stats
    (model/encoder.py:30-46 applies BN to padded activations).
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)  # biased, used for normalization
        n = np.prod([x.shape[a] for a in axes])
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


# ---------------------------------------------------------------------------
# LSTM cell (torch packing: gates ordered i, f, g, o)
# ---------------------------------------------------------------------------


def lstm_cell_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    """torch nn.LSTMCell/nn.LSTM init: all params U(±1/sqrt(hidden))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden)
    return {
        "w_ih": _uniform(k1, (in_dim, 4 * hidden), bound, dtype),
        "w_hh": _uniform(k2, (hidden, 4 * hidden), bound, dtype),
        "b_ih": _uniform(k3, (4 * hidden,), bound, dtype),
        "b_hh": _uniform(k4, (4 * hidden,), bound, dtype),
    }


def lstm_cell_apply(params, x, hc, policy: Policy = F32, x_proj=None):
    """One LSTM step. ``x_proj``: optionally precomputed x @ w_ih (+b) —
    the sequence LSTM hoists that matmul out of the scan for MXU efficiency."""
    h, c = hc
    hidden = h.shape[-1]
    if x_proj is None:
        x_proj = dot(x, params["w_ih"], policy) + params["b_ih"]
    gates = x_proj + dot(h, params["w_hh"], policy) + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_sequence(params, xs, lengths, reverse: bool = False, policy: Policy = F32):
    """Run an LSTM over (B, T, C) with packed-sequence parity.

    torch's pack_padded_sequence semantics (model/encoder.py:59-65):
    - forward: step t sees x[t]; outputs at t >= len are zeroed
    - reverse: processes each sequence from its OWN last valid step down to
      0 (not from the padded end) — implemented by gathering the
      per-sequence-reversed input, scanning forward, and un-reversing.

    The input projection for all timesteps is one big (B*T, C) @ (C, 4H)
    matmul (MXU-friendly); the scan carries only the h @ w_hh recurrence.
    """
    B, T, _ = xs.shape
    hidden = params["w_hh"].shape[0]

    if reverse:
        # per-sequence reversal: idx[b, t] = len[b]-1-t for t < len else t
        t_idx = jnp.arange(T)[None, :]
        rev_idx = jnp.where(t_idx < lengths[:, None], lengths[:, None] - 1 - t_idx, t_idx)
        xs = jnp.take_along_axis(xs, rev_idx[:, :, None], axis=1)

    x_proj = dot(xs.reshape(B * T, -1), params["w_ih"], policy).reshape(B, T, 4 * hidden)
    x_proj = x_proj + params["b_ih"]
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H) time-major scan

    def step(hc, xp):
        h, c = hc
        h2, c2 = lstm_cell_apply(params, None, (h, c), policy, x_proj=xp)
        return (h2, c2), h2

    init = (jnp.zeros((B, hidden), jnp.float32), jnp.zeros((B, hidden), jnp.float32))
    _, hs = jax.lax.scan(step, init, x_proj)
    hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)

    if reverse:
        hs = jnp.take_along_axis(hs, rev_idx[:, :, None], axis=1)

    # zero padded positions (pad_packed_sequence zero-fills)
    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, :, None]
    return jnp.where(mask, hs, 0.0)


# ---------------------------------------------------------------------------
# Conv2d / pooling (NHWC) — used by GST's reference encoder and the prosody
# predictor (reference: model/gst.py:22-36, model/prosodic_features/...)
# ---------------------------------------------------------------------------


def conv2d_init(key, in_ch: int, out_ch: int, kernel, bias: bool = True, dtype=jnp.float32, xavier: bool = False, gain: float = 1.0):
    kh, kw = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    k1, k2 = jax.random.split(key)
    if xavier:  # xavier_uniform with gain (prosody predictor's XavierConv2d)
        fan_in, fan_out = in_ch * kh * kw, out_ch * kh * kw
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
    else:  # torch Conv2d default
        bound = 1.0 / np.sqrt(in_ch * kh * kw)
    params = {"w": _uniform(k1, (kh, kw, in_ch, out_ch), bound, dtype)}
    if bias:
        b_bound = 1.0 / np.sqrt(in_ch * kh * kw)
        params["b"] = _uniform(k2, (out_ch,), b_bound, dtype)
    return params


def conv2d_apply(params, x, stride=(1, 1), padding=(0, 0), policy: Policy = F32):
    """2-D convolution over (B, H, W, C)."""
    ph, pw = padding
    y = jax.lax.conv_general_dilated(
        policy.cast(x),
        policy.cast(params["w"]),
        window_strides=stride,
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y


def max_pool2d(x, kernel, stride):
    """torch MaxPool2d over (B, H, W, C), floor-mode (drops remainders)."""
    kh, kw = kernel
    sh, sw = stride
    B, H, W, C = x.shape
    y = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1), "VALID"
    )
    return y


# ---------------------------------------------------------------------------
# GRU cell (torch packing: gates ordered r, z, n; b_hn stays inside the tanh)
# ---------------------------------------------------------------------------


def gru_cell_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden)
    return {
        "w_ih": _uniform(k1, (in_dim, 3 * hidden), bound, dtype),
        "w_hh": _uniform(k2, (hidden, 3 * hidden), bound, dtype),
        "b_ih": _uniform(k3, (3 * hidden,), bound, dtype),
        "b_hh": _uniform(k4, (3 * hidden,), bound, dtype),
    }


def gru_cell_apply(params, x, h, policy: Policy = F32, x_proj=None):
    """torch nn.GRU step: r = s(xr+hr), z = s(xz+hz),
    n = tanh(xn + r * (h @ Whn + bhn)), h' = (1-z)*n + z*h."""
    if x_proj is None:
        x_proj = dot(x, params["w_ih"], policy) + params["b_ih"]
    h_proj = dot(h, params["w_hh"], policy) + params["b_hh"]
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_sequence(params, xs, lengths=None, reverse: bool = False, policy: Policy = F32):
    """GRU over (B, T, C) with packed-sequence parity (like lstm_sequence).
    Returns (outputs (B, T, H), final_hidden (B, H)) where final_hidden is
    the state at each sequence's true last step."""
    B, T, _ = xs.shape
    hidden = params["w_hh"].shape[0]

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)

    if reverse:
        t_idx = jnp.arange(T)[None, :]
        rev_idx = jnp.where(t_idx < lengths[:, None], lengths[:, None] - 1 - t_idx, t_idx)
        xs = jnp.take_along_axis(xs, rev_idx[:, :, None], axis=1)

    x_proj = dot(xs.reshape(B * T, -1), params["w_ih"], policy).reshape(B, T, 3 * hidden)
    x_proj = (x_proj + params["b_ih"]).swapaxes(0, 1)  # (T, B, 3H)
    t_steps = jnp.arange(T)

    def step(carry, inp):
        h, h_final = carry
        xp, t = inp
        h2 = gru_cell_apply(params, None, h, policy, x_proj=xp)
        valid = (t < lengths)[:, None]
        h2 = jnp.where(valid, h2, h)  # hold state past the end (packed parity)
        h_final = jnp.where((t == lengths - 1)[:, None], h2, h_final)
        return (h2, h_final), h2

    init = (jnp.zeros((B, hidden), jnp.float32), jnp.zeros((B, hidden), jnp.float32))
    (h_last, h_final), hs = jax.lax.scan(step, init, (x_proj, t_steps))
    hs = hs.swapaxes(0, 1)

    if reverse:
        hs = jnp.take_along_axis(hs, rev_idx[:, :, None], axis=1)

    mask = (jnp.arange(T)[None, :] < lengths[:, None])[:, :, None]
    return jnp.where(mask, hs, 0.0), h_final


def birnn_stack_init(key, cell_init, in_dim: int, hidden: int, num_layers: int, dtype=jnp.float32):
    """Multi-layer bidirectional RNN params (torch nn.GRU/LSTM layout)."""
    layers_p = []
    for layer in range(num_layers):
        key, kf, kb = jax.random.split(key, 3)
        d = in_dim if layer == 0 else 2 * hidden
        layers_p.append({"fwd": cell_init(kf, d, hidden), "bwd": cell_init(kb, d, hidden)})
    return layers_p


# ---------------------------------------------------------------------------
# Dropout (torch semantics: scale by 1/(1-p) at train time)
# ---------------------------------------------------------------------------


def dropout(key, x, rate: float, enabled: bool = True):
    if not enabled or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
