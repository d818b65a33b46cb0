"""HiFi-GAN generator (vocoder) in JAX.

Behavioral spec from the reference (model/hifi_gan.py:154-216): conv_pre
(80 -> upsample_initial_channel, k=7) -> per stage [LeakyReLU(0.1) ->
ConvTranspose1d(ch -> ch/2, k_u, stride u) -> mean of num_kernels ResBlocks
(multi-receptive-field fusion)] -> LeakyReLU (default slope 0.01!) ->
conv_post (ch -> 1, k=7) -> tanh.

ResBlock1 (model/hifi_gan.py:20-109): 3x [lrelu -> conv(dilation d) ->
lrelu -> conv(dilation 1) -> +x], dilations (1,3,5).
ResBlock2 (:112-151): 2x [lrelu -> conv(dilation d) -> +x], dilations (1,3).

TPU redesign: channels-last NWC convs; the transposed convs lower to
lhs-dilated convolutions that XLA tiles onto the MXU (layers.
conv_transpose1d_apply); weight norm is folded at conversion time (the
reference removes it before inference anyway, run/say.py:88). All shapes
static: T mel frames -> T * prod(upsample_rates) samples.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy

LRELU_SLOPE = 0.1  # model/hifi_gan.py:7


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    """Mirrors the checkpoint-side JSON config (run/say.py:76-78)."""

    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80

    @staticmethod
    def from_dict(h: dict) -> "HiFiGANConfig":
        return HiFiGANConfig(
            resblock=str(h["resblock"]),
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=int(h["upsample_initial_channel"]),
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
            num_mels=int(h.get("num_mels", 80)),
        )

    @property
    def total_upsample(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out


class HiFiGAN:
    def __init__(self, config: HiFiGANConfig, policy: Policy = F32):
        self.cfg = config
        self.policy = policy

    # ------------------------------------------------------------------
    def init(self, key) -> dict:
        """Random init (the reference re-inits convs N(0, 0.01),
        model/hifi_gan.py:10-13,187). Jitted for the same reason as
        Tacotron2.init: one cacheable executable instead of ~100 eager
        random-op dispatches. Values match the eager path to 1 ulp (XLA
        fuses the ``normal(k) * 0.01`` scale under jit; threefry bits
        themselves are identical) — fine for a random init whose
        production role is the checkpoint-conversion skeleton."""
        return jax.jit(self._init_impl)(key)

    def _init_impl(self, key) -> dict:
        cfg = self.cfg
        n_ups = len(cfg.upsample_rates)
        n_k = len(cfg.resblock_kernel_sizes)
        keys = iter(jax.random.split(key, 4 + n_ups + n_ups * n_k * 8))

        def normal_conv(k, in_ch, out_ch, kernel):
            p = layers.conv1d_init(k, in_ch, out_ch, kernel)
            return {"w": jax.random.normal(k, p["w"].shape) * 0.01, "b": jnp.zeros_like(p["b"])}

        params = {
            "conv_pre": layers.conv1d_init(next(keys), cfg.num_mels, cfg.upsample_initial_channel, 7),
            "ups": [],
            "resblocks": [],
        }
        ch = cfg.upsample_initial_channel
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            p = layers.conv_transpose1d_init(next(keys), ch, ch // 2, k)
            params["ups"].append({"w": jax.random.normal(next(keys), p["w"].shape) * 0.01, "b": jnp.zeros_like(p["b"])})
            ch //= 2
            for kr, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
                rb: dict = {}
                if cfg.resblock == "1":
                    rb["convs1"] = [normal_conv(next(keys), ch, ch, kr) for _ in dil]
                    rb["convs2"] = [normal_conv(next(keys), ch, ch, kr) for _ in dil]
                else:
                    rb["convs"] = [normal_conv(next(keys), ch, ch, kr) for _ in dil]
                params["resblocks"].append(rb)
        params["conv_post"] = normal_conv(next(keys), ch, 1, 7)
        return params

    # ------------------------------------------------------------------
    def mel_receptive_field(self) -> int:
        """One-sided receptive field of the whole generator in MEL frames
        (conv_pre + every convT + every MRF stage + conv_post, each
        stage's reach divided back to mel resolution). Used by the
        serving path to size the vocode bucket so no kept sample's
        receptive field reaches the bucket's SAME-padding boundary."""
        from tacotron2_tpu.ops.mrf_pallas import stage_reach

        cfg = self.cfg
        rf = 3.0  # conv_pre, k=7 SAME
        cum = 1.0
        reach = stage_reach(
            cfg.resblock, cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes
        )
        for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
            rf += -(-k // u) / cum  # convT input reach, in mel frames
            cum *= u
            rf += reach / cum
        rf += 3.0 / cum  # conv_post
        return int(math.ceil(rf)) + 1

    # ------------------------------------------------------------------
    @staticmethod
    def _fold_conv(params, k: int, d: int, C: int, s: int):
        """Rewrite a SAME-padded dilated conv (k, C, C) for the s-phase
        FOLDED layout (L, C) -> (L/s, s*C) — space-to-depth so small-
        channel convs fill the 128-lane MXU (PERF.md: stage 4 of the
        UNIVERSAL_V1 MRF runs at 4.2% MFU with ch=32). Algebraically
        exact: y4[t', j*C+o] = y[s*t'+j, o].

        Derivation: y[t,o] = b[o] + Σ_κΣ_i W[κ,i,o] x[t+κd-p, i] with
        p = d(k-1)/2. With t = s t' + j and q = j + κd - p = s δ + r
        (δ = floor(q/s)), each (κ, j) contributes W[κ] into folded-weight
        block W4[δ, r-block, j-block]."""
        w, b = params["w"], params["b"]
        p = (k * d - d) // 2
        qs = [(kk, j, j + kk * d - p) for kk in range(k) for j in range(s)]
        dmin = min(q // s for _, _, q in qs)
        dmax = max(q // s for _, _, q in qs)
        k4 = dmax - dmin + 1
        w4 = jnp.zeros((k4, s * C, s * C), w.dtype)
        for kk, j, q in qs:
            dlt, r = q // s, q % s
            w4 = w4.at[dlt - dmin, r * C : (r + 1) * C, j * C : (j + 1) * C].add(w[kk])
        return {"w": w4, "b": jnp.tile(b, s)}, [(-dmin, dmax)]

    def _resblock_folded(self, rb, x4, kernel: int, dilations: Sequence[int],
                         C: int, s: int):
        """_resblock on the s-phase folded layout (exact rewrite)."""
        pol = self.policy
        if self.cfg.resblock == "1":
            for j, d in enumerate(dilations):
                w1, pad1 = self._fold_conv(rb["convs1"][j], kernel, d, C, s)
                w2, pad2 = self._fold_conv(rb["convs2"][j], kernel, 1, C, s)
                xt = jax.nn.leaky_relu(x4, LRELU_SLOPE)
                xt = layers.conv1d_apply(w1, xt, pol, padding=pad1)
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = layers.conv1d_apply(w2, xt, pol, padding=pad2)
                x4 = xt + x4
        else:
            for j, d in enumerate(dilations):
                wf, padf = self._fold_conv(rb["convs"][j], kernel, d, C, s)
                xt = jax.nn.leaky_relu(x4, LRELU_SLOPE)
                xt = layers.conv1d_apply(wf, xt, pol, padding=padf)
                x4 = xt + x4
        return x4

    # ------------------------------------------------------------------
    # Polyphase-by-dilation MRF (the r4 successor to the reverted dense
    # fold): every conv runs as ONE im2col matmul on an s-phase folded
    # layout (s = 128/ch fills the MXU lanes at the channel-starved late
    # stages), and dilated convs are first phase-split (t mod d) so the
    # folded weight stays DENSE. Redundancy is (s+k-1)/k (1.27-2x) instead
    # of the dense fold's k4*s/k (4-5.5x) because only the s+k-1 used tap
    # blocks enter the contraction. Algebraically exact (equality-gated in
    # tests/test_parity_hifigan.py). Reference semantics being reproduced:
    # model/hifi_gan.py:20-151 (ResBlock1/2 dilated convs).
    # ------------------------------------------------------------------

    @staticmethod
    def _row_shift(x, delta: int):
        """y[:, t] = x[:, t+delta], zero-filled outside — the SAME-pad
        zeros of the original conv, expressed on the folded row axis."""
        if delta == 0:
            return x
        T = x.shape[1]
        if delta > 0:
            return jnp.pad(x[:, delta:], ((0, 0), (0, delta), (0, 0)))
        return jnp.pad(x[:, : T + delta], ((0, 0), (-delta, 0), (0, 0)))

    def _im2col_conv_dense(self, cp, x4, k: int, C: int, s: int):
        """Dense (dilation-1) SAME conv on the s-phase folded layout
        (B, T4, s*C) as one matmul.

        y[s*t'+j, o] = sum_kappa x[s*t'+j+kappa-p, i] w[kappa, i, o],
        p=(k-1)/2. The needed absolute offsets q = j+kappa-p form the
        contiguous range [-p, s+k-2-p] (s+k-1 of them); offset q lives in
        rolled-copy delta=floor(q/s), lane block q mod s — so X~ is a
        lane-concat of contiguous sub-slices of a few row-shifted copies,
        and W~ ((s+k-1)C, sC) places w[q-j+p] at (col(q), j) where valid."""
        w, b = cp["w"], cp["b"]  # (k, C, C) WIO
        p = (k - 1) // 2
        offs = list(range(-p, s + k - 1 - p))
        # X~: group contiguous offsets by row-shift delta
        cols = []
        for delta in range(offs[0] // s, offs[-1] // s + 1):
            rs = [q % s for q in offs if q // s == delta]
            if not rs:
                continue
            shifted = self._row_shift(x4, delta)
            cols.append(shifted[..., min(rs) * C : (max(rs) + 1) * C])
        xt = jnp.concatenate(cols, axis=-1)  # (B, T4, (s+k-1)C)
        wt = jnp.zeros(((s + k - 1) * C, s * C), w.dtype)
        for ci, q in enumerate(offs):
            for j in range(s):
                kappa = q - j + p
                if 0 <= kappa < k:
                    wt = wt.at[ci * C : (ci + 1) * C, j * C : (j + 1) * C].set(w[kappa])
        pol = self.policy
        y = jnp.matmul(pol.cast(xt), pol.cast(wt)).astype(jnp.float32)
        return y + jnp.tile(b, s)

    def _conv_poly(self, cp, x4, k: int, d: int, C: int, s: int):
        """SAME conv with dilation d on the folded layout: d=1 goes
        straight to the im2col matmul; d>1 phase-splits (t mod d) first so
        each phase sees a DENSE conv (the taps t+kappa*d-p of output t all
        share t mod d), then refolds. Requires T4*s % (s*d) == 0 —
        guaranteed by the stage padding in apply()."""
        if d == 1:
            return self._im2col_conv_dense(cp, x4, k, C, s)
        B, T4, _ = x4.shape
        Lp = T4 * s
        Ld = Lp // d
        x = x4.reshape(B, Lp, C)
        xp = x.reshape(B, Ld, d, C).transpose(0, 2, 1, 3)  # (B, d, Ld, C)
        xp4 = xp.reshape(B * d, Ld // s, s * C)
        yp4 = self._im2col_conv_dense(cp, xp4, k, C, s)
        yp = yp4.reshape(B, d, Ld, C).transpose(0, 2, 1, 3)
        return yp.reshape(B, T4, s * C)

    def _resblock_poly(self, rb, x4, kernel: int, dilations: Sequence[int],
                       C: int, s: int, mask4):
        """_resblock on the s-phase folded layout via polyphase im2col
        convs. mask4 re-zeroes the padded tail after every conv so taps
        that reach past the true length read the same zeros the unfolded
        SAME convs pad with (lrelu/residual preserve zeros on their own)."""
        if self.cfg.resblock == "1":
            for j, d in enumerate(dilations):
                xt = jax.nn.leaky_relu(x4, LRELU_SLOPE)
                xt = self._conv_poly(rb["convs1"][j], xt, kernel, d, C, s) * mask4
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = self._conv_poly(rb["convs2"][j], xt, kernel, 1, C, s) * mask4
                x4 = xt + x4
        else:
            for j, d in enumerate(dilations):
                xt = jax.nn.leaky_relu(x4, LRELU_SLOPE)
                xt = self._conv_poly(rb["convs"][j], xt, kernel, d, C, s) * mask4
                x4 = xt + x4
        return x4

    def _resblock(self, rb, x, kernel: int, dilations: Sequence[int]):
        pol = self.policy
        if self.cfg.resblock == "1":
            for j, d in enumerate(dilations):
                xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
                xt = layers.conv1d_apply(rb["convs1"][j], xt, pol, padding=get_padding(kernel, d), dilation=d)
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = layers.conv1d_apply(rb["convs2"][j], xt, pol, padding=get_padding(kernel, 1), dilation=1)
                x = xt + x
        else:
            for j, d in enumerate(dilations):
                xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
                xt = layers.conv1d_apply(rb["convs"][j], xt, pol, padding=get_padding(kernel, d), dilation=d)
                x = xt + x
        return x

    def apply(self, params, mel: jnp.ndarray, fold: bool = False,
              mrf_poly=False, mrf_pallas="auto", fuse_ups="auto",
              mrf_edge_mask: bool = False,
              interpret: bool = False) -> jnp.ndarray:
        """mel (B, T, num_mels) -> wav (B, T * total_upsample).

        (The reference takes (B, num_mels, T) and returns (B, 1, samples);
        we are channels-last end to end.)

        ``fold``: phase-fold (space-to-depth) the MRF at stages whose
        channel count is below the 128-lane MXU width — an exact algebraic
        rewrite (gated by a CPU equality test) that was TRIED as the fix
        for the late stages' channel-starved MXU tiles and MEASURED SLOWER
        (34.5 vs 25.5 µs/frame, ABAB on v5e): dilation spreads taps across
        ⌈(k−1)d/s⌉+1 folded kernel positions, so the dense folded weights
        carry ~4-5.5× the FLOPs, cancelling the ~4× utilization gain.
        Default OFF; kept as the documented experiment (PERF.md).

        ``mrf_poly``: polyphase-by-dilation MRF (r4, see _resblock_poly) —
        the exact rewrite that fixes the dense fold's FLOP redundancy, but
        at the XLA level, where the tap matrix materializes to HBM:
        measured 2-4x SLOWER (tools/vocoder_poly_bench.py). Kept as the
        documented negative. bool (all stages) or per-stage sequence; odd
        kernels only (the reference's are).

        ``mrf_pallas``: the production answer (ops/mrf_pallas.py) — the
        same rewrite fused into one Pallas kernel per stage, tap matrix
        never leaving VMEM, folded weights launch-resident: 9.3 vs 25.3
        µs/frame on v5e (2.7×, tools/vocoder_poly_bench.py). bool or
        per-stage sequence; takes precedence over mrf_poly. Default
        "auto": all stages fused on accelerator backends, plain XLA convs
        on CPU (Mosaic compiles TPU-only; CPU tests pass interpret=True
        explicitly).

        ``fuse_ups``: additionally fuse each stage's lrelu -> transposed
        conv INTO its Pallas MRF kernel where the folded layouts align
        (upsample_fusable / upsample_fusable_expand: ALL UNIVERSAL_V1
        stages) — the convT output then never round-trips HBM. Only takes
        effect for stages already on the mrf_pallas path. Measured on v5e
        (tools/vocoder_poly_bench.py, r4): **6.93 µs/frame vs 8.33
        unfused vs 25.59 XLA base** (3.7× total), so the production
        default is "auto": ON on accelerator backends, OFF on CPU (where
        the Pallas path itself is off unless interpret is forced).

        ``mrf_edge_mask``: skip the per-conv boundary re-zeroing on
        interior tiles of the Pallas MRF kernels (one lax.cond per tile;
        exact, gated in tests/test_mrf_pallas.py). MEASURED SLOWER on v5e
        (r4: 9.37 vs 8.33 µs/frame unfused, 7.04 vs 6.93 fused — the
        cond's doubled kernel body costs more than the 18 interior mask
        passes it saves; it did NOT trip the Mosaic compile ceiling).
        Kept as the documented negative; default OFF."""
        cfg, pol = self.cfg, self.policy
        if mrf_pallas == "auto":
            mrf_pallas = interpret or jax.default_backend() != "cpu"
        if fuse_ups == "auto":
            fuse_ups = jax.default_backend() != "cpu"
        num_kernels = len(cfg.resblock_kernel_sizes)
        n_stages = len(cfg.upsample_rates)
        poly_stages = (
            list(mrf_poly) if isinstance(mrf_poly, (list, tuple))
            else [bool(mrf_poly)] * n_stages
        )
        pallas_stages = (
            list(mrf_pallas) if isinstance(mrf_pallas, (list, tuple))
            else [bool(mrf_pallas)] * n_stages
        )

        from tacotron2_tpu.ops.mrf_pallas import (
            mrf_stage_pallas, upsample_fusable, upsample_fusable_expand,
        )

        x = layers.conv1d_apply(params["conv_pre"], mel, pol, padding=3)
        ch = cfg.upsample_initial_channel
        odd = all(kk % 2 == 1 for kk in cfg.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            if pallas_stages[i] and odd:
                rbs = [
                    params["resblocks"][i * num_kernels + j]
                    for j in range(num_kernels)
                ]
                common = dict(
                    resblock=cfg.resblock,
                    kernels=cfg.resblock_kernel_sizes,
                    dilations=cfg.resblock_dilation_sizes,
                    bf16=(pol.compute_dtype == jnp.bfloat16),
                    interpret=interpret,
                    edge_mask=mrf_edge_mask,
                )
                if fuse_ups and (
                    upsample_fusable(u, ch, ch // 2, k)
                    or upsample_fusable_expand(u, ch, ch // 2, k)
                ):
                    x = mrf_stage_pallas(
                        rbs, x, upsample=(params["ups"][i], u), **common
                    )
                else:
                    x = jax.nn.leaky_relu(x, LRELU_SLOPE)
                    x = layers.conv_transpose1d_apply(
                        params["ups"][i], x, stride=u,
                        padding=(k - u) // 2, policy=pol,
                    )
                    x = mrf_stage_pallas(rbs, x, **common)
                ch //= 2
                continue
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = layers.conv_transpose1d_apply(params["ups"][i], x, stride=u, padding=(k - u) // 2, policy=pol)
            ch //= 2
            L = x.shape[1]
            poly = poly_stages[i] and odd
            if poly:
                B = x.shape[0]
                s = 128 // ch if (ch < 128 and 128 % ch == 0) else 1
                lcm_d = 1
                for dil in cfg.resblock_dilation_sizes:
                    for d in dil:
                        lcm_d = math.lcm(lcm_d, d)
                unit = s * lcm_d
                Lp = ((L + unit - 1) // unit) * unit
                xpad = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
                x4 = xpad.reshape(B, Lp // s, s * ch)
                mask4 = (
                    (jnp.arange(Lp) < L).astype(jnp.float32)
                    .repeat(ch)
                    .reshape(1, Lp // s, s * ch)
                )
                acc = None
                for j in range(num_kernels):
                    rb = params["resblocks"][i * num_kernels + j]
                    y = self._resblock_poly(
                        rb, x4, cfg.resblock_kernel_sizes[j],
                        cfg.resblock_dilation_sizes[j], ch, s, mask4,
                    )
                    acc = y if acc is None else acc + y
                x = (acc / num_kernels).reshape(B, Lp, ch)[:, :L]
                continue
            s = 128 // ch if (fold and ch < 128 and L % (128 // ch) == 0) else 1
            if s > 1:
                x = x.reshape(x.shape[0], L // s, s * ch)
            acc = None
            for j in range(num_kernels):
                rb = params["resblocks"][i * num_kernels + j]
                if s > 1:
                    y = self._resblock_folded(
                        rb, x, cfg.resblock_kernel_sizes[j],
                        cfg.resblock_dilation_sizes[j], ch, s,
                    )
                else:
                    y = self._resblock(
                        rb, x, cfg.resblock_kernel_sizes[j], cfg.resblock_dilation_sizes[j]
                    )
                acc = y if acc is None else acc + y
            x = acc / num_kernels
            if s > 1:
                x = x.reshape(x.shape[0], L, ch)
        x = jax.nn.leaky_relu(x)  # default slope 0.01 (model/hifi_gan.py:203)
        x = layers.conv1d_apply(params["conv_post"], x, pol, padding=3)
        return jnp.tanh(x)[..., 0]
