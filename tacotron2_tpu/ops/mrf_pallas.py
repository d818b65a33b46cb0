"""Fused HiFi-GAN MRF stage as ONE Pallas TPU kernel (VERDICT r3 #1).

The vocoder's multi-receptive-field resblocks are ~95% of its cost and the
late stages are channel-starved on the 128x128 MXU (ch=32 runs at 4.2% MFU
through XLA convs — PERF.md). Two prior attempts established the design
constraints:

- r3 dense phase-fold (HiFiGAN._fold_conv): the folded weight of a DILATED
  conv carries 4-5.5x redundant FLOPs — measured SLOWER (34.5 vs 25.5
  us/frame).
- r4 XLA-level im2col (HiFiGAN._resblock_poly): algebraically fixes the
  redundancy, but XLA materializes the (T, (s+k-1)C) tap matrix to HBM —
  measured 2-4x SLOWER (tools/vocoder_poly_bench.py). The im2col must
  never leave VMEM.

So: one kernel per upsample stage. The whole stage (3 resblocks x [lrelu ->
dilated conv -> lrelu -> conv -> residual], mean) runs on a time tile held
in VMEM with halo overlap-recompute at the tile edges; each conv is ONE MXU
dot of an in-VMEM tap matrix (built from static row/lane slices of the
tile) against a launch-resident folded weight block:

- channels C < 128 are s = 128/C phase-FOLDED: row t' of the (T/s, s*C)
  layout holds positions s*t'+j in lane blocks j — output lanes fill the
  MXU.
- a dense (d=1) conv needs tap blocks at the s+k-1 distinct offsets
  q = j + kappa - p — redundancy (s+k-1)/k, i.e. 1.27-2x, not 4-5.5x.
- a dilated conv gathers per-kappa runs [kappa*d-p, kappa*d-p+s) (k*s
  blocks, dups kept so the weight stays a plain block-select; at s=1 this
  is exactly k blocks, no redundancy).

Weight folding is an einsum with a constant 0/1 selection tensor
(fold_weight), done once per call outside the kernel.

Reference semantics reproduced: model/hifi_gan.py:20-151 (ResBlock1/2),
:154-216 (generator MRF mean). Equality vs the base conv path is gated in
tests/test_mrf_pallas.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1  # model/hifi_gan.py:7


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# tap plans: which input offsets (in unfolded time) each conv's tap matrix
# carries, in lane-block order — shared between the in-kernel build and the
# weight fold so the two can never drift.
# ---------------------------------------------------------------------------

def conv_offsets(k: int, d: int, s: int) -> list:
    """Unfolded-time offsets of the tap-matrix C-blocks, in order."""
    p = d * (k - 1) // 2
    if d == 1:
        return list(range(-p, s + k - 1 - p))
    if s == 1:
        return [kap * d - p for kap in range(k)]
    # per-kappa runs of s consecutive offsets (duplicates possible when
    # runs overlap; each (j, kappa) pair is charged to its own run)
    return [kap * d - p + j for kap in range(k) for j in range(s)]


def fold_weight(w: jnp.ndarray, k: int, d: int, s: int) -> jnp.ndarray:
    """(k, C, C) WIO conv weight -> (m*C, s*C) tap-matmul weight.

    Row block q (offset offs[q]), input channel i; column block j (output
    phase), output channel o: sum_kappa S[q, j, kappa] w[kappa, i, o] with
    S a constant 0/1 selector assigning each (j, kappa) pair to exactly
    one tap block."""
    C = w.shape[1]
    offs = conv_offsets(k, d, s)
    m = len(offs)
    p = d * (k - 1) // 2
    S = np.zeros((m, s, k), np.float32)
    if d > 1 and s > 1:
        for kap in range(k):
            for j in range(s):
                S[kap * s + j, j, kap] = 1.0
    else:
        for q, off in enumerate(offs):
            for j in range(s):
                num = off - j + p
                if num % d == 0 and 0 <= num // d < k:
                    S[q, j, num // d] = 1.0
    wt = jnp.einsum("qjk,kio->qijo", jnp.asarray(S), w)
    return wt.reshape(m * C, s * C)


def upsample_taps(k: int, u: int, s: int, s_in: int):
    """Tap plan for a FUSED transposed conv on the folded layouts.

    ConvT semantics (layers.conv_transpose1d_apply, stride u, padding
    pad=(k-u)//2, verified index algebra): out[P] = b + sum over m with
    (P+pad-m) % u == 0 of w[m] . x[(P+pad-m)/u]. On the s-folded OUTPUT
    layout with s = u*s_in (the u | s stages), output lane block j has a
    FIXED phase, and the input position q = s_in*R + e with R the output
    folded row and e = (j+pad-m)/u — so each (j, m) pair reads input
    folded row R + floor(e/s_in), lane block e mod s_in: a plain
    block-select, same shape as the dense-conv taps.

    Returns (taps, assign): taps = ordered distinct (row_shift, ji)
    blocks; assign = list of (j, m, tap_index)."""
    pad = (k - u) // 2
    taps: list = []
    assign = []
    for j in range(s):
        for m in range(k):
            if (j + pad - m) % u:
                continue
            e = (j + pad - m) // u
            key = (e // s_in, e % s_in)
            if key not in taps:
                taps.append(key)
            assign.append((j, m, taps.index(key)))
    return taps, assign


def fold_upsample_weight(w: jnp.ndarray, b: jnp.ndarray, u: int, s: int,
                         s_in: int):
    """(k, Cin, C) convT weight -> ((n_taps*Cin, s*C), (s*C,)) for the
    fused tap matmul (see upsample_taps)."""
    k, Cin, C = w.shape
    taps, assign = upsample_taps(k, u, s, s_in)
    S = np.zeros((len(taps), s, k), np.float32)
    for j, m, t in assign:
        S[t, j, m] = 1.0
    wt = jnp.einsum("tjm,mio->tijo", jnp.asarray(S), w)
    return wt.reshape(len(taps) * Cin, s * C), jnp.tile(b, s)


def _stage_convs(resblock: str, kernels, dilations):
    """Flat (k, d) list for one stage, resblock-major, matching the
    sequential compute order inside the kernel."""
    convs = []
    for kr, dil in zip(kernels, dilations):
        for d in dil:
            if resblock == "1":
                convs.append((kr, d))
                convs.append((kr, 1))
            else:
                convs.append((kr, d))
    return convs


def stage_reach(resblock: str, kernels, dilations) -> int:
    """Max one-sided receptive reach (unfolded rows) of any resblock chain
    — the halo each tile must recompute."""
    reach = 0
    for kr, dil in zip(kernels, dilations):
        r = 0
        for d in dil:
            r += d * (kr - 1) // 2
            if resblock == "1":
                r += (kr - 1) // 2
        reach = max(reach, r)
    return reach


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _row_shift(t, delta: int):
    """y[r] = t[r+delta], zero-filled — valid inside the halo margin."""
    if delta == 0:
        return t
    Te, W = t.shape
    z = jnp.zeros((abs(delta), W), t.dtype)
    if delta > 0:
        return jnp.concatenate([t[delta:], z], axis=0)
    return jnp.concatenate([z, t[: Te + delta]], axis=0)


def _build_taps(t, k: int, d: int, s: int, C: int):
    """In-VMEM tap matrix (Te, m*C) for one conv — static slices only."""
    p = d * (k - 1) // 2
    pieces = []
    if d == 1:
        offs = conv_offsets(k, d, s)
        delta0, delta1 = offs[0] // s, offs[-1] // s
        for delta in range(delta0, delta1 + 1):
            rs = [q % s for q in offs if q // s == delta]
            if not rs:
                continue
            sh = _row_shift(t, delta)
            pieces.append(sh[:, min(rs) * C : (max(rs) + 1) * C])
    elif s == 1:
        for kap in range(k):
            pieces.append(_row_shift(t, kap * d - p))
    else:
        for kap in range(k):
            delta, r = divmod(kap * d - p, s)
            a = _row_shift(t, delta)
            pieces.append(a[:, r * C :] if r else a)
            if r:
                pieces.append(_row_shift(t, delta + 1)[:, : r * C])
    return jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]


def _mrf_chain(x, mask, wcat_ref, bcat_ref, convs, kernels, dilations,
               resblock: str, row_offs, C: int, s: int, Tt: int, H: int,
               dot_dtype):
    """The shared in-kernel MRF chain: mean over resblocks of
    resblock_k(x) on the (Te, s*C) extended tile; returns the (Tt, s*C)
    center slice. ``mask=None`` skips the per-conv boundary re-zeroing —
    exact for INTERIOR tiles, whose whole extended row range maps to
    valid unfolded positions in [0, L) (see the edge_mask dispatch in the
    kernel factories)."""
    f32 = jnp.float32

    def conv(t, ci):
        k, d = convs[ci]
        # cast the TILE before building taps: the tap matrix is up to
        # k*s/s times wider than the tile, and cast commutes with the
        # slice/concat/zero-fill of _build_taps — same bf16 values, a
        # fraction of the VPU cast work. The weight block arrives
        # pre-cast (host side), so no per-conv weight cast either.
        taps = _build_taps(t.astype(dot_dtype), k, d, s, C)
        m = taps.shape[1] // C
        w = wcat_ref[row_offs[ci] : row_offs[ci] + m * C, :]
        y = jax.lax.dot_general(
            taps, w, (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )
        y = y + bcat_ref[ci : ci + 1, :]
        return y if mask is None else y * mask

    acc = None
    ci = 0
    for rk, (kr, dil) in enumerate(zip(kernels, dilations)):
        z = x
        for d in dil:
            t = jnp.where(z > 0, z, LRELU_SLOPE * z)
            t = conv(t, ci)
            ci += 1
            if resblock == "1":
                t = jnp.where(t > 0, t, LRELU_SLOPE * t)
                t = conv(t, ci)
                ci += 1
            z = z + t
        zc = z[H : H + Tt]
        acc = zc if acc is None else acc + zc
    return acc * (1.0 / len(kernels))


def _boundary_mask(g, Tt: int, H: int, s: int, C: int, L: int):
    """(Te, s*C) 0/1 mask for unfolded pos in [0, L): unfolded pos of
    (row r, lane l) = s*(g*Tt - H + r) + l//C — the same zeros the
    reference's per-conv SAME padding supplies."""
    Te, sC = Tt + 2 * H, s * C
    rows = jax.lax.broadcasted_iota(jnp.int32, (Te, sC), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (Te, sC), 1)
    pos = s * (g * Tt - H + rows) + lanes // C
    return ((pos >= 0) & (pos < L)).astype(jnp.float32)


def _edge_dispatch(edge_mask: bool, g, mask, chain, Tt: int, H: int,
                   s: int, L: int):
    """``chain(mask)`` with the per-conv boundary re-zeroing skipped on
    INTERIOR tiles (one ``lax.cond`` on a scalar tile-position predicate):
    a tile is interior when its whole extended row range [g*Tt - H,
    (g+1)*Tt + H) maps to unfolded positions inside [0, L) — the mask is
    all ones there, so the ~18 (Te, sC) VPU mask multiplies per stage are
    pure overhead (only the 2 boundary tiles of a production-length launch
    need them). Both branches compile (~2x kernel body) — opt-in
    (``edge_mask``) until measured on hardware."""
    if not edge_mask:
        return chain(mask)
    interior = jnp.logical_and(g * Tt - H >= 0, s * ((g + 1) * Tt + H) <= L)
    return jax.lax.cond(interior, lambda: chain(None), lambda: chain(mask))


def _make_stage_kernel(resblock: str, kernels, dilations, C: int, s: int,
                       Tt: int, H: int, L: int, n_resblocks: int,
                       row_offs, dot_dtype, edge_mask: bool = False):
    """Returns the Pallas kernel for one MRF stage.

    row_offs: per-conv row offsets into the packed resident weight block.
    L: valid unfolded length (static) — drives the boundary mask."""
    convs = _stage_convs(resblock, kernels, dilations)

    def kernel(xprev_ref, xcur_ref, xnext_ref, wcat_ref, bcat_ref, out_ref):
        g = pl.program_id(0)
        x = jnp.concatenate(
            [xprev_ref[Tt - H :], xcur_ref[...], xnext_ref[:H]], axis=0
        )  # (Te, sC) f32, folded rows [g*Tt - H, (g+1)*Tt + H)
        mask = _boundary_mask(g, Tt, H, s, C, L)
        out_ref[...] = _edge_dispatch(
            edge_mask, g, mask,
            lambda m: _mrf_chain(
                x, m, wcat_ref, bcat_ref, convs, kernels, dilations,
                resblock, row_offs, C, s, Tt, H, dot_dtype,
            ),
            Tt, H, s, L,
        )

    return kernel


def _make_stage_kernel_ups_expand(resblock: str, kernels, dilations, C: int,
                                  Tt: int, H: int, L: int, row_offs,
                                  dot_dtype, u: int, Cin: int, Ti: int,
                                  Hi: int, tap_deltas,
                                  edge_mask: bool = False):
    """Stage kernel with the upsample convT fused for the u > s stages
    (s == 1: C >= 128 — stages 1/2 of UNIVERSAL_V1, u = 8).

    The convT lands naturally in a u-folded (input-row, u*C) layout (one
    tap matmul; tap plan = upsample_taps(ku, u, s=u, s_in=1)). The MRF
    needs the UNFOLDED (Te, C) layout, and Mosaic has no row-expanding
    reshape — so the kernel row-repeats via a 0/1 iota matmul (the fused
    decode's kron(I, ones) trick, ops/decoder_loop_pallas.py) and
    phase-selects lanes with u static row masks. Both are O(u*C) per
    output row — noise next to the stage's MRF FLOPs."""
    convs = _stage_convs(resblock, kernels, dilations)
    Te = Tt + 2 * H
    Tei = Ti + 2 * Hi
    f32 = jnp.float32
    assert H % u == 0 and Tt % u == 0

    def kernel(xprev_ref, xcur_ref, xnext_ref, wcat_ref, bcat_ref,
               wups_ref, bups_ref, out_ref):
        g = pl.program_id(0)
        xi = jnp.concatenate(
            [xprev_ref[Ti - Hi :], xcur_ref[...], xnext_ref[:Hi]], axis=0
        )  # (Tei, Cin), input rows [g*Ti - Hi, (g+1)*Ti + Hi)
        xi = jnp.where(xi > 0, xi, LRELU_SLOPE * xi)  # pre-convT lrelu
        xi = xi.astype(dot_dtype)  # cast the tile once; taps are slices
        pieces = [_row_shift(xi, d) for d in tap_deltas]
        taps = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
        nt = len(tap_deltas) * Cin
        z4 = jax.lax.dot_general(
            taps, wups_ref[:nt, :],
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ) + bups_ref[0:1, :]  # (Tei, u*C): row q, lane block r = phase
        # row-repeat z4 into output rows: R[re] = z4[re//u + (Hi - H//u)]
        off = Hi - H // u
        re_i = jax.lax.broadcasted_iota(jnp.int32, (Te, Tei), 0)
        q_i = jax.lax.broadcasted_iota(jnp.int32, (Te, Tei), 1)
        E = (q_i == re_i // u + off).astype(f32)
        with jax.default_matmul_precision("default"):
            R = jax.lax.dot_general(
                E, z4, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )  # (Te, u*C)
        # phase lane-select: out row re takes lane block re % u (static
        # pattern — the tile base g*Tt - H is a multiple of u)
        rphase = jax.lax.broadcasted_iota(jnp.int32, (Te, C), 0) % u
        z = jnp.zeros((Te, C), f32)
        for r in range(u):
            z = z + jnp.where(rphase == r, R[:, r * C : (r + 1) * C], 0.0)
        mask = _boundary_mask(g, Tt, H, 1, C, L)
        z = z * mask  # prologue stays masked (1 of ~19 passes) — the
        # cond below only skips the chain's per-conv re-zeroing
        out_ref[...] = _edge_dispatch(
            edge_mask, g, mask,
            lambda m: _mrf_chain(
                z, m, wcat_ref, bcat_ref, convs, kernels, dilations,
                resblock, row_offs, C, 1, Tt, H, dot_dtype,
            ),
            Tt, H, 1, L,
        )

    return kernel


def _make_stage_kernel_ups(resblock: str, kernels, dilations, C: int, s: int,
                           Tt: int, H: int, L: int, row_offs, dot_dtype,
                           u: int, Cin: int, s_in: int, tap_list,
                           edge_mask: bool = False):
    """Stage kernel with the upsample transposed conv FUSED in front
    (lrelu -> convT -> MRF, the whole per-stage pipeline of
    model/hifi_gan.py:196-202 as ONE kernel). Requires u * s_in == s
    (output and input folded layouts row-align 1:1 — true for the u=2
    late stages of UNIVERSAL_V1, which is where the channel-starved MXU
    makes fusion matter). The convT is one tap-matrix dot against a
    launch-resident folded weight (upsample_taps/fold_upsample_weight);
    its output never touches HBM."""
    convs = _stage_convs(resblock, kernels, dilations)
    Hi = H + 8  # input halo: MRF reach + convT row shifts (|delta| <= 2)
    Te = Tt + 2 * H
    f32 = jnp.float32

    def kernel(xprev_ref, xcur_ref, xnext_ref, wcat_ref, bcat_ref,
               wups_ref, bups_ref, out_ref):
        g = pl.program_id(0)
        xi = jnp.concatenate(
            [xprev_ref[Tt - Hi :], xcur_ref[...], xnext_ref[:Hi]], axis=0
        )  # (Tt + 2*Hi, s_in*Cin), input folded rows [g*Tt - Hi, ...)
        xi = jnp.where(xi > 0, xi, LRELU_SLOPE * xi)  # pre-convT lrelu
        xi = xi.astype(dot_dtype)  # cast the tile once; taps are slices
        pieces = []
        for delta, ji in tap_list:
            sh = _row_shift(xi, (Hi - H) + delta)[:Te]
            pieces.append(sh[:, ji * Cin : (ji + 1) * Cin])
        taps = jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]
        mask = _boundary_mask(g, Tt, H, s, C, L)
        nt = len(tap_list) * Cin
        z = jax.lax.dot_general(
            taps, wups_ref[:nt, :],
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )
        z = (z + bups_ref[0:1, :]) * mask  # prologue stays masked
        out_ref[...] = _edge_dispatch(
            edge_mask, g, mask,
            lambda m: _mrf_chain(
                z, m, wcat_ref, bcat_ref, convs, kernels, dilations,
                resblock, row_offs, C, s, Tt, H, dot_dtype,
            ),
            Tt, H, s, L,
        )

    return kernel


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "resblock", "kernels", "dilations", "L", "C", "interpret", "bf16",
        "edge_mask", "tile_rows",
    ),
)
def _mrf_stage_call(wcat, bcat, x, *, resblock, kernels, dilations, L, C,
                    interpret, bf16, edge_mask=False, tile_rows=None):
    s = 128 // C if (C < 128 and 128 % C == 0) else 1
    sC = s * C
    reach = stage_reach(resblock, kernels, dilations)
    H = _round_up(-(-reach // s), 8)
    T4 = -(-L // s)
    Tt = min(1024, max(_round_up(T4, 8), H))
    if tile_rows:  # test/tuning override (forces multi-tile grids)
        assert tile_rows % 8 == 0 and tile_rows >= H
        Tt = tile_rows
    tiles = -(-T4 // Tt)
    T4p = tiles * Tt

    B = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (0, T4p * s - L), (0, 0)))
    x4 = xp.reshape(B, T4p, sC)
    x4pad = jnp.pad(x4, ((0, 0), (Tt, Tt), (0, 0)))

    n_convs = len(_stage_convs(resblock, kernels, dilations))
    row_offs = []
    r = 0
    for k, d in _stage_convs(resblock, kernels, dilations):
        row_offs.append(r)
        r += len(conv_offsets(k, d, s)) * C
    _dt = jnp.bfloat16 if bf16 else jnp.float32
    R8 = _round_up(r, 16 if bf16 else 8)  # bf16 tiles want 16 sublanes
    wcat = jnp.pad(wcat, ((0, R8 - r), (0, 0))).astype(_dt)
    n8 = _round_up(n_convs, 8)
    bcat = jnp.pad(bcat, ((0, n8 - n_convs), (0, 0)))

    kernel = _make_stage_kernel(
        resblock, kernels, dilations, C, s, Tt, H, L,
        len(kernels), tuple(row_offs),
        jnp.bfloat16 if bf16 else jnp.float32, edge_mask=edge_mask,
    )
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((Tt, sC), lambda g: (g, 0)),
            pl.BlockSpec((Tt, sC), lambda g: (g + 1, 0)),
            pl.BlockSpec((Tt, sC), lambda g: (g + 2, 0)),
            pl.BlockSpec((R8, sC), lambda g: (0, 0)),
            pl.BlockSpec((n8, sC), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tt, sC), lambda g: (g, 0)),
    )

    def one(x1):
        with jax.default_matmul_precision("default"):
            y = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((T4p, sC), jnp.float32),
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=int(100 * 1024 * 1024),
                ),
            )(x1, x1, x1, wcat, bcat)
        return y.reshape(T4p * s, C)[:L]

    return jax.vmap(one)(x4pad)


@functools.partial(
    jax.jit,
    static_argnames=(
        "resblock", "kernels", "dilations", "Lin", "C", "Cin", "u", "ku",
        "interpret", "bf16", "edge_mask", "tile_rows",
    ),
)
def _mrf_stage_ups_call(wcat, bcat, wups, bups, xin, *, resblock, kernels,
                        dilations, Lin, C, Cin, u, ku, interpret, bf16,
                        edge_mask=False, tile_rows=None):
    """Fused lrelu -> convT(stride u, kernel ku) -> MRF stage. xin
    (B, Lin, Cin) is the PRE-upsample activation; output (B, u*Lin, C).
    Requires u * (128/Cin) == 128/C (1:1 folded row alignment)."""
    L = u * Lin
    s = 128 // C
    s_in = 128 // Cin
    reach = stage_reach(resblock, kernels, dilations)
    H = _round_up(-(-reach // s), 8)
    T4 = -(-L // s)
    Tt = min(1024, max(_round_up(T4, 8), H + 8))
    if tile_rows:  # test/tuning override (forces multi-tile grids)
        assert tile_rows % 8 == 0 and tile_rows >= H + 8
        Tt = tile_rows
    tiles = -(-T4 // Tt)
    T4p = tiles * Tt

    B = xin.shape[0]
    # input folded rows align 1:1 with output folded rows (u*s_in == s)
    xinp = jnp.pad(xin, ((0, 0), (0, T4p * s_in - Lin), (0, 0)))
    xi4 = xinp.reshape(B, T4p, s_in * Cin)
    xi4pad = jnp.pad(xi4, ((0, 0), (Tt, Tt), (0, 0)))

    n_convs = len(_stage_convs(resblock, kernels, dilations))
    row_offs = []
    r = 0
    for k, d in _stage_convs(resblock, kernels, dilations):
        row_offs.append(r)
        r += len(conv_offsets(k, d, s)) * C
    _dt = jnp.bfloat16 if bf16 else jnp.float32
    R8 = _round_up(r, 16 if bf16 else 8)  # bf16 tiles want 16 sublanes
    wcat = jnp.pad(wcat, ((0, R8 - r), (0, 0))).astype(_dt)
    n8 = _round_up(n_convs, 8)
    bcat = jnp.pad(bcat, ((0, n8 - n_convs), (0, 0)))

    tap_list, _ = upsample_taps(ku, u, s, s_in)
    if max(abs(d) for d, _ in tap_list) > 8:
        # the kernel's input halo margin is Hi - H = 8 rows; a tap shift
        # past it would silently read zero-fill (wrong audio near tile
        # seams) — refuse loudly instead. Shipped configs (ku = 2u) use
        # |delta| <= 2; this trips only for exotic ku >> u.
        raise ValueError(
            f"convT tap shifts {tap_list} exceed the fused kernel's "
            f"8-row input halo margin (ku={ku}, u={u}, s={s}, s_in={s_in})"
        )
    ru = len(tap_list) * Cin
    R8u = _round_up(ru, 16 if bf16 else 8)
    wups = jnp.pad(wups, ((0, R8u - ru), (0, 0))).astype(_dt)
    bups2 = jnp.zeros((8, s * C), bups.dtype).at[0].set(bups)

    kernel = _make_stage_kernel_ups(
        resblock, kernels, dilations, C, s, Tt, H, L, tuple(row_offs),
        jnp.bfloat16 if bf16 else jnp.float32, u, Cin, s_in, tuple(tap_list),
        edge_mask=edge_mask,
    )
    sC = s * C
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((Tt, s_in * Cin), lambda g: (g, 0)),
            pl.BlockSpec((Tt, s_in * Cin), lambda g: (g + 1, 0)),
            pl.BlockSpec((Tt, s_in * Cin), lambda g: (g + 2, 0)),
            pl.BlockSpec((R8, sC), lambda g: (0, 0)),
            pl.BlockSpec((n8, sC), lambda g: (0, 0)),
            pl.BlockSpec((R8u, sC), lambda g: (0, 0)),
            pl.BlockSpec((8, sC), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tt, sC), lambda g: (g, 0)),
    )

    def one(x1):
        with jax.default_matmul_precision("default"):
            y = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((T4p, sC), jnp.float32),
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=int(100 * 1024 * 1024),
                ),
            )(x1, x1, x1, wcat, bcat, wups, bups2)
        return y.reshape(T4p * s, C)[:L]

    return jax.vmap(one)(xi4pad)


@functools.partial(
    jax.jit,
    static_argnames=(
        "resblock", "kernels", "dilations", "Lin", "C", "Cin", "u", "ku",
        "interpret", "bf16", "edge_mask", "tile_rows",
    ),
)
def _mrf_stage_ups_expand_call(wcat, bcat, wups, bups, xin, *, resblock,
                               kernels, dilations, Lin, C, Cin, u, ku,
                               interpret, bf16, edge_mask=False,
                               tile_rows=None):
    """Fused lrelu -> convT(stride u) -> MRF for the u > s stages (s == 1,
    C >= 128). xin (B, Lin, Cin) -> (B, u*Lin, C)."""
    L = u * Lin
    reach = stage_reach(resblock, kernels, dilations)
    H = _round_up(reach, 8)
    # floor H + 8u keeps the input tile Ti = Tt/u >= its halo Hi = H/u + 8;
    # u must divide Tt and H (row-phase arithmetic) — u is a power of two
    # <= 8 (guarded by upsample_fusable_expand) and both terms are
    # 8-aligned, so 8 | Tt implies u | Tt
    Tt = min(1024, max(_round_up(L, 8), H + 8 * u))
    if tile_rows:  # test/tuning override (forces multi-tile grids)
        assert tile_rows % 8 == 0 and tile_rows >= H + 8 * u
        Tt = tile_rows
    tiles = -(-L // Tt)
    T4p = tiles * Tt

    B = xin.shape[0]
    Ti = Tt // u
    xinp = jnp.pad(xin, ((0, 0), (0, T4p // u - Lin), (0, 0)))
    xi4pad = jnp.pad(xinp, ((0, 0), (Ti, Ti), (0, 0)))
    Hi = H // u + 8

    n_convs = len(_stage_convs(resblock, kernels, dilations))
    row_offs = []
    r = 0
    for k, d in _stage_convs(resblock, kernels, dilations):
        row_offs.append(r)
        r += len(conv_offsets(k, d, 1)) * C
    _dt = jnp.bfloat16 if bf16 else jnp.float32
    R8 = _round_up(r, 16 if bf16 else 8)  # bf16 tiles want 16 sublanes
    wcat = jnp.pad(wcat, ((0, R8 - r), (0, 0))).astype(_dt)
    n8 = _round_up(n_convs, 8)
    bcat = jnp.pad(bcat, ((0, n8 - n_convs), (0, 0)))

    tap_list, _ = upsample_taps(ku, u, u, 1)
    tap_deltas = tuple(d for d, _ in tap_list)
    if max(abs(d) for d in tap_deltas) > 8:
        raise ValueError(
            f"convT tap shifts {tap_deltas} exceed the expand kernel's "
            f"8-row input halo margin (ku={ku}, u={u})"
        )
    ru = len(tap_list) * Cin
    R8u = _round_up(ru, 16 if bf16 else 8)
    wups = jnp.pad(wups, ((0, R8u - ru), (0, 0))).astype(_dt)
    bups2 = jnp.zeros((8, u * C), bups.dtype).at[0].set(bups)

    kernel = _make_stage_kernel_ups_expand(
        resblock, kernels, dilations, C, Tt, H, L, tuple(row_offs),
        jnp.bfloat16 if bf16 else jnp.float32, u, Cin, Ti, Hi, tap_deltas,
        edge_mask=edge_mask,
    )
    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((Ti, Cin), lambda g: (g, 0)),
            pl.BlockSpec((Ti, Cin), lambda g: (g + 1, 0)),
            pl.BlockSpec((Ti, Cin), lambda g: (g + 2, 0)),
            pl.BlockSpec((R8, C), lambda g: (0, 0)),
            pl.BlockSpec((n8, C), lambda g: (0, 0)),
            pl.BlockSpec((R8u, u * C), lambda g: (0, 0)),
            pl.BlockSpec((8, u * C), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Tt, C), lambda g: (g, 0)),
    )

    def one(x1):
        with jax.default_matmul_precision("default"):
            y = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((T4p, C), jnp.float32),
                interpret=interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=int(100 * 1024 * 1024),
                ),
            )(x1, x1, x1, wcat, bcat, wups, bups2)
        return y[:L]

    return jax.vmap(one)(xi4pad)


def pack_stage_weights(rb_params: Sequence[dict], resblock: str, kernels,
                       dilations, C: int):
    """Fold one stage's resblock conv weights into the kernel's resident
    block: (sum_m m*C, s*C) f32 weight concat + (n_convs, s*C) biases."""
    s = 128 // C if (C < 128 and 128 % C == 0) else 1
    wts, bs = [], []
    for rb, (kr, dil) in zip(rb_params, zip(kernels, dilations)):
        for di, d in enumerate(dil):
            if resblock == "1":
                wts.append(fold_weight(rb["convs1"][di]["w"], kr, d, s))
                bs.append(jnp.tile(rb["convs1"][di]["b"], s))
                wts.append(fold_weight(rb["convs2"][di]["w"], kr, 1, s))
                bs.append(jnp.tile(rb["convs2"][di]["b"], s))
            else:
                wts.append(fold_weight(rb["convs"][di]["w"], kr, d, s))
                bs.append(jnp.tile(rb["convs"][di]["b"], s))
    return jnp.concatenate(wts, axis=0), jnp.stack(bs, axis=0)


def mrf_stage_pallas(rb_params: Sequence[dict], x: jnp.ndarray, *,
                     resblock: str, kernels, dilations, bf16: bool = True,
                     interpret: bool = False, upsample=None,
                     edge_mask: bool = False,
                     tile_rows: Optional[int] = None) -> jnp.ndarray:
    """Fused MRF stage: mean over resblocks of resblock_k(x).

    x (B, L, C) f32 -> (B, L, C) f32. Exact vs the base conv path up to
    dot rounding (bf16=False on CPU matches to f32 rounding).

    ``upsample=(ups_params, u)``: x is the PRE-upsample activation
    (B, Lin, Cin) and the stage's lrelu -> ConvTranspose1d(stride u) is
    fused in front of the MRF (model/hifi_gan.py:196-202 as one kernel).
    Requires u * (128/Cin) == 128/C; use upsample_fusable() to test.

    ``edge_mask``: skip the per-conv boundary re-zeroing on interior
    tiles via one lax.cond per tile (exact — gated in
    tests/test_mrf_pallas.py; opt-in pending hardware measurement).
    ``tile_rows``: override the time-tile size (test/tuning knob)."""
    if upsample is not None:
        ups, u = upsample
        B, Lin, Cin = x.shape
        ku = ups["w"].shape[0]
        C = ups["w"].shape[2]
        common = dict(
            resblock=resblock, kernels=tuple(kernels),
            dilations=tuple(tuple(d) for d in dilations),
            Lin=Lin, C=C, Cin=Cin, u=u, ku=ku,
            interpret=interpret, bf16=bf16,
            edge_mask=edge_mask, tile_rows=tile_rows,
        )
        wcat, bcat = pack_stage_weights(rb_params, resblock, kernels,
                                        dilations, C)
        if upsample_fusable(u, Cin, C, ku):
            s, s_in = 128 // C, 128 // Cin
            wups, bups = fold_upsample_weight(ups["w"], ups["b"], u, s, s_in)
            return _mrf_stage_ups_call(wcat, bcat, wups, bups, x, **common)
        if upsample_fusable_expand(u, Cin, C, ku):
            wups, bups = fold_upsample_weight(ups["w"], ups["b"], u, u, 1)
            return _mrf_stage_ups_expand_call(
                wcat, bcat, wups, bups, x, **common
            )
        raise ValueError(
            f"upsample fusion unsupported for u={u}, Cin={Cin}, C={C}"
        )
    B, L, C = x.shape
    wcat, bcat = pack_stage_weights(rb_params, resblock, kernels, dilations, C)
    return _mrf_stage_call(
        wcat, bcat, x,
        resblock=resblock, kernels=tuple(kernels),
        dilations=tuple(tuple(d) for d in dilations),
        L=L, C=C, interpret=interpret, bf16=bf16,
        edge_mask=edge_mask, tile_rows=tile_rows,
    )


def _taps_fit_halo(ku: int, u: int, s: int, s_in: int) -> bool:
    """The fused kernels give the input tile an 8-row halo margin for the
    convT row shifts; shipped configs (ku = 2u) use |shift| <= 2."""
    tap_list, _ = upsample_taps(ku, u, s, s_in)
    return max(abs(d) for d, _ in tap_list) <= 8


def upsample_fusable(u: int, Cin: int, C: int, ku: int) -> bool:
    """True when the stage's convT can fuse into its MRF kernel with the
    ALIGNED layout: both folded layouts exist and align 1:1
    (u * s_in == s — the u=2 late stages), and the tap shifts fit the
    kernel's input halo margin."""
    return (
        C < 128 and 128 % C == 0 and 128 % Cin == 0
        and u * (128 // Cin) == 128 // C
        and _taps_fit_halo(ku, u, 128 // C, 128 // Cin)
    )


def upsample_fusable_expand(u: int, Cin: int, C: int, ku: int) -> bool:
    """True when the stage's convT can fuse via the row-EXPAND path: the
    MRF runs unfolded (s == 1, C >= 128), u is a power of two <= 8 so
    the row-phase arithmetic divides the 8-aligned tile sizes (the u=8
    early stages), and the tap shifts fit the halo margin."""
    s = 128 // C if (C < 128 and 128 % C == 0) else 1
    return s == 1 and u in (2, 4, 8) and _taps_fit_halo(ku, u, u, 1)
