"""Equality gates for the fused Pallas MRF stage kernel
(tacotron2_tpu/ops/mrf_pallas.py) vs the base conv path — interpret mode
on the CPU mesh, f32 dots (bf16=False) so the comparison is exact up to
f32 rounding. Reference semantics: model/hifi_gan.py:20-151 (ResBlock1/2),
:154-216 (MRF mean)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig
from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.ops.mrf_pallas import mrf_stage_pallas


def _rb_params(rng, rb_type, kernels, dils, C):
    def conv(kr):
        return {
            "w": jnp.asarray(rng.standard_normal((kr, C, C)).astype(np.float32) * 0.05),
            "b": jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1),
        }

    rbs = []
    for kr, dil in zip(kernels, dils):
        if rb_type == "1":
            rbs.append({"convs1": [conv(kr) for _ in dil],
                        "convs2": [conv(kr) for _ in dil]})
        else:
            rbs.append({"convs": [conv(kr) for _ in dil]})
    return rbs


@pytest.mark.parametrize("rb_type,kernels,dils", [
    ("1", (3, 7, 11), ((1, 3, 5),) * 3),   # UNIVERSAL_V1 structure
    ("2", (3, 5), ((1, 3), (1, 3))),
])
@pytest.mark.parametrize("C", [32, 128])   # s = 4 (folded) and s = 1
def test_mrf_stage_kernel_matches_base(rb_type, kernels, dils, C):
    rng = np.random.default_rng(0)
    model = HiFiGAN(HiFiGANConfig(
        resblock=rb_type, resblock_kernel_sizes=kernels,
        resblock_dilation_sizes=dils))
    rbs = _rb_params(rng, rb_type, kernels, dils, C)
    for L in (333, 1024):  # non-multiple and multiple of every fold unit
        x = jnp.asarray(rng.standard_normal((2, L, C)).astype(np.float32))
        acc = None
        for j, (kr, dil) in enumerate(zip(kernels, dils)):
            y = model._resblock(rbs[j], x, kr, dil)
            acc = y if acc is None else acc + y
        ref = np.asarray(acc / len(kernels))
        got = np.asarray(mrf_stage_pallas(
            rbs, x, resblock=rb_type, kernels=kernels, dilations=dils,
            bf16=False, interpret=True))
        np.testing.assert_allclose(
            got, ref, atol=1e-5 * max(np.abs(ref).max(), 1e-3))


def test_hifigan_apply_mrf_pallas_matches_base():
    """Full generator with every stage's MRF through the fused kernel."""
    rng = np.random.default_rng(1)
    m = HiFiGAN(HiFiGANConfig(
        upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
        upsample_initial_channel=256, num_mels=16),
        Policy.from_string("32-true"))
    p = jax.tree.map(lambda a: a * 3.0, m.init(jax.random.PRNGKey(0)))
    mel = jnp.asarray(rng.standard_normal((2, 13, 16)).astype(np.float32))
    a = np.asarray(m.apply(p, mel))
    b = np.asarray(m.apply(p, mel, mrf_pallas=True, interpret=True))
    np.testing.assert_allclose(b, a, atol=1e-5 * max(np.abs(a).max(), 1e-3))


def test_hifigan_apply_fuse_ups_universal_all_stages():
    """fuse_ups on the full UNIVERSAL_V1 shape class (u=(8,8,2,2)): the
    u=8 early stages fuse via the row-EXPAND path (convT in u-folded
    layout + kron row-repeat + phase lane-select) and the u=2 late
    stages via the ALIGNED path — every stage's upsample runs inside its
    MRF kernel. Exact vs the unfused-Pallas path, single- and
    multi-tile."""
    rng = np.random.default_rng(3)
    m = HiFiGAN(HiFiGANConfig(
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=512, num_mels=16),
        Policy.from_string("32-true"))
    p = jax.tree.map(lambda a: a * 3.0, m.init(jax.random.PRNGKey(0)))
    for T in (7, 40):  # stage-2 (expand) and stage-3/4 (aligned) multi-tile at 40
        mel = jnp.asarray(rng.standard_normal((2, T, 16)).astype(np.float32))
        a = np.asarray(m.apply(p, mel, mrf_pallas=True, interpret=True))
        b = np.asarray(
            m.apply(p, mel, mrf_pallas=True, fuse_ups=True, interpret=True))
        np.testing.assert_allclose(
            b, a, atol=1e-5 * max(np.abs(a).max(), 1e-3))


def test_mrf_edge_mask_exact_multi_tile():
    """edge_mask=True skips the per-conv boundary re-zeroing on INTERIOR
    tiles via one lax.cond per tile; tile_rows forces multi-tile grids so
    both branches execute (interior AND edge). Must be bit-exact vs the
    always-masked path on all three kernel variants (base, aligned-ups,
    expand-ups)."""
    rng = np.random.default_rng(7)

    # base kernel, full UNIVERSAL resblock structure at C=32 (s=4):
    # tile_rows=24, L=500 -> 6 tiles, tiles 1..3 interior
    kernels, dils = (3, 7, 11), ((1, 3, 5),) * 3
    rbs = _rb_params(rng, "1", kernels, dils, 32)
    x = jnp.asarray(rng.standard_normal((1, 500, 32)).astype(np.float32))
    kw = dict(resblock="1", kernels=kernels, dilations=dils,
              bf16=False, interpret=True, tile_rows=24)
    ref = np.asarray(mrf_stage_pallas(rbs, x, **kw))
    got = np.asarray(mrf_stage_pallas(rbs, x, edge_mask=True, **kw))
    np.testing.assert_array_equal(got, ref)

    # aligned-ups kernel (u=2, Cin=64 -> C=32): tile_rows=16, Lin=200 ->
    # L=400, 7 tiles, tiles 1..4 interior
    kernels2, dils2 = (3,), ((1, 3),)
    rbs2 = _rb_params(rng, "2", kernels2, dils2, 32)
    ups = {
        "w": jnp.asarray(rng.standard_normal((4, 64, 32)).astype(np.float32) * 0.1),
        "b": jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1),
    }
    xin = jnp.asarray(rng.standard_normal((1, 200, 64)).astype(np.float32))
    kw2 = dict(resblock="2", kernels=kernels2, dilations=dils2,
               bf16=False, interpret=True, upsample=(ups, 2), tile_rows=16)
    ref2 = np.asarray(mrf_stage_pallas(rbs2, xin, **kw2))
    got2 = np.asarray(mrf_stage_pallas(rbs2, xin, edge_mask=True, **kw2))
    np.testing.assert_array_equal(got2, ref2)

    # expand-ups kernel (u=2, Cin=256 -> C=128, s=1): tile_rows=24,
    # Lin=96 -> L=192, 8 tiles, tiles 1..6 interior
    rbs3 = _rb_params(rng, "2", kernels2, dils2, 128)
    ups3 = {
        "w": jnp.asarray(rng.standard_normal((4, 256, 128)).astype(np.float32) * 0.05),
        "b": jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1),
    }
    xin3 = jnp.asarray(rng.standard_normal((1, 96, 256)).astype(np.float32))
    kw3 = dict(resblock="2", kernels=kernels2, dilations=dils2,
               bf16=False, interpret=True, upsample=(ups3, 2), tile_rows=24)
    ref3 = np.asarray(mrf_stage_pallas(rbs3, xin3, **kw3))
    got3 = np.asarray(mrf_stage_pallas(rbs3, xin3, edge_mask=True, **kw3))
    np.testing.assert_array_equal(got3, ref3)

    # generator-level knob plumbing (single-tile stages: edge branch)
    m = HiFiGAN(HiFiGANConfig(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=128, num_mels=16),
        Policy.from_string("32-true"))
    p = jax.tree.map(lambda a: a * 3.0, m.init(jax.random.PRNGKey(0)))
    mel = jnp.asarray(rng.standard_normal((1, 11, 16)).astype(np.float32))
    a = np.asarray(m.apply(p, mel, mrf_pallas=True, interpret=True))
    b = np.asarray(m.apply(p, mel, mrf_pallas=True, mrf_edge_mask=True,
                           interpret=True))
    np.testing.assert_array_equal(b, a)


def test_hifigan_apply_fuse_ups_matches_base():
    """fuse_ups: the stage's lrelu -> transposed conv fused INTO the MRF
    kernel (u=2 stages where the folded layouts align 1:1) must match
    both the unfused-Pallas and the base conv paths exactly. Covers a
    mixed stack (first stage u=4: fuses via the expand path at C=128),
    batch > 1, a length that doesn't divide the fold units, and both
    resblock types."""
    rng = np.random.default_rng(2)
    m = HiFiGAN(HiFiGANConfig(
        upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
        upsample_initial_channel=256, num_mels=16),
        Policy.from_string("32-true"))
    p = jax.tree.map(lambda a: a * 3.0, m.init(jax.random.PRNGKey(0)))
    mel = jnp.asarray(rng.standard_normal((2, 13, 16)).astype(np.float32))
    base = np.asarray(m.apply(p, mel))
    unfused = np.asarray(m.apply(p, mel, mrf_pallas=True, interpret=True))
    fused = np.asarray(
        m.apply(p, mel, mrf_pallas=True, fuse_ups=True, interpret=True))
    tol = 1e-5 * max(np.abs(base).max(), 1e-3)
    np.testing.assert_allclose(fused, unfused, atol=tol)
    np.testing.assert_allclose(fused, base, atol=tol)

    m2 = HiFiGAN(HiFiGANConfig(
        resblock="2", upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=128, num_mels=16,
        resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 3), (1, 3))),
        Policy.from_string("32-true"))
    p2 = jax.tree.map(lambda a: a * 3.0, m2.init(jax.random.PRNGKey(1)))
    mel2 = jnp.asarray(rng.standard_normal((1, 9, 16)).astype(np.float32))
    a2 = np.asarray(m2.apply(p2, mel2, mrf_pallas=True, interpret=True))
    b2 = np.asarray(
        m2.apply(p2, mel2, mrf_pallas=True, fuse_ups=True, interpret=True))
    np.testing.assert_allclose(
        b2, a2, atol=1e-5 * max(np.abs(a2).max(), 1e-3))
