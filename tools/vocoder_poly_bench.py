"""A/B the polyphase-by-dilation MRF (HiFiGAN.apply(mrf_poly=...)) against
the base XLA conv path on real hardware — honest slope timing (two workload
sizes cancel the ~25-30 ms tunnel transport), ABAB interleaved rounds.

Usage: python tools/vocoder_poly_bench.py [frames1 frames2 rounds [variants]]
(``variants``: comma-separated subset of the VARIANTS keys, e.g.
``base,pallas_all`` — cold XLA compiles through the tunnel take minutes,
so a full 7-variant sweep can exceed 20 min.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.environ.get(
    "TACOTRON2_COMPILE_CACHE", os.path.expanduser("~/.cache/tacotron2_tpu/jax")
)
if _cache and jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig
from tacotron2_tpu.models.layers import Policy
from tools.vocoder_decompose import slope_time

VARIANTS = {
    # mrf_pallas AND fuse_ups default to "auto" (= ON on TPU since r4d:
    # fuse_ups measured 6.93 vs 8.33 µs/frame), so every variant pins
    # both explicitly — dict() would A/B the production path against
    # itself
    "base": dict(mrf_pallas=False),
    "pallas_all": dict(mrf_pallas=True, fuse_ups=False),
    # r4b: upsample convT fused INTO every stage's kernel (now default)
    "fuse_ups": dict(mrf_pallas=True, fuse_ups=True),
    # r4c: per-conv boundary masks skipped on interior tiles (lax.cond;
    # ~2x kernel body). MEASURED SLOWER r4 (9.37/7.04 vs 8.33/6.93) —
    # kept for re-measurement if Mosaic's cond codegen improves
    "pallas_edge": dict(mrf_pallas=True, fuse_ups=False, mrf_edge_mask=True),
    "fuse_edge": dict(mrf_pallas=True, fuse_ups=True, mrf_edge_mask=True),
    "pallas_late2": dict(mrf_pallas=(False, False, True, True), fuse_ups=False),
    "pallas_s1": dict(mrf_pallas=(True, False, False, False), fuse_ups=False),
    "pallas_s2": dict(mrf_pallas=(False, True, False, False), fuse_ups=False),
    "pallas_s3": dict(mrf_pallas=(False, False, True, False), fuse_ups=False),
    "pallas_s4": dict(mrf_pallas=(False, False, False, True), fuse_ups=False),
}


def main():
    args = [int(x) for x in sys.argv[1:4]]
    f1, f2 = (args[0], args[1]) if len(args) >= 2 else (512, 2048)
    rounds = args[2] if len(args) >= 3 else 2
    variants = VARIANTS
    if len(sys.argv) >= 5:
        keys = sys.argv[4].split(",")
        variants = {k: VARIANTS[k] for k in keys}

    cfg = HiFiGANConfig()  # UNIVERSAL_V1
    model = HiFiGAN(cfg, Policy.from_string("bf16-mixed"))
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    mel1 = jnp.asarray(rng.standard_normal((1, f1, 80)).astype(np.float32))
    mel2 = jnp.asarray(rng.standard_normal((1, f2, 80)).astype(np.float32))

    results = {k: [] for k in variants}
    for rnd in range(rounds):
        for name, kw in variants.items():
            t = slope_time(
                lambda m, kw=kw: model.apply(params, m, **kw), mel1, mel2
            )
            results[name].append(t * 1e6)
            print(f"round {rnd} {name:12s} {t*1e6:7.2f} us/frame", flush=True)
    print()
    for name, ts in results.items():
        print(
            f"{name:12s} min {min(ts):7.2f} us/frame"
            f"  (runs: {[round(t, 2) for t in ts]})"
        )


if __name__ == "__main__":
    main()
