"""Sustained-load serving A/B (VERDICT r4 #2): steady-state req/s of
back-to-back micro-batch windows, strictly sequential (depth=1, the r4
behavior) vs pipelined double-buffering (depth=2 — window N+1's decode
dispatches while window N's int16 wavs stream down the tunnel).

The r4 phase probe showed ~70% of a K=64 window is the wav fetch with the
chip idle; double-buffering should move steady-state toward
max(fetch, compute) instead of fetch + compute. The counter-hypothesis
(why it could LOSE on this harness): a second dispatching thread steals
GIL/CPU from the 1-core host's transport RPC processing — exactly what
sank DevicePrefetcher at low worker counts (PERF.md).

Protocol: each round runs one timed PHASE per mode (ABAB order alternates
round-to-round), each phase = `windows` back-to-back windows of K
requests through run.server._synthesize_batch on a ThreadPoolExecutor
with `depth` in-flight slots. Per-phase wall / windows = ms/window;
median over rounds per mode. Same bundle, same compiled programs.

Usage: python tools/server_sustained_bench.py [K max_len rounds windows]
       (default 64 256 5 6)
"""

import json
import os
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.environ.get(
    "TACOTRON2_COMPILE_CACHE", os.path.expanduser("~/.cache/tacotron2_tpu/jax")
)
if _cache and jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.server_bench import TEXTS, build_bundle  # noqa: E402


def run_phase(bundle, K: int, depth: int, windows: int, tag: str) -> float:
    """Run `windows` back-to-back K-request windows with up to `depth`
    in flight; returns wall seconds for the whole phase."""
    from run.server import _synthesize_batch

    outdir = "/tmp/server_sustained"
    os.makedirs(outdir, exist_ok=True)

    def make_reqs(w):
        return [
            {"text": TEXTS[i % len(TEXTS)], "seed": i,
             "out_path": f"{outdir}/{tag}_{w}_{i}.wav", "use_vocoder": True}
            for i in range(K)
        ]

    pool = ThreadPoolExecutor(max_workers=depth)
    inflight = deque()
    t0 = time.perf_counter()
    for w in range(windows):
        while len(inflight) >= depth:
            inflight.popleft().result()
        inflight.append(pool.submit(_synthesize_batch, bundle, make_reqs(w)))
    while inflight:
        inflight.popleft().result()
    dt = time.perf_counter() - t0
    pool.shutdown(wait=True)
    return dt


def main():
    args = [int(x) for x in sys.argv[1:]]
    K = args[0] if len(args) >= 1 else 64
    max_len = args[1] if len(args) >= 2 else 256
    rounds = args[2] if len(args) >= 3 else 5
    windows = args[3] if len(args) >= 4 else 6

    from run.server import _synthesize_batch

    bundle = build_bundle(max_len)
    print("warming (compiles)...", flush=True)
    run_phase(bundle, K, 1, 1, "warm")
    run_phase(bundle, K, 2, 2, "warm2")

    t1, t2 = [], []
    for r in range(rounds):
        order = ((1, t1), (2, t2)) if r % 2 == 0 else ((2, t2), (1, t1))
        for depth, acc in order:
            dt = run_phase(bundle, K, depth, windows, f"r{r}d{depth}")
            acc.append(dt / windows)
        print(f"round {r}: depth1 {t1[-1]*1e3:.0f} ms/window, "
              f"depth2 {t2[-1]*1e3:.0f} ms/window", flush=True)

    med1 = sorted(t1)[len(t1) // 2]
    med2 = sorted(t2)[len(t2) // 2]
    print(json.dumps({
        "K": K, "max_len": max_len, "rounds": rounds, "windows": windows,
        "depth1_ms_per_window": round(med1 * 1e3, 1),
        "depth2_ms_per_window": round(med2 * 1e3, 1),
        "depth1_rps": round(K / med1, 1),
        "depth2_rps": round(K / med2, 1),
        "pipelining_speedup": round(med1 / med2, 3),
        "d1_all_ms": [round(x * 1e3) for x in t1],
        "d2_all_ms": [round(x * 1e3) for x in t2],
    }))


if __name__ == "__main__":
    main()
