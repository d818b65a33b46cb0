"""Probe the per-step host->device input cost on the real transport.

The burn-in's honest counter (~100k frames/s at B=32) sits well below the
slope-timed device bound (361k, PERF.md training table). This measures the
candidate culprits in isolation on the live device:

  1. shard_batch of a realistic training batch (5 arrays, ~5.3 MB)
  2. one packed device_put of the same bytes (1 array)
  3. per-array device_put latency at tiny sizes (fixed RPC cost)

    python tools/input_transfer_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from tacotron2_tpu.parallel import make_mesh_for_batch, shard_batch


def timed(fn, iters=20):
    # warm once, then median of per-iter walls (block on completion each
    # iter: transfers are host-synchronous on this transport anyway)
    fn()
    walls = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls))


def main() -> None:
    B, F, C = 32, 512, 183
    batch = {
        "chars": np.zeros((B, C), np.int32),
        "chars_len": np.full((B,), C, np.int32),
        "mel": np.zeros((B, F, 80), np.float32),
        "mel_len": np.full((B,), F, np.int32),
        "gate": np.zeros((B, F), np.float32),
    }
    mesh = make_mesh_for_batch(B)
    nbytes = sum(v.nbytes for v in batch.values())
    print(f"batch bytes: {nbytes/1e6:.2f} MB over {len(batch)} arrays")

    t = timed(lambda: list(shard_batch(batch, mesh).values()))
    print(f"shard_batch (5 x device_put): {t*1e3:.1f} ms")

    packed = np.zeros(nbytes, np.uint8)
    t = timed(lambda: jax.device_put(packed))
    print(f"packed single device_put ({nbytes/1e6:.2f} MB): {t*1e3:.1f} ms")

    for size in (4, 1024, 128 * 1024, 1024 * 1024, 5 * 1024 * 1024):
        a = np.zeros(size, np.uint8)
        t = timed(lambda: jax.device_put(a))
        print(f"device_put {size/1024:.0f} KiB: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
