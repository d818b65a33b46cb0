"""Benchmark harness — runs on real TPU hardware (driver contract).

Measures the north-star path (SURVEY §3.1 / BASELINE.md): free-running
Tacotron 2 decode (the `say` hot loop) on the flagship ~28M-param config,
bf16 compute. Reports mel frames/sec/chip; vs_baseline is measured against
the driver-set target of RTF < 0.05 (i.e. 86.13 frames-of-audio/s / 0.05 =
1722.6 mel frames/s/chip) — the reference publishes no numbers of its own
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

FRAMES_PER_SEC_AUDIO = 22050 / 256  # 86.13 (BASELINE.md audio frame math)
TARGET_RTF = 0.05


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # say path is batch-1
    chars_len = int(os.environ.get("BENCH_CHARS", "128"))
    max_len = int(os.environ.get("BENCH_FRAMES", "1000"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    cfg = Tacotron2Config(
        num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
        prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
        postnet_dim=512, dropout=0.5,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params, state = model.init(jax.random.PRNGKey(0))
    # keep the gate open so the loop decodes all max_len frames (worst case)
    params["decoder"]["gate"]["b"] = jnp.full_like(params["decoder"]["gate"]["b"], 10.0)

    rng = np.random.default_rng(0)
    chars = jnp.asarray(rng.integers(1, 40, size=(batch, chars_len)).astype(np.int64))
    lens = jnp.full((batch,), chars_len, dtype=jnp.int64)

    @jax.jit
    def say(params, state, chars, lens, rng):
        out = model.forward_infer(params, state, chars, lens, max_len, rng=rng)
        return out.mels_post, out.n_frames

    # warmup/compile
    mels, n = say(params, state, chars, lens, jax.random.PRNGKey(0))
    mels.block_until_ready()
    assert int(n) == max_len, f"decode stopped early at {int(n)}"

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        mels, n = say(params, state, chars, lens, jax.random.PRNGKey(i))
        mels.block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    frames_per_sec = batch * max_len / best
    rtf = (best / batch) / (max_len / FRAMES_PER_SEC_AUDIO)
    target_fps = FRAMES_PER_SEC_AUDIO / TARGET_RTF

    print(
        json.dumps(
            {
                "metric": "mel_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 2),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / target_fps, 3),
            }
        )
    )
    print(
        f"# say RTF {rtf:.4f} (target < {TARGET_RTF}), batch={batch}, "
        f"frames={max_len}, best of {iters}: {best * 1e3:.1f} ms, "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
