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

# persistent compile cache (same default as main.py): tunnel compiles of
# the fused path can take minutes and vary; cached executables reload in
# seconds, so the benchmark measures the device, not the compile helper
_cache = os.environ.get(
    "TACOTRON2_COMPILE_CACHE", os.path.expanduser("~/.cache/tacotron2_tpu/jax")
)
if _cache and jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

FRAMES_PER_SEC_AUDIO = 22050 / 256  # 86.13 (BASELINE.md audio frame math)
TARGET_RTF = 0.05


def _timed_once(comp, args, i):
    """Wall time of one call with an HONEST fence: on some transports (the
    axon tunnel) block_until_ready returns before execution, so the jitted
    fn returns scalars and we fetch them."""
    t0 = time.perf_counter()
    s, n = comp(*args, jax.random.PRNGKey(i))
    float(s)  # device->host scalar fetch fences the computation
    return time.perf_counter() - t0


def _slope(comp_a, comp_b, args, rounds, reps, dn):
    """Per-step time via INTERLEAVED A/B slope rounds.

    The tunnel's fixed transport latency DRIFTS on a seconds timescale;
    timing all A iters then all B iters bakes that drift into the slope
    (observed: 5.3-15.0 µs/step across bench runs whose true value is
    ~9-12). Each round times the two workload sizes back-to-back
    (median of ``reps`` each, order alternating round-to-round to cancel
    any monotone trend) and yields its own slope; the MEDIAN over rounds
    is robust to a latency step mid-benchmark. Same fix as the vocoder
    bench's ABAB protocol (tools/vocoder_poly_bench.py)."""

    def med(comp, base):
        ts = sorted(_timed_once(comp, args, base + i) for i in range(reps))
        return ts[len(ts) // 2]

    slopes = []
    for r in range(rounds):
        if r % 2 == 0:
            ta = med(comp_a, 2 * r * reps)
            tb = med(comp_b, (2 * r + 1) * reps)
        else:
            tb = med(comp_b, 2 * r * reps)
            ta = med(comp_a, (2 * r + 1) * reps)
        slopes.append((tb - ta) / dn)
    slopes.sort()
    median = max(slopes[len(slopes) // 2], 1e-9)
    # dispersion (VERDICT r4 #3): the tunnel's transport drift makes the
    # per-round slopes scatter; emit the spread so the artifact itself
    # distinguishes a real regression from measurement weather
    q1 = slopes[len(slopes) // 4]
    q3 = slopes[(3 * len(slopes)) // 4]
    return median, {"rounds": rounds, "slope_iqr_us": (q3 - q1) * 1e6,
                    "slopes_us": [round(s * 1e6, 2) for s in slopes]}


def _require_backend(timeout_s: float):
    """Fail fast (one JSON error line, exit 1) when the TPU tunnel is
    down: backend init then HANGS indefinitely (observed: bare
    jax.devices() never returns during an axon outage), which would leave
    the driver's bench run stuck with no record at all."""
    import threading

    devs = []
    t = threading.Thread(target=lambda: devs.append(jax.devices()), daemon=True)
    t.start()
    t.join(timeout_s)
    if not devs:
        print(json.dumps({
            "metric": "mel_frames_per_sec_per_chip", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0,
            "error": f"TPU backend init exceeded {timeout_s:.0f}s "
                     "(tunnel down?) — no measurement",
        }))
        sys.exit(1)


def main():
    _require_backend(float(os.environ.get("BENCH_INIT_TIMEOUT", "900")))
    batch = int(os.environ.get("BENCH_BATCH", "1"))  # say path is batch-1
    chars_len = int(os.environ.get("BENCH_CHARS", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    # two workload sizes: the slope cancels fixed dispatch/transport latency
    len_a = int(os.environ.get("BENCH_FRAMES_A", "512"))
    len_b = int(os.environ.get("BENCH_FRAMES_B", "2048"))

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

    use_int8 = os.environ.get("BENCH_INT8") == "1"  # fused int8 mode
    use_xla = os.environ.get("BENCH_XLA") == "1"  # legacy XLA while_loop

    comps = {}
    for ml in (len_a, len_b):
        def say(params, state, chars, lens, rng, ml=ml):
            if use_int8:
                out = model.forward_infer_fused(
                    params, state, chars, lens, ml, rng=rng, quantize=True
                )
            elif use_xla:
                out = model.forward_infer(params, state, chars, lens, ml, rng=rng)
            else:  # the production path: fused resident kernel on TPU
                out = model.forward_infer_fast(params, state, chars, lens, ml, rng=rng)
            return jnp.sum(out.mels_post), out.n_frames
        comps[ml] = jax.jit(say).lower(
            params, state, chars, lens, jax.random.PRNGKey(0)
        ).compile()
        s, n = comps[ml](params, state, chars, lens, jax.random.PRNGKey(0))
        float(s)
        assert int(n) == ml, f"decode stopped early at {int(n)}"

    args = (params, state, chars, lens)
    # warm both executables once more before timing (first fetch after
    # compile can carry cache-load / allocation one-offs)
    _timed_once(comps[len_a], args, 0)
    _timed_once(comps[len_b], args, 0)
    sec_per_step, spread = _slope(
        comps[len_a], comps[len_b], args,
        rounds=int(os.environ.get("BENCH_ROUNDS", "7")), reps=iters,
        dn=len_b - len_a,
    )

    frames_per_sec = batch / sec_per_step
    rtf = sec_per_step * FRAMES_PER_SEC_AUDIO / batch
    target_fps = FRAMES_PER_SEC_AUDIO / TARGET_RTF

    # MFU accounting (utils/flops.py): analytic FLOPs for the measured
    # workload -> achieved TFLOP/s and % of the v5e peak for the dtype
    from tacotron2_tpu.utils.flops import (
        V5E_BF16_TFLOPS, V5E_INT8_TOPS, decode_step_flops, mfu,
    )
    peak = V5E_INT8_TOPS if use_int8 else V5E_BF16_TFLOPS
    tf, frac = mfu(decode_step_flops(cfg, chars_len), frames_per_sec, peak)

    print(
        json.dumps(
            {
                "metric": "mel_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 2),
                "unit": "frames/s",
                "vs_baseline": round(frames_per_sec / target_fps, 3),
                "achieved_tflops": round(tf, 2),
                "mfu_pct": round(100 * frac, 2),
                # measurement self-description (VERDICT r4 #3): per-round
                # slope median/IQR over `rounds` interleaved A/B rounds.
                # Expected B=1 band on this tunnel (PERF.md "Bench
                # dispersion"): median 9-13 µs/step = 77k-111k frames/s;
                # values inside the band are transport drift, not a
                # kernel regression.
                "us_per_step_median": round(sec_per_step * 1e6, 2),
                "us_per_step_iqr": round(spread["slope_iqr_us"], 2),
                "rounds": spread["rounds"],
                "slopes_us": spread["slopes_us"],
            }
        )
    )
    print(
        f"# say RTF {rtf:.4f} (target < {TARGET_RTF}), batch={batch}, "
        f"{sec_per_step * 1e6:.1f} us/step (median slope over {len_a}->{len_b} "
        f"frames, interleaved rounds), device={jax.devices()[0].device_kind}, "
        f"{tf:.1f} TF/s = {100 * frac:.1f}% of {peak:.0f} "
        f"{'TOP/s int8' if use_int8 else 'TFLOP/s bf16'} peak",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
