"""Hardware sweep of the fused decode kernel: (quantize, resident_cols,
chunk_width, batch) -> µs/step, vs the XLA while_loop path. Honest timing
(scalar fetch + two-size slope, see bench.py / PERF.md).

Usage: python tools/fused_sweep.py [B ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config


def timed(comp, args, iters=5):
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        s = comp(*args, jax.random.PRNGKey(i))
        float(s)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def us_per_step(build, params, state, chars, lens, la=512, lb=2048):
    comps = {}
    for ml in (la, lb):
        fn = build(ml)
        comps[ml] = jax.jit(fn).lower(params, state, chars, lens, jax.random.PRNGKey(0)).compile()
        float(comps[ml](params, state, chars, lens, jax.random.PRNGKey(0)))
    args = (params, state, chars, lens)
    return (timed(comps[lb], args) - timed(comps[la], args)) / (lb - la) * 1e6


def main():
    batches = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    cfg = Tacotron2Config(
        num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
        prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
        postnet_dim=512, dropout=0.5,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params, state = model.init(jax.random.PRNGKey(0))
    params["decoder"]["gate"]["b"] = jnp.full_like(params["decoder"]["gate"]["b"], 10.0)

    for B in batches:
        rng = np.random.default_rng(0)
        chars = jnp.asarray(rng.integers(1, 40, size=(B, 128)).astype(np.int64))
        lens = jnp.full((B,), 128, dtype=jnp.int64)

        def xla(ml):
            def fn(params, state, chars, lens, rng):
                out = model.forward_infer(params, state, chars, lens, ml, rng=rng)
                return jnp.sum(out.mels_post)
            return fn

        print(f"B={B} XLA while_loop: {us_per_step(xla, params, state, chars, lens):.1f} us/step", flush=True)

        for quant in (False, True):
            for rc in (0, 1024, 2048, 3072):
                for cw in ((1024, 2048) if quant else (512, 1024)):
                    if (4096 - rc) % cw or 4096 - rc < cw:
                        continue
                    def fused(ml, q=quant, r=rc, c=cw):
                        def fn(params, state, chars, lens, rng):
                            out = model.forward_infer_fused(
                                params, state, chars, lens, ml, rng=rng,
                                quantize=q, resident_cols=r, chunk_width=c,
                            )
                            return jnp.sum(out.mels_post)
                        return fn
                    try:
                        t = us_per_step(fused, params, state, chars, lens)
                        print(f"  B={B} {'int8' if quant else 'bf16'} RC={rc} CW={cw}: {t:.1f} us/step", flush=True)
                    except Exception as e:
                        print(f"  B={B} {'int8' if quant else 'bf16'} RC={rc} CW={cw}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
