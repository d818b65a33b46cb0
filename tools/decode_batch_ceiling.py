"""Map the fused-decode batch ceiling (VERDICT r2 #4): fused kernel
(batch-aware residency default + FULL residency) vs the XLA while_loop at
serving batches, honest slope timing. Feeds the forward_infer_fast
crossover and the PERF.md table.

Usage: python tools/decode_batch_ceiling.py [B ...]   (default 32 64 128)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tools.fused_sweep import us_per_step


def main():
    batches = [int(x) for x in sys.argv[1:]] or [32, 64, 128]
    cfg = Tacotron2Config(
        num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
        prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
        postnet_dim=512, dropout=0.5,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params, state = model.init(jax.random.PRNGKey(0))
    params["decoder"]["gate"]["b"] = jnp.full_like(params["decoder"]["gate"]["b"], 10.0)

    la, lb = (256, 1024)  # shorter chains at big batch keep runs bounded
    for B in batches:
        rng = np.random.default_rng(0)
        chars = jnp.asarray(rng.integers(1, 40, size=(B, 128)).astype(np.int64))
        lens = jnp.full((B,), 128, dtype=jnp.int64)

        def xla(ml):
            def fn(params, state, chars, lens, rng):
                out = model.forward_infer(params, state, chars, lens, ml, rng=rng)
                return jnp.sum(out.mels_post)
            return fn

        try:
            t = us_per_step(xla, params, state, chars, lens, la=la, lb=lb)
            print(f"B={B} XLA while_loop: {t:.1f} us/step = "
                  f"{B/t*1e6/1e6:.2f}M frames/s", flush=True)
        except Exception as e:
            print(f"B={B} XLA: FAIL {str(e)[:160]}", flush=True)

        for label, kw in (("fused default", {}),
                          ("fused FULL", {"resident_cols": 4096}),
                          ("fused int8", {"quantize": True})):
            def fused(ml, kw=kw):
                def fn(params, state, chars, lens, rng):
                    out = model.forward_infer_fused(
                        params, state, chars, lens, ml, rng=rng, **kw)
                    return jnp.sum(out.mels_post)
                return fn
            try:
                t = us_per_step(fused, params, state, chars, lens, la=la, lb=lb)
                print(f"  B={B} {label}: {t:.1f} us/step = "
                      f"{B/t*1e6/1e6:.2f}M frames/s", flush=True)
            except Exception as e:
                print(f"  B={B} {label}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
