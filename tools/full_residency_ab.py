"""Same-process A/B of the fused decode residency split: RC=4H-128 (one
streamed 128-col chunk per frame, the r2 default) vs RC=4H (FULL residency,
zero streamed columns). Honest slope timing (see bench.py / PERF.md).

Usage: python tools/full_residency_ab.py [B ...]   (default 1 32)
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
    batches = [int(x) for x in sys.argv[1:]] or [1, 32]
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
        for rc in (3968, 4096):
            def fused(ml, r=rc):
                def fn(params, state, chars, lens, rng):
                    out = model.forward_infer_fused(
                        params, state, chars, lens, ml, rng=rng,
                        resident_cols=r,
                    )
                    return jnp.sum(out.mels_post)
                return fn
            t = us_per_step(fused, params, state, chars, lens)
            print(f"B={B} bf16 RC={rc}: {t:.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
