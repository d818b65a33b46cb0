"""A/B bench: hoisted-dW training step with the XLA forward scan vs the
launch-resident Pallas forward kernel (ops/train_decode_pallas.py), same
process, flagship dims, real hardware.

Usage: python tools/train_pallas_bench.py [batch ...]   (default 8 32 64)
Env: SWEEP_FRAMES=512
"""

import os
import sys
import time

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

from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tacotron2_tpu.training.losses import tacotron2_loss
from tacotron2_tpu.training.optimizer import make_optimizer

FRAMES = int(os.environ.get("SWEEP_FRAMES", "512"))


def main():
    batches = [int(x) for x in sys.argv[1:]] or [8, 32, 64]
    cfg = Tacotron2Config(
        num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
        prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
        postnet_dim=512, dropout=0.5,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 1e-6)
    opt_state = tx.init(params)

    for B in batches:
        rng = np.random.default_rng(0)
        batch = {
            "chars_idx": jnp.asarray(rng.integers(1, 40, size=(B, 128)).astype(np.int64)),
            "chars_len": jnp.full((B,), 128, jnp.int32),
            "mel": jnp.asarray(rng.standard_normal((B, FRAMES, 80)).astype(np.float32)),
            "mel_len": jnp.full((B,), FRAMES, jnp.int32),
            "gate": jnp.ones((B, FRAMES, 1), jnp.float32),
        }

        # fwd* modes time the forward only (no grad/optimizer) — for
        # decomposing where the step time goes
        modes = [("xla ", False, None, True), ("plas", True, "xla", True),
                 ("pbwd", True, "pallas", True),
                 ("fwdX", False, None, False), ("fwdP", True, "xla", False)]
        if os.environ.get("BENCH_MODES"):
            want = [w.strip() for w in os.environ["BENCH_MODES"].split(",")]
            modes = [m for m in modes if m[0].strip() in want]
        else:
            modes = [m for m in modes if m[3]]
        for label, pallas, bwd, with_grad in modes:
            def step(params, opt_state, batch, rng, pal=pallas, bw=bwd,
                     wg=with_grad):
                def loss_fn(p):
                    out, _ = model.forward_teacher(
                        p, state, batch["chars_idx"], batch["chars_len"],
                        batch["mel"], batch["mel_len"], rng=rng, train=True,
                        dw_hoist=True, pallas_train=pal, pallas_bwd=bw,
                    )
                    loss, _ = tacotron2_loss(
                        out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
                    )
                    return loss
                if not wg:
                    return loss_fn(params), params, opt_state
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, new_opt = tx.update(grads, opt_state, params)
                new_params = jax.tree.map(lambda p, q: p + q, params, updates)
                return loss, new_params, new_opt

            try:
                comp = jax.jit(step).lower(params, opt_state, batch, jax.random.PRNGKey(0)).compile()
                l, p2, o2 = comp(params, opt_state, batch, jax.random.PRNGKey(0))
                float(l)

                # HONEST timing (PERF.md methodology): chain k steps
                # device-side between scalar fetches and take the slope
                # over two chain lengths — cancels the ~25-30 ms tunnel
                # transport that a fetch-per-step loop would add to every
                # step (the r1/r2 bench numbers carried that bias).
                def chain(k):
                    l2, p2, o2 = comp(params, opt_state, batch, jax.random.PRNGKey(0))
                    for i in range(k - 1):
                        l2, p2, o2 = comp(p2, o2, batch, jax.random.PRNGKey(i + 1))
                    float(l2)

                def t_of(k, iters=5):
                    chain(k)  # warm
                    ts = []
                    for _ in range(iters):
                        t0 = time.perf_counter()
                        chain(k)
                        ts.append(time.perf_counter() - t0)
                    ts.sort()
                    return ts[len(ts) // 2]

                t = (t_of(8) - t_of(2)) / 6
                print(f"B={B} frames={FRAMES} {label}: {t*1e3:.1f} ms/step "
                      f"= {B*FRAMES/t/1e3:.0f}k mel frames/s/chip  loss={float(l):.4f}",
                      flush=True)
            except Exception as e:
                print(f"B={B} {label}: FAIL {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
