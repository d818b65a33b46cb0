"""Training-step throughput sweep (VERDICT r1 weak #2 / next #3).

Times the full jitted train step (teacher-forced scan + loss + backward +
Adam) on real hardware at flagship dims, sweeping the decode-scan unroll
factor — the lever against the dW-accumulator read-modify-write that
dominates training HBM traffic (PERF.md "where the training time goes").

Usage: python tools/train_step_sweep.py [batch ...]
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
from tacotron2_tpu.training.losses import tacotron2_loss
from tacotron2_tpu.training.optimizer import make_optimizer

FRAMES = int(os.environ.get("SWEEP_FRAMES", "512"))


def main():
    batches = [int(x) for x in sys.argv[1:]] or [32]
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

        for unroll in (1, 2, 4, 8):
            def step(params, opt_state, batch, rng, u=unroll):
                def loss_fn(p):
                    out, _ = model.forward_teacher(
                        p, state, batch["chars_idx"], batch["chars_len"],
                        batch["mel"], batch["mel_len"], rng=rng, train=True,
                        remat=True, scan_unroll=u,
                    )
                    loss, _ = tacotron2_loss(
                        out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
                    )
                    return loss
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, new_opt = tx.update(grads, opt_state, params)
                new_params = jax.tree.map(lambda p, q: p + q, params, updates)
                return loss, new_params, new_opt

            try:
                comp = jax.jit(step).lower(params, opt_state, batch, jax.random.PRNGKey(0)).compile()
                l, p2, o2 = comp(params, opt_state, batch, jax.random.PRNGKey(0))
                float(l)

                # chained-step slope timing — cancels the ~28 ms tunnel
                # transport a fetch-per-step loop adds (see
                # train_pallas_bench.py / PERF.md)
                def chain(k):
                    l2, p2, o2 = comp(params, opt_state, batch, jax.random.PRNGKey(0))
                    for i in range(k - 1):
                        l2, p2, o2 = comp(p2, o2, batch, jax.random.PRNGKey(i + 1))
                    float(l2)

                def t_of(k, iters=4):
                    chain(k)
                    ts = []
                    for _ in range(iters):
                        t0 = time.perf_counter()
                        chain(k)
                        ts.append(time.perf_counter() - t0)
                    ts.sort()
                    return ts[len(ts) // 2]

                t = (t_of(8) - t_of(2)) / 6
                print(f"B={B} frames={FRAMES} unroll={unroll}: {t*1e3:.1f} ms/step "
                      f"= {B*FRAMES/t/1e3:.0f}k mel frames/s/chip", flush=True)
            except Exception as e:
                print(f"B={B} unroll={unroll}: FAIL {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
