"""Verify the transport's H2D/execute serialization ("transfer fence") and
project the grouped-dispatch win.

Four timings of 48 flagship train steps (chained, donated state, fixed
shapes, warm cache):
  A. steps only (the PERF.md chained bound)
  B. steps + one 5.3 MB device_put per step   (per-step feeding — train loop)
  C. steps + K-grouped puts every K steps     (grouped feeding, K=8)
  D. steps + one stacked K-batch put per K    (single big put per group)

If puts fence against in-flight executes, B >> A and C/D ≈ A + transfer.

    python tools/transfer_fence_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.expanduser("~/.cache/tacotron2_tpu/jax")
if jax.config.jax_compilation_cache_dir is None:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tacotron2_tpu.training.losses import tacotron2_loss
from tacotron2_tpu.training.optimizer import make_optimizer

B, F, K, N = 32, 512, 8, 48


def main():
    cfg = Tacotron2Config(
        num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
        prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
        postnet_dim=512, dropout=0.5,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params, state = model.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(1e-3, 1e-6)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    batch = {
        "chars_idx": jnp.asarray(rng.integers(1, 40, size=(B, 128)).astype(np.int64)),
        "chars_len": jnp.full((B,), 128, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, F, 80)).astype(np.float32)),
        "mel_len": jnp.full((B,), F, jnp.int32),
        "gate": jnp.ones((B, F, 1), jnp.float32),
    }

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            out, _ = model.forward_teacher(
                p, state, batch["chars_idx"], batch["chars_len"],
                batch["mel"], batch["mel_len"], rng=rng, train=True,
                dw_hoist=True, pallas_train=True, pallas_bwd="pallas",
            )
            loss, _ = tacotron2_loss(
                out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
            )
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return loss, jax.tree.map(lambda p, q: p + q, params, updates), new_opt

    comp = jax.jit(step).lower(params, opt_state, batch, jax.random.PRNGKey(0)).compile()
    l, p2, o2 = comp(params, opt_state, batch, jax.random.PRNGKey(0))
    float(l)

    host = np.zeros((B, F, 80), np.float32)            # 5.2 MB
    host_k = np.zeros((K, B, F, 80), np.float32)        # 42 MB

    from tacotron2_tpu.parallel import batch_sharding, make_mesh_for_batch, shard_batch
    mesh = make_mesh_for_batch(B)
    sh = batch_sharding(mesh)
    host_batch = {
        "chars_idx": np.zeros((B, 128), np.int64),
        "chars_len": np.full((B,), 128, np.int32),
        "mel": np.zeros((B, F, 80), np.float32),
        "mel_len": np.full((B,), F, np.int32),
        "gate": np.zeros((B, F), np.float32),
    }

    def run(mode):
        l2, p2, o2 = comp(params, opt_state, batch, jax.random.PRNGKey(0))
        sink = []
        for i in range(N - 1):
            if mode == "B":
                sink.append(jax.device_put(host))
            elif mode == "E":
                sink.append(jax.device_put(host, sh))
            elif mode == "F":
                sink.append(shard_batch(host_batch, mesh))
            elif mode == "C" and i % K == 0:
                sink.extend(jax.device_put(host) for _ in range(K))
            elif mode == "D" and i % K == 0:
                sink.append(jax.device_put(host_k))
            l2, p2, o2 = comp(p2, o2, batch, jax.random.PRNGKey(i + 1))
        float(l2)
        del sink

    modes = (("A", "steps only"), ("B", "put/step"),
             ("C", f"{K} puts per {K} steps"),
             ("D", f"1 stacked put per {K} steps"),
             ("E", "sharded put/step"),
             ("F", "shard_batch (5 arrays) /step"))
    if os.environ.get("FENCE_MODES"):
        want = set(os.environ["FENCE_MODES"].split(","))
        modes = tuple(m for m in modes if m[0] in want)
    for mode, label in modes:
        run(mode)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(mode)
            ts.append(time.perf_counter() - t0)
        t = sorted(ts)[1] / N
        print(f"{mode} ({label}): {t*1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
