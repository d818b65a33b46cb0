"""Postnet-backward A/B (VERDICT r4 #7): the production train step with
the postnet's convs as conv_general_dilated (XLA conv + its transpose-rule
backward; the r4e decomposition charged this 4.4 ms of the 45.4 ms B=32
step at ~33% MFU) vs the tap-sum rewrite (layers.conv1d_apply_taps) whose
backward is K clean matmuls per layer.

Same process, both variants compiled up front (T2T_POSTNET_TAPS is read
at trace time), interleaved ABAB rounds of chain-slope timing (PERF.md
methodology: k-step device-side chains between scalar fetches cancel the
~28 ms transport), median of per-round times.

Usage: python tools/postnet_taps_ab.py [B rounds]   (default 32 5)
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
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
        "mel": jnp.asarray(rng.standard_normal((B, FRAMES, 80)).astype(np.float32)),
        "mel_len": jnp.full((B,), FRAMES, jnp.int32),
        "gate": jnp.ones((B, FRAMES, 1), jnp.float32),
    }

    def make_step():
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
            new_params = jax.tree.map(lambda p, q: p + q, params, updates)
            return loss, new_params, new_opt
        return step

    comps = {}
    for taps in (False, True):
        os.environ["T2T_POSTNET_TAPS"] = "1" if taps else "0"
        comps[taps] = jax.jit(make_step()).lower(
            params, opt_state, batch, jax.random.PRNGKey(0)
        ).compile()
        l, _, _ = comps[taps](params, opt_state, batch, jax.random.PRNGKey(0))
        print(f"taps={taps}: compiled, loss={float(l):.5f}", file=sys.stderr)
    os.environ.pop("T2T_POSTNET_TAPS", None)

    def t_of(comp, k, iters=3):
        def chain(k):
            l2, p2, o2 = comp(params, opt_state, batch, jax.random.PRNGKey(0))
            for i in range(k - 1):
                l2, p2, o2 = comp(p2, o2, batch, jax.random.PRNGKey(i + 1))
            float(l2)
        chain(2)  # warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            chain(k)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    res = {False: [], True: []}
    for r in range(rounds):
        order = (False, True) if r % 2 == 0 else (True, False)
        for taps in order:
            t = (t_of(comps[taps], 8) - t_of(comps[taps], 2)) / 6
            res[taps].append(t)
        print(f"round {r}: conv {res[False][-1]*1e3:.1f} ms, "
              f"taps {res[True][-1]*1e3:.1f} ms", flush=True)

    mc = sorted(res[False])[rounds // 2]
    mt = sorted(res[True])[rounds // 2]
    print(f"\nB={B} frames={FRAMES} median of {rounds} ABAB rounds:")
    print(f"  conv path: {mc*1e3:.2f} ms/step ({B*FRAMES/mc/1e3:.0f}k frames/s)")
    print(f"  taps path: {mt*1e3:.2f} ms/step ({B*FRAMES/mt/1e3:.0f}k frames/s)")
    print(f"  delta: {(mc-mt)*1e3:+.2f} ms ({100*(mc-mt)/mc:+.1f}%)")


if __name__ == "__main__":
    main()
