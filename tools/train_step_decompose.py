"""Decompose the FULL training step (fwd + bwd + Adam) at flagship dims
by surgically removing backward sections with stop_gradient monkeypatches
— no model changes, the patches wrap the module-level apply fns the model
looks up at trace time.

Rows (chained-slope timed, PERF.md methodology — transport cancels):
  full      : the production step (Pallas fwd+bwd kernels + Adam)
  no_adam   : grads computed, optimizer update + param add skipped
  enc_sg    : encoder output stop-gradient -> encoder backward (BiLSTM
              scan transpose + conv/BN grads) removed; encoder params get
              zero grads but Adam still updates the full tree
  post_sg   : postnet output stop-gradient -> postnet backward removed
  enc+post  : both
Differences between rows attribute the step time; compare with the
forward-only rows in tools/fwd_decompose.py and the backward-kernel
truncation sweep (T2T_BWD_LEVEL, CLAUDE.md).

Usage: python tools/train_step_decompose.py [B] [T]
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

from tacotron2_tpu.models import encoder as encoder_mod
from tacotron2_tpu.models import postnet as postnet_mod
from tacotron2_tpu.models import tacotron2 as t2
from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from tacotron2_tpu.training.losses import tacotron2_loss
from tacotron2_tpu.training.optimizer import make_optimizer

_ENC_APPLY = encoder_mod.apply
_POST_APPLY = postnet_mod.apply


def _enc_sg(params, state, *a, **k):
    out, st = _ENC_APPLY(params, state, *a, **k)
    return jax.lax.stop_gradient(out), st


def _post_sg(params, state, *a, **k):
    out, st = _POST_APPLY(params, state, *a, **k)
    return jax.lax.stop_gradient(out), st


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    if os.environ.get("T2T_DECOMP_TINY"):  # CPU smoke of the harness
        cfg = Tacotron2Config(
            num_chars=39, encoded_dim=16, encoder_kernel_size=5, num_mels=8,
            prenet_dim=8, att_rnn_dim=16, att_dim=8, rnn_hidden_dim=16,
            postnet_dim=8, dropout=0.5,
        )
    else:
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
        "mel": jnp.asarray(
            rng.standard_normal((B, T, cfg.num_mels)).astype(np.float32)),
        "mel_len": jnp.full((B,), T, jnp.int32),
        "gate": jnp.ones((B, T, 1), jnp.float32),
    }

    def make_step(with_adam=True):
        def step(params, opt_state, rng):
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
            if not with_adam:
                # keep grads live via the returned scalar so XLA can't DCE
                # the backward; params/opt pass through untouched
                gsum = sum(jnp.sum(g).astype(jnp.float32)
                           for g in jax.tree.leaves(grads))
                return loss + 0.0 * gsum, params, opt_state
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, q: p + q, params, updates)
            return loss, new_params, new_opt
        return step

    def timed(step):
        comp = jax.jit(step).lower(params, opt_state, jax.random.PRNGKey(0)).compile()

        def chain(k):
            l, p2, o2 = comp(params, opt_state, jax.random.PRNGKey(0))
            for i in range(k - 1):
                l, p2, o2 = comp(p2, o2, jax.random.PRNGKey(i + 1))
            float(l)

        def t_of(k, iters=5):
            chain(k)
            ts = []
            for _ in range(iters):
                t0 = time.perf_counter()
                chain(k)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        return (t_of(8) - t_of(2)) / 6 * 1e3

    rows = []

    def run(label, enc_patch=None, post_patch=None, with_adam=True):
        encoder_mod.apply = enc_patch or _ENC_APPLY
        postnet_mod.apply = post_patch or _POST_APPLY
        # tacotron2.py imported the modules, not the fns — patching the
        # module attribute is enough; assert that stays true
        assert t2.encoder_mod is encoder_mod and t2.postnet_mod is postnet_mod
        try:
            ms = timed(make_step(with_adam))
            rows.append((label, ms))
            print(f"B={B} T={T} {label:9s}: {ms:6.1f} ms/step", flush=True)
        except Exception as e:  # record, keep sweeping
            print(f"B={B} T={T} {label:9s}: FAIL {str(e)[:200]}", flush=True)
        finally:
            encoder_mod.apply = _ENC_APPLY
            postnet_mod.apply = _POST_APPLY

    run("full")
    run("no_adam", with_adam=False)
    run("enc_sg", enc_patch=_enc_sg)
    run("post_sg", post_patch=_post_sg)
    run("enc+post", enc_patch=_enc_sg, post_patch=_post_sg)

    if len(rows) == 5:
        d = dict(rows)
        print(f"\nattribution (B={B}, T={T}):")
        print(f"  adam+update      : {d['full'] - d['no_adam']:6.1f} ms")
        print(f"  encoder backward : {d['full'] - d['enc_sg']:6.1f} ms")
        print(f"  postnet backward : {d['full'] - d['post_sg']:6.1f} ms")
        print(f"  both backwards   : {d['full'] - d['enc+post']:6.1f} ms")
        print(f"  residual (decode kernels fwd+bwd, enc/post fwd, losses, "
              f"PRNG): {d['enc+post']:6.1f} ms")


if __name__ == "__main__":
    main()
