"""Decompose the teacher-forced FORWARD cost at flagship dims: times the
full forward (train on/off), encoder alone, prenet alone, postnet alone,
and the dropout-mask PRNG alone. Absolute numbers include ~25-30 ms tunnel
transport; DIFFERENCES between rows cancel it.

Usage: python tools/fwd_decompose.py [B] [T]
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
from tacotron2_tpu.models import postnet as postnet_mod


def timed(fn, *args, iters=7):
    float(jnp.sum(fn(*args)))  # compile+warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = Tacotron2Config(
        num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
        prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
        postnet_dim=512, dropout=0.5,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    chars = jnp.asarray(rng.integers(1, 40, size=(B, 128)).astype(np.int64))
    lens = jnp.full((B,), 128, jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    mlen = jnp.full((B,), T, jnp.int32)
    key = jax.random.PRNGKey(1)

    @jax.jit
    def fwd_train(p, k):
        out, _ = model.forward_teacher(
            p, state, chars, lens, mel, mlen, rng=k, train=True,
            dw_hoist=True, pallas_train=True, pallas_bwd="pallas",
        )
        return out.mels_post

    @jax.jit
    def fwd_eval(p, k):
        out, _ = model.forward_teacher(
            p, state, chars, lens, mel, mlen, rng=k, train=False,
            dw_hoist=True, pallas_train=True,
        )
        return out.mels_post

    @jax.jit
    def enc_only(p, k):
        encoded, att_encoded, mask, _ = model._encode(
            p, state, chars, lens, True, k, None, None, None
        )
        return encoded

    @jax.jit
    def prenet_only(p, k):
        shifted = jnp.pad(mel, ((0, 0), (1, 0), (0, 0)))[:, :T]
        return model._prenet(p, shifted, k, True)

    @jax.jit
    def postnet_only(p, k):
        post, _ = postnet_mod.apply(
            p["postnet"], state["postnet"], mel, True, cfg.dropout, k,
            model.policy,
        )
        return post

    @jax.jit
    def masks_only(k):
        from tacotron2_tpu.ops import train_scan

        keys = jax.random.split(k, T)
        dm1, dm2 = jax.vmap(
            lambda kk: train_scan._dropout_masks(kk, (B, 1024), True)
        )(keys)
        return dm1[..., :1] + dm2[..., :1]

    print(f"B={B} T={T} (each row includes ~25-30 ms transport; compare diffs)")
    print(f"fwd train=True : {timed(fwd_train, params, key):.1f} ms")
    print(f"fwd train=False: {timed(fwd_eval, params, key):.1f} ms")
    print(f"encoder only   : {timed(enc_only, params, key):.1f} ms")
    print(f"prenet only    : {timed(prenet_only, params, key):.1f} ms")
    print(f"postnet only   : {timed(postnet_only, params, key):.1f} ms")
    print(f"lstm-drop masks: {timed(masks_only, key):.1f} ms")


if __name__ == "__main__":
    main()
