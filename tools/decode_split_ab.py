"""A/B the SPLITDEC fused-decode variant (T2T_DEC_SPLITDEC, see
ops/decoder_loop_pallas.py): decoder-LSTM resident matmul issued for its
attention-independent rows BEFORE the VPU-bound attention epilogue (MXU
overlap), ctx contribution added after — vs the baseline ordering.

Follow-up to tools/decode_decompose.py's finding that both resident
matmuls run at ~MXU speed-of-light (~7.2 us each at B=64) while the
attention chain exposes ~10 us of VPU serialization: if Mosaic overlaps
the early-issued matmul with that chain, up to ~6 us/step hides.

Interleaved ABAB rounds, slope over two max_len sizes, median.

Usage: python tools/decode_split_ab.py [B rounds]   (default 64 7)
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
from tacotron2_tpu.ops.decoder_loop_pallas import FusedDecodeLoop, pack_decoder_params


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    reps = int(os.environ.get("DEC_REPS", "3"))
    ml_a = int(os.environ.get("DEC_FRAMES_A", "256"))
    ml_b = int(os.environ.get("DEC_FRAMES_B", "1024"))
    chars_len = 128

    cfg = Tacotron2Config(
        num_chars=39, encoded_dim=512, encoder_kernel_size=5, num_mels=80,
        prenet_dim=256, att_rnn_dim=1024, att_dim=128, rnn_hidden_dim=1024,
        postnet_dim=512, dropout=0.5,
    )
    model = Tacotron2(cfg, Policy.from_string("bf16-mixed"))
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    chars = jnp.asarray(rng.integers(1, 40, size=(B, chars_len)).astype(np.int64))
    lens = jnp.full((B,), chars_len, dtype=jnp.int32)
    encoded, att_encoded, mask, _ = jax.jit(
        lambda p, s, c, l: model._encode(p, s, c, l, False,
                                         jax.random.PRNGKey(1), None, None, None)
    )(params, state, chars, lens)
    rc = model.default_resident_cols(False, batch=min(B, 64))
    packed = jax.jit(
        lambda p: pack_decoder_params(
            p, cfg.num_mels, cfg.encoded_full_dim, cfg.att_rnn_dim,
            cfg.rnn_hidden_dim, cfg.prenet_dim, cfg.controls_dim,
            dtype=jnp.bfloat16, quantize=False, resident_cols=rc,
        )
    )(params)

    def build(split, ml):
        os.environ["T2T_DEC_SPLITDEC"] = "1" if split else "0"

        def run(packed_, enc_, att_, msk_):
            outs = []
            step = min(B, 64)
            for c0 in range(0, B, step):
                c1 = min(c0 + step, B)
                lp = FusedDecodeLoop(
                    num_mels=cfg.num_mels, encoded_full_dim=cfg.encoded_full_dim,
                    att_rnn_dim=cfg.att_rnn_dim, prenet_dim=cfg.prenet_dim,
                    att_dim=cfg.att_dim, max_chars=chars_len, batch=c1 - c0,
                    controls_dim=cfg.controls_dim, dropout=cfg.dropout,
                    resident_cols=rc,
                )
                m, g, a, ln, es = lp.decode(
                    packed_, enc_[c0:c1], att_[c0:c1], msk_[c0:c1], ml,
                    rng=jax.random.PRNGKey(7), prenet_dropout=True,
                )
                outs.append((jnp.sum(m), m))
            return sum(o[0] for o in outs), outs[0][1]

        comp = jax.jit(run).lower(packed, encoded, att_encoded, mask).compile()
        os.environ.pop("T2T_DEC_SPLITDEC", None)
        return comp

    args = (packed, encoded, att_encoded, mask)
    comps = {}
    for split in (False, True):
        for ml in (ml_a, ml_b):
            comps[(split, ml)] = build(split, ml)
            s, _ = comps[(split, ml)](*args)
            float(s)
            print(f"  compiled split={split} ml={ml}", file=sys.stderr)

    # numerics: split changes contraction order (two f32 partial sums);
    # verify the mel divergence stays in the recurrence-amplified fp class
    s0, m0 = comps[(False, ml_a)](*args)
    s1, m1 = comps[(True, ml_a)](*args)
    m0, m1 = np.asarray(m0), np.asarray(m1)
    denom = max(float(np.max(np.abs(m0))), 1e-9)
    rel = float(np.max(np.abs(m0 - m1))) / denom
    print(f"split-vs-base rel mel divergence: {rel:.2e}")

    def timed(comp):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s, _ = comp(*args)
            float(s)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    res = {False: [], True: []}
    for r in range(rounds):
        order = (False, True) if r % 2 == 0 else (True, False)
        for split in order:
            ta = timed(comps[(split, ml_a)])
            tb = timed(comps[(split, ml_b)])
            res[split].append((tb - ta) / (ml_b - ml_a))
        print(f"round {r}: base {res[False][-1]*1e6:.1f} us, "
              f"split {res[True][-1]*1e6:.1f} us", flush=True)

    mb = sorted(res[False])[rounds // 2]
    ms = sorted(res[True])[rounds // 2]
    print(f"\nB={B} median of {rounds} ABAB rounds:")
    print(f"  baseline : {mb*1e6:.2f} us/step ({B/mb/1e6:.2f}M frames/s)")
    print(f"  splitdec : {ms*1e6:.2f} us/step ({B/ms/1e6:.2f}M frames/s)")
    print(f"  delta: {(mb-ms)*1e6:+.2f} us ({100*(mb-ms)/mb:+.1f}%)")


if __name__ == "__main__":
    main()
