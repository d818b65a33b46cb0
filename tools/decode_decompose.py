"""Attribute the fused decode kernel's per-step cost by section
(VERDICT r4 #1): sweeps the cumulative T2T_DEC_LEVEL truncation gates in
ops/decoder_loop_pallas.py — the decode-side analog of the backward's
T2T_BWD_LEVEL harness — at serving batches, flagship dims, bf16 FULL
residency.

Levels (cumulative):
  10  IO/pipeline skeleton (resident-weight fetch, per-t dmask DMA, outs)
  20  + prenet matmuls (M->P, P->P) + xh build
  30  + resident att-LSTM matmul  (B8,R2)x(R2,4H)
  40  + att-LSTM nonlinearity
  45  + attention window build (5-stage log-roll, VPU)
  50  + folded-conv tap contraction (64,A)x(64,NL)
  55  + query matmuls + (A,NL) energy tanh (VPU-heavy)
  60  + energy reduction + masked softmax
  65  + per-row context vecmats (attention complete)
  70  + phase-1 xh build + resident dec-LSTM matmul
  80  + dec-LSTM nonlinearity
  99  full (+ head matmuls, s_mel recurrence)

Timing: per-step slope between two max_len sizes cancels fixed transport;
ALL levels are timed inside EACH round (levels interleaved) so the
tunnel's seconds-scale latency drift hits every level equally — the
level-to-level DELTAS are the attribution. Median-of-rounds per level.

Usage: python tools/decode_decompose.py [B] [rounds]
  DEC_LEVELS=10,99       restrict the level set
  DEC_FRAMES_A/B=256/1024  slope workload sizes
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
from tacotron2_tpu.ops.decoder_loop_pallas import FusedDecodeLoop, pack_decoder_params

LEVELS = [10, 20, 30, 40, 45, 50, 55, 60, 65, 70, 80, 99]
NAMES = {
    10: "IO/pipeline skeleton",
    20: "+ prenet matmuls",
    30: "+ resident att-LSTM matmul",
    40: "+ att-LSTM nonlinearity",
    45: "+ attn window build (log-roll)",
    50: "+ tap contraction (64,A)x(64,NL)",
    55: "+ query + (A,NL) energy tanh",
    60: "+ energy reduce + softmax",
    65: "+ context vecmats",
    70: "+ xh build + resident dec matmul",
    80: "+ dec-LSTM nonlinearity",
    99: "full (+ heads)",
}


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    reps = int(os.environ.get("DEC_REPS", "3"))
    ml_a = int(os.environ.get("DEC_FRAMES_A", "256"))
    ml_b = int(os.environ.get("DEC_FRAMES_B", "1024"))
    levels = [int(x) for x in os.environ.get(
        "DEC_LEVELS", ",".join(map(str, LEVELS))).split(",")]
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
    lens = jnp.full((B,), chars_len, dtype=jnp.int64)

    # pre-encode ONCE (kernel attribution, not the say pipeline) and pack
    # with the serving-default residency for this batch
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
    print(f"B={B} chars={chars_len} resident_cols={rc} "
          f"slope {ml_a}->{ml_b} frames, {rounds} rounds x {reps} reps, "
          f"levels={levels}", file=sys.stderr)

    def build(level, ml):
        # fresh closure per (level, ml): the env var is read at TRACE time
        # inside FusedDecodeLoop._chunk_call, so each jit must retrace
        os.environ["T2T_DEC_LEVEL"] = str(level)

        def run(packed_, enc_, att_, msk_):
            # batch-chunked exactly like forward_infer_fused: sequential
            # <=64-row launches — per-chunk level gates are identical
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
                outs.append(jnp.sum(m) + jnp.sum(es))
            return sum(outs)

        comp = jax.jit(run).lower(packed, encoded, att_encoded, mask).compile()
        os.environ.pop("T2T_DEC_LEVEL", None)
        return comp

    args = (packed, encoded, att_encoded, mask)
    comps = {}
    for lv in levels:
        for ml in (ml_a, ml_b):
            t0 = time.time()
            comps[(lv, ml)] = build(lv, ml)
            float(comps[(lv, ml)](*args))  # warm
            print(f"  compiled level {lv} ml={ml} ({time.time()-t0:.1f}s)",
                  file=sys.stderr)

    def timed(comp):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(comp(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    # interleaved rounds: EVERY level sampled in each round so drift is
    # shared; per-round slope per level, median over rounds
    slopes = {lv: [] for lv in levels}
    for r in range(rounds):
        order = levels if r % 2 == 0 else levels[::-1]
        for lv in order:
            ta = timed(comps[(lv, ml_a)])
            tb = timed(comps[(lv, ml_b)])
            slopes[lv].append((tb - ta) / (ml_b - ml_a))
        print(f"  round {r}: " + " ".join(
            f"L{lv}={slopes[lv][-1]*1e6:.1f}" for lv in levels), file=sys.stderr)

    print(f"\n== fused decode attribution, B={B} (us/step, median of "
          f"{rounds} interleaved rounds; delta = cost of the added section)")
    prev = None
    for lv in levels:
        ss = sorted(slopes[lv])
        med = ss[len(ss) // 2] * 1e6
        d = "" if prev is None else f"  delta {med - prev:+7.2f}"
        print(f"  L{lv:<3} {med:8.2f} us/step{d}   {NAMES.get(lv, '')}")
        prev = med


if __name__ == "__main__":
    main()
