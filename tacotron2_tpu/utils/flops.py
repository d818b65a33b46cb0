"""Analytic FLOP models for MFU / roofline accounting (VERDICT r3 #3).

Counts multiply-accumulates as 2 FLOPs, matmul/conv terms only (elementwise
and softmax traffic is not FLOP-relevant on the MXU roofline). Workload
definitions follow the reference models being reproduced:

- decode step: model/tacotron2.py:276-325 AR loop (prenet, attention LSTM,
  location attention, decoder LSTM, heads) + the per-frame share of the
  postnet (applied to the full mel after the loop; slope timing charges it
  per frame). The one-time encoder pass is EXCLUDED — the slope protocol
  cancels constants.
- training frame: forward (encoder per-char share + decode step + postnet)
  x3 — the backward's dX and dW products each re-cost one forward.
- vocoder frame: model/hifi_gan.py:154-216 (see
  tools/vocoder_decompose.flops_model for the per-stage split).

Peak numbers: TPU v5e (v5litepod) — 197 TFLOP/s bf16, 394 TOP/s int8.
"""

from __future__ import annotations

V5E_BF16_TFLOPS = 197.0
V5E_INT8_TOPS = 394.0


def decode_step_flops(cfg, chars_len: int, postnet: bool = True) -> float:
    """FLOPs per decoded mel frame per batch row."""
    P, M = cfg.prenet_dim, cfg.num_mels
    H1, H2, A = cfg.att_rnn_dim, cfg.rnn_hidden_dim, cfg.att_dim
    D = cfg.encoded_full_dim
    L = chars_len
    macs = 0
    macs += M * P + P * P                              # prenet
    macs += (P + D) * 4 * H1 + H1 * 4 * H1             # attention LSTM
    macs += H1 * A                                     # query projection
    macs += L * (2 * 31 * 32 + 32 * A + A + D)         # location conv/dense,
    #                                                    energies, context
    macs += (H1 + D) * 4 * H2 + H2 * 4 * H2            # decoder LSTM
    macs += (H2 + D) * (M + 1)                         # mel + gate heads
    if postnet:
        macs += postnet_frame_macs(cfg)
    return 2.0 * macs


def postnet_frame_macs(cfg) -> float:
    """5-layer k=5 postnet (model/tacotron2.py:96-141) MACs per frame."""
    M, C, k = cfg.num_mels, cfg.postnet_dim, 5
    return k * (M * C + 3 * C * C + C * M)


def encoder_char_macs(cfg) -> float:
    """3 convs k=5 + BiLSTM (model/encoder.py) MACs per input char."""
    Dc = cfg.encoded_dim
    k = cfg.encoder_kernel_size
    h = Dc // 2  # per-direction hidden
    return 3 * k * Dc * Dc + 2 * (Dc * 4 * h + h * 4 * h)


def train_frame_flops(cfg, chars_len: int, frames_per_char: float = 4.0) -> float:
    """FLOPs per mel frame for one training step (fwd + bwd)."""
    fwd = decode_step_flops(cfg, chars_len, postnet=True)
    fwd += 2.0 * encoder_char_macs(cfg) / frames_per_char
    return 3.0 * fwd


def mfu(flops_per_item: float, items_per_sec: float,
        peak_tflops: float = V5E_BF16_TFLOPS) -> tuple:
    """(achieved TFLOP/s, fraction of peak)."""
    tf = flops_per_item * items_per_sec / 1e12
    return tf, tf / peak_tflops
