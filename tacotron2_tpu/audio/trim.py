"""Silence trimming, equivalent to ``librosa.effects.trim``.

The reference trims with librosa (datasets/tts_dataset.py:194-200,
preprocessing/ljspeech.py:33-35). librosa's algorithm: frame-wise RMS power
(centered frames, zero padding, hop 512), converted to dB relative to the
max-power frame; frames whose level exceeds ``-top_db`` are non-silent; the
signal is cut at the first/last non-silent frame boundary. Host-side numpy —
this runs in the input pipeline, not on the TPU.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _frame_rms(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    # librosa.feature.rms(center=True): pad frame_length//2 both sides
    # (zeros). Windowed mean-of-squares via an O(n) float64 cumulative sum
    # instead of a (frames, frame_length) gather — ~5x cheaper, and the
    # input pipeline is single-core-bound on this host (PERF.md loader
    # section). f64 running sums keep the dB threshold decisions exact.
    sq = np.pad(y.astype(np.float64) ** 2, frame_length // 2, mode="constant")
    num_frames = 1 + (len(sq) - frame_length) // hop_length
    c = np.concatenate([[0.0], np.cumsum(sq)])
    starts = np.arange(num_frames) * hop_length
    return np.sqrt((c[starts + frame_length] - c[starts]) / frame_length)


def trim_silence(
    y: np.ndarray,
    top_db: float = 60.0,
    frame_length: int = 2048,
    hop_length: int = 512,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Trim leading/trailing silence. Returns (trimmed, (start, end)) like
    librosa.effects.trim."""
    y = np.asarray(y)
    mse = _frame_rms(y, frame_length, hop_length) ** 2
    ref = mse.max()
    if ref <= 0:
        return y[0:0], (0, 0)
    # power_to_db(mse, ref=max) > -top_db  <=>  mse > ref * 10^(-top_db/10)
    non_silent = mse > ref * (10.0 ** (-top_db / 10.0))
    nz = np.flatnonzero(non_silent)
    if len(nz) == 0:
        return y[0:0], (0, 0)
    start = int(nz[0] * hop_length)
    end = min(len(y), int((nz[-1] + 1) * hop_length))
    return y[start:end], (start, end)
