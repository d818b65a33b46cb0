"""Mel-spectrogram frontend as XLA ops, bit-matched to the reference's
torchaudio parameters.

The reference computes mels with ``speech_utils.TacotronMelSpectrogram``
(datasets/tts_dataset.py:12,166-168,204), whose parameters are mirrored at
datasets/prosody_dataset.py:39-50,67:

    n_fft=1024, win_length=1024, hop_length=256, f_min=0, f_max=8000,
    n_mels=80, power=1 (magnitude), mel_scale="slaney", norm="slaney",
    then log(clamp(min=1e-5)) and transpose -> (frames, mels)

torchaudio semantics reproduced here:
- center=True with reflect padding of n_fft//2 on both sides
- periodic Hann window (torch.hann_window(periodic=True))
- onesided rFFT, no normalization
- number of frames = 1 + len(wav) // hop_length

TPU-first design: framing is a gather + one rFFT + one (frames, 513) @
(513, 80) matmul — all static-shaped and fusible by XLA. Variable-length
wavs are handled by bucketing the padded signal (pad AFTER the host-side
reflect pad, so valid frames never read synthetic samples) so the jitted
kernel compiles once per bucket, not once per utterance.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np


# ---------------------------------------------------------------------------
# Slaney mel scale + filterbank (torchaudio melscale_fbanks(norm="slaney",
# mel_scale="slaney") == librosa.filters.mel(htk=False, norm="slaney"))
# ---------------------------------------------------------------------------

_F_SP = 200.0 / 3.0
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = math.log(6.4) / 27.0


def hz_to_mel_slaney(hz):
    hz = np.asarray(hz, dtype=np.float64)
    mel = hz / _F_SP
    log_region = hz >= _MIN_LOG_HZ
    mel = np.where(log_region, _MIN_LOG_MEL + np.log(np.maximum(hz, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP, mel)
    return mel


def mel_to_hz_slaney(mel):
    mel = np.asarray(mel, dtype=np.float64)
    hz = mel * _F_SP
    log_region = mel >= _MIN_LOG_MEL
    hz = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (mel - _MIN_LOG_MEL)), hz)
    return hz


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    norm: str = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_fft // 2 + 1, n_mels), float32."""
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs, dtype=np.float64)

    mel_min, mel_max = hz_to_mel_slaney(f_min), hz_to_mel_slaney(f_max)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)  # (n_mels + 2,)

    fdiff = np.diff(hz_pts)  # (n_mels + 1,)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels + 2, n_freqs)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_freqs)

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"unsupported norm {norm!r}")

    return weights.T.astype(np.float32)  # (n_freqs, n_mels)


def hann_window_periodic(win_length: int) -> np.ndarray:
    """torch.hann_window(win_length, periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / mel on device
# ---------------------------------------------------------------------------


def _frame_indices(num_frames: int, n_fft: int, hop_length: int) -> np.ndarray:
    starts = np.arange(num_frames, dtype=np.int32)[:, None] * hop_length
    return starts + np.arange(n_fft, dtype=np.int32)[None, :]


class TacotronMelSpectrogram:
    """Log-mel extractor with torchaudio-equivalent numerics.

    ``__call__`` takes a 1-D numpy waveform and returns a float32
    (frames, n_mels) log-mel array, exactly like the reference's
    ``TacotronMelSpectrogram`` (log(clamp(min=1e-5)), transposed).
    Computation runs on the default JAX backend; compilation is cached per
    length bucket.
    """

    CLAMP_MIN = 1e-5
    BUCKET_FRAMES = 128  # compile granularity: buckets of 128 frames

    def __init__(
        self,
        n_mels: int = 80,
        sample_rate: int = 22050,
        n_fft: int = 1024,
        win_length: int = 1024,
        hop_length: int = 256,
        f_min: float = 0.0,
        f_max: float = 8000.0,
        power: float = 1.0,
    ):
        self.n_mels = n_mels
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.f_min = f_min
        self.f_max = f_max
        self.power = power
        self.window = hann_window_periodic(win_length)
        if win_length < n_fft:  # torch centers the window inside n_fft
            pad = (n_fft - win_length) // 2
            self.window = np.pad(self.window, (pad, n_fft - win_length - pad))
        self.fbanks = mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max, "slaney")

    # -- device path ---------------------------------------------------
    @functools.lru_cache(maxsize=None)
    def _jitted(self, num_frames_padded: int):
        import jax
        import jax.numpy as jnp

        window = jnp.asarray(self.window)
        fbanks = jnp.asarray(self.fbanks)
        n_fft, hop = self.n_fft, self.hop_length
        idx = jnp.asarray(_frame_indices(num_frames_padded, n_fft, hop))

        @jax.jit
        def compute(padded_wav):
            frames = padded_wav[idx] * window[None, :]  # (F, n_fft)
            spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))  # magnitude, power=1
            if self.power != 1.0:
                spec = spec**self.power
            mel = jnp.dot(
                spec.astype(jnp.float32), fbanks, preferred_element_type=jnp.float32
            )  # (F, n_mels)
            return jnp.log(jnp.clip(mel, min=self.CLAMP_MIN))

        return compute

    def num_frames(self, num_samples: int) -> int:
        return 1 + num_samples // self.hop_length

    def _numpy_compute(self, padded: np.ndarray, num_frames: int) -> np.ndarray:
        """Host-side path, numerically identical math to the XLA path
        (cross-backend parity-tested). Uses scipy's float32 rfft when
        available — np.fft always promotes to float64, which doubles the
        FFT cost on the (single-core) input pipeline; f32 matches
        torch.stft's own compute precision anyway."""
        idx = _frame_indices(num_frames, self.n_fft, self.hop_length)
        frames = padded[idx] * self.window[None, :]
        try:
            from scipy.fft import rfft as _rfft
        except ImportError:
            _rfft = np.fft.rfft
        spec = np.abs(_rfft(frames, axis=-1)).astype(np.float32)
        if self.power != 1.0:
            spec = spec**self.power
        mel = spec @ self.fbanks
        return np.log(np.clip(mel, self.CLAMP_MIN, None)).astype(np.float32)

    def __call__(self, wav: np.ndarray, backend: str = "numpy") -> np.ndarray:
        """wav -> (frames, n_mels) float32 log-mel.

        ``backend="numpy"`` (default) runs host-side — the input pipeline
        must not contend with the accelerator the train step runs on
        (SURVEY §2.8: host-side input pipeline feeding device buffers).
        ``backend="jax"`` uses the bucketed jitted kernel (the in-graph
        math; also what tests cross-check against).
        """
        wav = np.asarray(wav, dtype=np.float32).reshape(-1)
        num_frames = self.num_frames(len(wav))
        # center=True reflect pad (host side — uses true samples only)
        pad = self.n_fft // 2
        padded = np.pad(wav, (pad, pad), mode="reflect")
        if backend == "numpy":
            need = (num_frames - 1) * self.hop_length + self.n_fft
            if len(padded) < need:
                padded = np.pad(padded, (0, need - len(padded)))
            return self._numpy_compute(padded, num_frames)
        # bucket the frame count so jit compiles once per bucket
        bucket = -(-num_frames // self.BUCKET_FRAMES) * self.BUCKET_FRAMES
        need = (bucket - 1) * self.hop_length + self.n_fft
        if len(padded) < need:
            padded = np.pad(padded, (0, need - len(padded)))
        out = np.asarray(self._jitted(bucket)(padded))
        return out[:num_frames]

    # -- in-graph path (for Griffin-Lim and fused pipelines) -----------
    def stft_magnitude_jax(self, wav):
        """In-graph magnitude STFT of an already reflect-padded signal."""
        import jax.numpy as jnp

        num_frames = (wav.shape[-1] - self.n_fft) // self.hop_length + 1
        idx = jnp.asarray(_frame_indices(num_frames, self.n_fft, self.hop_length))
        frames = wav[idx] * jnp.asarray(self.window)[None, :]
        return jnp.abs(jnp.fft.rfft(frames, axis=-1))
