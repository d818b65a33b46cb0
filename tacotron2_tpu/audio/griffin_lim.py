"""Griffin-Lim mel inversion in JAX — the vocoder-free synthesis path.

The reference inverts mels with ``librosa.feature.inverse.mel_to_audio``
(run/say.py:159-171, run/test.py:211-221): mel -> linear magnitude via NNLS,
then 32 Griffin-Lim iterations with momentum 0.99 and random phase init.

TPU-native design: the whole loop (ISTFT -> STFT -> phase update) is a
``lax.fori_loop`` over static-shaped FFTs, jitted once. Mel->linear uses a
projected-gradient NNLS (librosa solves the same non-negative least-squares
problem; its solver is scipy's — ours iterates on device).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from tacotron2_tpu.audio.mel import hann_window_periodic, mel_filterbank, _frame_indices


def _get_jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def _stft(frames_idx, window, y):
    _, jnp = _get_jax()
    frames = y[frames_idx] * window[None, :]
    return jnp.fft.rfft(frames, axis=-1)


def _istft(spec, window, n_fft, hop_length, length):
    """Overlap-add inverse STFT with squared-window normalization
    (librosa/torch semantics, center=True)."""
    _, jnp = _get_jax()
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
    num_frames = spec.shape[0]
    total = (num_frames - 1) * hop_length + n_fft

    idx = (
        np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    ).reshape(-1)
    y = jnp.zeros(total, dtype=frames.dtype).at[idx].add(frames.reshape(-1))
    wsq = jnp.zeros(total, dtype=window.dtype).at[idx].add(
        jnp.tile(window**2, (num_frames,))
    )
    y = y / jnp.maximum(wsq, 1e-10)
    # undo center padding
    start = n_fft // 2
    return y[start : start + length]


@functools.lru_cache(maxsize=8)
def _griffin_lim_jitted(num_frames: int, n_fft: int, hop_length: int, n_iter: int, momentum: float, length: int):
    jax, jnp = _get_jax()
    window = jnp.asarray(hann_window_periodic(n_fft))
    pad = n_fft // 2
    padded_len = length + 2 * pad
    frames_idx = jnp.asarray(_frame_indices(num_frames, n_fft, hop_length))

    def rebuild(angles, magnitude):
        y = _istft(magnitude * angles, window, n_fft, hop_length, length)
        # center pad with zeros in-graph (reflect would need the unknown signal)
        y_padded = jnp.pad(y, (pad, pad))
        return _stft(frames_idx[: (padded_len - n_fft) // hop_length + 1], window, y_padded), y

    @jax.jit
    def run(magnitude, init_angles):
        def body(_, carry):
            angles, tprev = carry
            rebuilt, _ = rebuild(angles, magnitude)
            update = rebuilt - (momentum / (1.0 + momentum)) * tprev
            angles = update / jnp.maximum(jnp.abs(update), 1e-16)
            return angles, rebuilt

        angles, _ = jax.lax.fori_loop(
            0, n_iter, body, (init_angles, jnp.zeros_like(init_angles))
        )
        _, y = rebuild(angles, magnitude)
        return y

    return run


def _griffin_lim_numpy(magnitude, n_fft, hop_length, n_iter, momentum, length, init_angles):
    """Numpy fallback — some TPU transports lack complex-FFT support."""
    from tacotron2_tpu.audio.mel import _frame_indices, hann_window_periodic

    window = hann_window_periodic(n_fft)
    pad = n_fft // 2
    num_frames = magnitude.shape[0]
    frames_idx = _frame_indices(num_frames, n_fft, hop_length)
    ola_idx = (
        np.arange(num_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    ).reshape(-1)
    total = (num_frames - 1) * hop_length + n_fft
    wsq = np.zeros(total)
    np.add.at(wsq, ola_idx, np.tile(window**2, num_frames))
    wsq = np.maximum(wsq, 1e-10)

    def istft(spec):
        frames = np.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
        y = np.zeros(total)
        np.add.at(y, ola_idx, frames.reshape(-1))
        return (y / wsq)[pad : pad + length]

    def stft(y):
        yp = np.pad(y, (pad, pad))
        return np.fft.rfft(yp[frames_idx] * window[None, :], axis=-1)

    angles = init_angles
    tprev = np.zeros_like(angles)
    for _ in range(n_iter):
        rebuilt = stft(istft(magnitude * angles))
        update = rebuilt - (momentum / (1.0 + momentum)) * tprev
        angles = update / np.maximum(np.abs(update), 1e-16)
        tprev = rebuilt
    return istft(magnitude * angles).astype(np.float32)


def griffin_lim(
    magnitude: np.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: Optional[int] = None,
    seed: int = 0,
) -> np.ndarray:
    """Griffin-Lim phase reconstruction. ``magnitude``: (frames, n_fft//2+1)."""
    _, jnp = _get_jax()
    magnitude = np.asarray(magnitude, dtype=np.float32)
    num_frames = magnitude.shape[0]
    if length is None:
        length = (num_frames - 1) * hop_length
    rng = np.random.default_rng(seed)
    init_phase = rng.uniform(-np.pi, np.pi, size=magnitude.shape).astype(np.float32)
    init_angles = np.exp(1j * init_phase).astype(np.complex64)
    # Only run the in-graph loop on CPU backends: some TPU transports lack
    # complex FFT, and a FAILED device program can wedge the device for
    # subsequent (unrelated) programs — don't even attempt it there.
    import jax

    if jax.default_backend() == "cpu":
        try:
            run = _griffin_lim_jitted(num_frames, n_fft, hop_length, n_iter, momentum, length)
            return np.asarray(run(jnp.asarray(magnitude), jnp.asarray(init_angles)))
        except Exception:
            pass
    return _griffin_lim_numpy(
        magnitude, n_fft, hop_length, n_iter, momentum, length, init_angles
    )


@functools.lru_cache(maxsize=8)
def _nnls_jitted(num_frames: int, n_freqs: int, n_mels: int, n_iter: int):
    jax, jnp = _get_jax()

    @jax.jit
    def run(fb, mel):  # fb: (n_freqs, n_mels), mel: (frames, n_mels)
        # projected gradient on ||S @ fb - mel||^2 with S >= 0
        # init: transpose trick scaled to match energies
        denom = jnp.sum(fb, axis=0, keepdims=True)  # (1, n_mels)
        s = jnp.dot(mel / jnp.maximum(denom, 1e-10), fb.T, preferred_element_type=jnp.float32)
        lipschitz = jnp.linalg.norm(fb, ord=2) ** 2
        step = 1.0 / jnp.maximum(lipschitz, 1e-10)

        def body(_, s):
            grad = jnp.dot(
                jnp.dot(s, fb, preferred_element_type=jnp.float32) - mel,
                fb.T,
                preferred_element_type=jnp.float32,
            )
            return jnp.maximum(s - step * grad, 0.0)

        return jax.lax.fori_loop(0, n_iter, body, jnp.maximum(s, 0.0))

    return run


def mel_to_linear(
    mel_magnitude: np.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    n_iter: int = 80,
) -> np.ndarray:
    """Invert the mel filterbank: (frames, n_mels) -> (frames, n_fft//2+1).

    librosa's mel_to_stft solves NNLS; we use on-device projected gradient.
    """
    mel_magnitude = np.asarray(mel_magnitude, dtype=np.float32)
    n_mels = mel_magnitude.shape[1]
    fb = mel_filterbank(sample_rate, n_fft, n_mels, f_min, f_max, "slaney")
    run = _nnls_jitted(mel_magnitude.shape[0], fb.shape[0], n_mels, n_iter)
    return np.asarray(run(fb, mel_magnitude))


def mel_to_audio(
    mel_magnitude: np.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    power: float = 1.0,
    n_iter: int = 32,
    seed: int = 0,
) -> np.ndarray:
    """librosa.feature.inverse.mel_to_audio equivalent (run/say.py:161-171).

    Input is the *linear* (exp'd) mel magnitude, shape (frames, n_mels) —
    the reference transposes to (n_mels, frames); we accept frames-major.
    """
    assert win_length == n_fft, "win_length != n_fft not used by the reference"
    linear = mel_to_linear(mel_magnitude, sample_rate, n_fft, f_min, f_max)
    if power != 1.0:
        linear = linear ** (1.0 / power)
    return griffin_lim(linear, n_fft=n_fft, hop_length=hop_length, n_iter=n_iter, seed=seed)
