"""Audio frontend tests: torch.stft golden vectors for the STFT, structural
checks for the slaney filterbank, round-trips for WAV IO / trim / Griffin-Lim.
(The reference's mel params: datasets/prosody_dataset.py:39-50,67.)"""

import numpy as np
import pytest

from tacotron2_tpu.audio import (
    TacotronMelSpectrogram,
    griffin_lim,
    mel_filterbank,
    mel_to_audio,
    read_wav,
    trim_silence,
    write_wav,
)
from tacotron2_tpu.audio.griffin_lim import mel_to_linear
from tacotron2_tpu.audio.mel import hann_window_periodic, hz_to_mel_slaney, mel_to_hz_slaney


def _tone(freq=440.0, sr=22050, dur=0.7, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# -- WAV IO ----------------------------------------------------------------


def test_wav_roundtrip_pcm16(tmp_path):
    wav = _tone()
    p = str(tmp_path / "t.wav")
    write_wav(p, wav, 22050)
    back, sr = read_wav(p)
    assert sr == 22050
    assert back.shape == wav.shape
    assert np.max(np.abs(back - wav)) < 1.0 / 32000


def test_wav_roundtrip_float(tmp_path):
    wav = _tone()
    p = str(tmp_path / "t.wav")
    write_wav(p, wav, 16000, subtype="FLOAT")
    back, sr = read_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=1e-7)


def test_wav_stereo_to_mono(tmp_path):
    wav = np.stack([_tone(440), _tone(880)], axis=1)
    p = str(tmp_path / "t.wav")
    write_wav(p, wav, 22050, subtype="FLOAT")
    back, _ = read_wav(p)
    np.testing.assert_allclose(back, wav.mean(axis=1), atol=1e-6)


# -- Window / STFT golden vs torch ------------------------------------------


def test_hann_window_matches_torch():
    torch = pytest.importorskip("torch")
    ours = hann_window_periodic(1024)
    ref = torch.hann_window(1024, periodic=True).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_stft_magnitude_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(5000).astype(np.float32)

    ref = torch.stft(
        torch.tensor(wav),
        n_fft=1024,
        hop_length=256,
        win_length=1024,
        window=torch.hann_window(1024, periodic=True),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    ref_mag = ref.abs().numpy().T  # (frames, freqs)

    mel = TacotronMelSpectrogram()
    padded = np.pad(wav, (512, 512), mode="reflect")
    ours = np.asarray(mel.stft_magnitude_jax(padded))
    assert ours.shape == ref_mag.shape == (1 + len(wav) // 256, 513)
    np.testing.assert_allclose(ours, ref_mag, atol=2e-3, rtol=1e-4)


# -- Mel scale / filterbank --------------------------------------------------


def test_slaney_scale_roundtrip():
    hz = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(mel_to_hz_slaney(hz_to_mel_slaney(hz)), hz, rtol=1e-9)
    # linear below 1 kHz: 200/3 Hz per mel
    assert abs(hz_to_mel_slaney(200.0) - 3.0) < 1e-9


def test_mel_filterbank_structure():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0, norm="slaney")
    assert fb.shape == (513, 80)
    assert fb.dtype == np.float32
    assert (fb >= 0).all()
    # slaney-normalized triangle areas: sum_k fb[k, m] * df == ~1 each
    df = 22050 / 2 / 512
    areas = fb.sum(axis=0) * df
    assert np.all(areas > 0.8) and np.all(areas < 1.2)
    # each filter's support is a contiguous band strictly inside [0, 8000]
    freqs = np.linspace(0, 22050 / 2, 513)
    for m in (0, 40, 79):
        support = freqs[fb[:, m] > 0]
        assert support.max() <= 8000.0 + 1e-6
    # peak frequencies strictly increasing
    peaks = freqs[np.argmax(fb, axis=0)]
    assert np.all(np.diff(peaks) > 0)


def test_mel_filterbank_slaney_norm_value():
    fb_unnorm = mel_filterbank(22050, 1024, 80, 0.0, 8000.0, norm=None)
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0, norm="slaney")
    mel_pts = mel_to_hz_slaney(
        np.linspace(hz_to_mel_slaney(0.0), hz_to_mel_slaney(8000.0), 82)
    )
    enorm = 2.0 / (mel_pts[2:] - mel_pts[:-2])
    ratio = fb.sum(axis=0) / np.maximum(fb_unnorm.sum(axis=0), 1e-20)
    np.testing.assert_allclose(ratio, enorm, rtol=1e-4)


# -- Full mel pipeline --------------------------------------------------------


def test_mel_shapes_and_silence_floor():
    mel = TacotronMelSpectrogram()
    wav = np.zeros(22050, dtype=np.float32)
    out = mel(wav)
    assert out.shape == (1 + 22050 // 256, 80)
    np.testing.assert_allclose(out, np.float32(np.log(1e-5)), atol=1e-4)


def test_mel_tone_peak_bin():
    mel = TacotronMelSpectrogram()
    out = mel(_tone(freq=1000.0))
    # energy should concentrate around the 1 kHz mel bin, consistent across frames
    peak_bins = out[5:-5].argmax(axis=1)
    assert peak_bins.std() < 1.0
    fb = mel_filterbank(22050, 1024, 80, 0, 8000)
    freqs = np.linspace(0, 22050 / 2, 513)
    peak_freq = freqs[fb[:, int(np.median(peak_bins))].argmax()]
    assert abs(peak_freq - 1000.0) < 150.0


def test_mel_matches_reference_composition():
    """log-mel == log(clamp(fb @ |stft|, 1e-5)) with torch.stft as golden."""
    torch = pytest.importorskip("torch")
    wav = _tone(660.0, dur=0.3)
    spec = (
        torch.stft(
            torch.tensor(wav),
            n_fft=1024,
            hop_length=256,
            win_length=1024,
            window=torch.hann_window(1024, periodic=True),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        )
        .abs()
        .numpy()
    )  # (freqs, frames)
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    ref = np.log(np.clip(fb.T @ spec, 1e-5, None)).T  # (frames, mels)
    ours = TacotronMelSpectrogram()(wav)
    # log-space near the 1e-5 clamp floor amplifies f32 FFT noise; 0.02 in
    # log space ~= 2% relative in linear space
    np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_mel_numpy_jax_backend_parity():
    """The host-side numpy path and the XLA path must agree — the input
    pipeline uses numpy, the in-graph ops use jax."""
    mel = TacotronMelSpectrogram()
    wav = _tone(freq=740.0, dur=0.4)
    a = mel(wav, backend="numpy")
    b = mel(wav, backend="jax")
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=5e-3)  # fp32 FFT noise near clamp


def test_mel_bucketing_consistency():
    # different lengths in the same bucket must give identical leading frames
    mel = TacotronMelSpectrogram()
    wav = _tone(dur=1.0)
    a = mel(wav)
    b = mel(wav[: len(wav) - 256])
    # trailing frames read the (differing) reflect-pad region: window extends
    # n_fft//2 = 512 samples = 2 hops past the frame center, so drop 3 frames
    n = b.shape[0] - 3
    np.testing.assert_allclose(a[:n], b[:n], atol=1e-5)


# -- Trim ---------------------------------------------------------------------


def test_trim_silence():
    sr = 22050
    silence = np.zeros(sr // 2, dtype=np.float32)
    tone = _tone(dur=0.5)
    y = np.concatenate([silence, tone, silence])
    trimmed, (start, end) = trim_silence(y, top_db=60)
    # boundaries land on hop-512 frame edges within one centered window
    # (frame_length=2048) of the tone edges
    assert abs(start - len(silence)) <= 2048
    assert abs(end - (len(silence) + len(tone))) <= 2048
    assert start < len(silence) < len(silence) + len(tone) < end + 2048
    assert len(trimmed) == end - start


def test_trim_all_silent():
    y = np.zeros(10000, dtype=np.float32)
    trimmed, _ = trim_silence(y)
    assert len(trimmed) == 0


# -- Griffin-Lim --------------------------------------------------------------


def test_griffin_lim_reconstructs_tone():
    sr = 22050
    wav = _tone(freq=880.0, dur=0.4)
    mel = TacotronMelSpectrogram()
    padded = np.pad(wav, (512, 512), mode="reflect")
    mag = np.asarray(mel.stft_magnitude_jax(padded))
    rec = griffin_lim(mag, length=len(wav), seed=1)
    assert rec.shape == wav.shape
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(rec))
    freq = np.fft.rfftfreq(len(rec), 1 / sr)[spec.argmax()]
    assert abs(freq - 880.0) < 10.0


def test_mel_to_linear_consistency():
    wav = _tone(freq=440.0, dur=0.3)
    mel = TacotronMelSpectrogram()
    log_mel = mel(wav)
    linear = mel_to_linear(np.exp(log_mel))
    fb = mel_filterbank(22050, 1024, 80, 0, 8000)
    recon_mel = linear @ fb
    err = np.abs(recon_mel - np.exp(log_mel)).mean() / np.abs(np.exp(log_mel)).mean()
    assert err < 0.05


def test_mel_to_audio_end_to_end():
    wav = _tone(freq=523.0, dur=0.3)
    mel = TacotronMelSpectrogram()
    log_mel = mel(wav)
    rec = mel_to_audio(np.exp(log_mel), seed=3)
    spec = np.abs(np.fft.rfft(rec))
    freq = np.fft.rfftfreq(len(rec), 1 / 22050)[spec.argmax()]
    assert abs(freq - 523.0) < 30.0
