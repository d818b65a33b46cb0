"""Prosody-training dataset: random fixed-size mel/wav segment pairs.

Rebuild of the reference ProsodyDataset (datasets/prosody_dataset.py:14-100):
random 64-frame mel segments with the aligned waveform segment and the
prosodic features of that segment — training data for the prosody
predictor. The reference version contains a latent bug (``self.features``
referenced but never assigned, :95-98); here the features are computed from
the wav segment via the framework's extractor.
"""

from __future__ import annotations

import random
from os import path
from typing import List, Optional

import numpy as np

from tacotron2_tpu.audio.io import load_audio
from tacotron2_tpu.audio.mel import TacotronMelSpectrogram
from tacotron2_tpu.audio.prosody import FEATURE_NAMES, extract_features
from tacotron2_tpu.audio.trim import trim_silence


class ProsodyDataset:
    def __init__(
        self,
        filenames: List[str],
        base_dir: str,
        sample_rate: int = 22050,
        n_fft: int = 1024,
        win_length: int = 1024,
        hop_length: int = 256,
        f_min: float = 0.0,
        f_max: float = 8000.0,
        n_mels: int = 80,
        power: float = 1.0,
        trim: bool = True,
        spectrogram_segment_size: int = 64,
        features: Optional[List[str]] = None,
        seed: Optional[int] = None,
    ):
        self.filenames = filenames
        self.base_dir = base_dir
        self.trim = trim
        self.segment = spectrogram_segment_size
        self.hop_length = hop_length
        self.sample_rate = sample_rate
        self.feature_names = features or FEATURE_NAMES
        self.melspectrogram = TacotronMelSpectrogram(
            n_mels=n_mels, sample_rate=sample_rate, n_fft=n_fft,
            win_length=win_length, hop_length=hop_length, f_min=f_min,
            f_max=f_max, power=power,
        )
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.filenames)

    def __getitem__(self, i: int):
        wav, _ = load_audio(path.join(self.base_dir, self.filenames[i]))
        if self.trim:
            wav, _ = trim_silence(wav, frame_length=512)
        mel = self.melspectrogram(wav)  # (T, n_mels) log-mel

        last = max(len(mel) - self.segment, 0)
        start = self._rng.randint(0, last) if last else 0
        end = start + self.segment
        mel_segment = mel[start:end]
        if len(mel_segment) < self.segment:  # pad short clips
            mel_segment = np.pad(
                mel_segment, ((0, self.segment - len(mel_segment)), (0, 0)),
                constant_values=np.log(1e-5),
            )

        # aligned wav segment (reference pads hop/2 both sides, :77-79)
        padded = np.pad(wav, (self.hop_length // 2, self.hop_length // 2))
        wav_segment = padded[start * self.hop_length : end * self.hop_length]

        feats = extract_features(wav_segment, self.sample_rate)
        if feats is None:
            feats = {k: 0.0 for k in self.feature_names}
        features = np.asarray([feats.get(k, 0.0) for k in self.feature_names], np.float32)
        return {
            "mel_segment": mel_segment.astype(np.float32),
            "wav_segment": wav_segment.astype(np.float32),
            "features": features,
        }
