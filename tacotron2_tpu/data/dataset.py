"""TTS dataset: wav -> log-mel + gate targets, text -> char indices.

Behavioral spec from the reference (datasets/tts_dataset.py:50-302):
- text normalized at construction (transliterate -> lower -> strip ->
  [expand abbreviations] -> end token), chars ordinal-encoded + 1
- audio: load wav -> [librosa trim] -> pad ``silence`` samples -> log-mel
  (frames, n_mels); optional per-file mel cache
- gate target: ones with the LAST frame 0 (:211-215) — note this is the
  inverse of NVIDIA's convention; stop is signalled by the gate going low
- metadata: lens, speaker_id, description embeddings (per-item files, zeros
  (1, 768) when absent, optional augmentation-dir random pick), features
  with optional override for controllability eval

Host-side numpy/IO only; the mel transform itself runs through the XLA
frontend (tacotron2_tpu.audio.mel).
"""

from __future__ import annotations

import os
import random
from os import path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from tacotron2_tpu.audio.io import load_audio
from tacotron2_tpu.audio.mel import TacotronMelSpectrogram
from tacotron2_tpu.audio.trim import trim_silence
from tacotron2_tpu.config import ALLOWED_CHARS
from tacotron2_tpu.text.cleaners import normalize_text
from tacotron2_tpu.text.encoder import CharEncoder


def _load_embedding_file(p: str) -> np.ndarray:
    if p.endswith(".pt"):
        import torch

        return torch.load(p, map_location="cpu", weights_only=False).detach().cpu().numpy()
    return np.load(p)


class TTSDataset:
    def __init__(
        self,
        filenames: List[str],
        texts: List[str],
        base_dir: str,
        speaker_ids: Optional[List[int]] = None,
        features=None,
        allowed_chars: str = ALLOWED_CHARS,
        end_token: Optional[str] = "^",
        silence: int = 0,
        trim: bool = True,
        trim_top_db: float = 60,
        trim_frame_length: int = 2048,
        feature_override=None,
        expand_abbreviations: bool = False,
        include_wav: bool = False,
        include_text: bool = False,
        include_filename: bool = False,
        num_frames_per_step: int = 1,
        num_mels: int = 80,
        cache: bool = False,
        cache_dir: Optional[str] = None,
        description_embeddings: Optional[List[Optional[str]]] = None,
        description_embeddings_dim: int = 768,
        description_embeddings_augment: bool = False,
        sample_rate: int = 22050,
        verbose: bool = False,
    ):
        if cache and cache_dir is None:
            raise ValueError("If caching spectrograms, a cache directory is required")
        if verbose:  # config echo (reference: datasets/tts_dataset.py:92-134)
            print(f"Dataset: {'Caching Mel spectrograms at ' + str(cache_dir) if cache else 'Not caching Mel spectrograms'}")
            print(f"Dataset: {'Using end token ' + end_token if end_token else 'Not using an end token'}")
            if trim:
                print(f"Dataset: Trimming silence with top db {trim_top_db} and frame length {trim_frame_length}")
            else:
                print("Dataset: Not trimming silence from input audio files")
            print(f"Dataset: Adding {silence} frames of silence to the end of each clip")
            print(f"Dataset: Allowed characters {allowed_chars}")
        if cache and not path.exists(cache_dir):
            os.makedirs(cache_dir, exist_ok=True)
        self.cache = cache
        self.cache_dir = cache_dir

        self.filenames = filenames
        self.base_dir = base_dir
        self.end_token = end_token
        self.trim = trim
        self.trim_top_db = trim_top_db
        self.trim_frame_length = trim_frame_length
        self.silence = silence
        self.include_wav = include_wav
        self.include_text = include_text
        self.include_filename = include_filename
        self.num_frames_per_step = num_frames_per_step
        self.features = features
        self.feature_override = feature_override
        self.speaker_ids = speaker_ids
        self.description_embeddings = description_embeddings
        self.description_embeddings_dim = description_embeddings_dim
        self.description_embeddings_augment = description_embeddings_augment

        # normalization happens once at construction (tts_dataset.py:136-146)
        self.texts = [
            normalize_text(t, allowed_chars, end_token, expand_abbreviations) for t in texts
        ]
        self.encoder = CharEncoder(allowed_chars, end_token)
        self.melspectrogram = TacotronMelSpectrogram(n_mels=num_mels, sample_rate=sample_rate)

        # cache-key tag: the mel depends on these preprocessing params, so a
        # changed config against the same cache_dir must MISS rather than
        # serve stale mels (the reference keys on filename alone,
        # tts_dataset.py:185-187 — a footgun we don't reproduce)
        import hashlib

        key = f"{trim}|{trim_top_db}|{trim_frame_length}|{silence}|{num_mels}|{sample_rate}"
        self._cache_tag = hashlib.sha1(key.encode()).hexdigest()[:8]

    def __len__(self) -> int:
        return len(self.filenames)

    # ------------------------------------------------------------------
    def _mel(self, i: int) -> np.ndarray:
        filename = self.filenames[i]
        cache_path = None
        if self.cache:
            cache_path = path.join(
                self.cache_dir, f"{filename.replace('/', '_')}.{self._cache_tag}.npy"
            )
            if path.exists(cache_path):
                return np.load(cache_path)

        # format-dispatching load (WAV numpy codec / FLAC native decoder)
        wav, _ = load_audio(path.join(self.base_dir, filename))
        if self.trim:
            wav, _ = trim_silence(
                wav, top_db=self.trim_top_db, frame_length=self.trim_frame_length
            )
        wav = np.pad(wav, (0, self.silence))
        mel = self.melspectrogram(wav)  # (frames, n_mels)
        if self.cache and cache_path is not None:
            np.save(cache_path, mel)
        return mel

    def _description_embedding(self, i: int) -> np.ndarray:
        rel = self.description_embeddings[i]
        if rel is None:
            return np.zeros((1, self.description_embeddings_dim), np.float32)
        full = path.join(self.base_dir, rel)
        if self.description_embeddings_augment:
            # random pick among original + *_augmentations/*.pt (tts_dataset.py:253-283)
            aug_dir = full.replace(".pt", "_augmentations").replace(".npy", "_augmentations")
            eligible = [full]
            if path.isdir(aug_dir):
                eligible += [
                    path.join(aug_dir, x)
                    for x in os.listdir(aug_dir)
                    if x.endswith(".pt") or x.endswith(".npy")
                ]
            full = random.choice(eligible)
        emb = _load_embedding_file(full).astype(np.float32).reshape(1, -1)
        return emb

    def __getitem__(self, i: int) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
        mel = self._mel(i)
        T = len(mel)

        gate = np.ones((T, 1), np.float32)
        gate[-1] = 0.0  # stop frame (tts_dataset.py:211-215)

        chars_idx = self.encoder.encode(self.texts[i])

        out_data = {
            "chars_idx": chars_idx,
            "mel_spectrogram": mel.astype(np.float32),
            "gate": gate,
        }
        out_metadata: Dict[str, Any] = {
            "chars_idx_len": np.int64(len(chars_idx)),
            "mel_spectrogram_len": np.int64(T),
            "gate_len": np.int64(T),
        }
        out_extra: Dict[str, Any] = {}
        if self.include_text:
            out_extra["text"] = self.texts[i]
        if self.include_filename:
            out_extra["filename"] = self.filenames[i]
        if self.speaker_ids is not None:
            out_metadata["speaker_id"] = np.int64(self.speaker_ids[i])
        if self.description_embeddings is not None:
            out_metadata["description_embeddings"] = self._description_embedding(i)
        if self.features is not None:
            if self.feature_override is not None:
                out_metadata["features"] = np.asarray(self.feature_override, np.float32)
            else:
                out_metadata["features"] = np.asarray(self.features[i], np.float32)
        return out_data, out_metadata, out_extra
