"""Hi-Fi TTS offline preprocessing — rebuild of preprocessing/hifi_tts.py:20-168.

Parses NeMo-style ``{speaker}_manifest_clean_{set}.json`` manifests,
resamples FLAC -> 22050 Hz WAV with clip prevention (the reference's Praat
``scale_peak()``, hifi_tts.py:38-59 — here: polyphase resample + peak
rescale when |x| > 0.99), optional trim, feature extraction, speaker-ID
ordinal encoding to 0..N (train-fit, applied to dev/test), and per-split
CSVs. FLAC decode uses the native C++ decoder (tacotron2_tpu.audio.flac).
"""

from __future__ import annotations

import csv
import json
import os
from concurrent.futures import ProcessPoolExecutor
from functools import partial
from os import path
from typing import Optional

import numpy as np

from tacotron2_tpu.audio.io import load_audio, write_wav
from tacotron2_tpu.audio.prosody import extract_features
from tacotron2_tpu.audio.trim import trim_silence

TARGET_SR = 22050


def _load_set(base_dir: str, set_name: str):
    import pandas as pd

    rows = []
    for file in (x for x in os.listdir(base_dir) if "clean" in x and set_name in x):
        speaker = file.split("_")[0]
        with open(path.join(base_dir, f"{speaker}_manifest_clean_{set_name}.json")) as infile:
            for line in infile:
                data = json.loads(line)
                data["speaker_id"] = speaker
                rows.append(data)
    return pd.DataFrame(rows)


def resample_no_clip(wav: np.ndarray, sr: int, target_sr: int = TARGET_SR) -> np.ndarray:
    """Polyphase resample; rescale peaks to ±0.99 if resampling would clip
    (the reference's __no_clip, hifi_tts.py:38-59)."""
    if sr != target_sr:
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(target_sr, sr)
        wav = resample_poly(wav.astype(np.float64), target_sr // g, sr // g).astype(np.float32)
    peak = np.max(np.abs(wav)) if len(wav) else 0.0
    if peak > 0.99:
        wav = wav * (0.99 / peak)
    return wav


def _process_row(speech_dir: str, trim: bool, trim_top_db: float, row: dict) -> Optional[dict]:
    filepath = row["audio_filepath"]
    try:
        wav, sr = load_audio(path.join(speech_dir, filepath))
    except (FileNotFoundError, ValueError):
        return None
    wav = resample_no_clip(wav, sr)

    # mirror the reference's path rewrite: audio/... -> audio_22050/...  .wav
    resampled_rel = "audio_22050" + filepath[5:].replace("flac", "wav")
    out_path = path.join(speech_dir, resampled_rel)
    os.makedirs(path.dirname(out_path), exist_ok=True)
    write_wav(out_path, wav, TARGET_SR)
    final_rel = resampled_rel

    if trim:
        trimmed_rel = "audio_22050_trimmed" + filepath[5:].replace("flac", "wav")
        trimmed, _ = trim_silence(wav, top_db=trim_top_db)
        t_path = path.join(speech_dir, trimmed_rel)
        os.makedirs(path.dirname(t_path), exist_ok=True)
        write_wav(t_path, trimmed, TARGET_SR)
        wav = trimmed
        final_rel = trimmed_rel

    features = extract_features(wav, TARGET_SR, transcript=row.get("text_normalized"))
    if features is None:
        return None
    features["speaker_id_dataset"] = int(row["speaker_id"])
    features["text"] = row.get("text_normalized")
    features["wav"] = final_rel
    return features


def _set_preprocess(speech_dir: str, set_name: str, n_jobs: int, trim: bool, trim_top_db: float):
    import pandas as pd

    df = _load_set(speech_dir, set_name)
    rows = [row.to_dict() for _, row in df.iterrows()]
    worker = partial(_process_row, speech_dir, trim, trim_top_db)
    if n_jobs > 1:
        with ProcessPoolExecutor(max_workers=n_jobs) as pool:
            results = list(pool.map(worker, rows, chunksize=8))
    else:
        results = [worker(r) for r in rows]
    return pd.DataFrame([x for x in results if isinstance(x, dict)])


def do_preprocess(
    speech_dir: str,
    out_dir: str,
    out_postfix: str,
    n_jobs: int = 8,
    trim: bool = False,
    trim_top_db: float = 60.0,
):
    train_df = _set_preprocess(speech_dir, "train", n_jobs, trim, trim_top_db)
    val_df = _set_preprocess(speech_dir, "dev", n_jobs, trim, trim_top_db)
    test_df = _set_preprocess(speech_dir, "test", n_jobs, trim, trim_top_db)

    # ordinal-encode speaker ids 0..N by sorted order, train-fit
    # (hifi_tts.py:147-160; sklearn OrdinalEncoder sorts categories)
    cats = sorted(train_df.speaker_id_dataset.unique())
    mapping = {c: i for i, c in enumerate(cats)}
    for df in (train_df, val_df, test_df):
        df["speaker_id"] = df.speaker_id_dataset.map(mapping).astype(np.int64)

    for set_df, set_name in zip([train_df, val_df, test_df], ["train", "val", "test"]):
        set_df.to_csv(
            path.join(out_dir, f"hifi-tts-{set_name}-{out_postfix}.csv"),
            sep="|",
            quoting=csv.QUOTE_NONE,
            index=None,
        )
    print(f"hifi-tts: train {len(train_df)}, val {len(val_df)}, test {len(test_df)}")
