"""LJSpeech offline preprocessing — rebuild of preprocessing/ljspeech.py:15-92.

Reads ``metadata.csv`` (pipe-sep, no header: id|text|text_normalized),
optionally trims into ``wavs_trimmed/``, extracts the 18 prosodic features
per utterance under a process pool, and writes ``ljspeech-{postfix}.csv``
(pipe-sep) with text/wav/feature columns. Rows whose extraction fails are
dropped (reference :37-38,83).
"""

from __future__ import annotations

import csv
import os
from concurrent.futures import ProcessPoolExecutor
from functools import partial
from os import path
from typing import Optional

from tacotron2_tpu.audio.io import read_wav, write_wav
from tacotron2_tpu.audio.prosody import extract_features
from tacotron2_tpu.audio.trim import trim_silence


def _process_row(speech_dir: str, trim: bool, trim_top_db: float, row: dict) -> Optional[dict]:
    filepath = path.join(speech_dir, "wavs", f"{row['id']}.wav")
    try:
        wav, sr = read_wav(filepath)
    except (FileNotFoundError, ValueError):
        return None

    wav_rel = path.join("wavs", f"{row['id']}.wav")
    if trim:
        trimmed, _ = trim_silence(wav, top_db=trim_top_db)
        wav_rel = path.join("wavs_trimmed", f"{row['id']}.wav")
        write_wav(path.join(speech_dir, wav_rel), trimmed, sr)
        wav = trimmed

    features = extract_features(wav, sr, transcript=row["text_normalized"])
    if features is None:
        return None
    features["text"] = row["text_normalized"]
    features["wav"] = wav_rel
    return features


def do_preprocess(
    speech_dir: str,
    out_dir: str,
    out_postfix: str,
    n_jobs: int = 8,
    trim: bool = False,
    trim_top_db: float = 60.0,
) -> str:
    import pandas as pd

    df = pd.read_csv(
        path.join(speech_dir, "metadata.csv"),
        delimiter="|",
        quoting=csv.QUOTE_NONE,
        header=None,
    )
    df.columns = ["id", "text", "text_normalized"]

    if trim:
        os.makedirs(path.join(speech_dir, "wavs_trimmed"), exist_ok=True)

    rows = [row.to_dict() for _, row in df.iterrows()]
    worker = partial(_process_row, speech_dir, trim, trim_top_db)
    if n_jobs > 1:
        with ProcessPoolExecutor(max_workers=n_jobs) as pool:
            results = list(pool.map(worker, rows, chunksize=16))
    else:
        results = [worker(r) for r in rows]
    results = [x for x in results if isinstance(x, dict)]

    out_path = path.join(out_dir, f"ljspeech-{out_postfix}.csv")
    pd.DataFrame(results).to_csv(out_path, sep="|", quoting=csv.QUOTE_NONE, index=None)
    print(f"preprocessed {len(results)}/{len(rows)} utterances -> {out_path}")
    return out_path
