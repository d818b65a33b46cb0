"""Dataset split + feature-normalization CLIs.

Rebuild of the reference's standalone scripts in
preprocessing/preprocessing_split/ (normalize.py, ljspeech.py, hifi.py,
lj-hifi.py) and data/preprocessing/libritts.py, as one module with click
subcommands:

    python -m preprocessing.splits ljspeech --csv-in ... --train-out ...
    python -m preprocessing.splits hifi --train-in ... ...
    python -m preprocessing.splits lj-hifi --hifi-train-in ... ...
    python -m preprocessing.splits libritts-index --libritts-dir ...

Normalization contract (normalize.py:48-56): per-feature median±3σ from the
TRAIN split mapped linearly to [-1, 1], plus ``_clip`` variants clipped to
that range. Norm families: dataset / speaker / dataset_gender.
"""

from __future__ import annotations

import csv
import os
from os import path
from typing import Dict

import click
import numpy as np

from tacotron2_tpu.audio.prosody import FEATURE_NAMES as FEATURES_ALL

FEATURES_ALL_SPEAKER_NORM = [f"{x}_speaker_norm" for x in FEATURES_ALL]
FEATURES_ALL_SPEAKER_NORM_CLIP = [f"{x}_clip" for x in FEATURES_ALL_SPEAKER_NORM]
FEATURES_ALL_DATASET_NORM = [f"{x}_dataset_norm" for x in FEATURES_ALL]
FEATURES_ALL_DATASET_NORM_CLIP = [f"{x}_clip" for x in FEATURES_ALL_DATASET_NORM]
FEATURES_ALL_DATASET_GENDER_NORM = [f"{x}_dataset_gender_norm" for x in FEATURES_ALL]
FEATURES_ALL_DATASET_GENDER_NORM_CLIP = [f"{x}_clip" for x in FEATURES_ALL_DATASET_GENDER_NORM]

HIFI_GENDER = {92: "f", 6097: "m", 9017: "m"}  # preprocessing_split/hifi.py:18


def normalize(df, medians, stds):
    """median±3σ -> [-1, 1] linear map (normalize.py:48-56)."""
    minimums = medians - 3 * stds
    maximums = medians + 3 * stds
    return (((df - minimums) * 2.0) / (maximums - minimums)) + -1.0


def do_norm(df, feature_medians, feature_stds, F, F_CLIP):
    df[F] = normalize(df[FEATURES_ALL], feature_medians, feature_stds).values
    df[F_CLIP] = df[F].clip(-1, 1).values


def do_norm_by(df, df_train, F, F_CLIP, by: str):
    """Group-wise normalization with train-split statistics (hifi.py:193+)."""
    import pandas as pd

    medians: Dict = {}
    stds: Dict = {}
    for key, group in df_train.groupby(by):
        medians[key] = group[FEATURES_ALL].median()
        stds[key] = group[FEATURES_ALL].std()
    parts = []
    for key, group in df.groupby(by):
        group = group.copy()
        do_norm(group, medians[key], stds[key], F, F_CLIP)
        parts.append(group)
    return pd.concat(parts, ignore_index=True)


def _train_test_split(df, test_size: int, random_state: int):
    """sklearn.model_selection.train_test_split equivalent (shuffled)."""
    from sklearn.model_selection import train_test_split as tts

    return tts(df, test_size=test_size, random_state=random_state)


def _read(p):
    import pandas as pd

    return pd.read_csv(p, delimiter="|", quoting=csv.QUOTE_NONE)


def _write(df, p):
    df.to_csv(p, sep="|", quoting=csv.QUOTE_NONE, index=None)


# ---------------------------------------------------------------------------
# ljspeech: split + speaker norm (preprocessing_split/ljspeech.py)
# ---------------------------------------------------------------------------


def split_ljspeech(csv_in, train_out, val_out, test_out, val_size=100, test_size=2000, random_state=9001):
    df = _read(csv_in)
    df_train, df_test = _train_test_split(df, test_size, random_state)
    df_train, df_val = _train_test_split(df_train, val_size, random_state)
    assert len(df_train) + len(df_test) + len(df_val) == len(df)

    medians = df_train[FEATURES_ALL].median()
    stds = df_train[FEATURES_ALL].std()
    for d in (df_train, df_val, df_test):
        do_norm(d, medians, stds, FEATURES_ALL_SPEAKER_NORM, FEATURES_ALL_SPEAKER_NORM_CLIP)
    _write(df_train, train_out)
    _write(df_val, val_out)
    _write(df_test, test_out)


# ---------------------------------------------------------------------------
# hifi: per-speaker split fixup + 3 norm families (preprocessing_split/hifi.py)
# ---------------------------------------------------------------------------


def fix_sizes(df_train_split, df, expected_size, random_state):
    """Borrow train rows so each speaker's split reaches the expected size
    (hifi.py:180-203)."""
    import pandas as pd

    new_df = []
    for speaker_id, group in df.groupby("speaker_id"):
        new_df.append(group)
        diff = expected_size - len(group)
        if diff <= 0:
            continue
        remaining, borrowed = _train_test_split(df_train_split[speaker_id], diff, random_state)
        df_train_split[speaker_id] = remaining
        new_df.append(borrowed)
    return pd.concat(new_df, ignore_index=True)


def split_hifi(train_in, val_in, test_in, train_out, val_out, test_out,
               speaker_val_size=100, speaker_test_size=2000, random_state=9001):
    import pandas as pd

    df_train, df_val, df_test = _read(train_in), _read(val_in), _read(test_in)
    for d in (df_train, df_val, df_test):
        d["gender"] = [HIFI_GENDER[i] for i in d.speaker_id_dataset]

    split = {sid: g for sid, g in df_train.groupby("speaker_id")}
    df_val = fix_sizes(split, df_val, speaker_val_size, random_state)
    df_test = fix_sizes(split, df_test, speaker_test_size, random_state)
    df_train = pd.concat(split.values(), ignore_index=True)

    medians, stds = df_train[FEATURES_ALL].median(), df_train[FEATURES_ALL].std()
    for d in (df_train, df_val, df_test):
        do_norm(d, medians, stds, FEATURES_ALL_DATASET_NORM, FEATURES_ALL_DATASET_NORM_CLIP)
    df_train2 = do_norm_by(df_train, df_train, FEATURES_ALL_SPEAKER_NORM, FEATURES_ALL_SPEAKER_NORM_CLIP, "speaker_id")
    df_val = do_norm_by(df_val, df_train, FEATURES_ALL_SPEAKER_NORM, FEATURES_ALL_SPEAKER_NORM_CLIP, "speaker_id")
    df_test = do_norm_by(df_test, df_train, FEATURES_ALL_SPEAKER_NORM, FEATURES_ALL_SPEAKER_NORM_CLIP, "speaker_id")
    df_train = df_train2
    df_train2 = do_norm_by(df_train, df_train, FEATURES_ALL_DATASET_GENDER_NORM, FEATURES_ALL_DATASET_GENDER_NORM_CLIP, "gender")
    df_val = do_norm_by(df_val, df_train, FEATURES_ALL_DATASET_GENDER_NORM, FEATURES_ALL_DATASET_GENDER_NORM_CLIP, "gender")
    df_test = do_norm_by(df_test, df_train, FEATURES_ALL_DATASET_GENDER_NORM, FEATURES_ALL_DATASET_GENDER_NORM_CLIP, "gender")
    df_train = df_train2
    _write(df_train, train_out)
    _write(df_val, val_out)
    _write(df_test, test_out)


# ---------------------------------------------------------------------------
# lj-hifi merge (preprocessing_split/lj-hifi.py)
# ---------------------------------------------------------------------------


def split_lj_hifi(hifi_train_in, hifi_val_in, hifi_test_in,
                  lj_train_in, lj_val_in, lj_test_in,
                  train_out, val_out, test_out,
                  hifi_dir="hi_fi_tts_v0", lj_dir="LJSpeech-1.1"):
    import pandas as pd

    hifi = [_read(p) for p in (hifi_train_in, hifi_val_in, hifi_test_in)]
    lj = [_read(p) for p in (lj_train_in, lj_val_in, lj_test_in)]
    for d in hifi:
        d.wav = [path.join(hifi_dir, x) for x in d.wav]
    for d in lj:
        d.wav = [path.join(lj_dir, x) for x in d.wav]
        d["gender"] = "f"  # LJ speaker annotation (lj-hifi.py:91-98)
    lj_speaker_id = hifi[0].speaker_id.max() + 1
    for d in lj:
        d["speaker_id"] = lj_speaker_id

    # sanity checks (lj-hifi.py:100-110)
    for split_name, h, l in (("val", hifi[1], lj[1]), ("test", hifi[2], lj[2])):
        for sid, g in h.groupby("speaker_id"):
            if len(g) < len(l):
                raise ValueError(
                    f"Speaker {sid} in HiFi-TTS {split_name} has {len(g)} instances, "
                    f"fewer than LJSpeech's {len(l)}"
                )

    df_train = pd.concat([hifi[0], lj[0]], ignore_index=True)
    df_val = pd.concat([hifi[1], lj[1]], ignore_index=True)
    df_test = pd.concat([hifi[2], lj[2]], ignore_index=True)

    medians, stds = df_train[FEATURES_ALL].median(), df_train[FEATURES_ALL].std()
    for d in (df_train, df_val, df_test):
        do_norm(d, medians, stds, FEATURES_ALL_DATASET_NORM, FEATURES_ALL_DATASET_NORM_CLIP)
    df_train2 = do_norm_by(df_train, df_train, FEATURES_ALL_SPEAKER_NORM, FEATURES_ALL_SPEAKER_NORM_CLIP, "speaker_id")
    df_val = do_norm_by(df_val, df_train, FEATURES_ALL_SPEAKER_NORM, FEATURES_ALL_SPEAKER_NORM_CLIP, "speaker_id")
    df_test = do_norm_by(df_test, df_train, FEATURES_ALL_SPEAKER_NORM, FEATURES_ALL_SPEAKER_NORM_CLIP, "speaker_id")
    df_train = df_train2
    df_train2 = do_norm_by(df_train, df_train, FEATURES_ALL_DATASET_GENDER_NORM, FEATURES_ALL_DATASET_GENDER_NORM_CLIP, "gender")
    df_val = do_norm_by(df_val, df_train, FEATURES_ALL_DATASET_GENDER_NORM, FEATURES_ALL_DATASET_GENDER_NORM_CLIP, "gender")
    df_test = do_norm_by(df_test, df_train, FEATURES_ALL_DATASET_GENDER_NORM, FEATURES_ALL_DATASET_GENDER_NORM_CLIP, "gender")
    df_train = df_train2
    _write(df_train, train_out)
    _write(df_val, val_out)
    _write(df_test, test_out)


# ---------------------------------------------------------------------------
# LibriTTS indexer (data/preprocessing/libritts.py)
# ---------------------------------------------------------------------------


def index_libritts(libritts_dir, out_dir, durations_csv=None, max_duration=10.0,
                   sets=("dev-clean", "test-clean", "train-clean-100")):
    """Walk speaker/chapter dirs, filter clips <= max_duration, pair wavs
    with .normalized.txt transcripts; write per-set CSVs + speaker-id list
    (wav|speaker_id|text_normalized schema, SURVEY §2.6)."""
    durations = {}
    if durations_csv and path.exists(durations_csv):
        import pandas as pd

        ddf = pd.read_csv(durations_csv)
        durations = dict(zip(ddf.iloc[:, 0], ddf.iloc[:, 1]))

    speaker_ids = set()
    for set_name in sets:
        rows = []
        set_dir = path.join(libritts_dir, set_name)
        if not path.isdir(set_dir):
            continue
        for speaker in sorted(os.listdir(set_dir)):
            sp_dir = path.join(set_dir, speaker)
            if not path.isdir(sp_dir):
                continue
            for chapter in sorted(os.listdir(sp_dir)):
                ch_dir = path.join(sp_dir, chapter)
                if not path.isdir(ch_dir):
                    continue
                for f in sorted(os.listdir(ch_dir)):
                    if not f.endswith(".wav"):
                        continue
                    rel = path.join(set_name, speaker, chapter, f)
                    if durations and durations.get(rel, 0.0) > max_duration:
                        continue
                    txt = path.join(ch_dir, f.replace(".wav", ".normalized.txt"))
                    if not path.exists(txt):
                        continue
                    with open(txt) as tf:
                        text = tf.read().strip()
                    rows.append((rel, speaker, text))
                    speaker_ids.add(speaker)
        out_path = path.join(out_dir, f"libritts-{set_name}.csv")
        with open(out_path, "w") as f:
            f.write("wav|speaker_id|text_normalized\n")
            for rel, speaker, text in rows:
                f.write(f"{rel}|{speaker}|{text}\n")
        print(f"{set_name}: {len(rows)} clips")
    with open(path.join(out_dir, "libritts-speaker-ids.csv"), "w") as f:
        for s in sorted(speaker_ids):
            f.write(f"{s}\n")


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


@click.group()
def main():
    pass


@main.command("ljspeech")
@click.option("--csv-in", type=str, required=True)
@click.option("--train-out", type=str, required=True)
@click.option("--val-out", type=str, required=True)
@click.option("--test-out", type=str, required=True)
@click.option("--val-size", type=int, default=100)
@click.option("--test-size", type=int, default=2000)
@click.option("--random_state", type=int, default=9001)
def _lj_cmd(csv_in, train_out, val_out, test_out, val_size, test_size, random_state):
    split_ljspeech(csv_in, train_out, val_out, test_out, val_size, test_size, random_state)


@main.command("hifi")
@click.option("--train-in", type=str, required=True)
@click.option("--val-in", type=str, required=True)
@click.option("--test-in", type=str, required=True)
@click.option("--train-out", type=str, required=True)
@click.option("--val-out", type=str, required=True)
@click.option("--test-out", type=str, required=True)
@click.option("--speaker-val-size", type=int, default=100)
@click.option("--speaker-test-size", type=int, default=2000)
@click.option("--random_state", type=int, default=9001)
def _hifi_cmd(train_in, val_in, test_in, train_out, val_out, test_out,
              speaker_val_size, speaker_test_size, random_state):
    split_hifi(train_in, val_in, test_in, train_out, val_out, test_out,
               speaker_val_size, speaker_test_size, random_state)


@main.command("lj-hifi")
@click.option("--hifi-train-in", type=str, required=True)
@click.option("--hifi-val-in", type=str, required=True)
@click.option("--hifi-test-in", type=str, required=True)
@click.option("--lj-train-in", type=str, required=True)
@click.option("--lj-val-in", type=str, required=True)
@click.option("--lj-test-in", type=str, required=True)
@click.option("--train-out", type=str, required=True)
@click.option("--val-out", type=str, required=True)
@click.option("--test-out", type=str, required=True)
@click.option("--hifi-dir", type=str, default="hi_fi_tts_v0")
@click.option("--lj-dir", type=str, default="LJSpeech-1.1")
def _lj_hifi_cmd(**kw):
    split_lj_hifi(**kw)


@main.command("libritts-index")
@click.option("--libritts-dir", type=str, required=True)
@click.option("--out-dir", type=str, default=".")
@click.option("--durations-csv", type=str, default=None)
@click.option("--max-duration", type=float, default=10.0)
def _libritts_cmd(libritts_dir, out_dir, durations_csv, max_duration):
    index_libritts(libritts_dir, out_dir, durations_csv, max_duration)


if __name__ == "__main__":
    main()
