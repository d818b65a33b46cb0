"""Native FLAC decoder tests (vs the pure-Python encoder fixture) and the
offline preprocessing pipeline (feature extraction, splits, normalization)."""

import os

import numpy as np
import pytest

from tests.flac_encoder import encode_flac


def _roundtrip(tmp_path, samples, mode, channels_note="", **kw):
    from tacotron2_tpu.audio.flac import read_flac

    p = str(tmp_path / f"t_{mode}.flac")
    with open(p, "wb") as f:
        f.write(encode_flac(samples, subframe_mode=mode, **kw))
    wav, sr = read_flac(p, mono=False if np.ndim(samples) > 1 else True)
    return wav, sr


@pytest.fixture(scope="module")
def tone16():
    t = np.arange(22050 // 2)
    return (np.sin(2 * np.pi * 440 * t / 22050) * 12000).astype(np.int64)


@pytest.mark.parametrize("mode", ["verbatim", "fixed0", "fixed1", "fixed2", "lpc2"])
def test_flac_decode_subframe_modes(tmp_path, tone16, mode):
    wav, sr = _roundtrip(tmp_path, tone16, mode)
    assert sr == 22050
    assert len(wav) == len(tone16)
    np.testing.assert_allclose(wav, tone16 / 32768.0, atol=1e-6)


def test_flac_decode_constant(tmp_path):
    samples = np.full(5000, 123, dtype=np.int64)
    wav, sr = _roundtrip(tmp_path, samples, "constant")
    np.testing.assert_allclose(wav, 123 / 32768.0, atol=1e-6)


def test_flac_decode_stereo(tmp_path, tone16):
    stereo = np.stack([tone16, -tone16], axis=1)
    wav, sr = _roundtrip(tmp_path, stereo, "fixed1")
    assert wav.shape == (len(tone16), 2)
    np.testing.assert_allclose(wav[:, 0], tone16 / 32768.0, atol=1e-6)
    np.testing.assert_allclose(wav[:, 1], -tone16 / 32768.0, atol=1e-6)


def test_flac_multiple_blocks(tmp_path, tone16):
    wav, _ = _roundtrip(tmp_path, tone16, "fixed2", block_size=1000)
    np.testing.assert_allclose(wav, tone16 / 32768.0, atol=1e-6)


def test_flac_decoder_rejects_malformed(tmp_path, tone16):
    """Truncated/corrupt streams must raise, not crash or hang."""
    from tacotron2_tpu.audio.flac import read_flac

    good = encode_flac(tone16)
    cases = {
        "truncated_header.flac": good[:20],
        "truncated_frames.flac": good[: len(good) // 2],
        "not_flac.flac": b"RIFFxxxxWAVE" + b"\x00" * 100,
        "empty.flac": b"",
        "garbage.flac": bytes(range(256)) * 8,
    }
    for name, payload in cases.items():
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(payload)
        with pytest.raises((ValueError, FileNotFoundError)):
            read_flac(p)


def test_dataset_reads_flac(tmp_path, tone16):
    """TTSDataset loads .flac corpora through the native decoder."""
    from tacotron2_tpu.data import TTSDataset

    with open(tmp_path / "a.flac", "wb") as f:
        f.write(encode_flac(tone16))
    ds = TTSDataset(
        ["a.flac"], ["hello"], str(tmp_path), trim=False,
        allowed_chars="abcdefghijklmnopqrstuvwxyz ", end_token="^",
    )
    data, meta, _ = ds[0]
    assert data["mel_spectrogram"].shape == (1 + len(tone16) // 256, 80)


def test_load_audio_dispatch(tmp_path, tone16):
    from tacotron2_tpu.audio.io import load_audio, write_wav

    p = str(tmp_path / "a.flac")
    with open(p, "wb") as f:
        f.write(encode_flac(tone16))
    wav, sr = load_audio(p)
    assert sr == 22050 and len(wav) == len(tone16)
    pw = str(tmp_path / "a.wav")
    write_wav(pw, wav, sr)
    wav2, _ = load_audio(pw)
    np.testing.assert_allclose(wav, wav2, atol=1e-3)


# -- prosody features ---------------------------------------------------------


def _speechlike(sr=22050, f0=150.0, dur=1.0, seed=0):
    """Synthetic voiced signal: harmonic pulse train + noise + AM envelope."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * dur)) / sr
    sig = sum((1.0 / k) * np.sin(2 * np.pi * f0 * k * t) for k in range(1, 6))
    env = 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2  # ~3 Hz syllable-ish AM
    return (0.2 * env * sig + 0.002 * rng.standard_normal(len(t))).astype(np.float32)


def test_extract_features_pitch_accuracy():
    from tacotron2_tpu.audio.prosody import FEATURE_NAMES, extract_features

    wav = _speechlike(f0=150.0)
    feats = extract_features(wav, 22050)
    assert feats is not None
    assert set(feats) == set(FEATURE_NAMES)
    # pitch_mean is log10 Hz
    assert abs(10 ** feats["pitch_mean"] - 150.0) < 8.0
    assert feats["duration"] == pytest.approx(1.0, abs=0.01)
    assert 0 < feats["duration_vcd"] <= feats["duration"] + 0.05
    assert feats["jitter"] >= 0 and feats["shimmer"] >= 0
    assert feats["nhr_vcd"] <= feats["nhr"] + 1e-6  # voiced frames more harmonic


def test_native_extractor_matches_numpy():
    """The C++ backend (native/prosody.cpp) must match the numpy reference
    implementation on every feature."""
    from tacotron2_tpu.audio.prosody import (
        FEATURE_NAMES,
        _extract_features_numpy,
        extract_features_native,
    )

    for seed, f0 in ((0, 120.0), (1, 200.0), (2, 330.0)):
        wav = _speechlike(f0=f0, dur=0.8, seed=seed)
        a = _extract_features_numpy(wav, 22050)
        b = extract_features_native(wav, 22050)
        assert a is not None and b is not None
        for k in FEATURE_NAMES:
            assert abs(a[k] - b[k]) <= 0.02 * max(abs(a[k]), 1e-3), (k, a[k], b[k])


def test_native_extractor_degenerate():
    from tacotron2_tpu.audio.prosody import extract_features_native

    assert extract_features_native(np.zeros(22050, np.float32), 22050) is None


def test_extract_features_degenerate_returns_none():
    from tacotron2_tpu.audio.prosody import extract_features

    assert extract_features(np.zeros(22050, np.float32), 22050) is None
    assert extract_features(np.zeros(10, np.float32), 22050) is None


def test_extract_features_pitch_ordering():
    from tacotron2_tpu.audio.prosody import extract_features

    low = extract_features(_speechlike(f0=110.0), 22050)
    high = extract_features(_speechlike(f0=220.0), 22050)
    assert high["pitch_mean"] > low["pitch_mean"]
    assert low["pitch_5"] <= low["pitch_mean"] <= low["pitch_95"]


# -- splits / normalization ----------------------------------------------------


def _feature_df(n=200, seed=0):
    import pandas as pd

    from tacotron2_tpu.audio.prosody import FEATURE_NAMES

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({f: rng.normal(loc=i, scale=1 + 0.1 * i, size=n) for i, f in enumerate(FEATURE_NAMES)})
    df["text"] = [f"utterance {i}" for i in range(n)]
    df["wav"] = [f"wavs/{i}.wav" for i in range(n)]
    return df


def test_normalize_median_pm_3sigma():
    from preprocessing.splits import FEATURES_ALL, normalize

    df = _feature_df()
    med, std = df[FEATURES_ALL].median(), df[FEATURES_ALL].std()
    normed = normalize(df[FEATURES_ALL], med, std)
    # median maps to 0, median±3σ to ±1
    assert np.allclose(normalize(med.to_frame().T, med, std).values, 0.0, atol=1e-12)
    assert np.abs(normed.values).max() < 2.0  # tails can exceed 1 pre-clip


def test_split_ljspeech(tmp_path):
    import csv

    import pandas as pd

    from preprocessing.splits import FEATURES_ALL_SPEAKER_NORM_CLIP, split_ljspeech

    df = _feature_df(n=120)
    src = str(tmp_path / "lj.csv")
    df.to_csv(src, sep="|", index=None, quoting=csv.QUOTE_NONE)
    outs = [str(tmp_path / f"{s}.csv") for s in ("train", "val", "test")]
    split_ljspeech(src, *outs, val_size=10, test_size=20, random_state=9001)
    train = pd.read_csv(outs[0], delimiter="|", quoting=csv.QUOTE_NONE)
    val = pd.read_csv(outs[1], delimiter="|", quoting=csv.QUOTE_NONE)
    test = pd.read_csv(outs[2], delimiter="|", quoting=csv.QUOTE_NONE)
    assert len(train) == 90 and len(val) == 10 and len(test) == 20
    for col in FEATURES_ALL_SPEAKER_NORM_CLIP:
        assert col in train.columns
        assert train[col].abs().max() <= 1.0 + 1e-9


def _hifi_feature_df(n_per_speaker, speakers=(92, 6097, 9017), seed=0):
    import pandas as pd

    from tacotron2_tpu.audio.prosody import FEATURE_NAMES

    rng = np.random.default_rng(seed)
    rows = []
    for s_idx, spk in enumerate(speakers):
        for i in range(n_per_speaker):
            row = {f: rng.normal(loc=j, scale=1.0) for j, f in enumerate(FEATURE_NAMES)}
            row.update(
                text=f"utt {spk} {i}", wav=f"audio_22050/{spk}/{i}.wav",
                speaker_id=s_idx, speaker_id_dataset=spk,
            )
            rows.append(row)
    return pd.DataFrame(rows)


def test_split_hifi_size_fixup_and_norms(tmp_path):
    import csv

    import pandas as pd

    from preprocessing.splits import (
        FEATURES_ALL_DATASET_GENDER_NORM_CLIP,
        FEATURES_ALL_DATASET_NORM_CLIP,
        FEATURES_ALL_SPEAKER_NORM_CLIP,
        split_hifi,
    )

    train = _hifi_feature_df(30)
    val = _hifi_feature_df(2, seed=1)  # too small: must borrow from train
    test = _hifi_feature_df(3, seed=2)
    paths = {}
    for name, df in (("train", train), ("val", val), ("test", test)):
        p = str(tmp_path / f"{name}.csv")
        df.to_csv(p, sep="|", index=None, quoting=csv.QUOTE_NONE)
        paths[name] = p
    outs = {n: str(tmp_path / f"o_{n}.csv") for n in ("train", "val", "test")}
    split_hifi(paths["train"], paths["val"], paths["test"],
               outs["train"], outs["val"], outs["test"],
               speaker_val_size=5, speaker_test_size=8, random_state=9001)

    otrain = pd.read_csv(outs["train"], delimiter="|", quoting=csv.QUOTE_NONE)
    oval = pd.read_csv(outs["val"], delimiter="|", quoting=csv.QUOTE_NONE)
    otest = pd.read_csv(outs["test"], delimiter="|", quoting=csv.QUOTE_NONE)
    # per-speaker sizes fixed up by borrowing from train (hifi.py:180-203)
    assert all(oval.groupby("speaker_id").size() == 5)
    assert all(otest.groupby("speaker_id").size() == 8)
    # conservation: borrowed rows leave train
    assert len(otrain) == 90 - 3 * (5 - 2) - 3 * (8 - 3)
    # gender annotation (hifi.py:18) + all three norm families present
    assert set(otrain.gender.unique()) == {"f", "m"}
    for col_set in (FEATURES_ALL_SPEAKER_NORM_CLIP, FEATURES_ALL_DATASET_NORM_CLIP,
                    FEATURES_ALL_DATASET_GENDER_NORM_CLIP):
        for c in col_set:
            assert c in otrain.columns
            assert otrain[c].abs().max() <= 1.0 + 1e-9


def test_split_lj_hifi_merge(tmp_path):
    import csv

    import pandas as pd

    from preprocessing.splits import split_hifi, split_lj_hifi
    from tacotron2_tpu.audio.prosody import FEATURE_NAMES

    # hifi CSVs (already through split_hifi to get gender column)
    train = _hifi_feature_df(20)
    val = _hifi_feature_df(6, seed=1)
    test = _hifi_feature_df(6, seed=2)
    hp = {}
    for name, df in (("train", train), ("val", val), ("test", test)):
        p = str(tmp_path / f"h_{name}.csv")
        df.to_csv(p, sep="|", index=None, quoting=csv.QUOTE_NONE)
        hp[name] = p
    ho = {n: str(tmp_path / f"ho_{n}.csv") for n in ("train", "val", "test")}
    split_hifi(hp["train"], hp["val"], hp["test"], ho["train"], ho["val"], ho["test"],
               speaker_val_size=6, speaker_test_size=6, random_state=9001)

    # LJ CSVs (single speaker, fewer val/test rows than each hifi speaker)
    rng = np.random.default_rng(5)
    def lj_df(n, seed):
        r = np.random.default_rng(seed)
        return pd.DataFrame(
            [dict({f: r.normal() for f in FEATURE_NAMES},
                  text=f"lj {i}", wav=f"wavs/{i}.wav") for i in range(n)]
        )
    lp = {}
    for name, n in (("train", 25), ("val", 4), ("test", 4)):
        p = str(tmp_path / f"l_{name}.csv")
        lj_df(n, hash(name) % 100).to_csv(p, sep="|", index=None, quoting=csv.QUOTE_NONE)
        lp[name] = p

    outs = {n: str(tmp_path / f"m_{n}.csv") for n in ("train", "val", "test")}
    split_lj_hifi(ho["train"], ho["val"], ho["test"], lp["train"], lp["val"], lp["test"],
                  outs["train"], outs["val"], outs["test"])
    m = pd.read_csv(outs["train"], delimiter="|", quoting=csv.QUOTE_NONE)
    # LJ gets gender f and the next speaker id (lj-hifi.py:91-98)
    lj_rows = m[m.wav.str.startswith("LJSpeech-1.1")]
    assert (lj_rows.gender == "f").all()
    assert lj_rows.speaker_id.unique().tolist() == [3]
    assert m.wav.str.startswith(("hi_fi_tts_v0", "LJSpeech-1.1")).all()


def test_ljspeech_preprocess_end_to_end(tmp_path):
    import pandas as pd

    from preprocessing.ljspeech import do_preprocess
    from tacotron2_tpu.audio.io import write_wav

    speech = tmp_path / "LJ"
    (speech / "wavs").mkdir(parents=True)
    rows = []
    for i in range(3):
        wav = _speechlike(f0=120 + 40 * i, dur=0.6, seed=i)
        write_wav(str(speech / "wavs" / f"LJ00{i}.wav"), wav, 22050)
        rows.append(f"LJ00{i}|Text {i}|text {i} normalized")
    with open(speech / "metadata.csv", "w") as f:
        f.write("\n".join(rows) + "\n")

    out = do_preprocess(str(speech), str(tmp_path), "test", n_jobs=1)
    df = pd.read_csv(out, delimiter="|")
    assert len(df) == 3
    assert "pitch_mean" in df.columns and "wav" in df.columns and "text" in df.columns
    assert df.wav[0] == os.path.join("wavs", "LJ000.wav")


def test_hifi_preprocess_end_to_end(tmp_path):
    import json

    import pandas as pd

    speech = tmp_path / "hifi"
    (speech / "audio").mkdir(parents=True)
    for spk_i, spk in enumerate(["92", "6097"]):
        for set_name in ("train", "dev", "test"):
            entries = []
            for j in range(2):
                rel = f"audio/{spk}_{set_name}_{j}.flac"
                wav = (_speechlike(f0=120 + 60 * spk_i, dur=0.6, seed=j) * 20000).astype(np.int64)
                with open(speech / rel, "wb") as f:
                    f.write(encode_flac(wav, sample_rate=44100))
                entries.append({"audio_filepath": rel, "text_normalized": f"clip {j}"})
            with open(speech / f"{spk}_manifest_clean_{set_name}.json", "w") as f:
                f.write("\n".join(json.dumps(e) for e in entries) + "\n")

    from preprocessing.hifi_tts import do_preprocess

    do_preprocess(str(speech), str(tmp_path), "t", n_jobs=1)
    train = pd.read_csv(tmp_path / "hifi-tts-train-t.csv", delimiter="|")
    assert len(train) == 4
    assert sorted(train.speaker_id.unique()) == [0, 1]  # ordinal-encoded
    # resampled wavs written at 22050
    from tacotron2_tpu.audio.io import read_wav

    wav, sr = read_wav(str(speech / train.wav[0]))
    assert sr == 22050


def test_libritts_index(tmp_path):
    from preprocessing.splits import index_libritts

    root = tmp_path / "libritts"
    d = root / "dev-clean" / "84" / "1234"
    d.mkdir(parents=True)
    from tacotron2_tpu.audio.io import write_wav

    write_wav(str(d / "84_1234_000001_000001.wav"), _speechlike(dur=0.3), 22050)
    with open(d / "84_1234_000001_000001.normalized.txt", "w") as f:
        f.write("hello there\n")
    index_libritts(str(root), str(tmp_path), sets=("dev-clean",))
    with open(tmp_path / "libritts-dev-clean.csv") as f:
        lines = f.read().strip().split("\n")
    assert lines[0] == "wav|speaker_id|text_normalized"
    assert len(lines) == 2 and "hello there" in lines[1]
