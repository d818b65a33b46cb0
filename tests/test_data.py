"""Data pipeline tests: dataset item contract (vs reference TTSDataset
semantics), gate targets, mel caching, collate/bucketing, loader prefetch."""

import numpy as np
import pytest

from tacotron2_tpu.audio.io import write_wav
from tacotron2_tpu.data import TTSDataLoader, TTSDataset, collate

LJ_CHARS = "!'(),.:;? \\-abcdefghijklmnopqrstuvwxyz"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    names, texts = [], []
    for i, dur in enumerate([0.30, 0.45, 0.61]):
        wav = (0.3 * np.sin(2 * np.pi * 220 * (i + 1) * np.arange(int(22050 * dur)) / 22050)).astype(
            np.float32
        )
        name = f"clip{i}.wav"
        write_wav(str(d / name), wav, 22050)
        names.append(name)
        texts.append(["Hello world.", "A second clip!", "Mr. test?"][i])
    return str(d), names, texts


def _dataset(corpus, **kw):
    base, names, texts = corpus
    kw.setdefault("trim", False)
    return TTSDataset(names, texts, base, allowed_chars=LJ_CHARS, end_token="^", **kw)


def test_item_contract(corpus):
    ds = _dataset(corpus, include_text=True, include_filename=True, silence=512)
    data, meta, extra = ds[0]
    T = data["mel_spectrogram"].shape[0]
    assert data["mel_spectrogram"].shape == (T, 80)
    # frames = 1 + (samples + silence) // 256
    assert T == 1 + (int(22050 * 0.30) + 512) // 256
    assert data["gate"].shape == (T, 1)
    assert data["gate"][-1, 0] == 0.0 and np.all(data["gate"][:-1] == 1.0)
    assert meta["mel_spectrogram_len"] == T
    assert extra["text"] == "hello world.^"
    assert extra["filename"] == "clip0.wav"
    # chars encoded +1 (0 = padding)
    assert data["chars_idx"].min() >= 1


def test_abbreviation_expansion(corpus):
    ds = _dataset(corpus, expand_abbreviations=True, include_text=True)
    _, _, extra = ds[2]
    assert extra["text"] == "mister test?^"


def test_mel_cache_roundtrip(corpus, tmp_path):
    base, names, texts = corpus
    ds1 = _dataset(corpus, cache=True, cache_dir=str(tmp_path / "cache"))
    a = ds1[1][0]["mel_spectrogram"]
    ds2 = _dataset(corpus, cache=True, cache_dir=str(tmp_path / "cache"))
    b = ds2[1][0]["mel_spectrogram"]
    np.testing.assert_array_equal(a, b)
    assert (tmp_path / "cache" / f"clip1.wav.{ds1._cache_tag}.npy").exists()


def test_mel_cache_invalidates_on_param_change(corpus, tmp_path):
    """Changing a preprocessing param against the same cache_dir must MISS,
    not serve the stale mel (the reference keys on filename alone,
    tts_dataset.py:185-187)."""
    cache = str(tmp_path / "cache")
    ds1 = _dataset(corpus, cache=True, cache_dir=cache, num_mels=80)
    a = ds1[0][0]["mel_spectrogram"]
    ds2 = _dataset(corpus, cache=True, cache_dir=cache, num_mels=40)
    b = ds2[0][0]["mel_spectrogram"]
    assert a.shape[1] == 80 and b.shape[1] == 40
    assert ds1._cache_tag != ds2._cache_tag
    # silence changes the mel too — distinct tag
    ds3 = _dataset(corpus, cache=True, cache_dir=cache, silence=512)
    assert ds3._cache_tag != ds1._cache_tag


def test_collate_padding(corpus):
    ds = _dataset(corpus)
    batch = collate([ds[0], ds[1], ds[2]])
    B, L = batch["chars_idx"].shape
    assert B == 3
    assert L == batch["chars_len"].max()
    assert batch["mel"].shape[1] == batch["mel_len"].max()
    # padded tail zeros
    shortest = int(np.argmin(batch["chars_len"]))
    assert np.all(batch["chars_idx"][shortest, batch["chars_len"][shortest] :] == 0)
    assert np.all(batch["gate"][0, batch["mel_len"][0] :] == 0)


def test_collate_bucketing(corpus):
    ds = _dataset(corpus)
    batch = collate([ds[0], ds[1]], bucket_chars=32, bucket_frames=128)
    assert batch["chars_idx"].shape[1] % 32 == 0
    assert batch["mel"].shape[1] % 128 == 0


def test_speaker_and_features(corpus):
    base, names, texts = corpus
    ds = TTSDataset(
        names, texts, base, allowed_chars=LJ_CHARS, end_token="^", trim=False,
        speaker_ids=[0, 1, 2], features=[[0.1, -0.2]] * 3,
    )
    batch = collate([ds[0], ds[2]])
    np.testing.assert_array_equal(batch["speaker_id"], [0, 2])
    assert batch["controls"].shape == (2, 2)


def test_feature_override(corpus):
    base, names, texts = corpus
    ds = TTSDataset(
        names, texts, base, allowed_chars=LJ_CHARS, end_token="^", trim=False,
        features=[[0.1, -0.2]] * 3, feature_override=[0.5, 0.5],
    )
    _, meta, _ = ds[0]
    np.testing.assert_allclose(meta["features"], [0.5, 0.5])


def test_description_embeddings_zero_fallback(corpus):
    base, names, texts = corpus
    ds = TTSDataset(
        names, texts, base, allowed_chars=LJ_CHARS, end_token="^", trim=False,
        description_embeddings=[None, None, None], description_embeddings_dim=16,
    )
    _, meta, _ = ds[0]
    assert meta["description_embeddings"].shape == (1, 16)
    assert np.all(meta["description_embeddings"] == 0)


def test_loader_epoch(corpus):
    ds = _dataset(corpus)
    dl = TTSDataLoader(ds, batch_size=2, num_workers=2, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == len(dl) == 1
    assert batches[0]["mel"].shape[0] == 2
    dl2 = TTSDataLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    assert len(list(dl2)) == 2


def test_loader_propagates_worker_errors(corpus):
    ds = _dataset(corpus)
    orig = ds.__class__.__getitem__

    class Boom(Exception):
        pass

    def bad(self, i):
        raise Boom("worker failure")

    ds.__getitem__ = bad.__get__(ds)
    dl = TTSDataLoader(ds, batch_size=2, num_workers=2)
    with pytest.raises(Exception):
        list(dl)


def test_loader_abandoned_iterator_does_not_hang(corpus):
    ds = _dataset(corpus)
    dl = TTSDataLoader(ds, batch_size=1, drop_last=False, prefetch_factor=1)
    it = iter(dl)
    next(it)
    it.close()  # abandon mid-epoch; producer must exit, not deadlock


def test_loader_shuffle_changes_order(corpus):
    ds = _dataset(corpus)
    dl = TTSDataLoader(ds, batch_size=3, shuffle=True, drop_last=False, seed=1)
    e1 = next(iter(dl))["chars_len"].tolist()
    e2 = next(iter(dl))["chars_len"].tolist()
    # different epochs reshuffle (lengths are distinct so order is visible)
    assert sorted(e1) == sorted(e2)


def test_loader_process_workers(corpus):
    """worker_type="process": spawn-based pool (reference parity with the 8
    DataLoader processes, run/train.py:150-168) yields identical batches to
    the thread pool."""
    ds = _dataset(corpus)
    kw = dict(batch_size=2, shuffle=False, drop_last=False, num_workers=2)
    thread_batches = list(TTSDataLoader(ds, worker_type="thread", **kw))
    proc_loader = TTSDataLoader(ds, worker_type="process", **kw)
    proc_batches = list(proc_loader)
    # second epoch reuses the persistent pool
    proc_batches2 = list(proc_loader)
    proc_loader.close()
    assert len(proc_batches) == len(thread_batches) == len(proc_batches2)
    for a, b in zip(thread_batches, proc_batches):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
