"""Batching + host-side prefetch for the input pipeline.

Replaces the reference's torch DataLoader (datasets/tts_dataloader.py:8-60,
run/train.py:150-168: 8 workers, pinned memory, prefetch 2) with a
thread-pool prefetcher feeding ready-made numpy batches.

TPU-specific addition: SHAPE BUCKETING. Under XLA every (chars_len,
mel_len) pair is a fresh compilation; padding each batch up to bucket
multiples (default chars->32, mel frames->128) bounds the number of
compiled programs while wasting <~10% compute. Padding semantics match the
reference collate (pad_sequence with zeros, tts_dataloader.py:29): gate
targets pad with 0 against masked logits of -1000, contributing ~0 loss.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

# -- process-worker plumbing -------------------------------------------------
# The reference uses 8 DataLoader *processes* (run/train.py:150-168). Threads
# are our default (numpy FFT/matmul release the GIL for the heavy slices),
# but worker_type="process" is available for GIL-bound datasets. The dataset
# is shipped ONCE per worker via the pool initializer (not per task), and
# workers are spawned (never forked) so they don't inherit a live TPU client.
_WORKER_DATASET = None


def _process_worker_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_worker_get(i: int):
    return _WORKER_DATASET[i]


def default_num_workers() -> int:
    """Host-adaptive loader worker count for the driver loops.

    The reference hardcodes 8 DataLoader workers (run/train.py:150-168);
    on a multi-core host that is right, but worker threads only help
    while cores exist to run them: on the 1-core bench harness an
    interleaved sweep measured workers=2 at 93.4 ms/step vs workers=8 at
    136.9 (direct flagship train loop — 8 threads time-slice the core
    away from the transport's RPC processing; PERF.md input-staging
    study). min(8, 2*cores) gives 2 on 1 core and the reference's 8 from
    4 cores up. Override per-loader via the num_workers argument."""
    import os

    return min(8, 2 * (os.cpu_count() or 4))


def _round_up(x: int, m: Optional[int]) -> int:
    if not m:
        return x
    return -(-x // m) * m


def collate(
    items,
    bucket_chars: Optional[int] = None,
    bucket_frames: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Pad-collate dataset items -> one training batch dict.

    Keys: chars_idx (B,L), chars_len (B,), mel (B,T,M), mel_len (B,),
    gate (B,T,1) [+ speaker_id / controls / description_embeddings / text /
    filename]."""
    data, meta, extra = zip(*items)
    B = len(items)
    L = _round_up(max(len(d["chars_idx"]) for d in data), bucket_chars)
    T = _round_up(max(len(d["mel_spectrogram"]) for d in data), bucket_frames)
    M = data[0]["mel_spectrogram"].shape[1]

    chars = np.zeros((B, L), np.int64)
    mel = np.zeros((B, T, M), np.float32)
    gate = np.zeros((B, T, 1), np.float32)
    chars_len = np.zeros((B,), np.int64)
    mel_len = np.zeros((B,), np.int64)
    for b, d in enumerate(data):
        n = len(d["chars_idx"])
        t = len(d["mel_spectrogram"])
        chars[b, :n] = d["chars_idx"]
        mel[b, :t] = d["mel_spectrogram"]
        gate[b, :t] = d["gate"]
        chars_len[b] = n
        mel_len[b] = t

    batch: Dict[str, np.ndarray] = {
        "chars_idx": chars,
        "chars_len": chars_len,
        "mel": mel,
        "mel_len": mel_len,
        "gate": gate,
    }
    if "speaker_id" in meta[0]:
        batch["speaker_id"] = np.asarray([m["speaker_id"] for m in meta], np.int64)
    if "features" in meta[0]:
        batch["controls"] = np.stack([m["features"] for m in meta]).astype(np.float32)
    if "description_embeddings" in meta[0]:
        batch["description_embeddings"] = np.concatenate(
            [m["description_embeddings"] for m in meta], axis=0
        ).astype(np.float32)
    for key in ("text", "filename"):
        if extra[0] and key in extra[0]:
            batch[key] = [e[key] for e in extra]
    return batch


class TTSDataLoader:
    """Iterable over collated batches with background prefetch.

    ``num_workers`` threads decode/mel items concurrently; up to
    ``prefetch_factor`` batches are staged ahead of the consumer.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        num_workers: Optional[int] = None,  # None -> default_num_workers()
        shuffle: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        bucket_chars: Optional[int] = None,
        bucket_frames: Optional[int] = None,
        prefetch_factor: int = 2,
        sort_by_length: bool = False,
        worker_type: str = "thread",
    ):
        assert worker_type in ("thread", "process")
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(
            1, num_workers if num_workers is not None else default_num_workers()
        )
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.bucket_chars = bucket_chars
        self.bucket_frames = bucket_frames
        self.prefetch_factor = max(1, prefetch_factor)
        self.sort_by_length = sort_by_length
        self.worker_type = worker_type
        self._epoch = 0
        self._process_pool = None

    def _pool(self):
        if self.worker_type == "thread":
            return ThreadPoolExecutor(max_workers=self.num_workers), self.dataset.__getitem__
        if self._process_pool is None:
            import multiprocessing

            # spawn: workers must not inherit a (forked) live TPU client
            self._process_pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_process_worker_init,
                initargs=(self.dataset,),
            )
        return self._process_pool, _process_worker_get

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def close(self):
        if self._process_pool is not None:
            self._process_pool.shutdown(wait=False)
            self._process_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _index_batches(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        if self.sort_by_length:
            # reduce padding waste: sort within a shuffled window
            window = self.batch_size * 32
            chunks = [idx[i : i + window] for i in range(0, len(idx), window)]
            idx = np.concatenate(
                [c[np.argsort([len(self.dataset.texts[j]) for j in c])] for c in chunks]
            )
        batches = [
            list(idx[i : i + self.batch_size])
            for i in range(0, len(idx) - (self.batch_size - 1 if self.drop_last else 0), self.batch_size)
        ]
        return [b for b in batches if b]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._index_batches()
        self._epoch += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_factor)
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that aborts if the consumer abandoned the iterator
            # (a plain blocking put would leak the producer thread)
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                pool, get_item = self._pool()
                try:
                    for b in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(get_item, b))
                        if not _put(collate(items, self.bucket_chars, self.bucket_frames)):
                            return
                finally:
                    if self.worker_type == "thread":
                        pool.shutdown(wait=False)
                    # process pools persist across epochs (spawn is slow)
                _put(None)
            except Exception as e:  # surface worker errors to the consumer
                _put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()
