"""Input-pipeline throughput benchmark (VERDICT r1 weak #4).

Measures what the host-side loader can PRODUCE (mel frames/s, items/s) at
flagship settings — to be compared with what one chip CONSUMES in training
(PERF.md: 113k frames/s @ B=32, 227k @ B=256). The reference feeds its GPU
with 8 torch DataLoader *processes* (run/train.py:150-168); ours is a
thread pool (data/loader.py) unless --workers-type process.

Usage: python tools/loader_bench.py [--items 96] [--workers 8]
       [--worker-type thread|process] [--dur 6.5] [--epochs 3]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=96)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--worker-type", default="thread", choices=["thread", "process"])
    ap.add_argument("--dur", type=float, default=6.5, help="clip seconds (LJSpeech mean ~6.5)")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--trim", action="store_true", default=True)
    args = ap.parse_args()

    from tacotron2_tpu.audio.io import write_wav
    from tacotron2_tpu.data import TTSDataLoader, TTSDataset

    tmp = tempfile.mkdtemp(prefix="loader_bench_")
    rng = np.random.default_rng(0)
    names, texts = [], []
    n_samples = int(22050 * args.dur)
    for i in range(args.items):
        t = np.arange(n_samples) / 22050
        f0 = 140 + 60 * rng.random()
        wav = (0.25 * np.sin(2 * np.pi * f0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3.1 * t) ** 2)
               + 0.01 * rng.standard_normal(n_samples)).astype(np.float32)
        name = f"b{i}.wav"
        write_wav(os.path.join(tmp, name), wav, 22050)
        names.append(name)
        texts.append("the quick brown fox jumps over the lazy dog " * 3)

    ds = TTSDataset(
        names, texts, tmp, trim=args.trim, trim_top_db=60, trim_frame_length=2048,
        num_mels=80, sample_rate=22050,
    )
    loader = TTSDataLoader(
        ds, batch_size=args.batch_size, num_workers=args.workers, shuffle=True,
        drop_last=True, bucket_chars=32, bucket_frames=128,
        worker_type=args.worker_type,
    )

    # warmup epoch (thread/process pool spin-up, page cache)
    for _ in loader:
        pass

    t0 = time.perf_counter()
    frames = items = batches = 0
    for _ in range(args.epochs):
        for batch in loader:
            B = batch["mel"].shape[0]
            frames += int(batch["mel_len"].sum())
            items += B
            batches += 1
    dt = time.perf_counter() - t0

    print(f"worker_type={args.worker_type} workers={args.workers} "
          f"batch={args.batch_size} clip={args.dur}s trim={args.trim}")
    print(f"{items} items, {frames} real mel frames in {dt:.2f}s")
    print(f"-> {items/dt:.1f} items/s, {frames/dt:,.0f} mel frames/s produced")


if __name__ == "__main__":
    main()
