"""Synthetic burn-in corpus for the sustained-training demonstration
(PERF.md "production burn-in"): 64 multi-tone utterances, 2.5-5.5 s at
22050 Hz, pipe-separated manifests. The texts cycle real words so the
char pipeline exercises its full path; audio is a deterministic tone mix
(the burn-in validates throughput/stability/checkpointing at the
reference's 100k-step budget — run/train.py:236-239 — not speech quality).

    python tools/burnin_corpus.py <workdir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORDS = (
    "the quick brown fox jumps over a lazy dog while seventy two "
    "synthetic utterances train the flagship model on one chip"
).split()


def main(workdir: str) -> None:
    os.makedirs(os.path.join(workdir, "speech"), exist_ok=True)
    from tacotron2_tpu.audio.io import write_wav

    rng = np.random.default_rng(42)
    rows = []
    for i in range(64):
        dur = 2.5 + 3.0 * (i % 16) / 15.0  # 2.5..5.5 s
        t = np.arange(int(22050 * dur)) / 22050
        f0 = 120 + 10 * (i % 24)
        wav = (
            0.25 * np.sin(2 * np.pi * f0 * t)
            + 0.15 * np.sin(2 * np.pi * 2.01 * f0 * t)
            + 0.05 * np.sin(2 * np.pi * 3.02 * f0 * t)
        )
        # slow amplitude envelope so frames differ along time
        wav = (wav * (0.6 + 0.4 * np.sin(2 * np.pi * 0.7 * t + i))).astype(np.float32)
        write_wav(os.path.join(workdir, f"speech/u{i:02d}.wav"), wav, 22050)
        n = 6 + int(rng.integers(0, 10))
        text = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(n))
        rows.append(f"{text}|u{i:02d}.wav")
    for split, sel in (("train", rows), ("val", rows[:8]), ("test", rows[:8])):
        with open(os.path.join(workdir, f"{split}.csv"), "w") as f:
            f.write("text|wav\n" + "\n".join(sel) + "\n")
    print(f"burn-in corpus: 64 utterances in {workdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/t2t_burnin")
