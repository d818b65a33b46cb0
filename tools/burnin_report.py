"""Digest a burn-in run's TensorBoard logs into sustained-throughput and
stability numbers (PERF.md "production burn-in").

    python tools/burnin_report.py <results_dir> [run_glob]

Reads the driver's own honest per-window counters (run/train.py logs
``mel_frames_per_sec`` as frames_done/wall over each ``log_every`` window
— device steps + input pipeline + logging, NOT a slope-timed kernel
number) and reports:
  - median / p10 / p90 window throughput over the whole run
  - the loss trajectory (first/last + the lr-milestone segments)
  - windows containing a validation pass or an async checkpoint save
    (step % 5000 == 0) separately, so their cost is visible instead of
    smeared into the median
  - total steps and wall time from first to last scalar
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(results_dir: str, run_glob: str = "*") -> None:
    pat = os.path.join(results_dir, "lightning_logs", run_glob)
    runs = sorted(glob.glob(pat))
    if not runs:
        raise SystemExit(f"no TB runs under {pat}")
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    # merge scalars across event files (a resume appends a second file
    # in the same run dir / a second run dir, same name prefix)
    series = {}
    for run in runs:
        ea = EventAccumulator(run)
        ea.Reload()
        for tag in ("training_loss", "mel_frames_per_sec", "val_loss"):
            if tag in ea.Tags().get("scalars", []):
                for ev in ea.Scalars(tag):
                    series.setdefault(tag, {})[ev.step] = (ev.wall_time, ev.value)

    loss = sorted(series.get("training_loss", {}).items())
    fps = sorted(series.get("mel_frames_per_sec", {}).items())
    val = sorted(series.get("val_loss", {}).items())
    if not loss:
        raise SystemExit("no training_loss scalars found")

    steps = [s for s, _ in loss]
    t0, t1 = loss[0][1][0], loss[-1][1][0]
    print(f"runs: {[os.path.basename(r) for r in runs]}")
    print(f"steps {steps[0]}..{steps[-1]}  wall {t1 - t0:.0f}s "
          f"({(t1 - t0) / 60:.1f} min)")
    print(f"loss: first {loss[0][1][1]:.4f}  last {loss[-1][1][1]:.4f}  "
          f"min {min(v for _, (_, v) in loss):.4f}")
    if val:
        print(f"val_loss: first {val[0][1][1]:.4f}  last {val[-1][1][1]:.4f}")

    if fps:
        # split windows: those containing a val/checkpoint boundary
        # (step % 5000 == 0 inside the window) pay a pause by design
        plain, boundary = [], []
        prev_step = None
        for s, (_, v) in fps:
            lo = prev_step if prev_step is not None else s - 1
            crosses = (s // 5000) != (lo // 5000) or s % 5000 == 0
            (boundary if crosses else plain).append(v)
            prev_step = s
        for name, arr in (("plain windows", plain), ("val/save windows", boundary)):
            if arr:
                a = np.asarray(arr)
                print(f"{name}: n={len(a)}  median {np.median(a):,.0f} frames/s  "
                      f"p10 {np.percentile(a, 10):,.0f}  p90 {np.percentile(a, 90):,.0f}  "
                      f"min {a.min():,.0f}")
        nz = np.asarray([v for _, (_, v) in fps])
        print(f"all windows: mean {nz.mean():,.0f} frames/s over {len(nz)} windows")
    # any non-finite loss anywhere is a hard failure of the burn-in
    bad = [s for s, (_, v) in loss if not np.isfinite(v)]
    print("non-finite losses:", bad if bad else "none")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/t2t_burnin/results",
         sys.argv[2] if len(sys.argv) > 2 else "*")
