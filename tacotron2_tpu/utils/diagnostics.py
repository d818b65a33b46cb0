"""Training-health diagnostics: cheap numeric checks that catch the class
of regression that gradient-agreement tests can NOT catch (wrong data,
wrong masking, wrong schedule all produce self-consistent gradients).

Used by the hardware smoke (tools/tpu_smoke.py) and unit-tested against
deliberately-broken alignments in tests/test_aux_components.py. The
reference has no analog (SURVEY §4: no tests; §5.3: failure detection is a
max-length check + failures.csv) — this is the rebuild's own test strategy.
"""

from __future__ import annotations

import numpy as np


def alignment_metrics(alignments, chars_len, mel_len) -> dict:
    """Health metrics over a teacher-forced batch.

    ``alignments``: (B, T, L) attention weights; ``chars_len``/``mel_len``:
    (B,) valid lengths. Returns:

    - ``pad_mass``: mean attention mass on PADDED char positions over valid
      frames. The char pad mask (model/tacotron2.py:223-226 analog) forces
      this to ~0; a broken mask shows up here immediately, trained or not.
    - ``diagonality``: mean absolute deviation of the expected attended
      position (normalized to [0, 1]) from the linear time ramp — ~0 for a
      clean monotone alignment, ~0.25 for uniform attention. Converges only
      with training; report + loose-bound material, not a hard gate for
      smoke-length runs.
    - ``entropy``: mean per-frame attention entropy in nats (uniform
      attention = log(chars_len)).
    """
    alignments = np.asarray(alignments, np.float64)
    chars_len = np.asarray(chars_len)
    mel_len = np.asarray(mel_len)
    B, T, L = alignments.shape
    pos = np.arange(L)
    pad_masses, diags, ents = [], [], []
    for b in range(B):
        cl = int(chars_len[b])
        ml = min(int(mel_len[b]), T)
        if ml == 0 or cl == 0:
            continue
        w = alignments[b, :ml]  # (ml, L)
        pad_masses.append(float(w[:, cl:].sum() / ml))
        valid = np.clip(w[:, :cl], 1e-12, None)
        valid = valid / valid.sum(axis=1, keepdims=True)
        expected = (valid * pos[:cl]).sum(axis=1) / max(cl - 1, 1)
        ramp = np.arange(ml) / max(ml - 1, 1)
        diags.append(float(np.abs(expected - ramp).mean()))
        ents.append(float(-(valid * np.log(valid)).sum(axis=1).mean()))
    return {
        "pad_mass": float(np.mean(pad_masses)) if pad_masses else 0.0,
        "diagonality": float(np.mean(diags)) if diags else 0.0,
        "entropy": float(np.mean(ents)) if ents else 0.0,
    }


def gate_accuracy(gates, gate_target, mel_len) -> float:
    """Fraction of valid frames whose predicted gate SIGN matches the
    target (target 1 -> logit >= 0, target 0 -> logit < 0; the reference's
    stop convention, run/test.py:167-168 / datasets/tts_dataset.py:211-215)."""
    gates = np.asarray(gates)
    gate_target = np.asarray(gate_target)
    mel_len = np.asarray(mel_len)
    total, correct = 0, 0
    T = gates.shape[1]
    for b in range(gates.shape[0]):
        ml = min(int(mel_len[b]), T)
        if ml == 0:
            continue
        g = gates[b, :ml].reshape(-1)
        t = gate_target[b, :ml].reshape(-1)
        correct += int(((g >= 0) == (t >= 0.5)).sum())
        total += ml
    return correct / max(total, 1)


def tb_scalar_series(logdir_glob: str, tag: str):
    """[(step, value), ...] for a TensorBoard scalar tag (first matching
    run dir). Host-side tooling for loss-drop assertions."""
    import glob

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    dirs = sorted(glob.glob(logdir_glob))
    if not dirs:
        raise FileNotFoundError(f"no TB run dir matches {logdir_glob}")
    ea = EventAccumulator(dirs[0])
    ea.Reload()
    return [(s.step, s.value) for s in ea.Scalars(tag)]
