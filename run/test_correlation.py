"""Controllability evaluation — rebuild of run/test_correlation.py:30-248.

Grid-sweeps each control dimension over -1..1 step 0.2 (one-hot
perturbations of a zero vector, deduped — :43-49), samples 200 utterances
per speaker (random_state 9001 — :84-91), synthesizes each utterance under
each override into ``results_.../(override tuple)/``.

BEYOND-REFERENCE: the reference leaves the acoustic-correlation analysis
out-of-repo (its thesis ran Praat externally); this framework owns a
Praat-parity prosody extractor (audio/prosody.py + native/prosody.cpp), so
``analyze_correlations`` closes the loop — per control dimension, the
Pearson correlation of the override value against every extracted acoustic
feature over the synthesized sweep, written to ``correlations.csv``.
"""

from __future__ import annotations

import os
from os import path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from run.common import build_model, load_hifigan, load_tacotron_checkpoint, read_manifest, vocode
from run.test import gate_to_lengths
from run.train import _dataset_kwargs
from tacotron2_tpu.audio.io import write_wav
from tacotron2_tpu.config import Config
from tacotron2_tpu.data import TTSDataLoader, TTSDataset

MAX_LEN = 5000


def control_overrides(num_controls: int):
    """The deduped one-hot sweep set (run/test_correlation.py:43-49)."""
    overrides = set()
    # plain Python floats: np.float64 would leak its repr into the output
    # directory names (str(tuple(override))) and break their round-trip
    # through ast.literal_eval in analyze_correlations
    values = [round(float(x), 1) for x in np.arange(-1.0, 1.2, 0.2)]
    for dim in range(num_controls):
        for v in values:
            o = [0.0] * num_controls
            o[dim] = 0.0 if abs(v) < 1e-9 else v
            overrides.add(tuple(o))
    return sorted(overrides)


def do_test_correlation(
    cfg: Config,
    device: int,
    speech_dir: str,
    checkpoint: str,
    hifi_gan_checkpoint: Optional[str] = None,
    results_dir: str = "results_correlation",
    utterances_per_speaker: int = 200,
    batch_size: int = 8,
    max_len_override: int = MAX_LEN,
    analyze: bool = True,
) -> str:
    ext = cfg.extensions
    assert ext.controls.active, "test_correlation requires controls"
    num_controls = len(ext.controls.features)

    test_df = read_manifest(cfg.dataset.test)
    if ext.speaker_tokens.force_speaker is not None:
        test_df = test_df[test_df.speaker_id == ext.speaker_tokens.force_speaker].reset_index(
            drop=True
        )
    # 200 per speaker, seed 9001 (run/test_correlation.py:84-91)
    if "speaker_id" in test_df.columns:
        import pandas as pd

        test_df = pd.concat(
            [
                g.sample(min(len(g), utterances_per_speaker), random_state=9001)
                for _, g in test_df.groupby("speaker_id")
            ],
            ignore_index=True,
        )
    else:
        test_df = test_df.sample(
            min(len(test_df), utterances_per_speaker), random_state=9001
        ).reset_index(drop=True)

    hifigan, hifi_params = load_hifigan(hifi_gan_checkpoint)
    params, model_state, _ = load_tacotron_checkpoint(checkpoint)
    model = build_model(cfg)

    @jax.jit
    def predict(params, state, chars, lens, rng, **kw):
        return model.forward_infer_fast(params, state, chars, lens, max_len_override, rng=rng, **kw)

    prep_kwargs = _dataset_kwargs(cfg.dataset.preprocessing)
    prep_kwargs["cache"] = False
    sr = cfg.dataset.preprocessing.sample_rate
    os.makedirs(results_dir, exist_ok=True)

    for override in control_overrides(num_controls):
        out_dir = path.join(results_dir, str(tuple(override)))
        os.makedirs(out_dir, exist_ok=True)
        dataset = TTSDataset(
            filenames=list(test_df.wav),
            texts=list(test_df.text),
            base_dir=speech_dir,
            speaker_ids=list(test_df.speaker_id) if ext.speaker_tokens.active else None,
            features=test_df[ext.controls.features].values.tolist(),
            feature_override=list(override),
            include_text=True,
            **prep_kwargs,
        )
        loader = TTSDataLoader(
            dataset, batch_size=batch_size, num_workers=8, shuffle=False, drop_last=False,
            bucket_chars=32,
        )
        i = 0
        for batch in loader:
            kw = {"controls": jnp.asarray(batch["controls"])}
            if "speaker_id" in batch:
                kw["speaker_id"] = jnp.asarray(batch["speaker_id"])
            out = predict(
                params, model_state,
                jnp.asarray(batch["chars_idx"]), jnp.asarray(batch["chars_len"]),
                jax.random.PRNGKey(i), **kw,
            )
            mel_lengths = gate_to_lengths(np.asarray(out.gates))
            mels_post = np.asarray(out.mels_post)
            for b in range(len(mel_lengths)):
                n = int(mel_lengths[b])
                if n == 0 or n >= max_len_override:
                    print(f"warning: degenerate output for {i + b} under {override}")
                    continue
                wav = vocode(mels_post[b, :n], hifigan, hifi_params, sr)
                write_wav(path.join(out_dir, f"{i + b}.wav"), wav[: n * 256], sr)
            i += len(mel_lengths)
        print(f"override {override}: {i} utterances")
    if analyze:
        out_csv = analyze_correlations(results_dir, list(ext.controls.features))
        print(f"wrote {out_csv}")
    return results_dir


def analyze_correlations(results_dir: str, control_features) -> str:
    """control-value ↔ acoustic-feature Pearson correlations over a
    completed sweep directory -> ``correlations.csv`` (pipe-separated:
    control|acoustic_feature|pearson_r|n). All-zero overrides contribute
    the 0.0 point to EVERY control dimension; one-hot overrides to their
    active dimension."""
    import ast
    import csv

    from tacotron2_tpu.audio.io import read_wav
    from tacotron2_tpu.audio.prosody import FEATURE_NAMES, extract_features

    per_dim = {d: [] for d in range(len(control_features))}
    for name in sorted(os.listdir(results_dir)):
        full = path.join(results_dir, name)
        if not os.path.isdir(full):
            continue
        try:
            override = tuple(float(x) for x in ast.literal_eval(name))
        except (ValueError, SyntaxError):
            continue
        if len(override) != len(control_features):
            continue  # stale sweep dir from a different control config
        nz = [i for i, v in enumerate(override) if abs(v) > 1e-9]
        if len(nz) > 1:
            continue  # not part of the one-hot sweep
        dims = list(range(len(override))) if not nz else nz
        feats = []
        for f in sorted(os.listdir(full)):
            if not f.endswith(".wav"):
                continue
            wav, wsr = read_wav(path.join(full, f))
            fd = extract_features(wav, wsr)
            if fd is not None:
                feats.append(fd)
        for d in dims:
            v = override[d]
            per_dim[d].extend((v, fd) for fd in feats)

    out = path.join(results_dir, "correlations.csv")
    with open(out, "w", newline="") as fh:
        w = csv.writer(fh, delimiter="|")
        w.writerow(["control", "acoustic_feature", "pearson_r", "n"])
        for d, samples in per_dim.items():
            vals = np.asarray([v for v, _ in samples], np.float64)
            if len(samples) < 3 or np.ptp(vals) < 1e-9:
                continue
            for fname in FEATURE_NAMES:
                ys = np.asarray([fd[fname] for _, fd in samples], np.float64)
                ok = np.isfinite(ys)
                if ok.sum() < 3 or np.std(ys[ok]) < 1e-12 or np.std(vals[ok]) < 1e-12:
                    r = float("nan")
                else:
                    r = float(np.corrcoef(vals[ok], ys[ok])[0, 1])
                w.writerow([control_features[d], fname, f"{r:.4f}", int(ok.sum())])
    return out
