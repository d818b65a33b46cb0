"""Controllability evaluation — rebuild of run/test_correlation.py:30-248.

Grid-sweeps each control dimension over -1..1 step 0.2 (one-hot
perturbations of a zero vector, deduped — :43-49), samples 200 utterances
per speaker (random_state 9001 — :84-91), synthesizes each utterance under
each override into ``results_.../(override tuple)/``. The downstream
acoustic-correlation analysis is out-of-repo, like the reference.
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
    values = [round(x, 1) for x in np.arange(-1.0, 1.2, 0.2)]
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
    return results_dir
