"""Batch synthesis / evaluation driver — rebuild of run/test.py:29-227.

Free-runs the model over the test manifest (bs 8, max_len 5000), derives
per-utterance lengths from the gate sign (mel_len = first index with
gate < 0; wav_len = mel_len * 256 — run/test.py:167-168), writes numbered
WAVs, and logs degenerate outputs (gate never fired / vocoder errors) to
failures.csv (run/test.py:177-187,224-227).
"""

from __future__ import annotations

import os
from os import path
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from run.common import (
    build_model,
    load_hifigan,
    load_tacotron_checkpoint,
    read_manifest,
    vocode,
)
from run.train import _dataset_kwargs
from tacotron2_tpu.audio.io import write_wav
from tacotron2_tpu.config import Config
from tacotron2_tpu.data import TTSDataLoader, TTSDataset

MAX_LEN = 5000


def gate_to_lengths(gates: np.ndarray) -> np.ndarray:
    """(B, T, 1) gate logits -> frame counts: first index where gate < 0
    (run/test.py:167)."""
    fired = gates[..., 0] < 0.0  # (B, T)
    any_fired = fired.any(axis=1)
    first = fired.argmax(axis=1)
    return np.where(any_fired, first, gates.shape[1])


def do_test(
    cfg: Config,
    device: int,
    speech_dir: str,
    checkpoint: str,
    hifi_gan_checkpoint: Optional[str] = None,
    results_dir: str = "results_test",
    batch_size: int = 8,
    max_len_override: int = MAX_LEN,
    limit: Optional[int] = None,
) -> str:
    ext = cfg.extensions
    test_df = read_manifest(cfg.dataset.test)
    if ext.speaker_tokens.force_speaker is not None:
        test_df = test_df[test_df.speaker_id == ext.speaker_tokens.force_speaker].reset_index(
            drop=True
        )
    if limit:
        test_df = test_df.iloc[:limit]

    prep_kwargs = _dataset_kwargs(cfg.dataset.preprocessing)
    prep_kwargs["cache"] = False  # run/test.py:114
    dataset = TTSDataset(
        filenames=list(test_df.wav),
        texts=list(test_df.text),
        base_dir=speech_dir,
        speaker_ids=list(test_df.speaker_id) if ext.speaker_tokens.active else None,
        features=test_df[ext.controls.features].values.tolist() if ext.controls.active else None,
        include_text=True,
        **prep_kwargs,
    )
    loader = TTSDataLoader(
        dataset, batch_size=batch_size, num_workers=8, shuffle=False, drop_last=False,
        bucket_chars=32,
    )

    hifigan, hifi_params = load_hifigan(hifi_gan_checkpoint)
    params, model_state, _ = load_tacotron_checkpoint(checkpoint)
    model = build_model(cfg)

    @jax.jit
    def predict(params, state, chars, lens, rng, **kw):
        return model.forward_infer_fast(params, state, chars, lens, max_len_override, rng=rng, **kw)

    os.makedirs(results_dir, exist_ok=True)
    failures_path = path.join(results_dir, "failures.csv")
    failures = []
    sr = cfg.dataset.preprocessing.sample_rate
    i = 0
    for batch in loader:
        kw = {}
        if "speaker_id" in batch:
            kw["speaker_id"] = jnp.asarray(batch["speaker_id"])
        if "controls" in batch:
            kw["controls"] = jnp.asarray(batch["controls"])
        out = predict(
            params, model_state,
            jnp.asarray(batch["chars_idx"]), jnp.asarray(batch["chars_len"]),
            jax.random.PRNGKey(i), **kw,
        )
        gates = np.asarray(out.gates)
        mel_lengths = gate_to_lengths(gates)
        mels_post = np.asarray(out.mels_post)
        texts = batch.get("text", [""] * len(mel_lengths))

        for b in range(len(mel_lengths)):
            n = int(mel_lengths[b])
            wav_length = n * 256  # run/test.py:168
            if wav_length == 0 or n >= max_len_override:
                failures.append((i + b, texts[b]))
                continue
            try:
                wav = vocode(mels_post[b, :n], hifigan, hifi_params, sr)
                write_wav(path.join(results_dir, f"{i + b}.wav"), wav[:wav_length], sr)
            except Exception as e:  # degenerate Griffin-Lim inputs etc.
                failures.append((i + b, texts[b]))
        i += len(mel_lengths)

    if failures:
        with open(failures_path, "a") as f:
            for idx, text in failures:
                f.write(f"{idx}|{text}\n")
    print(f"test: wrote {i - len(failures)} wavs, {len(failures)} failures -> {results_dir}")
    return results_dir
