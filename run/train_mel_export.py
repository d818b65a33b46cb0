"""Teacher-forced mel export — rebuild of run/train_mel_export.py:16-142.

Runs teacher-forced prediction over train+val (bs 64, no shuffle) and saves
``mel_spectrogram_post[:len]`` as .npy per utterance — the dataset used to
fine-tune a HiFi-GAN on this Tacotron's outputs.
"""

from __future__ import annotations

import os
from os import path

import numpy as np

import jax
import jax.numpy as jnp

from run.common import build_model, load_tacotron_checkpoint, read_manifest
from run.train import _dataset_kwargs
from tacotron2_tpu.config import Config
from tacotron2_tpu.data import TTSDataLoader, TTSDataset


def do_train_mel_export(
    cfg: Config,
    device: int,
    speech_dir: str,
    checkpoint: str,
    results_dir: str = "results_mel_export",
    batch_size: int = 64,
) -> str:
    ext = cfg.extensions
    params, model_state, _ = load_tacotron_checkpoint(checkpoint)
    model = build_model(cfg)

    @jax.jit
    def forward(params, state, batch, rng):
        out, _ = model.forward_teacher(
            params, state, batch["chars_idx"], batch["chars_len"],
            batch["mel"], batch["mel_len"], rng=rng, train=False,
            speaker_id=batch.get("speaker_id"), controls=batch.get("controls"),
        )
        return out.mels_post

    os.makedirs(results_dir, exist_ok=True)
    prep_kwargs = _dataset_kwargs(cfg.dataset.preprocessing)
    prep_kwargs["cache"] = False  # one pass; no cache dir in this flow

    for split in ("train", "val"):
        df = read_manifest(getattr(cfg.dataset, split))
        dataset = TTSDataset(
            filenames=list(df.wav),
            texts=list(df.text),
            base_dir=speech_dir,
            speaker_ids=list(df.speaker_id) if ext.speaker_tokens.active else None,
            features=df[ext.controls.features].values.tolist() if ext.controls.active else None,
            include_filename=True,
            **prep_kwargs,
        )
        loader = TTSDataLoader(
            dataset, batch_size=batch_size, shuffle=False, drop_last=False,
            bucket_chars=32, bucket_frames=128,
        )
        count = 0
        for batch in loader:
            nb = {k: jnp.asarray(v) for k, v in batch.items() if isinstance(v, np.ndarray)}
            mels_post = np.asarray(forward(params, model_state, nb, jax.random.PRNGKey(count)))
            for b, fname in enumerate(batch["filename"]):
                n = int(batch["mel_len"][b])
                out_name = path.join(results_dir, path.basename(fname).replace(".wav", ".npy"))
                np.save(out_name, mels_post[b, :n])
                count += 1
        print(f"{split}: exported {count} mels")
    return results_dir
