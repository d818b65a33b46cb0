"""Prosody-predictor training driver.

The reference ships this capability as ``ProsodyPredictorLightning``
(model/prosodic_features/prosody_detector.py:158-255): MSE regression of
normalized prosodic features from log-mels, per-feature concordance
correlation (CCC) train/val metrics, Adam lr 1e-5, MultiStepLR epoch-65
x0.1 — but its imports are broken and no driver invokes it (SURVEY §2.5).
This is the working TPU-native driver: manifests + feature columns come
from the same 4-section config, mels through the framework's XLA frontend,
one jitted train step, and a checkpoint loadable by
``main.py train --prosody-model-checkpoint`` for the perceptual-loss phase
(run/train.py).

Feature targets default to the reference wrapper's 7 ``*_norm_clip``
columns (prosody_detector.py:167-175) and can be overridden with
``extensions.prosody_model.features``.
"""

from __future__ import annotations

import datetime
import os
import time
from os import path
from typing import Optional

import numpy as np

import jax

from run.common import read_manifest
from tacotron2_tpu.config import Config
from tacotron2_tpu.data import TTSDataLoader, TTSDataset
from tacotron2_tpu.models.prosody import ProsodyPredictor
from tacotron2_tpu.training import checkpoint as ckpt_lib
from tacotron2_tpu.training.logging import TrainLogger
from tacotron2_tpu.training.losses import ccc_per_feature, mse
from tacotron2_tpu.training.optimizer import make_optimizer

# reference defaults (prosody_detector.py:167-175)
DEFAULT_FEATURES = [
    "pitch_mean_norm_clip",
    "pitch_range_norm_clip",
    "intensity_mean_norm_clip",
    "jitter_norm_clip",
    "shimmer_norm_clip",
    "nhr_norm_clip",
    "rate_norm_clip",
]


def make_prosody_train_step(predictor: ProsodyPredictor, tx):
    """One jitted step: MSE(pred, y) grad/update + the prediction for
    host-side CCC metrics (prosody_detector.py:239-255)."""
    import optax

    def loss_fn(params, batch, rng):
        pred, _, _, _ = predictor.apply(
            params, batch["mel"], batch["mel_len"], train=True, rng=rng
        )
        return mse(pred, batch["features"]), pred

    @jax.jit
    def step(params, opt_state, batch, rng):
        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pred

    return step


def make_prosody_eval_step(predictor: ProsodyPredictor):
    @jax.jit
    def step(params, batch):
        pred, _, _, _ = predictor.apply(params, batch["mel"], batch["mel_len"])
        return mse(pred, batch["features"]), pred

    return step


def _collate_key_fixup(batch: dict) -> dict:
    # TTSDataLoader surfaces feature targets under "controls"
    # (tts_metadata["features"] in the reference collate)
    if "controls" in batch:
        batch = dict(batch)
        batch["features"] = batch.pop("controls")
    return batch


def do_train_prosody(
    cfg: Config,
    raw_config: dict,
    device: int,
    speech_dir: str,
    results_dir: Optional[str],
    steps: int = 10_000,
    lr: float = 1e-5,
    batch_size: int = 32,
    seed: int = 0,
    log_every: int = 50,
    val_every: Optional[int] = None,
) -> str:
    if results_dir is None:
        results_dir = f"results_prosody_{cfg.training.name} {datetime.datetime.now()}"
    os.makedirs(results_dir, exist_ok=True)

    features = cfg.extensions.prosody_model.features or DEFAULT_FEATURES
    train_df = read_manifest(cfg.dataset.train)
    val_df = read_manifest(cfg.dataset.val)
    missing = [f for f in features if f not in train_df.columns]
    if missing:
        raise ValueError(
            f"prosody feature columns missing from {cfg.dataset.train}: {missing}"
        )

    prep = cfg.dataset.preprocessing
    ds_kwargs = dict(
        base_dir=speech_dir,
        allowed_chars=prep.allowed_chars,
        end_token=prep.end_token,
        trim=prep.trim,
        trim_top_db=prep.trim_top_db,
        trim_frame_length=prep.trim_frame_length,
        num_mels=prep.num_mels,
        sample_rate=prep.sample_rate,
    )
    train_dataset = TTSDataset(
        filenames=list(train_df.wav), texts=list(train_df.text),
        features=train_df[features].values.tolist(), **ds_kwargs,
    )
    val_dataset = TTSDataset(
        filenames=list(val_df.wav), texts=list(val_df.text),
        features=val_df[features].values.tolist(), **ds_kwargs,
    )
    train_loader = TTSDataLoader(
        train_dataset, batch_size=batch_size, shuffle=True,
        drop_last=True, bucket_frames=128, bucket_chars=32, seed=seed,
    )
    val_loader = TTSDataLoader(
        val_dataset, batch_size=batch_size, shuffle=False,
        drop_last=False, bucket_frames=128, bucket_chars=32,
    )

    predictor = ProsodyPredictor(num_features=len(features), num_mels=prep.num_mels)
    params = predictor.init(jax.random.PRNGKey(seed))

    # reference optimizer contract (prosody_detector.py:201-212): Adam(lr),
    # no weight decay, MultiStepLR([65], 0.1) stepped per EPOCH
    steps_per_epoch = max(1, len(train_loader))
    tx, schedule = make_optimizer(
        lr, weight_decay=0.0, scheduler_milestones=[65 * steps_per_epoch],
        grad_clip=1e9,  # the reference predictor training does not clip
    )
    opt_state = tx.init(params)

    train_step = make_prosody_train_step(predictor, tx)
    eval_step = make_prosody_eval_step(predictor)
    logger = TrainLogger(path.join(results_dir, "lightning_logs"), "prosody")
    val_every = val_every or steps_per_epoch

    hparams = dict(
        conv_out_dim=predictor.conv_out_dim,
        rnn_in_dim=predictor.rnn_in_dim,
        use_deltas=predictor.use_deltas,
        use_lstm=predictor.use_lstm,
        rnn_layers=predictor.rnn_layers,
        rnn_dropout=predictor.rnn_dropout,
        num_features=len(features),
        num_mels=prep.num_mels,
        features=list(features),
    )

    def run_validation(step_i: int):
        losses, preds, ys = [], [], []
        for batch in val_loader:
            batch = _collate_key_fixup(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            loss, pred = eval_step(params, batch)
            losses.append(float(loss))
            preds.append(np.asarray(pred))
            ys.append(batch["features"])
        if not losses:
            return None
        mean_loss = float(np.mean(losses))
        scalars = {"val_loss": mean_loss}
        ccc = np.asarray(
            ccc_per_feature(np.concatenate(preds), np.concatenate(ys))
        )
        for name, c in zip(features, ccc):
            scalars[f"val_{name}"] = float(c)
        logger.scalars(scalars, step_i)
        return mean_loss

    rng = jax.random.PRNGKey(seed + 1)
    step_i, t_last = 0, time.time()
    print(f"train_prosody: {len(train_dataset)} utts, {steps_per_epoch} steps/epoch, "
          f"{steps} steps, features {features}")
    while step_i < steps:
        for batch in train_loader:
            if step_i >= steps:
                break
            batch = _collate_key_fixup(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, pred = train_step(params, opt_state, batch, sub)
            step_i += 1
            if step_i % log_every == 0 or step_i == 1:
                scalars = {"train_loss": float(loss), "lr": float(schedule(step_i))}
                ccc = np.asarray(ccc_per_feature(np.asarray(pred), batch["features"]))
                for name, c in zip(features, ccc):
                    scalars[f"train_{name}"] = float(c)
                dt, t_last = time.time() - t_last, time.time()
                logger.scalars(scalars, step_i)
                print(f"prosody step {step_i}: loss {scalars['train_loss']:.4f} "
                      f"({log_every / max(dt, 1e-9):.1f} steps/s)")
            if step_i % val_every == 0:
                run_validation(step_i)
            if step_i % 5000 == 0:
                ckpt_lib.save_checkpoint(
                    path.join(results_dir, "prosody_last.ckpt"), params, {},
                    {"prosody_predictor": hparams, "source_config": raw_config},
                )

    run_validation(step_i)
    out = ckpt_lib.save_checkpoint(
        path.join(results_dir, "prosody_final.ckpt"), params, {},
        {"prosody_predictor": hparams, "source_config": raw_config},
    )
    logger.close()
    print(f"saved {out}")
    return out
