"""Jitted train / eval steps.

Reference semantics (model/tts_model.py:165-253): teacher-forced forward,
loss = BCE(gate) + MSE(mel) + MSE(mel_post); Lightning AMP backward with
global-norm clip 1.0; Adam + per-step MultiStepLR. Here: one jitted function
— forward (lax.scan decode), loss, grad, optax update, BN-state update.

Data parallelism (SURVEY §2.8 plan): the batch arrives sharded over the
``data`` mesh axis via sharding constraints set by the caller
(tacotron2_tpu.parallel); because loss/BN-stats are expressed as global
means over the sharded batch axis, XLA inserts the psum collectives over
ICI automatically — no NCCL analog, no manual pmean.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tacotron2_tpu.models.tacotron2 import Tacotron2
from tacotron2_tpu.training.losses import prosody_style_loss, tacotron2_loss


def build_train_step(model: Tacotron2, tx, remat: bool = True, prosody=None,
                     pallas_train=None, shard_mesh=None):
    """Pure (un-jitted) train step: (train_state, batch, rng) ->
    (train_state, metrics). Shared by the single-chip and mesh-sharded paths.

    ``batch``: dict with chars_idx (B,L), chars_len (B,), mel (B,T,M),
    mel_len (B,), gate (B,T,1), and optional speaker_id / controls /
    description_embeddings. ``remat`` (default on) rematerializes the
    decode scan in the backward pass — the decode is weight-bandwidth
    bound, so recompute is nearly free and batch x frames scales far
    beyond what stored activations allow.

    ``prosody``: optional (ProsodyPredictor, frozen params, loss kind) —
    adds the perceptual style loss of the reference's prosody-model phase
    (model/tts_model.py:204-225, commented there). The frozen params are
    closed over: jit hoists them as device constants, so the predictor
    weights never re-transfer per step.
    """

    def loss_fn(params, model_state, batch, rng):
        out, new_model_state = model.forward_teacher(
            params,
            model_state,
            batch["chars_idx"],
            batch["chars_len"],
            batch["mel"],
            batch["mel_len"],
            rng=rng,
            train=True,
            speaker_id=batch.get("speaker_id"),
            controls=batch.get("controls"),
            description_embeddings=batch.get("description_embeddings"),
            remat=remat,
            # hoisted-dW custom-VJP scan (ops/train_scan.py): removes the
            # scan transpose's per-step weight-gradient accumulator RMW —
            # and on TPU (bf16, B<=64) the forward/backward run as
            # launch-resident Pallas kernels (ops/train_decode_pallas.py,
            # 109.9 -> 76.3 ms/step at B=32/512f, PERF.md). Gradients
            # verified against jax.grad of the standard scan
            # (tests/test_train_scan.py, tests/test_train_pallas.py).
            # ``shard_mesh``: on >1-device meshes the kernels run
            # per-shard under jax.shard_map over the "data" axis (GSPMD
            # has no partitioning rule for pallas_call); TP meshes and
            # indivisible batches fall back to the XLA hoisted scan,
            # which partitions cleanly over the batch axis.
            dw_hoist=True,
            pallas_train=pallas_train,
            shard_mesh=shard_mesh,
        )
        loss, metrics = tacotron2_loss(
            out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
        )
        if prosody is not None:
            predictor, predictor_params, kind = prosody
            style = prosody_style_loss(
                predictor, predictor_params, out.mels_post, batch["mel"],
                batch["mel_len"], kind=kind,
            )
            loss = loss + style
            metrics = dict(metrics)
            metrics["style_loss"] = style
            metrics["loss"] = loss
        return loss, (metrics, new_model_state)

    def train_step(state, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (metrics, new_model_state)), grads = grad_fn(
            state.params, state.model_state, batch, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda g: jnp.sum(g * g), grads)
        ) ** 0.5
        new_state = state.__class__(
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def make_train_step(model: Tacotron2, tx, donate: bool = True):
    """Jitted single-program train step (works 1-chip or mesh-sharded —
    sharding follows argument placement)."""
    return jax.jit(build_train_step(model, tx), donate_argnums=(0,) if donate else ())


def make_eval_step(model: Tacotron2):
    """Validation step (model/tts_model.py:117-163): teacher-forced, eval
    mode, same loss; also returns the first sample's tensors for plotting."""

    def eval_step(params, model_state, batch, rng):
        out, _ = model.forward_teacher(
            params,
            model_state,
            batch["chars_idx"],
            batch["chars_len"],
            batch["mel"],
            batch["mel_len"],
            rng=rng,
            train=False,
            prenet_dropout=True,  # AlwaysDropout stays on in the reference
            speaker_id=batch.get("speaker_id"),
            controls=batch.get("controls"),
            description_embeddings=batch.get("description_embeddings"),
        )
        loss, metrics = tacotron2_loss(
            out.mels, out.mels_post, out.gates, batch["mel"], batch["gate"]
        )
        firsts = {
            "mel_spectrogram_pred": out.mels_post[0],
            "mel_spectrogram": batch["mel"][0],
            "alignment": out.alignments[0],
            "gate": batch["gate"][0],
            "gate_pred": out.gates[0],
        }
        return metrics, firsts

    return jax.jit(eval_step)


def make_predict_step(model: Tacotron2, max_len: int):
    """Free-running prediction (model/tts_model.py:294-316)."""

    @functools.partial(jax.jit, static_argnames=())
    def predict_step(params, model_state, batch, rng):
        return model.forward_infer(
            params,
            model_state,
            batch["chars_idx"],
            batch["chars_len"],
            max_len,
            rng=rng,
            speaker_id=batch.get("speaker_id"),
            controls=batch.get("controls"),
            description_embeddings=batch.get("description_embeddings"),
        )

    return predict_step
