"""Training driver — the TPU rebuild of the reference run/train.py:21-255.

Reproduces the orchestration contract: CSV manifests (pipe-sep), force-
speaker filtering with the speaker-norm controls guard, description-
embedding selection (incl. blank-embedding pretraining), the finetune
protocol (max_steps += finetune_steps, lr/10, batch x2, val every epoch,
freeze encoder + speaker embedding), TensorBoard scalars/images/histograms,
final.ckpt / finetuned.ckpt saves, --resume-ckpt.

TPU redesign: one jitted SPMD train step over a device mesh (DP; TP hooks),
bf16-mixed policy, bucketed static shapes, Orbax checkpoints.

NOTE: the reference crashes when speaker tokens are inactive
(``list(train_df.speaker_id if active else None)`` -> ``list(None)``,
run/train.py:120-124); we pass None properly instead of reproducing that.
"""

from __future__ import annotations

import datetime
import os
import time
from os import path
from typing import Optional

import numpy as np

import jax

from run.common import build_model, read_manifest
from tacotron2_tpu.config import Config
from tacotron2_tpu.data import TTSDataLoader, TTSDataset
from tacotron2_tpu.parallel import (
    DevicePrefetcher,
    DirectStream,
    use_device_prefetch,
    make_mesh_for_batch,
    place_params,
    place_replicated,
)
from tacotron2_tpu.parallel import make_sharded_train_step
from tacotron2_tpu.training import checkpoint as ckpt_lib
from tacotron2_tpu.training.logging import TrainLogger
from tacotron2_tpu.training.optimizer import make_optimizer
from tacotron2_tpu.training.step import make_eval_step
from tacotron2_tpu.training.train_state import TrainState


def _dataset_kwargs(prep) -> dict:
    return dict(
        allowed_chars=prep.allowed_chars,
        end_token=prep.end_token,
        silence=prep.silence,
        trim=prep.trim,
        trim_top_db=prep.trim_top_db,
        trim_frame_length=prep.trim_frame_length,
        expand_abbreviations=prep.expand_abbreviations,
        num_mels=prep.num_mels,
        cache=prep.cache,
        sample_rate=prep.sample_rate,
    )


def do_train(
    cfg: Config,
    raw_config: dict,
    device: int,
    speech_dir: str,
    results_dir: Optional[str],
    resume_ckpt: Optional[str],
    finetune: bool = False,
    finetune_steps: Optional[int] = None,
    seed: int = 0,
    log_every: int = 50,
    max_steps_override: Optional[int] = None,
    prosody_model_checkpoint: Optional[str] = None,
) -> str:
    # multi-host: same code path over DCN once the coordinator is configured
    # (SURVEY §2.8/§5.8 — jax.distributed + the identical SPMD step). Skip
    # when a launcher already initialized the runtime (tests/multihost_worker).
    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized

    # torch.set_float32_matmul_precision analog (run/train.py:170):
    # controls how f32 matmuls lower on the MXU
    matmul_precision = {
        "highest": "highest", "high": "high", "medium": "bfloat16",
    }.get(cfg.training.float32_matmul_precision)
    if matmul_precision:
        jax.config.update("jax_default_matmul_precision", matmul_precision)

    if results_dir is None:
        results_dir = f"results_{cfg.training.name} {datetime.datetime.now()}"
    os.makedirs(results_dir, exist_ok=True)
    cache_dir = path.join(results_dir, "mel_cache")

    ext = cfg.extensions
    train_df = read_manifest(cfg.dataset.train)
    val_df = read_manifest(cfg.dataset.val)

    # force_speaker restriction (run/train.py:48-67); config guards already
    # validated at load time (tacotron2_tpu.config._validate)
    if ext.speaker_tokens.force_speaker is not None:
        fs = ext.speaker_tokens.force_speaker
        train_df = train_df[train_df.speaker_id == fs].reset_index(drop=True)
        val_df = val_df[val_df.speaker_id == fs].reset_index(drop=True)

    # description-embedding selection (run/train.py:70-107)
    description_augment = False
    if ext.descriptions.finetuneable and finetune:
        import pandas as pd

        augmented_ids = set(
            pd.read_csv(path.join(speech_dir, "augmented_ids.csv"), header=None)[0]
        )
        train_df = train_df[train_df.id.isin(augmented_ids)]
        description_augment = True

    desc_train = desc_val = None
    if ext.descriptions.bert_embeddings:
        if not ext.descriptions.finetuneable or finetune:
            desc_train = [x if isinstance(x, str) else None for x in train_df.description_embedding]
            desc_val = [x if isinstance(x, str) else None for x in val_df.description_embedding]
        else:  # pretraining a finetuneable model: blank embeddings
            desc_train = [None] * len(train_df)
            desc_val = [None] * len(val_df)

    # finetune adjustments (run/train.py:109-113)
    lr = cfg.training.lr
    batch_size = cfg.training.batch_size
    max_steps = max_steps_override or cfg.training.max_steps
    val_check_interval = cfg.training.val_check_interval
    if finetune:
        assert finetune_steps is not None, "If finetuning, --finetune-steps is required!"
        max_steps += finetune_steps
        lr /= 10
        val_check_interval = 1.0
        batch_size *= 2

    features_of = lambda df: (
        df[ext.controls.features].values.tolist() if ext.controls.active else None
    )
    speakers_of = lambda df: (list(df.speaker_id) if ext.speaker_tokens.active else None)

    prep_kwargs = _dataset_kwargs(cfg.dataset.preprocessing)
    train_dataset = TTSDataset(
        filenames=list(train_df.wav),
        texts=list(train_df.text),
        base_dir=speech_dir,
        speaker_ids=speakers_of(train_df),
        features=features_of(train_df),
        cache_dir=cache_dir,
        description_embeddings=desc_train,
        description_embeddings_dim=cfg.model.description_embeddings_dim or 768,
        description_embeddings_augment=description_augment,
        **prep_kwargs,
    )
    val_dataset = TTSDataset(
        filenames=list(val_df.wav),
        texts=list(val_df.text),
        base_dir=speech_dir,
        speaker_ids=speakers_of(val_df),
        features=features_of(val_df),
        cache_dir=cache_dir,
        description_embeddings=desc_val,
        description_embeddings_dim=cfg.model.description_embeddings_dim or 768,
        **prep_kwargs,
    )

    train_loader = TTSDataLoader(
        train_dataset, batch_size=batch_size, shuffle=True,
        drop_last=True, bucket_chars=32, bucket_frames=128, seed=seed,
    )
    val_loader = TTSDataLoader(
        val_dataset, batch_size=64, shuffle=False, drop_last=False,
        bucket_chars=32, bucket_frames=128,
    )

    # model / optimizer ------------------------------------------------
    model = build_model(cfg)
    milestones = [int(x * max_steps) for x in cfg.model.scheduler_milestones]

    rng = jax.random.PRNGKey(seed)
    params, model_state = model.init(rng)

    if resume_ckpt is not None:
        from run.common import load_tacotron_checkpoint

        params, model_state, _ = load_tacotron_checkpoint(resume_ckpt)

    freeze_mask = None
    if finetune:
        # freeze encoder + speaker embedding (run/train.py:229-233)
        freeze_mask = jax.tree.map(lambda _: True, params)
        freeze_mask["encoder"] = jax.tree.map(lambda _: False, params["encoder"])
        if "speaker_embedding" in params:
            freeze_mask["speaker_embedding"] = jax.tree.map(
                lambda _: False, params["speaker_embedding"]
            )

    tx, schedule = make_optimizer(
        lr, cfg.training.weight_decay, scheduler_milestones=milestones,
        grad_clip=1.0, freeze_mask=freeze_mask,
    )

    mesh = make_mesh_for_batch(batch_size)
    params = place_params(params, mesh)
    model_state = place_replicated(model_state, mesh)
    ts = TrainState.create(params, model_state, tx)

    if resume_ckpt is not None and ckpt_lib.has_train_state(resume_ckpt) and not finetune:
        # plain resume restores optimizer + step (run/train.py:245-250);
        # finetune starts a FRESH optimizer (lr/10, new schedule, freeze
        # masks change the optimizer-state structure)
        try:
            opt_state, step0 = ckpt_lib.load_train(resume_ckpt, ts.opt_state)
            opt_state = place_replicated(opt_state, mesh)
            ts = TrainState(params=ts.params, model_state=ts.model_state,
                            opt_state=opt_state, step=np.asarray(step0, np.int32))
        except ValueError as e:
            print(f"warning: optimizer state in {resume_ckpt} does not match "
                  f"the current optimizer; starting fresh ({e})")

    train_step = make_sharded_train_step(model, tx, mesh)
    eval_step = make_eval_step(model)

    # prosody-model perceptual loss (the reference's commented second-phase
    # wiring, run/train.py:188-208): load the frozen predictor and switch to
    # a style-loss step at active_after * max_steps. Two separate jitted
    # steps — the pre-phase step never pays the predictor's compute.
    prosody_after = None
    train_step_style = None
    if ext.prosody_model.active:
        if prosody_model_checkpoint is None:
            raise ValueError(
                "Prosody model extension is active, but no prosody model "
                "checkpoint was given!"
            )
        from run.common import load_prosody_checkpoint

        predictor, p_params = load_prosody_checkpoint(prosody_model_checkpoint)
        p_params = place_replicated(p_params, mesh)
        prosody_after = int(max_steps * ext.prosody_model.active_after)
        train_step_style = make_sharded_train_step(
            model, tx, mesh,
            prosody=(predictor, p_params, ext.prosody_model.loss or "mse"),
        )
        print(f"prosody model: style loss activates at step {prosody_after}")

    logger = TrainLogger(path.join(results_dir, "lightning_logs"), cfg.training.name)

    # validation cadence: Lightning semantics — float = fraction of an epoch,
    # int = every N steps (run/train.py Trainer(**{"val_check_interval": ...}))
    steps_per_epoch = max(1, len(train_loader))
    if val_check_interval is None:
        val_every = steps_per_epoch
    elif isinstance(val_check_interval, float):
        val_every = max(1, int(steps_per_epoch * val_check_interval))
    else:
        val_every = int(val_check_interval)

    def run_validation(step: int):
        # per-batch losses stay ON DEVICE; one host fetch per val epoch
        # (each float() through the tunnel costs ~28 ms of fixed transport
        # — PERF.md methodology — so a 64-batch epoch would burn ~1.8 s in
        # pure latency if fetched per batch)
        losses, firsts0, lens0 = [], None, None
        for i, batch in enumerate(val_loader):
            vb = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            metrics, firsts = eval_step(ts.params, ts.model_state, vb, jax.random.PRNGKey(step))
            losses.append(metrics["loss"])
            if i == 0:
                firsts0 = firsts
                lens0 = (int(batch["mel_len"][0]), int(batch["chars_len"][0]))
        if losses:
            mean_loss = float(jax.numpy.mean(jax.numpy.stack(losses)))
            firsts0 = jax.tree.map(np.asarray, firsts0)
            logger.scalars({"val_loss": mean_loss, "val_mel_loss": mean_loss}, step)
            if firsts0 is not None:
                logger.validation_images(firsts0, lens0[0], lens0[1], step)
            return mean_loss
        return None

    # train loop ---------------------------------------------------------
    # optional XLA profiler trace (SURVEY §5.1): set TACOTRON2_TRACE_DIR
    from tacotron2_tpu.utils.profiling import device_trace

    trace_ctx = device_trace(os.environ.get("TACOTRON2_TRACE_DIR"))
    trace_ctx.__enter__()
    saver = ckpt_lib.AsyncSaver()
    step = int(ts.step)
    # Dropout PRNG: the hardware RBG generator by default (measured r5:
    # 42.3 vs 45.7 ms/step at B=32/512f = +7.5% — threefry's VPU bit-mixing
    # for the ~50M dropout mask draws/step [postnet 5x(B,T,512) + prenet +
    # LSTM masks] was 3.4 ms of the step; tools/ probe in PERF.md "Postnet
    # backward / dropout RNG"). Training semantics are unchanged (dropout
    # bits are random either way; same key -> same masks across the fused/
    # XLA paths and across DP shards). TACOTRON2_PRNG=threefry restores
    # the old stream (e.g. to reproduce a pre-r5 run bit-exactly).
    if os.environ.get("TACOTRON2_PRNG", "rbg") == "threefry":
        data_rng = jax.random.PRNGKey(seed + 1)
    else:
        data_rng = jax.random.key(seed + 1, impl="rbg")
    t_last, frames_done = time.time(), 0
    print(f"train: {len(train_dataset)} utts, {steps_per_epoch} steps/epoch, "
          f"max_steps {max_steps}, batch {batch_size}, mesh {dict(mesh.shape)}")
    stop_threshold = cfg.training.stopping_val_loss_threshold
    # Input staging (tools/train_loop_probe.py, tools/transfer_fence_probe.py
    # on v5e/axon): DIRECT loop — host batch -> fast shard_batch (plain
    # per-device puts; the NamedSharding device_put path costs +20 ms/step
    # on the tunneled transport) -> dispatch — on small hosts, where a
    # background staging thread (DevicePrefetcher) measured NEUTRAL at
    # best and a large NEGATIVE with few loader workers (83k vs 161k
    # frames/s at num_workers=1): every extra host thread steals GIL/CPU
    # from the transport's own RPC processing. On multi-core hosts the
    # loader/H2D overlap is real, so the policy is CORE-COUNT-ADAPTIVE
    # (>=4 cores -> prefetch), mirroring data.loader.default_num_workers;
    # TACOTRON2_DEVICE_PREFETCH=1/0 force-overrides either way
    # (parallel/prefetch.py::use_device_prefetch, decision table PERF.md).
    if use_device_prefetch():
        stream = DevicePrefetcher(train_loader, mesh, depth=2)
    else:
        stream = DirectStream(train_loader, mesh)
    try:
        for device_batch, batch in stream:
            if step >= max_steps:
                break
            step_fn = (
                train_step_style
                if prosody_after is not None and step >= prosody_after
                else train_step
            )
            ts, metrics = step_fn(ts, device_batch, data_rng)
            # honest throughput: REAL frames (sum of mel lengths), not the
            # bucketed padded shape — keeps the TB counter consistent with
            # the slope-timed PERF.md numbers
            frames_done += int(np.sum(batch["mel_len"]))
            step += 1
            if step % log_every == 0 or step == 1:
                # ONE transport round-trip for all log scalars (same fix
                # as the val loop above): each individual float() pays the
                # ~28 ms fixed tunnel latency, ~140 ms per log step when
                # the ~5 metrics are fetched one by one. Stack device-side
                # (one tiny concatenate dispatch, compiled once) and fetch
                # the vector with a single np.asarray.
                names = sorted(metrics)
                stacked = jax.numpy.stack(
                    [jax.numpy.asarray(metrics[k], jax.numpy.float32) for k in names]
                    + [jax.numpy.asarray(schedule(step), jax.numpy.float32)]
                )
                vals = np.asarray(stacked)
                m = {f"training_{k}": float(v) for k, v in zip(names, vals)}
                m["lr"] = float(vals[-1])
                dt = time.time() - t_last
                m["mel_frames_per_sec"] = frames_done / max(dt, 1e-9)
                t_last, frames_done = time.time(), 0
                logger.scalars(m, step)
                print(f"step {step}: loss {m['training_loss']:.4f} "
                      f"({m['mel_frames_per_sec']:.0f} frames/s)")
            if step % 1000 == 0:  # histograms (model/tts_model.py:289-292)
                logger.histograms(ts.params, step)
            if step % val_every == 0:
                val_loss = run_validation(step)
                # stopping_val_loss_threshold: config key present in every
                # reference config (always null there; EarlyStopping was
                # imported but never wired, run/train.py:19) — live here
                if (stop_threshold is not None and val_loss is not None
                        and val_loss <= stop_threshold):
                    print(f"early stop: val_loss {val_loss:.4f} <= {stop_threshold}")
                    break
            if step % 5000 == 0:
                # async: snapshots by DEVICE-SIDE COPY before the next
                # donating dispatch (the donated step deletes the old
                # param/opt buffers — a by-reference snapshot raced the
                # background gather; caught by the r4 burn-in), then
                # gathers/writes in a background thread so the loop keeps
                # stepping through the ~100 MB device→host fetch a sync
                # save stalls on (training/checkpoint.py::AsyncSaver)
                saver.save(
                    path.join(results_dir, "last.ckpt"), ts.params, ts.model_state,
                    raw_config, opt_state=ts.opt_state, step=step,
                )

    finally:
        stream.close()
        trace_ctx.__exit__(None, None, None)
        # join the in-flight periodic save on BOTH paths — the
        # non-daemon thread would finish anyway, but a prompt join
        # surfaces its errors before the final synchronous save
        saver.wait()
    run_validation(step)
    final_name = "finetuned.ckpt" if finetune else "final.ckpt"
    out = ckpt_lib.save_checkpoint(
        path.join(results_dir, final_name), ts.params, ts.model_state,
        raw_config, opt_state=ts.opt_state, step=step,
    )
    logger.close()
    print(f"saved {out}")
    return out
