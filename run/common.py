"""Shared driver helpers: model/checkpoint loading, CSV IO, vocoding.

The checkpoint loader accepts BOTH our Orbax directories and the reference's
Lightning ``.ckpt`` files (converted on the fly via tacotron2_tpu.convert) —
a reference user's trained checkpoints keep working.
"""

from __future__ import annotations

import csv
import os
from os import path
from typing import Optional, Tuple

import numpy as np

from tacotron2_tpu.config import Config
from tacotron2_tpu.models.layers import Policy
from tacotron2_tpu.models.tacotron2 import Tacotron2, Tacotron2Config


def read_manifest(csv_path: str):
    """Pipe-separated, QUOTE_NONE (reference: run/train.py:40-45)."""
    import pandas as pd

    return pd.read_csv(csv_path, delimiter="|", quoting=csv.QUOTE_NONE, engine="c")


def model_config_from(cfg: Config) -> Tacotron2Config:
    ext = cfg.extensions
    return Tacotron2Config(
        num_chars=cfg.num_chars,
        encoded_dim=cfg.model.encoded_dim,
        encoder_kernel_size=cfg.model.encoder_kernel_size,
        num_mels=cfg.dataset.preprocessing.num_mels,
        prenet_dim=cfg.model.prenet_dim,
        att_rnn_dim=cfg.model.att_rnn_dim,
        att_dim=cfg.model.att_dim,
        rnn_hidden_dim=cfg.model.rnn_hidden_dim,
        postnet_dim=cfg.model.postnet_dim,
        dropout=cfg.model.dropout,
        speaker_tokens=ext.speaker_tokens.active,
        num_speakers=ext.speaker_tokens.num_speakers,
        controls=ext.controls.active,
        controls_dim=cfg.controls_dim,
        description_embeddings=cfg.model.description_embeddings,
        description_embeddings_dim=cfg.model.description_embeddings_dim,
        gst=ext.gst.active,
        gst_token_embedding_size=ext.gst.token_embedding_size,
    )


def build_model(cfg: Config, precision: Optional[str] = None) -> Tacotron2:
    policy = Policy.from_string(precision or cfg.training.precision)
    return Tacotron2(model_config_from(cfg), policy)


def load_tacotron_checkpoint(checkpoint: str):
    """-> (params, model_state, saved_config_dict). Accepts an Orbax dir or a
    torch/Lightning .ckpt file."""
    if path.isdir(checkpoint):
        from tacotron2_tpu.training import checkpoint as ckpt

        return ckpt.load_model(checkpoint)
    # torch Lightning checkpoint (reference format)
    from tacotron2_tpu.convert import load_lightning_checkpoint

    params, state, hparams = load_lightning_checkpoint(checkpoint)
    return params, state, {"hyper_parameters": hparams}


def load_prosody_checkpoint(checkpoint: str):
    """Load a prosody-predictor checkpoint saved by run/train_prosody.py.
    -> (ProsodyPredictor, params). The analog of the reference's
    ``ProsodyModelLightning.load_from_checkpoint(...).prosody_predictor``
    (run/train.py:193-195, commented there)."""
    from tacotron2_tpu.models.prosody import ProsodyPredictor
    from tacotron2_tpu.training import checkpoint as ckpt

    params, _, saved = ckpt.load_model(checkpoint)
    h = dict(saved.get("prosody_predictor", {}))
    h.pop("features", None)
    predictor = ProsodyPredictor(**h)
    return predictor, params


def load_hifigan(checkpoint: Optional[str]):
    """Load a HiFi-GAN generator (torch checkpoint + side config.json, the
    upstream hifi-gan repo format — run/say.py:62-90). Returns
    (HiFiGAN, params) or (None, None). Falls back to the reference's
    hard-coded UNIVERSAL_V1 path when the flag names a missing file."""
    if checkpoint is None:
        return None, None
    import json

    from tacotron2_tpu.convert import convert_hifigan_state_dict
    from tacotron2_tpu.models.hifigan import HiFiGAN, HiFiGANConfig

    if not path.exists(checkpoint):
        fallback = "web_checkpoints/hifi-gan/UNIVERSAL_V1/g_02500000"
        if path.exists(fallback):
            checkpoint = fallback
        else:
            raise FileNotFoundError(f"HiFi-GAN checkpoint not found: {checkpoint}")

    cfg_path = path.join(path.dirname(checkpoint), "config.json")
    with open(cfg_path) as f:
        h = json.load(f)

    import torch

    sd = torch.load(checkpoint, map_location="cpu", weights_only=False)
    params = convert_hifigan_state_dict(sd, h)
    return HiFiGAN(HiFiGANConfig.from_dict(h)), params


def host_prng_keys(seeds) -> np.ndarray:
    """uint32 ``(N, 2)`` array bit-equal to ``jax.random.PRNGKey(seed)``
    per row, for the default threefry2x32 impl with x64 disabled (the
    framework default): jax truncates the Python seed to its low 32 bits
    and zero-fills the high word (verified for 0/negative/>=2^32 seeds in
    tests/test_server.py::test_host_prng_keys_match_jax).

    Built on HOST. The warm server used to call ``jax.random.PRNGKey``
    once per request in the micro-batch window; on the axon tunnel each
    of those is a device dispatch costing a ~28 ms round trip — measured
    ~450 ms of the K=16 batched window (tools/server_phase_probe.py).
    """
    a = np.asarray(seeds, dtype=np.int64)
    return np.stack(
        [np.zeros_like(a), a & 0xFFFFFFFF], axis=-1
    ).astype(np.uint32)


_VOCODER_JIT: dict = {}


def jitted_vocoder(hifigan):
    """Cached ``jax.jit`` of a HiFiGAN's apply. The warm server vocodes per
    request; a fresh jit wrapper each call would re-trace (and re-load the
    persistent compile cache) every time. Keyed by object identity with a
    strong ref so id() can't be recycled."""
    import jax

    ent = _VOCODER_JIT.get(id(hifigan))
    if ent is None or ent[0] is not hifigan:
        ent = (hifigan, jax.jit(hifigan.apply))
        _VOCODER_JIT[id(hifigan)] = ent
    return ent[1]


_CUT_VOCODER_JIT: dict = {}


def jitted_cut_vocoder(hifigan):
    """Cached jit of the warm server's DEVICE-SIDE vocode epilogue:
    row-select + cut/pad to the ``Tb`` bucket + HiFi-GAN + PCM16
    quantization, all in one launch so the mel never round-trips the
    host. The previous flow fetched the full f32 mel block to the host
    (5.2 MB at K=16/T=256), re-padded it with numpy, re-uploaded it, and
    then fetched the f32 waveform (6.3 MB) — on the ~25-30 MB/s axon
    tunnel those two transfers were ~60% of the batched window
    (tools/server_phase_probe.py). This keeps the mel on device and
    fetches int16 (4x fewer wav bytes).

    ``fn(hifi_params, mels (B,T,M), row_idx (nb,), cuts (nb,), Tb)``:
    rows are gathered by ``row_idx`` (host-padded to the power-of-two
    row bucket with 0s), frames at or past a row's ``cuts`` are zeroed
    (bit-identical to the old host ``np.pad`` of ``mel[:cuts]``; dummy
    rows carry cut 0 = all-zero mel, same as the old zero-stack rows),
    and the waveform is clipped/scaled exactly like
    ``audio.io.write_wav``'s PCM_16 path (f32->int16 convert rounds
    toward zero on both numpy and XLA)."""
    import jax
    import jax.numpy as jnp

    ent = _CUT_VOCODER_JIT.get(id(hifigan))
    if ent is None or ent[0] is not hifigan:

        def fn(hifi_params, mels, row_idx, cuts, Tb):
            m = jnp.take(mels, row_idx, axis=0)
            if Tb <= m.shape[1]:
                m = m[:, :Tb]
            else:  # cut + RF margin can land past the decode buffer
                m = jnp.pad(m, ((0, 0), (0, Tb - m.shape[1]), (0, 0)))
            mask = jnp.arange(Tb)[None, :] < cuts[:, None]
            wav = hifigan.apply(hifi_params, m * mask[..., None].astype(m.dtype))
            clipped = jnp.clip(wav, -1.0, 1.0 - 1.0 / 32768.0)
            return (clipped * 32768.0).astype(jnp.int16)

        ent = (hifigan, jax.jit(fn, static_argnums=4))
        _CUT_VOCODER_JIT[id(hifigan)] = ent
    return ent[1]


_MEL_ROW_CUT_JIT = None


def jitted_mel_row_cut():
    """Cached jit of ``(mels (B,T,M), row, Tb) -> mels[row, :Tb]`` with the
    row index a TRACED operand and ``Tb`` static. Fetching a single row's
    cut mel via plain indexing (``mels[b, :cut]``) compiles a new tiny
    slice executable per unique ``(b, cut)`` pair — on the warm server's
    Griffin-Lim path that meant a fresh (tunnel round-trip) compile for
    nearly every request. Bucketing ``Tb`` to 128 multiples bounds the
    executable count to the handful of length buckets; the caller trims
    the host array to the exact cut."""
    global _MEL_ROW_CUT_JIT
    if _MEL_ROW_CUT_JIT is None:
        import jax
        import jax.numpy as jnp

        def fn(mels, row, Tb):
            return jax.lax.dynamic_index_in_dim(
                mels, row, axis=0, keepdims=False)[:Tb]

        _MEL_ROW_CUT_JIT = jax.jit(fn, static_argnums=2)
    return _MEL_ROW_CUT_JIT


def fetch_mel_row(mels, row: int, cut: int) -> np.ndarray:
    """Device->host fetch of ``mels[row, :cut]`` through the bucketed
    jitted slice (one executable per 128-frame bucket instead of per
    (row, cut) pair; only ~bucket frames cross the tunnel instead of the
    full (B, T, M) block)."""
    import jax.numpy as jnp

    Tb = min(int(mels.shape[1]), -(-max(cut, 1) // 128) * 128)
    out = jitted_mel_row_cut()(mels, jnp.asarray(row, jnp.int32), Tb)
    return np.asarray(out)[:cut]


def vocode(mel_post: np.ndarray, hifigan, hifi_params, sample_rate: int) -> np.ndarray:
    """mel (T, M) log-mel -> waveform. HiFi-GAN on-device if given, else
    Griffin-Lim on exp(mel) (run/say.py:153-171)."""
    if hifigan is not None:
        wav = np.asarray(jitted_vocoder(hifigan)(hifi_params, mel_post[None]))[0]
        return wav
    from tacotron2_tpu.audio.griffin_lim import mel_to_audio

    return mel_to_audio(np.exp(mel_post), sample_rate=sample_rate)
