"""Inference CLI driver — the TPU rebuild of the reference run/say.py:24-179.

Pipeline (SURVEY §3.1, the north-star path): text frontend (transliterate ->
lower -> strip -> end token; NO abbreviation expansion here, matching
run/say.py:43-60) -> free-running Tacotron decode on device (max_len 5000)
-> HiFi-GAN on device or Griffin-Lim fallback -> WAV.

Unlike the reference (Tacotron on CPU, vocoder on GPU, run/say.py:125-157),
everything runs in one XLA program chain on the TPU. ``--random-seed``
drives the explicit AlwaysDropout PRNG, so it is reproducible by design.
"""

from __future__ import annotations

import secrets
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from run.common import build_model, load_hifigan, load_tacotron_checkpoint, vocode
from tacotron2_tpu.audio.io import write_wav
from tacotron2_tpu.config import Config
from tacotron2_tpu.text.cleaners import normalize_text
from tacotron2_tpu.text.encoder import CharEncoder

MAX_LEN = 5000  # frames cap (run/say.py:147)


def bert_description_embedding(
    description: Optional[str], dim: int, bert_checkpoint: Optional[str] = None
) -> np.ndarray:
    """BERT pooler_output of the style description (run/say.py:92-106);
    zeros when absent. The encode runs in OUR JAX BERT (models/bert.py) on
    device. ``bert_checkpoint`` points at LOCAL weights (an HF-layout
    directory or a torch state-dict file + vocab.txt — see
    BertEmbedder.from_local) so the path works with zero network access;
    without it, HF's from_pretrained supplies the (cached) weights like
    the reference's implicit download."""
    if description is None:
        return np.zeros((1, dim), np.float32)
    from run.embed_descriptions import BertEmbedder

    embedder = (
        BertEmbedder.from_local(bert_checkpoint)
        if bert_checkpoint is not None
        else BertEmbedder.from_pretrained()
    )
    return embedder.embed([description])


def do_say(
    cfg: Config,
    device: int,
    checkpoint: str,
    text: str,
    output: str,
    hifi_gan_checkpoint: Optional[str] = None,
    random_seed: Optional[int] = None,
    speaker_id: Optional[int] = None,
    controls: Optional[str] = None,
    export_mel: bool = False,
    description: Optional[str] = None,
    max_len_override: int = MAX_LEN,
    quantize_int8: bool = False,
    bert_checkpoint: Optional[str] = None,
    gst_reference: Optional[str] = None,
) -> str:
    prep = cfg.dataset.preprocessing
    if random_seed is None:
        random_seed = secrets.randbelow(2**31)

    # text frontend (run/say.py:43-60 — no abbreviation expansion)
    norm = normalize_text(text, prep.allowed_chars, prep.end_token, False)
    encoder = CharEncoder(prep.allowed_chars, prep.end_token)
    chars_idx, chars_len = encoder.encode_batch([norm])
    # NOTE: chars are NOT padded to a bucket here — the encoder's convs are
    # unmasked (like the reference's), so padding would perturb activations
    # within kernel reach of the sequence end and break exact reference
    # parity. One compile per text length is acceptable for a CLI.

    hifigan, hifi_params = load_hifigan(hifi_gan_checkpoint)

    kwargs = {}
    if cfg.model.description_embeddings:
        kwargs["description_embeddings"] = jnp.asarray(
            bert_description_embedding(
                description, cfg.model.description_embeddings_dim,
                bert_checkpoint=bert_checkpoint,
            )
        )
    if cfg.extensions.speaker_tokens.active:
        # the reference crashes with a raw TypeError here
        # (run/say.py:110-112, torch.tensor([None])); validate like the
        # rest of the config surface instead
        if speaker_id is None:
            raise ValueError(
                "--speaker-id is required: this is a multi-speaker model "
                "(extensions.speaker_tokens.active)."
            )
        kwargs["speaker_id"] = jnp.asarray([speaker_id], jnp.int32)
    if cfg.extensions.controls.active and controls:
        kwargs["controls"] = jnp.asarray(
            [[float(x) for x in controls.split(",")]], jnp.float32
        )
    if gst_reference is not None:
        # GST style transfer: reference wav -> framework mel frontend ->
        # style embedding (beyond-reference capability: the reference keeps
        # GST dormant, model/gst.py:158-175; absent flag = neutral
        # zeros-reference style, Tacotron2._infer_style)
        if not cfg.extensions.gst.active:
            raise ValueError(
                "--gst-reference given, but extensions.gst is not active "
                "in this config."
            )
        from tacotron2_tpu.audio.io import read_wav
        from tacotron2_tpu.audio.mel import TacotronMelSpectrogram

        ref_wav, ref_sr = read_wav(gst_reference)
        if ref_sr != prep.sample_rate:
            raise ValueError(
                f"--gst-reference sample rate {ref_sr} != configured "
                f"{prep.sample_rate}"
            )
        mel_fn = TacotronMelSpectrogram(
            n_mels=prep.num_mels, sample_rate=prep.sample_rate
        )
        kwargs["gst_reference_mel"] = jnp.asarray(mel_fn(ref_wav))[None]

    params, model_state, _ = load_tacotron_checkpoint(checkpoint)
    model = build_model(cfg)

    if quantize_int8:
        # opt-in int8 mode: fused Pallas decode with quantized resident
        # weights (~0.3% mel divergence — PERF.md)
        fwd = lambda p, s, c, l, r: model.forward_infer_fused(
            p, s, c, l, max_len_override, rng=r, quantize=True, **kwargs
        )
    else:
        # fused-on-TPU / XLA-on-CPU dispatch (bit-comparable; 9.2 vs 33.7
        # us/step at batch 1 on v5e — PERF.md)
        fwd = lambda p, s, c, l, r: model.forward_infer_fast(
            p, s, c, l, max_len_override, rng=r, **kwargs
        )
    out = jax.jit(fwd)(params, model_state, jnp.asarray(chars_idx),
                       jnp.asarray(chars_len), jax.random.PRNGKey(random_seed))

    n = int(out.n_frames)
    # drop the final (gate-fired) frame like the reference (run/say.py:153-161)
    cut = max(n - 1, 1)

    if hifigan is not None:
        # device-side epilogue (run/common.py::jitted_cut_vocoder): cut
        # masking + HiFi-GAN + PCM16 quantize in one launch. The mel
        # buffer never crosses the tunnel and the wav comes back as
        # int16. Tb is bucketed to 128 frames past the receptive-field
        # margin, so the HiFi-GAN executable is REUSED across utterance
        # lengths (the old exact-length vocode recompiled the full
        # generator for every new utterance length — ~20-40 s through
        # the tunnel on a persistent-cache miss); output is bit-identical
        # to the exact-length vocode for the first cut*hop samples
        # (tests/test_server.py::test_vocode_bucket_invariance_and_rf).
        from run.common import jitted_cut_vocoder

        Tb = -(-(cut + hifigan.mel_receptive_field()) // 128) * 128
        batch_wav = np.asarray(jitted_cut_vocoder(hifigan)(
            hifi_params, out.mels_post, jnp.asarray([0], jnp.int32),
            jnp.asarray([cut], jnp.int32), Tb))
        wav = batch_wav[0, : cut * (batch_wav.shape[1] // Tb)]
    else:
        from run.common import fetch_mel_row

        wav = vocode(fetch_mel_row(out.mels_post, 0, cut),
                     None, None, prep.sample_rate)
    write_wav(output, np.asarray(wav), prep.sample_rate)

    if export_mel:
        from run.common import fetch_mel_row

        np.save(output, fetch_mel_row(out.mels_post, 0, cut).T)
    print(f"wrote {output}: {len(wav) / prep.sample_rate:.2f}s ({n} frames, seed {random_seed})")
    return output
