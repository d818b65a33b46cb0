"""One-way PyTorch -> JAX pytree checkpoint conversion.

Needed early because the parity gate (mel MAE < 1e-3, BASELINE.md) is
defined against identical weights. Handles:

- the reference's Lightning ``.ckpt`` files ("state_dict" with keys prefixed
  ``tacotron2.``, model/tts_model.py:46) and raw ``Tacotron2`` state dicts
- HiFi-GAN generator checkpoints (``{"generator": state_dict}``,
  run/say.py:79-86), including weight-norm folding (the reference calls
  ``remove_weight_norm()`` before inference anyway, run/say.py:88)

Layout transforms (SURVEY §7 "hard parts" #7):
- Linear: torch (out, in) -> (in, out)
- Conv1d: torch (O, I, W) -> (W, I, O)  [NWC/WIO convs]
- ConvTranspose1d: torch (I, O, W) -> (W, I, O), flipped at apply time
- LSTM/LSTMCell: torch (4H, in) -> (in, 4H); gate order i,f,g,o preserved
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    """torch tensor -> numpy float32 (works on CPU tensors and ndarrays)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix, bias=True):
    p = {"w": _t(sd[f"{prefix}.weight"]).T}
    if bias:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _conv1d(sd, prefix, bias=True):
    p = {"w": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}  # (O,I,W)->(W,I,O)
    if bias:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _bn(sd, prefix):
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    state = {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])}
    return params, state


def _lstm(sd, prefix, suffix=""):
    return {
        "w_ih": _t(sd[f"{prefix}.weight_ih{suffix}"]).T,
        "w_hh": _t(sd[f"{prefix}.weight_hh{suffix}"]).T,
        "b_ih": _t(sd[f"{prefix}.bias_ih{suffix}"]),
        "b_hh": _t(sd[f"{prefix}.bias_hh{suffix}"]),
    }


def convert_tacotron2_state_dict(sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """Reference ``Tacotron2`` state dict -> (params, state) pytrees matching
    ``tacotron2_tpu.models.tacotron2.Tacotron2.init``."""
    # strip the Lightning wrapper prefix if present (model/tts_model.py:59)
    if any(k.startswith("tacotron2.") for k in sd):
        sd = {k[len("tacotron2.") :]: v for k, v in sd.items() if k.startswith("tacotron2.")}

    params: dict = {}
    state: dict = {}

    # encoder (model/encoder.py): convolutions Sequential indices 0,4,8 conv / 1,5,9 BN
    enc = {
        "embedding": {"table": _t(sd["encoder.embedding.weight"])},
        "convs": [],
        "bns": [],
        "lstm_fwd": _lstm(sd, "encoder.lstm", "_l0"),
        "lstm_bwd": _lstm(sd, "encoder.lstm", "_l0_reverse"),
    }
    enc_state = {"bns": []}
    for i in range(3):
        enc["convs"].append(_conv1d(sd, f"encoder.convolutions.{4 * i}"))
        bn_p, bn_s = _bn(sd, f"encoder.convolutions.{4 * i + 1}")
        enc["bns"].append(bn_p)
        enc_state["bns"].append(bn_s)
    params["encoder"] = enc
    state["encoder"] = enc_state

    # conditioning
    if "speaker_embedding.weight" in sd:
        params["speaker_embedding"] = {"table": _t(sd["speaker_embedding.weight"])}
    if "description_embeddings_linear.0.weight" in sd:
        params["description_linear"] = _linear(sd, "description_embeddings_linear.0")

    # prenet (model/tacotron2.py:85-92): Sequential indices 0 and 3, no bias
    params["prenet"] = {
        "fc1": _linear(sd, "prenet.0", bias=False),
        "fc2": _linear(sd, "prenet.3", bias=False),
    }
    params["att_encoder"] = _linear(sd, "att_encoder", bias=False)

    # decoder (model/decoder.py)
    params["decoder"] = {
        "att_rnn": _lstm(sd, "decoder.att_rnn"),
        "attention": {
            "query": _linear(sd, "decoder.attention.query_layer", bias=False),
            "v": _linear(sd, "decoder.attention.v", bias=False),
            "location_conv": _conv1d(sd, "decoder.attention.location_conv", bias=False),
            "location_dense": _linear(sd, "decoder.attention.location_dense", bias=False),
        },
        "lstm": _lstm(sd, "decoder.lstm"),
        "mel_out": _linear(sd, "decoder.mel_out"),
        "gate": _linear(sd, "decoder.gate"),
    }

    # postnet (model/postnet.py): Sequential conv at 4i, BN at 4i+1
    post = {"convs": [], "bns": []}
    post_state = {"bns": []}
    for i in range(5):
        post["convs"].append(_conv1d(sd, f"postnet.postnet.{4 * i}", bias=False))
        bn_p, bn_s = _bn(sd, f"postnet.postnet.{4 * i + 1}")
        post["bns"].append(bn_p)
        post_state["bns"].append(bn_s)
    params["postnet"] = post
    state["postnet"] = post_state

    return params, state


def load_lightning_checkpoint(path: str) -> Tuple[dict, dict, Dict[str, Any]]:
    """Load a reference Lightning ``.ckpt`` -> (params, state, hparams)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    hparams = ckpt.get("hyper_parameters", {})
    params, state = convert_tacotron2_state_dict(sd)
    return params, state, dict(hparams)


def _conv2d(sd, prefix, bias=True):
    p = {"w": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}  # (O,I,H,W)->(H,W,I,O)
    if bias:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


def _gru(sd, prefix, suffix=""):
    return {
        "w_ih": _t(sd[f"{prefix}.weight_ih{suffix}"]).T,
        "w_hh": _t(sd[f"{prefix}.weight_hh{suffix}"]).T,
        "b_ih": _t(sd[f"{prefix}.bias_ih{suffix}"]),
        "b_hh": _t(sd[f"{prefix}.bias_hh{suffix}"]),
    }


def convert_gst_state_dict(sd: Dict[str, Any], num_convs: int = 6) -> Tuple[dict, dict]:
    """Reference GST state dict (model/gst.py:158-175) -> (params, state)."""
    params = {"reference_encoder": {"convs": [], "bns": [], "gru": None}, "stl": {}}
    state = {"reference_encoder": {"bns": []}}
    re = params["reference_encoder"]
    for i in range(num_convs):
        re["convs"].append(_conv2d(sd, f"reference_encoder.convs.{i}"))
        bn_p, bn_s = _bn(sd, f"reference_encoder.bns.{i}")
        re["bns"].append(bn_p)
        state["reference_encoder"]["bns"].append(bn_s)
    re["gru"] = _gru(sd, "reference_encoder.gru", "_l0")
    params["stl"] = {
        "embed": _t(sd["stl.embed"]),
        "attention": {
            "w_query": _linear(sd, "stl.attention.W_query", bias=False),
            "w_key": _linear(sd, "stl.attention.W_key", bias=False),
            "w_value": _linear(sd, "stl.attention.W_value", bias=False),
        },
    }
    return params, state


def convert_embedding_encoder_state_dict(sd: Dict[str, Any], num_layers: int = 2) -> dict:
    """Reference EmbeddingEncoder state dict (model/embedding_encoder.py:44)."""
    gru = []
    for layer in range(num_layers):
        gru.append(
            {
                "fwd": _gru(sd, "encoder", f"_l{layer}"),
                "bwd": _gru(sd, "encoder", f"_l{layer}_reverse"),
            }
        )
    return {
        "gru": gru,
        "attention": {
            "history": _linear(sd, "attention.history", bias=False),
            "context": _linear(sd, "attention.context", bias=False),
            "v": _linear(sd, "attention.v", bias=False),
        },
    }


# ---------------------------------------------------------------------------
# HiFi-GAN generator
# ---------------------------------------------------------------------------


def _fold_weight_norm(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Fold weight_norm (weight_g, weight_v) pairs into plain weights:
    w = g * v / ||v||, norm over all dims except 0 (torch's default dim=0)."""
    out = dict(sd)
    for key in list(sd):
        if key.endswith(".weight_v"):
            base = key[: -len(".weight_v")]
            v = _t(sd[key])
            g = _t(sd[base + ".weight_g"])
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
            out[base + ".weight"] = g * v / np.maximum(norm, 1e-12)
            del out[key], out[base + ".weight_g"]
    return out


def convert_hifigan_state_dict(sd: Dict[str, Any], h: Dict[str, Any]) -> dict:
    """Reference HiFi-GAN ``Generator`` state dict + config -> params pytree
    for ``tacotron2_tpu.models.hifigan`` (model/hifi_gan.py:154-216)."""
    if "generator" in sd:
        sd = sd["generator"]
    sd = _fold_weight_norm(sd)

    num_kernels = len(h["resblock_kernel_sizes"])
    num_ups = len(h["upsample_rates"])

    def conv(prefix, bias=True):
        return _conv1d(sd, prefix, bias=bias)

    params = {
        "conv_pre": conv("conv_pre"),
        "ups": [],
        "resblocks": [],
        "conv_post": conv("conv_post"),
    }
    for i in range(num_ups):
        # ConvTranspose1d torch weight (I, O, W) -> (W, I, O)
        params["ups"].append(
            {
                "w": _t(sd[f"ups.{i}.weight"]).transpose(2, 0, 1),
                "b": _t(sd[f"ups.{i}.bias"]),
            }
        )
    for i in range(num_ups * num_kernels):
        rb: dict = {}
        if h["resblock"] == "1":
            rb["convs1"] = [conv(f"resblocks.{i}.convs1.{j}") for j in range(3)]
            rb["convs2"] = [conv(f"resblocks.{i}.convs2.{j}") for j in range(3)]
        else:
            rb["convs"] = [conv(f"resblocks.{i}.convs.{j}") for j in range(2)]
        params["resblocks"].append(rb)
    return params
