"""Global Style Tokens (GST) — optional style-conditioning block.

Behavioral spec from the reference (model/gst.py:9-184, itself based on
NVIDIA Mellotron; dormant there but part of the capability surface,
SURVEY §2.5): ReferenceEncoder = 6x [Conv2d(3x3, stride 2, pad 1) ->
BatchNorm2d -> ReLU] over the mel treated as an image, then a GRU whose
last hidden state summarizes the reference audio; STL = 10 learned 32-d
tokens attended by an 8-head scaled-dot-product attention producing a
(N, 1, 256) style embedding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy


def _conv_out_len(L: int, n_convs: int, kernel: int = 3, stride: int = 2, pad: int = 1) -> int:
    for _ in range(n_convs):
        L = (L - kernel + 2 * pad) // stride + 1
    return L


# ---------------------------------------------------------------------------
# ReferenceEncoder
# ---------------------------------------------------------------------------


def reference_encoder_init(key, ref_enc_filters=(32, 32, 64, 64, 128, 128), n_mel_channels=80, gru_size=128):
    filters = [1] + list(ref_enc_filters)
    params = {"convs": [], "bns": []}
    state = {"bns": []}
    for i in range(len(ref_enc_filters)):
        key, sub = jax.random.split(key)
        params["convs"].append(layers.conv2d_init(sub, filters[i], filters[i + 1], (3, 3)))
        bn_p, bn_s = layers.batchnorm_init(filters[i + 1])
        params["bns"].append(bn_p)
        state["bns"].append(bn_s)
    out_channels = _conv_out_len(n_mel_channels, len(ref_enc_filters))
    key, sub = jax.random.split(key)
    params["gru"] = layers.gru_cell_init(sub, ref_enc_filters[-1] * out_channels, gru_size)
    return params, state


def reference_encoder_apply(params, state, mels, lengths=None, train: bool = False, policy: Policy = F32):
    """mels (N, T, n_mels) -> (N, gru_size). BN state updated when train."""
    x = mels[..., None]  # (N, T, n_mels, 1) == NHWC with H=T, W=mels
    new_bns = []
    n_convs = len(params["convs"])
    for i in range(n_convs):
        x = layers.conv2d_apply(params["convs"][i], x, stride=(2, 2), padding=(1, 1), policy=policy)
        x, bn_s = layers.batchnorm_apply(params["bns"][i], state["bns"][i], x, train)
        new_bns.append(bn_s)
        x = jax.nn.relu(x)
    N, T2, W2, C = x.shape
    # torch reshapes (N,C,T',W') -> transpose(1,2) -> view(N,T',C*W'):
    # channel-major flattening; our NHWC is W-major — permute to match
    x = x.transpose(0, 1, 3, 2).reshape(N, T2, C * W2)
    if lengths is not None:
        lengths = jnp.ceil(lengths.astype(jnp.float32) / (2**n_convs)).astype(jnp.int32)
    _, h_final = layers.gru_sequence(params["gru"], x, lengths, policy=policy)
    return h_final, {"bns": new_bns}


# ---------------------------------------------------------------------------
# Multi-head attention over style tokens (model/gst.py:105-155)
# ---------------------------------------------------------------------------


def mha_init(key, query_dim: int, key_dim: int, num_units: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w_query": layers.linear_init(k1, query_dim, num_units, bias=False),
        "w_key": layers.linear_init(k2, key_dim, num_units, bias=False),
        "w_value": layers.linear_init(k3, key_dim, num_units, bias=False),
    }


def mha_apply(params, query, key, num_heads: int, key_dim: int, policy: Policy = F32):
    """query (N, Tq, Dq), key (N, Tk, Dk) -> (N, Tq, num_units).
    Scores scaled by sqrt(key_dim) — the INPUT key dim, like the reference
    (model/gst.py:146)."""
    q = layers.linear_apply(params["w_query"], query, policy)
    k = layers.linear_apply(params["w_key"], key, policy)
    v = layers.linear_apply(params["w_value"], key, policy)
    N, Tq, U = q.shape
    h = num_heads
    q = q.reshape(N, Tq, h, U // h).transpose(0, 2, 1, 3)  # (N, h, Tq, U/h)
    k = k.reshape(N, -1, h, U // h).transpose(0, 2, 1, 3)
    v = v.reshape(N, -1, h, U // h).transpose(0, 2, 1, 3)
    scores = jnp.einsum("nhqd,nhkd->nhqk", policy.cast(q), policy.cast(k),
                        preferred_element_type=jnp.float32) / (key_dim**0.5)
    scores = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhqk,nhkd->nhqd", policy.cast(scores), policy.cast(v),
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(N, Tq, U)


# ---------------------------------------------------------------------------
# GST = ReferenceEncoder + STL
# ---------------------------------------------------------------------------


class GST:
    """Style-token module: mels -> (N, 1, token_embedding_size)."""

    def __init__(
        self,
        ref_enc_filters=(32, 32, 64, 64, 128, 128),
        n_mel_channels: int = 80,
        ref_enc_gru_size: int = 128,
        token_num: int = 10,
        token_embedding_size: int = 256,
        num_heads: int = 8,
        policy: Policy = F32,
    ):
        self.ref_enc_filters = tuple(ref_enc_filters)
        self.n_mel_channels = n_mel_channels
        self.gru_size = ref_enc_gru_size
        self.token_num = token_num
        self.token_embedding_size = token_embedding_size
        self.num_heads = num_heads
        self.key_dim = token_embedding_size // num_heads
        self.policy = policy

    def init(self, key) -> Tuple[dict, dict]:
        k1, k2, k3 = jax.random.split(key, 3)
        ref_p, ref_s = reference_encoder_init(
            k1, self.ref_enc_filters, self.n_mel_channels, self.gru_size
        )
        params = {
            "reference_encoder": ref_p,
            "stl": {
                # tokens init N(0, 0.5) (model/gst.py:97)
                "embed": jax.random.normal(k2, (self.token_num, self.key_dim)) * 0.5,
                "attention": mha_init(k3, self.gru_size, self.key_dim, self.token_embedding_size),
            },
        }
        return params, {"reference_encoder": ref_s}

    def apply(self, params, state, mels, lengths=None, train: bool = False):
        """mels (N, T, n_mels) -> (style (N, 1, E), new_state)."""
        enc, ref_state = reference_encoder_apply(
            params["reference_encoder"], state["reference_encoder"], mels, lengths,
            train, self.policy,
        )
        query = enc[:, None, :]  # (N, 1, gru)
        keys = jnp.tanh(params["stl"]["embed"])[None].repeat(mels.shape[0], axis=0)
        style = mha_apply(
            params["stl"]["attention"], query, keys, self.num_heads, self.key_dim, self.policy
        )
        return style, {"reference_encoder": ref_state}
