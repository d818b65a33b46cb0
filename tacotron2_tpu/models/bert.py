"""BERT encoder in JAX — the description-embedding backbone.

The reference encodes style descriptions with HuggingFace's torch
``BertModel`` at inference, taking ``pooler_output`` (run/say.py:92-106;
SURVEY §2.7 lists "BERT-base encode in JAX" as the TPU-native equivalent).
This is a from-scratch functional BERT (post-LN, learned positions, exact
gelu) plus a converter from HF torch state dicts, parity-tested against
``transformers.BertModel`` with random weights (no downloads needed).

Usage in the say path: HF weights (if locally cached) are converted once
and the encode runs on the TPU; tokenization stays host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12


def _layer_norm(params, x, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]


class Bert:
    def __init__(self, config: BertConfig, policy: Policy = F32):
        self.cfg = config
        self.policy = policy

    def apply(
        self,
        params,
        input_ids: jnp.ndarray,  # (B, T) int
        attention_mask: Optional[jnp.ndarray] = None,  # (B, T) 1=real
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (last_hidden (B, T, H), pooler_output (B, H))."""
        cfg, pol = self.cfg, self.policy
        B, T = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, T), jnp.float32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, T), jnp.int32)

        emb = (
            jnp.take(params["word_embeddings"], input_ids, axis=0)
            + params["position_embeddings"][None, :T]
            + jnp.take(params["token_type_embeddings"], token_type_ids, axis=0)
        )
        h = _layer_norm(params["embeddings_ln"], emb, cfg.layer_norm_eps)

        # HF extended attention mask: large negative bias on padded keys
        bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -1e9

        n_heads = cfg.num_attention_heads
        head = cfg.hidden_size // n_heads
        for layer in params["layers"]:
            q = layers.linear_apply(layer["q"], h, pol).reshape(B, T, n_heads, head)
            k = layers.linear_apply(layer["k"], h, pol).reshape(B, T, n_heads, head)
            v = layers.linear_apply(layer["v"], h, pol).reshape(B, T, n_heads, head)
            scores = jnp.einsum("bqhd,bkhd->bhqk", pol.cast(q), pol.cast(k),
                                preferred_element_type=jnp.float32)
            scores = scores / np.sqrt(head) + bias
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", pol.cast(probs), pol.cast(v),
                             preferred_element_type=jnp.float32).reshape(B, T, -1)
            attn_out = layers.linear_apply(layer["attn_out"], ctx, pol)
            h = _layer_norm(layer["attn_ln"], h + attn_out, cfg.layer_norm_eps)

            inter = jax.nn.gelu(
                layers.linear_apply(layer["ffn_in"], h, pol), approximate=False
            )
            ffn_out = layers.linear_apply(layer["ffn_out"], inter, pol)
            h = _layer_norm(layer["ffn_ln"], h + ffn_out, cfg.layer_norm_eps)

        pooled = jnp.tanh(layers.linear_apply(params["pooler"], h[:, 0], pol))
        return h, pooled


def convert_bert_state_dict(sd, num_attention_heads: Optional[int] = None) -> Tuple[dict, BertConfig]:
    """HuggingFace torch ``BertModel`` state dict -> (params, config).
    ``num_attention_heads`` isn't recoverable from the weights; defaults to
    hidden/64 (true for every standard BERT size)."""

    def t(key):
        v = sd[key]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def lin(prefix):
        return {"w": t(f"{prefix}.weight").T, "b": t(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    word = t("embeddings.word_embeddings.weight")
    pos = t("embeddings.position_embeddings.weight")
    params = {
        "word_embeddings": word,
        "position_embeddings": pos,
        "token_type_embeddings": t("embeddings.token_type_embeddings.weight"),
        "embeddings_ln": ln("embeddings.LayerNorm"),
        "layers": [],
        "pooler": lin("pooler.dense"),
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        p = f"encoder.layer.{i}"
        params["layers"].append(
            {
                "q": lin(f"{p}.attention.self.query"),
                "k": lin(f"{p}.attention.self.key"),
                "v": lin(f"{p}.attention.self.value"),
                "attn_out": lin(f"{p}.attention.output.dense"),
                "attn_ln": ln(f"{p}.attention.output.LayerNorm"),
                "ffn_in": lin(f"{p}.intermediate.dense"),
                "ffn_out": lin(f"{p}.output.dense"),
                "ffn_ln": ln(f"{p}.output.LayerNorm"),
            }
        )
        i += 1
    n_layers = i
    hidden = word.shape[1]
    cfg = BertConfig(
        vocab_size=word.shape[0],
        hidden_size=hidden,
        num_hidden_layers=n_layers,
        num_attention_heads=num_attention_heads or max(1, hidden // 64),
        intermediate_size=params["layers"][0]["ffn_in"]["w"].shape[1],
        max_position_embeddings=pos.shape[0],
        type_vocab_size=params["token_type_embeddings"].shape[0],
    )
    return params, cfg
