"""Embedding-sequence encoder: BiGRU + additive attention pooling.

Behavioral spec from the reference (model/embedding_encoder.py:5-104,
TorchScript; imported by tacotron2.py but never constructed — dormant,
SURVEY §2.5): a multi-layer bidirectional GRU over a sequence of
embeddings (packed), whose all-layer final hidden state is the attention
context for pooling the outputs:
score = v(tanh(W_h history + W_c context)), softmax over valid steps,
pooled = score @ history. Returns (pooled (B, D), scores (B, T, 1)).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy


class EmbeddingEncoder:
    def __init__(
        self,
        embedding_dim: int,
        encoder_out_dim: int,
        encoder_num_layers: int,
        encoder_dropout: float,
        attention_dim: int,
        policy: Policy = F32,
    ):
        self.embedding_dim = embedding_dim
        self.encoder_out_dim = encoder_out_dim
        self.hidden = encoder_out_dim // 2
        self.num_layers = encoder_num_layers
        self.dropout = encoder_dropout
        self.attention_dim = attention_dim
        # context = all-layer final hiddens; reference hard-codes
        # context_dim = encoder_out_dim * 2 (i.e. assumes 2 layers,
        # model/embedding_encoder.py:73-77)
        self.context_dim = encoder_out_dim * 2
        self.policy = policy

    def init(self, key) -> dict:
        k_rnn, k1, k2, k3 = jax.random.split(key, 4)
        return {
            "gru": layers.birnn_stack_init(
                k_rnn, layers.gru_cell_init, self.embedding_dim, self.hidden, self.num_layers
            ),
            "attention": {
                "history": layers.linear_init(k1, self.encoder_out_dim, self.attention_dim, bias=False),
                "context": layers.linear_init(k2, self.context_dim, self.attention_dim, bias=False),
                "v": layers.linear_init(k3, self.attention_dim, 1, bias=False),
            },
        }

    def apply(self, params, x, lengths, train: bool = False, rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x (B, T, E), lengths (B,) -> (pooled (B, D), scores (B, T, 1))."""
        B, T, _ = x.shape
        finals = []
        out = x
        for layer, p in enumerate(params["gru"]):
            fwd, h_f = layers.gru_sequence(p["fwd"], out, lengths, policy=self.policy)
            bwd, h_b = layers.gru_sequence(p["bwd"], out, lengths, reverse=True, policy=self.policy)
            out = jnp.concatenate([fwd, bwd], axis=-1)
            finals += [h_f, h_b]
            # torch inter-layer dropout (not after the last layer)
            if train and self.dropout > 0 and layer < len(params["gru"]) - 1:
                rng, sub = jax.random.split(rng)
                out = layers.dropout(sub, out, self.dropout)
        # torch h: (layers*2, B, H) -> swapaxes(0,1).reshape(B, -1)
        context = jnp.concatenate(finals, axis=-1)  # (B, layers*2*H)

        att = params["attention"]
        hist = layers.linear_apply(att["history"], out, self.policy)  # (B,T,A)
        ctx = layers.linear_apply(att["context"], context, self.policy)[:, None, :]
        score = layers.linear_apply(att["v"], jnp.tanh(hist + ctx), self.policy)  # (B,T,1)
        mask = (jnp.arange(T)[None, :] >= lengths[:, None])[..., None]
        score = jnp.where(mask, -jnp.inf, score)
        score = jax.nn.softmax(score, axis=1)
        score = jnp.where(mask, 0.0, score)
        pooled = jnp.einsum("btz,btd->bd", score, out)  # z == 1
        return pooled, score
