"""Tacotron 2 character encoder.

Behavioral spec from the reference (model/encoder.py:8-67): character
embedding (padding row 0, init N(0, 0.5)) -> 3x [Conv1d(k, same-pad) ->
BatchNorm1d -> ReLU -> Dropout] -> bidirectional LSTM over packed sequences
(hidden = dim/2 per direction).

TPU redesign: NWC convs + the BiLSTM as two masked ``lax.scan``s with the
input projections hoisted into one big MXU matmul (layers.lstm_sequence),
replacing cuDNN packed sequences.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy


def init(key, num_chars: int, embedding_dim: int, kernel_size: int):
    keys = jax.random.split(key, 8)
    params = {
        "embedding": layers.embedding_init(
            keys[0], num_chars + 1, embedding_dim, std=0.5, padding_idx=0
        ),
        "convs": [],
        "bns": [],
        "lstm_fwd": layers.lstm_cell_init(keys[4], embedding_dim, embedding_dim // 2),
        "lstm_bwd": layers.lstm_cell_init(keys[5], embedding_dim, embedding_dim // 2),
    }
    state = {"bns": []}
    for i in range(3):
        params["convs"].append(
            layers.conv1d_init(keys[1 + i], embedding_dim, embedding_dim, kernel_size)
        )
        bn_p, bn_s = layers.batchnorm_init(embedding_dim)
        params["bns"].append(bn_p)
        state["bns"].append(bn_s)
    return params, state


def apply(
    params,
    state,
    chars_idx: jnp.ndarray,  # (B, L) int
    chars_len: jnp.ndarray,  # (B,) int
    train: bool,
    dropout_rate: float,
    rng=None,
    policy: Policy = F32,
) -> Tuple[jnp.ndarray, dict]:
    """Returns (encoded (B, L, D), new_bn_state)."""
    x = layers.embedding_apply(params["embedding"], chars_idx)  # (B, L, D)

    new_bns = []
    for i in range(3):
        x = layers.conv1d_apply(params["convs"][i], x, policy, padding="SAME")
        x, bn_s = layers.batchnorm_apply(params["bns"][i], state["bns"][i], x, train)
        new_bns.append(bn_s)
        x = jax.nn.relu(x)
        if train:
            rng, sub = jax.random.split(rng)
            x = layers.dropout(sub, x, dropout_rate)

    # bidirectional halves (each D/2) concatenated back to D
    fwd = layers.lstm_sequence(params["lstm_fwd"], x, chars_len, reverse=False, policy=policy)
    bwd = layers.lstm_sequence(params["lstm_bwd"], x, chars_len, reverse=True, policy=policy)
    encoded = jnp.concatenate([fwd, bwd], axis=-1)

    return encoded, {"bns": new_bns}
