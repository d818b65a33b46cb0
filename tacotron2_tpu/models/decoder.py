"""Tacotron 2 decoder step — the hot op of the whole framework.

Behavioral spec from the reference (model/decoder.py:10-119): one step is
  attention LSTMCell([prenet_out, context]) -> Dropout(0.1)
  -> location-sensitive attention -> cumulative-weight update
  -> decoder LSTMCell([att_h, context (+controls)]) -> Dropout(0.1)
  -> gate head Linear([rnn_h, context]) and mel head
     Linear([rnn_h, context (+controls)])

The reference launches this per frame from Python (model/tacotron2.py:276-
308, ~600-800 sequential CUDA launches per batch). Here it is a pure
function over a state pytree, driven by ``lax.scan`` (teacher forcing) or
``lax.while_loop`` (free-running) in tacotron2.py — one XLA program, no
per-step dispatch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import attention, layers
from tacotron2_tpu.models.layers import F32, Policy


class DecoderState(NamedTuple):
    """Recurrent state carried across decode steps
    (reference init: model/tacotron2.py:126-153, all zeros)."""

    att_h: jnp.ndarray  # (B, att_rnn_dim)
    att_c: jnp.ndarray
    att_context: jnp.ndarray  # (B, encoded_full_dim)
    att_weights: jnp.ndarray  # (B, L)
    att_weights_cum: jnp.ndarray  # (B, L)
    rnn_h: jnp.ndarray  # (B, rnn_hidden_dim)
    rnn_c: jnp.ndarray


def init_state(batch_size: int, encoded_len: int, att_rnn_dim: int, encoded_full_dim: int, rnn_hidden_dim: int) -> DecoderState:
    z = lambda *s: jnp.zeros(s, jnp.float32)
    return DecoderState(
        att_h=z(batch_size, att_rnn_dim),
        att_c=z(batch_size, att_rnn_dim),
        att_context=z(batch_size, encoded_full_dim),
        att_weights=z(batch_size, encoded_len),
        att_weights_cum=z(batch_size, encoded_len),
        rnn_h=z(batch_size, rnn_hidden_dim),
        rnn_c=z(batch_size, rnn_hidden_dim),
    )


def init(
    key,
    num_mels: int,
    embedding_dim: int,  # encoded_full_dim
    prenet_dim: int,
    att_rnn_dim: int,
    att_dim: int,
    rnn_hidden_dim: int,
    extra_decoder_in_dim: int = 0,
):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "att_rnn": layers.lstm_cell_init(k1, prenet_dim + embedding_dim, att_rnn_dim),
        "attention": attention.init(k2, att_rnn_dim, embedding_dim, att_dim),
        "lstm": layers.lstm_cell_init(
            k3, att_rnn_dim + embedding_dim + extra_decoder_in_dim, rnn_hidden_dim
        ),
        "mel_out": layers.linear_init(
            k4, rnn_hidden_dim + embedding_dim + extra_decoder_in_dim, num_mels
        ),
        "gate": layers.linear_init(k5, rnn_hidden_dim + embedding_dim, 1),
    }


def step(
    params,
    prev_mel_prenet: jnp.ndarray,  # (B, prenet_dim)
    state: DecoderState,
    encoded: jnp.ndarray,  # (B, L, D_full)
    att_encoded: jnp.ndarray,  # (B, L, att_dim)
    encoded_mask: jnp.ndarray,  # (B, L) True where padded
    extra_decoder_in: Optional[jnp.ndarray] = None,  # (B, controls_dim)
    train: bool = False,
    rng=None,
    policy: Policy = F32,
):
    """One decode step. Returns (mel_out (B, M), gate_out (B, 1), new_state)."""
    # attention RNN ----------------------------------------------------
    att_in = jnp.concatenate([prev_mel_prenet, state.att_context], axis=-1)
    att_h, att_c = layers.lstm_cell_apply(
        params["att_rnn"], att_in, (state.att_h, state.att_c), policy
    )
    if train:
        rng, sub = jax.random.split(rng)
        att_h_d = layers.dropout(sub, att_h, 0.1)
    else:
        att_h_d = att_h

    # attention --------------------------------------------------------
    context, weights = attention.apply(
        params["attention"],
        att_h_d,
        encoded,
        att_encoded,
        state.att_weights,
        state.att_weights_cum,
        encoded_mask,
        policy,
    )
    weights_cum = state.att_weights_cum + weights

    # decoder RNN --------------------------------------------------------
    dec_in = [att_h_d, context]
    if extra_decoder_in is not None:
        dec_in.append(extra_decoder_in)
    rnn_h, rnn_c = layers.lstm_cell_apply(
        params["lstm"], jnp.concatenate(dec_in, axis=-1), (state.rnn_h, state.rnn_c), policy
    )
    if train:
        rng, sub = jax.random.split(rng)
        rnn_h_d = layers.dropout(sub, rnn_h, 0.1)
    else:
        rnn_h_d = rnn_h

    # heads --------------------------------------------------------------
    gate_in = jnp.concatenate([rnn_h_d, context], axis=-1)
    gate_out = layers.linear_apply(params["gate"], gate_in, policy)  # (B, 1)

    mel_in = gate_in if extra_decoder_in is None else jnp.concatenate(
        [rnn_h_d, context, extra_decoder_in], axis=-1
    )
    mel_out = layers.linear_apply(params["mel_out"], mel_in, policy)  # (B, M)

    new_state = DecoderState(
        att_h=att_h_d,  # reference carries the POST-dropout h (decoder.py:75,111)
        att_c=att_c,
        att_context=context,
        att_weights=weights,
        att_weights_cum=weights_cum,
        rnn_h=rnn_h_d,
        rnn_c=rnn_c,
    )
    return mel_out, gate_out, new_state
