"""Location-sensitive (Bahdanau + location features) attention.

Behavioral spec from the reference (model/attention.py:6-69):
energies = v(tanh(query_proj + location_proj + processed_memory)), with the
location path a Conv1d(2->32, k=31, same-pad, no bias) over the previous and
cumulative attention weights followed by a 32->128 dense (no bias); padded
positions masked to -inf before the softmax; context = weights @ memory.

All matmuls batched for the MXU; the location conv runs NWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy


def init(
    key,
    att_rnn_dim: int,
    embedding_dim: int,
    att_dim: int,
    n_filters: int = 32,
    kernel_size: int = 31,
):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "query": layers.linear_init(k1, att_rnn_dim, att_dim, bias=False),
        "v": layers.linear_init(k2, att_dim, 1, bias=False),
        "location_conv": layers.conv1d_init(k3, 2, n_filters, kernel_size, bias=False),
        "location_dense": layers.linear_init(k4, n_filters, att_dim, bias=False),
    }


def apply(
    params,
    att_hidden: jnp.ndarray,  # (B, att_rnn_dim)
    memory: jnp.ndarray,  # (B, L, D_full)
    processed_memory: jnp.ndarray,  # (B, L, att_dim)
    att_weights: jnp.ndarray,  # (B, L) previous
    att_weights_cum: jnp.ndarray,  # (B, L) cumulative
    mask: jnp.ndarray,  # (B, L) True where PADDED
    policy: Policy = F32,
):
    """Returns (context (B, D_full), weights (B, L))."""
    q = layers.linear_apply(params["query"], att_hidden, policy)[:, None, :]  # (B,1,A)

    loc = jnp.stack([att_weights, att_weights_cum], axis=-1)  # (B, L, 2)
    loc = layers.conv1d_apply(params["location_conv"], loc, policy, padding="SAME")
    loc = layers.linear_apply(params["location_dense"], loc, policy)  # (B, L, A)

    energies = layers.linear_apply(
        params["v"], jnp.tanh(q + loc + processed_memory), policy
    )[..., 0]  # (B, L)
    energies = jnp.where(mask, -jnp.inf, energies)

    weights = jax.nn.softmax(energies, axis=1)
    context = jnp.einsum(
        "bl,bld->bd", policy.cast(weights), policy.cast(memory),
        preferred_element_type=jnp.float32,
    )
    return context, weights
