"""Postnet: 5-layer conv refinement applied as a residual over the whole mel.

Behavioral spec from the reference (model/postnet.py:4-52): 5x [Conv1d(k=5,
same-pad, no bias) -> BatchNorm1d -> Tanh -> Dropout], except the LAST layer
has no Tanh; first maps num_mels -> postnet_dim, last maps back to num_mels.
Applied over (B, T, M) channels-last here (reference uses (B, M, T)).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy


def init(key, num_mels: int, postnet_dim: int, num_layers: int = 5):
    keys = jax.random.split(key, num_layers)
    dims = [num_mels] + [postnet_dim] * (num_layers - 1) + [num_mels]
    params = {"convs": [], "bns": []}
    state = {"bns": []}
    for i in range(num_layers):
        params["convs"].append(layers.conv1d_init(keys[i], dims[i], dims[i + 1], 5, bias=False))
        bn_p, bn_s = layers.batchnorm_init(dims[i + 1])
        params["bns"].append(bn_p)
        state["bns"].append(bn_s)
    return params, state


def apply(
    params,
    state,
    x: jnp.ndarray,  # (B, T, M)
    train: bool,
    dropout_rate: float,
    rng=None,
    policy: Policy = F32,
) -> Tuple[jnp.ndarray, dict]:
    num_layers = len(params["convs"])
    new_bns = []
    # T2T_POSTNET_TAPS=1: tap-sum conv rewrite whose BACKWARD is K clean
    # matmuls (layers.conv1d_apply_taps) — the VERDICT r4 #7 experiment;
    # read at trace time, A/B in PERF.md "Postnet backward" decides the
    # default
    conv = (layers.conv1d_apply_taps
            if os.environ.get("T2T_POSTNET_TAPS") == "1"
            else layers.conv1d_apply)
    for i in range(num_layers):
        x = conv(params["convs"][i], x, policy, padding="SAME")
        x, bn_s = layers.batchnorm_apply(params["bns"][i], state["bns"][i], x, train)
        new_bns.append(bn_s)
        if i < num_layers - 1:  # last layer: no Tanh (model/postnet.py:36-46)
            x = jnp.tanh(x)
        if train:
            rng, sub = jax.random.split(rng)
            x = layers.dropout(sub, x, dropout_rate)
    return x, {"bns": new_bns}
