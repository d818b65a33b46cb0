"""Standalone ResBlock2 + Multi-Receptive-Field Fusion.

Rebuild of the reference's clean reimplementation (model/resblock.py:9-82;
dormant there — hifi_gan.py uses its own blocks — but part of the inventory,
SURVEY §2.5). MRF = mean over parallel resblocks with different kernel
sizes/dilations; this mirrors tacotron2_tpu.models.hifigan's internals as an
independently usable module.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from tacotron2_tpu.models import layers
from tacotron2_tpu.models.layers import F32, Policy

LRELU_SLOPE = 0.1


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def resblock2_init(key, channels: int, kernel_size: int = 3, dilation: Sequence[int] = (1, 3)):
    keys = jax.random.split(key, len(dilation))
    return {
        "convs": [layers.conv1d_init(k, channels, channels, kernel_size) for k in keys],
        "kernel_size": kernel_size,
        "dilation": tuple(dilation),
    }


def resblock2_apply(params, x, policy: Policy = F32):
    k = params["kernel_size"]
    for conv, d in zip(params["convs"], params["dilation"]):
        xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
        xt = layers.conv1d_apply(conv, xt, policy, padding=get_padding(k, d), dilation=d)
        x = xt + x
    return x


def mrf_init(key, channels: int, kernel_sizes: Sequence[int] = (3, 7, 11),
             dilations: Sequence[Sequence[int]] = ((1, 3), (1, 3), (1, 3))):
    keys = jax.random.split(key, len(kernel_sizes))
    return {
        "blocks": [
            resblock2_init(kk, channels, ks, d)
            for kk, ks, d in zip(keys, kernel_sizes, dilations)
        ]
    }


def mrf_apply(params, x, policy: Policy = F32):
    """Multi-receptive-field fusion: mean of the parallel resblock outputs
    (model/resblock.py:52-82)."""
    outs = [resblock2_apply(b, x, policy) for b in params["blocks"]]
    return sum(outs) / len(outs)
