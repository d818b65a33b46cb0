"""Training losses.

Reference (model/tts_model.py:197-201): loss = BCEWithLogits(gate, gate_tgt)
+ MSE(mel, mel_tgt) + MSE(mel_post, mel_tgt), each a plain mean over the
FULL padded tensors. Padding contributes ~zero numerator (masked gate logits
are -1000 vs target 0 -> BCE ~ 0; masked mels are 0 vs padded target 0) but
does change the denominator — we reproduce that exactly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch F.binary_cross_entropy_with_logits (mean reduction), computed
    stably: max(x,0) - x*y + log(1+exp(-|x|))."""
    x, y = logits, targets
    loss = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def tacotron2_loss(
    mels: jnp.ndarray,
    mels_post: jnp.ndarray,
    gates: jnp.ndarray,
    mel_target: jnp.ndarray,
    gate_target: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    gate_loss = bce_with_logits(gates, gate_target)
    mel_loss = mse(mels, mel_target)
    mel_post_loss = mse(mels_post, mel_target)
    loss = gate_loss + mel_loss + mel_post_loss
    return loss, {
        "gate_loss": gate_loss,
        "mel_loss": mel_loss,
        "mel_post_loss": mel_post_loss,
        "tacotron_loss": loss,
        "loss": loss,
    }


def concordance_correlation_coefficient_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """CCC loss = 1 - CCC (reference: model/loss.py:4-15, dormant but part of
    the capability surface — used by the prosody-predictor training)."""
    pred_mean = jnp.mean(pred)
    tgt_mean = jnp.mean(target)
    covariance = jnp.mean((pred - pred_mean) * (target - tgt_mean))
    pred_var = jnp.var(pred)
    tgt_var = jnp.var(target)
    ccc = 2.0 * covariance / (pred_var + tgt_var + (pred_mean - tgt_mean) ** 2 + 1e-12)
    return 1.0 - ccc


def ccc_per_feature(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-column concordance correlation over a (B, F) batch — the
    torchmetrics.functional.concordance_corrcoef the reference predictor
    training logs per feature (model/prosodic_features/prosody_detector.py:
    233-235, 249-253). torchmetrics' running sums cancel the bias factors,
    leaving CCC = 2*cov_b / (var_b(x) + var_b(y) + (mean diff)^2) with
    biased (population) moments — reproduced here."""
    pm = jnp.mean(pred, axis=0)
    tm = jnp.mean(target, axis=0)
    cov = jnp.mean((pred - pm) * (target - tm), axis=0)
    pv = jnp.var(pred, axis=0)
    tv = jnp.var(target, axis=0)
    return 2.0 * cov / (pv + tv + (pm - tm) ** 2 + 1e-12)


def prosody_style_loss(
    predictor,
    predictor_params,
    mels_post: jnp.ndarray,
    mel_target: jnp.ndarray,
    mel_lengths: jnp.ndarray,
    kind: str = "mse",
) -> jnp.ndarray:
    """Frozen-predictor perceptual ("style") loss over the three activation
    levels, per the reference's commented wiring (model/tts_model.py:178-225):
    run the frozen prosody predictor over the ground-truth mel (targets) and
    over mel_post (predictions); style = MSE(low) + MSE(mid) + MSE(high).
    ``kind="ccc"`` substitutes the CCC loss per level — the semantics of the
    reference's unread ``extensions.prosody_model.loss`` key
    (run/train.py:207, commented)."""
    _, low, mid, high = predictor.apply(predictor_params, mel_target, mel_lengths)
    low = jax.lax.stop_gradient(low)
    mid = jax.lax.stop_gradient(mid)
    high = jax.lax.stop_gradient(high)
    _, low_p, mid_p, high_p = predictor.apply(predictor_params, mels_post, mel_lengths)
    if kind == "ccc":
        term = concordance_correlation_coefficient_loss
    else:
        term = mse
    return term(low_p, low) + term(mid_p, mid) + term(high_p, high)
