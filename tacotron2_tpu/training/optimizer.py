"""Optimizer: torch-Adam-equivalent optax chain.

Reference (model/tts_model.py:78-91, run/train.py:235-243):
Adam(lr, weight_decay) — torch's COUPLED weight decay (added to the grad
before the Adam moments, unlike AdamW) — optional MultiStepLR(gamma=0.1)
stepped per optimizer step, and Lightning's gradient_clip_val=1.0 (global
norm, clipped BEFORE weight decay enters via the optimizer).
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def multistep_lr_schedule(lr: float, milestones: Sequence[int], gamma: float = 0.1):
    """torch MultiStepLR: lr * gamma^(#milestones passed)."""
    if not milestones:
        return lambda step: lr
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(init_value=lr, boundaries_and_scales=boundaries)


def make_optimizer(
    lr: float,
    weight_decay: float,
    scheduler_milestones: Optional[Sequence[int]] = None,
    grad_clip: float = 1.0,
    gamma: float = 0.1,
    freeze_mask=None,
):
    """Build the optax chain. ``freeze_mask``: pytree of bools (True = train)
    for the finetune protocol that freezes encoder + speaker embedding
    (reference: run/train.py:229-233)."""
    schedule = multistep_lr_schedule(lr, scheduler_milestones or [], gamma)
    chain = [
        optax.clip_by_global_norm(grad_clip),
        optax.add_decayed_weights(weight_decay),  # coupled, torch-Adam style
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),  # includes the sign flip
    ]
    tx = optax.chain(*chain)
    if freeze_mask is not None:
        import jax

        labels = jax.tree.map(lambda trainable: "train" if trainable else "frozen", freeze_mask)
        tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)
    return tx, schedule
