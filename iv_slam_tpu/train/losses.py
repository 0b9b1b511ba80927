"""Training losses for the introspection FCN.

MaskedMSELoss (lib/utils/utils.py:10-18): sum((pred - target)^2 * mask) /
sum(mask); deep-supervision composition loss = main + 0.4 * aux
(networks/models/models.py:47-54, TRAIN.deep_sup_scale).
"""

from __future__ import annotations

import jax.numpy as jnp

DEEP_SUP_SCALE = 0.4


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray):
    """pred/target/mask: (..., H, W, 1) or broadcastable."""
    se = (pred - target) ** 2 * mask
    return jnp.sum(se) / jnp.maximum(jnp.sum(mask), 1.0)


def deep_sup_loss(
    pred: jnp.ndarray,
    pred_deepsup: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    deep_sup_scale: float = DEEP_SUP_SCALE,
):
    main = masked_mse(pred, target, mask)
    aux = masked_mse(pred_deepsup, target, mask)
    return main + deep_sup_scale * aux, main
