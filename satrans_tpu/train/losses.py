"""Training losses.

The reference's effective objective (basemodel.py:313-327):

    total = BCE(pred, y, reduction='sum') + l2_reg + aux_loss

Sum-reduction (NOT mean) with lr 0.005/0.001 is part of the published
hyperparameters (SURVEY.md section 2 usage notes) - easy to get silently
wrong, so it is explicit here.

The MTL engine (mtl_basemodel.py:262-271) instead sums per-task BCE terms,
each masked to the samples whose domain matches the task.  The reference uses
boolean fancy-indexing (dynamic shapes); we multiply by a 0/1 mask - identical
math, static shapes for XLA.

BCE matches ``torch.nn.functional.binary_cross_entropy`` on probabilities,
including torch's clamp of log terms at -100.
"""

from __future__ import annotations

import jax.numpy as jnp


def bce_elementwise(pred, y):
    """-(y log p + (1-y) log(1-p)) with torch's log-clamp at -100."""
    log_p = jnp.maximum(jnp.log(pred), -100.0)
    log_1p = jnp.maximum(jnp.log1p(-pred), -100.0)
    return -(y * log_p + (1.0 - y) * log_1p)


def bce_sum(pred, y):
    """reduction='sum' (reference basemodel.py:316)."""
    return jnp.sum(bce_elementwise(pred, y))


def mse_sum(pred, y):
    return jnp.sum(jnp.square(pred - y))


def mae_sum(pred, y):
    return jnp.sum(jnp.abs(pred - y))


_SINGLE = {"binary_crossentropy": bce_sum, "mse": mse_sum, "mae": mae_sum}


def get_loss(name):
    if callable(name):
        return name
    try:
        return _SINGLE[name]
    except KeyError:
        raise NotImplementedError(f"loss {name!r}") from None


def masked_multitask_bce_sum(pred, y, domain_ids, offset: int, num_tasks: int):
    """sum_i BCE_sum(pred[:, i][d==i+offset], y[d==i+offset]).

    Static-shape version of mtl_basemodel.py:262-269.
    """
    total = 0.0
    for i in range(num_tasks):
        mask = (domain_ids == (i + offset)).astype(pred.dtype)
        total = total + jnp.sum(mask * bce_elementwise(pred[:, i], y))
    return total
