"""Segment reductions.

The reference depends on the ``torch_scatter`` C++/CUDA extension for
``scatter_mean`` (star_trans.py:14, 850).  On TPU these are plain XLA
scatters - ``jax.ops.segment_sum`` plus a count (SURVEY.md section 2.2) -
no custom kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int):
    """Mean of rows per segment; empty segments yield 0 (like scatter_mean)."""
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    count = jax.ops.segment_sum(jnp.ones(data.shape[:1], data.dtype),
                                segment_ids, num_segments=num_segments)
    return total / jnp.maximum(count, 1.0)[:, None]
