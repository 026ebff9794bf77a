"""Multi-host initialization + distributed evaluation.

The reference's only scaling mechanism is an unused single-process
``DataParallel`` branch (basemodel.py:271-274).  Here:

* :func:`initialize` wraps ``jax.distributed.initialize`` for multi-host
  runs (controller-less; every host calls it, then builds the same global
  mesh over ``jax.devices()``).
* :func:`host_shard_info` gives (host_id, num_hosts) for the input pipeline
  (``data.loader.ShardedBatchIterator``).
* :func:`distributed_auc` computes exact rank-sum AUC over a globally
  sharded prediction array without funneling scores through one host
  (SURVEY.md section 7 "AUC at scale").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..train.metrics import auc_jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Multi-host bring-up; no-op on a single process with no coordinator."""
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_shard_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def distributed_auc(y_true, y_score, weight=None):
    """Exact global AUC on sharded arrays.

    Call under jit with globally-sharded inputs; the argsort/segment ops
    inside ``auc_jax`` become XLA's distributed sort + collectives, so no
    host ever materializes the full score vector.
    """
    return jax.jit(auc_jax)(y_true, y_score, weight)
