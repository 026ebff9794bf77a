"""Evaluation metrics.

* :func:`auc` - exact ROC-AUC via tie-averaged rank statistics.  Pure numpy,
  matches ``sklearn.metrics.roc_auc_score`` to float64 precision but runs in
  O(n log n) without sklearn's curve machinery (the reference calls sklearn
  per train batch AND on tens of millions of test rows, main.py:356-374).
* :func:`auc_jax` - the same rank-sum AUC on device, jittable: usable inside
  a pjit'ed eval loop so scores never funnel through the host.
* :func:`log_loss` - sklearn-compatible mean BCE (eps clip, the reference's
  train-metric 'binary_crossentropy', basemodel.py:601-605).
* :func:`per_domain_auc` - the paper's headline report: AUC per scenario
  value min..max of the test split (reference main.py:368-374).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _tie_average_ranks(scores: np.ndarray) -> np.ndarray:
    """1-based ranks with ties sharing their average rank."""
    order = np.argsort(scores, kind="mergesort")
    s = scores[order]
    n = len(s)
    ranks = np.empty(n, dtype=np.float64)
    boundary = np.concatenate(([True], s[1:] != s[:-1]))
    group_ids = np.cumsum(boundary) - 1
    n_groups = group_ids[-1] + 1 if n else 0
    counts = np.bincount(group_ids, minlength=n_groups).astype(np.float64)
    # rank of the last element in each group, then average over the tie run
    last = np.cumsum(counts)
    avg = last - (counts - 1) / 2.0
    ranks[order] = avg[group_ids]
    return ranks


def auc(y_true, y_score) -> float:
    """Mann-Whitney rank AUC with tie correction (== sklearn roc_auc_score)."""
    y = np.asarray(y_true).ravel().astype(np.float64)
    s = np.asarray(y_score).ravel().astype(np.float64)
    n_pos = float(y.sum())
    n_neg = float(len(y) - n_pos)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("AUC undefined with a single class")
    ranks = _tie_average_ranks(s)
    return float((ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg))


def auc_jax(y_true, y_score, weight=None):
    """On-device rank AUC (tie-averaged) - jittable.

    ``weight`` (0/1) restricts to a subset with static shapes, enabling
    per-domain AUC without host round-trips.
    """
    y = y_true.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    s = y_score
    w = jnp.ones_like(y) if weight is None else weight.astype(y.dtype)
    # Tie-averaged ranks among the weighted subset: rank(x) = (#less) +
    # (#equal + 1) / 2, computed via sorting tricks is O(n^2) naively; use
    # argsort-based ranks over all entries but count only weighted ones.
    order = jnp.argsort(s)
    s_sorted = s[order]
    w_sorted = w[order]
    # cumulative weighted count strictly less / less-or-equal
    cw = jnp.cumsum(w_sorted)
    # boundaries of tie groups in sorted order
    same_as_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), s_sorted[1:] == s_sorted[:-1]])
    group = jnp.cumsum(~same_as_prev) - 1
    # per-group totals
    n_groups = s.shape[0]
    grp_w = jax.ops.segment_sum(w_sorted, group, num_segments=n_groups)
    grp_cw_end = jax.ops.segment_max(cw, group, num_segments=n_groups)
    less = grp_cw_end[group] - grp_w[group]          # weighted # strictly less
    rank_sorted = less + (grp_w[group] + 1.0) / 2.0  # tie-averaged weighted rank
    ranks = jnp.zeros_like(rank_sorted).at[order].set(rank_sorted)
    n_pos = jnp.sum(w * y)
    n_tot = jnp.sum(w)
    n_neg = n_tot - n_pos
    pos_rank_sum = jnp.sum(w * y * ranks)
    return (pos_rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def log_loss(y_true, y_pred, eps: float = 1e-15) -> float:
    """Mean BCE with sklearn's probability clipping."""
    y = np.asarray(y_true).ravel().astype(np.float64)
    p = np.clip(np.asarray(y_pred).ravel().astype(np.float64), eps, 1 - eps)
    return float(-np.mean(y * np.log(p) + (1 - y) * np.log(1 - p)))


def accuracy(y_true, y_pred) -> float:
    y = np.asarray(y_true).ravel()
    return float(np.mean((np.asarray(y_pred).ravel() > 0.5) == (y > 0.5)))


def mse(y_true, y_pred) -> float:
    return float(np.mean(np.square(np.asarray(y_true).ravel()
                                   - np.asarray(y_pred).ravel())))


def per_domain_auc(y_true, y_score, domain_values) -> dict[int, float]:
    """AUC per scenario value, iterating min..max like reference main.py:368."""
    d = np.asarray(domain_values).ravel()
    out = {}
    for v in range(int(d.min()), int(d.max()) + 1):
        m = d == v
        out[v] = auc(np.asarray(y_true).ravel()[m], np.asarray(y_score).ravel()[m])
    return out


METRICS = {
    "auc": auc,
    "binary_crossentropy": log_loss,
    "logloss": log_loss,
    "mse": mse,
    "accuracy": accuracy,
    "acc": accuracy,
}


def get_metric(name):
    if callable(name):
        return name
    try:
        return METRICS[name]
    except KeyError:
        raise NotImplementedError(f"metric {name!r}") from None
