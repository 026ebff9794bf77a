"""Synthetic multi-domain CTR data for tests and benchmarks.

Generates a learnable click signal with domain-dependent feature-interaction
structure, so scenario-adaptive models (SATrans/STAR) have something real to
exploit over domain-agnostic baselines.
"""

from __future__ import annotations

import numpy as np

from ..features import DenseFeature, SparseFeature, VarLenSparseFeature


def synthetic_columns(num_sparse: int = 6, vocab: int = 100, dim: int = 8,
                      num_domains: int = 3, num_dense: int = 0,
                      num_varlen: int = 0, maxlen: int = 3,
                      domain_col: str = "domain"):
    cols = [SparseFeature(f"f{i}", vocab, dim) for i in range(num_sparse)]
    cols.append(SparseFeature(domain_col, num_domains + 2, dim))
    cols += [DenseFeature(f"d{i}", 1) for i in range(num_dense)]
    cols += [VarLenSparseFeature(f"v{i}", vocab, dim, maxlen, "max")
             for i in range(num_varlen)]
    return cols


def synthetic_data(n: int = 4096, num_sparse: int = 6, vocab: int = 100,
                   num_domains: int = 3, num_dense: int = 0,
                   num_varlen: int = 0, maxlen: int = 3, seed: int = 0,
                   domain_col: str = "domain"):
    """Returns ({name: column}, labels).  Domain ids are 1-based like AliCCP
    column 301 after the +1 shift (reference main.py:112-114)."""
    rng = np.random.default_rng(seed)
    x = {f"f{i}": rng.integers(1, vocab, size=n).astype(np.int64)
         for i in range(num_sparse)}
    dom = rng.integers(1, num_domains + 1, size=n).astype(np.int64)
    x[domain_col] = dom
    for i in range(num_dense):
        x[f"d{i}"] = rng.random(n).astype(np.float32)
    for i in range(num_varlen):
        v = rng.integers(0, vocab, size=(n, maxlen))
        x[f"v{i}"] = v.astype(np.int64)

    # Domain-conditioned logit: each domain weighs a different pair
    # interaction, plus shared per-feature effects.
    w = rng.normal(0, 1.0, size=(num_sparse, vocab))
    logit = sum(w[i][x[f"f{i}"] % vocab] for i in range(num_sparse)) * 0.5
    pair_w = rng.normal(0, 1.0, size=(num_domains + 1, vocab))
    inter = pair_w[dom % (num_domains + 1)]
    logit = logit + inter[np.arange(n), (x["f0"] * x["f1"]) % vocab]
    for i in range(num_dense):
        logit = logit + x[f"d{i}"]
    p = 1.0 / (1.0 + np.exp(-(logit - logit.mean()) / max(logit.std(), 1e-6)))
    y = (rng.random(n) < p).astype(np.float32)
    return x, y
