"""Typed feature specifications and batch layout.

TPU-native replacement for the reference's deepctr-torch feature columns
(`SparseFeat` / `DenseFeat` / `VarLenSparseFeat`, used in
reference main.py:182-191) and `build_input_features` index map
(reference models/basemodel.py:165-166).

Design differences from the reference (deliberate, TPU-first):

* The reference packs every feature into ONE float32 ``[B, W]`` tensor and
  re-slices + casts to ``long`` per field on every forward pass
  (basemodel.py:461-487).  We instead keep a typed batch::

      {"sparse": int32 [B, S],          # one column per sparse field
       "dense":  float32 [B, D],        # one column per dense dim
       "varlen": int32 [B, V, maxlen],  # padded id sequences (0 = pad)
       ...}

  so there are no float->int casts on device and XLA sees static integer
  gather indices.

* Every sparse/varlen field's embedding rows live in one fused bank
  (see :mod:`satrans_tpu.embeddings`); the :class:`FeatureLayout` computes the
  per-field row offsets into that bank so a whole-batch lookup is a single
  gather of ``[B, S]`` indices.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class SparseFeature:
    """A categorical field embedded into ``dim`` floats.

    Mirrors deepctr's ``SparseFeat(name, vocabulary_size, embedding_dim)``
    (reference main.py:182).  ``vocab`` must already include padding/offset
    rows (the reference uses ``data_max[feat] + 2``).
    """

    name: str
    vocab: int
    dim: int = 32
    # Fields sharing an embedding table use the same ``embedding_name``.
    embedding_name: str | None = None

    @property
    def table_name(self) -> str:
        return self.embedding_name or self.name


@dataclasses.dataclass(frozen=True)
class DenseFeature:
    """A real-valued field of ``dimension`` floats (reference main.py:183)."""

    name: str
    dimension: int = 1


@dataclasses.dataclass(frozen=True)
class VarLenSparseFeature:
    """A padded variable-length id-list field with max/mean/sum pooling.

    Mirrors deepctr's ``VarLenSparseFeat(SparseFeat(...), maxlen, combiner)``
    (reference main.py:185-188).  Id ``0`` is the pad value; the reference's
    AliCCP history features are 0-padded (aliccp_dataset_processing.py:226).
    """

    name: str
    vocab: int
    dim: int
    maxlen: int
    combiner: str = "max"  # 'max' | 'mean' | 'sum'
    embedding_name: str | None = None

    @property
    def table_name(self) -> str:
        return self.embedding_name or self.name


Feature = SparseFeature | DenseFeature | VarLenSparseFeature


def sparse_features(columns: Sequence[Feature]) -> list[SparseFeature]:
    return [c for c in columns if isinstance(c, SparseFeature)]


def dense_features(columns: Sequence[Feature]) -> list[DenseFeature]:
    return [c for c in columns if isinstance(c, DenseFeature)]


def varlen_features(columns: Sequence[Feature]) -> list[VarLenSparseFeature]:
    return [c for c in columns if isinstance(c, VarLenSparseFeature)]


class FeatureLayout:
    """Column bookkeeping for a fixed feature-column list.

    Computes, once, everything the models need to turn a feature dict into
    typed device arrays and a fused embedding lookup:

    * ``sparse_names`` / ``dense_names`` / ``varlen_names`` - stable field
      order (the order the columns were declared in, like the reference's
      ``build_input_features`` OrderedDict, basemodel.py:165).
    * ``table_offsets`` - per distinct embedding table, its first row in the
      fused bank; ``field_offsets`` maps each sparse/varlen field to its
      table's offset so ``bank[ids + field_offsets]`` is the lookup.
    * ``total_rows`` - number of rows in the fused bank.
    """

    def __init__(self, columns: Sequence[Feature]):
        self.columns = list(columns)
        self.sparse = sparse_features(columns)
        self.dense = dense_features(columns)
        self.varlen = varlen_features(columns)

        self.sparse_names = [c.name for c in self.sparse]
        self.dense_names = [c.name for c in self.dense]
        self.varlen_names = [c.name for c in self.varlen]

        dims = {c.dim for c in self.sparse} | {c.dim for c in self.varlen}
        if len(dims) > 1:
            raise ValueError(
                f"All sparse embedding dims must match for the fused bank, got {dims}"
            )
        self.embedding_dim = dims.pop() if dims else 0
        self.dense_dim = sum(c.dimension for c in self.dense)

        # Fused-bank row layout: one contiguous row range per distinct table.
        self.table_offsets: dict[str, int] = {}
        self.table_vocabs: dict[str, int] = {}
        offset = 0
        for c in self.sparse + self.varlen:
            t = c.table_name
            if t not in self.table_offsets:
                self.table_offsets[t] = offset
                self.table_vocabs[t] = c.vocab
                offset += c.vocab
            elif self.table_vocabs[t] != c.vocab:
                raise ValueError(f"Conflicting vocab for shared table {t!r}")
        self.total_rows = offset

        self.sparse_field_offsets = np.asarray(
            [self.table_offsets[c.table_name] for c in self.sparse], dtype=np.int32
        )
        self.varlen_field_offsets = np.asarray(
            [self.table_offsets[c.table_name] for c in self.varlen], dtype=np.int32
        )

        self._sparse_index = {n: i for i, n in enumerate(self.sparse_names)}
        self._varlen_index = {n: i for i, n in enumerate(self.varlen_names)}

        # Dense columns are concatenated in declaration order.
        self._dense_slices: dict[str, slice] = {}
        d = 0
        for c in self.dense:
            self._dense_slices[c.name] = slice(d, d + c.dimension)
            d += c.dimension

    # Number of "fields" entering field-wise attention: each sparse and each
    # (pooled) varlen feature contributes one field (reference satrans.py:130).
    @property
    def num_fields(self) -> int:
        return len(self.sparse) + len(self.varlen)

    def sparse_index(self, name: str) -> int:
        return self._sparse_index[name]

    def small_split(self, threshold: int = 256):
        """Partition tables by vocab for the small-table matmul storage
        (embeddings.bank_init): tables with vocab <= threshold (and no varlen
        user) live in a compact side bank whose lookups are one-hot matmuls,
        so their gradients are dense GEMMs instead of scatter rows.

        Returns a dict with:
          small_idx / large_idx       - sparse field positions per class
          small_offsets               - per small field, first row in the
                                        side bank
          small_rows                  - side-bank row count
          large_offsets               - per large sparse field, first row in
                                        the large-only bank
          varlen_offsets              - varlen field offsets in the large bank
          large_rows                  - large-bank row count
        Cached per (layout, threshold); layouts are immutable.
        """
        cache = getattr(self, "_small_split_cache", None)
        if cache is None:
            cache = self._small_split_cache = {}
        if threshold in cache:
            return cache[threshold]
        varlen_tables = {c.table_name for c in self.varlen}
        small_tables: dict[str, int] = {}
        large_tables: dict[str, int] = {}
        small_rows = 0
        large_rows = 0
        for c in self.sparse + self.varlen:
            t = c.table_name
            if t in small_tables or t in large_tables:
                continue
            if c.vocab <= threshold and t not in varlen_tables:
                small_tables[t] = small_rows
                small_rows += c.vocab
            else:
                large_tables[t] = large_rows
                large_rows += c.vocab
        small_idx = [i for i, c in enumerate(self.sparse)
                     if c.table_name in small_tables]
        large_idx = [i for i, c in enumerate(self.sparse)
                     if c.table_name in large_tables]
        out = {
            "small_idx": small_idx,
            "large_idx": large_idx,
            "small_offsets": np.asarray(
                [small_tables[self.sparse[i].table_name] for i in small_idx],
                np.int32),
            "small_rows": small_rows,
            "large_offsets": np.asarray(
                [large_tables[self.sparse[i].table_name] for i in large_idx],
                np.int32),
            "varlen_offsets": np.asarray(
                [large_tables[c.table_name] for c in self.varlen], np.int32),
            "large_rows": large_rows,
        }
        cache[threshold] = out
        return out

    def input_dim(self, include_sparse: bool = True, include_dense: bool = True,
                  feature_group: bool = False) -> int:
        """Flattened DNN input width (reference basemodel.py:489-507)."""
        dim = 0
        if include_sparse:
            dim += self.num_fields if feature_group else self.num_fields * self.embedding_dim
        if include_dense:
            dim += self.dense_dim
        return dim

    def validate_ids(self, data: dict[str, np.ndarray]) -> None:
        """Raise on out-of-vocab ids (host-side, one pass per column).

        On device, bad ids fail SILENTLY and inconsistently: large-bank
        gathers clamp to the last row, side-bank one-hot reads return zeros
        (torch would raise).  Enabled via ``SATRANS_VALIDATE=1`` or an
        explicit call before training/serving on untrusted inputs.
        """
        for c in list(self.sparse) + list(self.varlen):
            col = np.asarray(data[c.name])
            lo, hi = int(col.min()), int(col.max())
            if lo < 0 or hi >= c.vocab:
                raise ValueError(
                    f"feature {c.name!r}: ids in [{lo}, {hi}] exceed vocab "
                    f"{c.vocab} - fix the preprocessing id remap "
                    "(reference aliccp_dataset_processing.py:161-169)")

    def batch_from_dict(self, data: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        """Assemble a typed batch from a {name: column array} dict.

        Replaces the reference's dict -> ordered list -> ``np.concatenate``
        float tensor path (meta_basemodel.py:221-264) with typed arrays.
        Set ``SATRANS_VALIDATE=1`` to id-range-check every column first
        (see :meth:`validate_ids`).
        """
        import os
        if os.environ.get("SATRANS_VALIDATE", "0") == "1":
            self.validate_ids(data)
        n = len(next(iter(data.values())))
        out: dict[str, np.ndarray] = {}
        if self.sparse:
            out["sparse"] = np.stack(
                [np.asarray(data[name]).reshape(n) for name in self.sparse_names],
                axis=1,
            ).astype(np.int32)
        if self.dense:
            out["dense"] = np.concatenate(
                [np.asarray(data[name], dtype=np.float32).reshape(n, -1)
                 for name in self.dense_names],
                axis=1,
            )
        if self.varlen:
            out["varlen"] = np.stack(
                [np.asarray(data[name]).reshape(n, -1) for name in self.varlen_names],
                axis=1,
            ).astype(np.int32)
        return out
