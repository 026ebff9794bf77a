"""Fused embedding bank: one gather for all sparse fields.

The reference keeps a ``nn.ModuleDict`` of per-field ``nn.Embedding`` tables
and performs one gather per field per step (reference
models/basemodel.py:95-121 ``create_embedding_matrix`` and :461-487
``input_from_feature_columns``: 19 separate lookups for AliCCP).

TPU-first redesign: all tables are concatenated row-wise into ONE
``[total_rows, dim]`` bank.  A whole-batch lookup is then a single gather

    bank[ids + field_offsets]        # ids: int32 [B, S]

which XLA lowers to one fused dynamic-gather - minimal kernel launches, one
HBM stream, and the bank is a single tensor that can be row-sharded across a
device mesh (``PartitionSpec('data', None)``) at pod scale.

The same layout serves the first-order "Linear" model (1-dim embeddings
summed, reference basemodel.py:34-92) with a ``[total_rows, 1]`` bank.

L2 regularization semantics: the reference adds ``l2 * sum(W^2)`` over the
FULL tables every step (basemodel.py:180, 519-535), which makes every step's
gradient dense in the embedding tables.  ``l2_loss`` reproduces that exactly.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from .features import FeatureLayout
from .nn import initializers as init


def pack_factor(d: int) -> int:
    """Logical rows per physical 128-lane row.

    TPU HBM layouts pad the minor dimension to 128 lanes, so a ``[R, 32]``
    bank physically occupies 4x its logical bytes and every gather/Adam pass
    pays 4x bandwidth.  Packing ``pack_factor`` logical rows into one
    128-wide physical row (a pure reshape - values unchanged) measured 2.3x
    faster gathers and ~4x less optimizer traffic on v5e (see gsbench in the
    bench history).
    """
    return 128 // d if d in (1, 2, 4, 8, 16, 32, 64, 128) else 1


# Tables whose vocab is at most this (and that no varlen field uses) live in
# a compact side bank read via one-hot matmuls: forward AND backward are MXU
# GEMMs, and their rows leave the big scatter-add entirely.  On AliCCP 9 of
# 19 fields (134 rows, incl. the scenario column) are the dominant duplicate
# mass of the 155k-row embedding-grad scatter.
SMALL_TABLE_THRESHOLD = 256


def bank_init(key, layout: FeatureLayout, *, dim: int | None = None,
              init_std: float | None = 1e-4):
    """Create the fused bank: a packed ``[R/rp, rp*d]`` large bank plus a
    compact ``[Rs, d]`` side bank for small tables (see
    SMALL_TABLE_THRESHOLD).

    ``init_std=None`` maps to the reference's ``noembinit`` flag
    (basemodel.py:114-116): keep torch's ``nn.Embedding`` default N(0, 1).
    """
    d = layout.embedding_dim if dim is None else dim
    split = layout.small_split(SMALL_TABLE_THRESHOLD)
    rp = pack_factor(d)
    rows = -(-max(split["large_rows"], 1) // rp) * rp

    def draw(k, shape):
        if init_std is None:
            return init.torch_embedding_default(k, shape)
        return init.normal(k, shape, init_std)

    k1, k2 = jax.random.split(key)
    bank = draw(k1, (rows, d))
    if rows > split["large_rows"]:
        # zero pad rows so they contribute nothing to L2 / updates
        bank = bank.at[split["large_rows"]:].set(0.0)
    p = {"bank": bank.reshape(rows // rp, rp * d)}
    if split["small_rows"]:
        p["small"] = draw(k2, (split["small_rows"], d))
    return p


def bank_logical(params, d: int):
    """View the packed bank as logical ``[R, d]`` rows (a reshape)."""
    return params["bank"].reshape(-1, d)


def combine_duplicate_rows(ids, g):
    """Sort ids and segment-sum duplicate rows' gradients.

    Returns ``(row_ids, summed, valid)``: ``row_ids[i]`` is the i-th unique
    physical row in sorted order where ``valid[i]``; ``summed[i]`` is the sum
    of ``g`` rows whose id equals ``row_ids[i]``.  Entries past the unique
    count carry ``valid=False`` (their ids/values are meaningless).

    This is both the combine stage of the dense embedding-grad scatter (see
    :func:`_gather_packed_bwd`) and the sparse-row collection the Trainer's
    fused/lazy bank optimizers consume (train/bank_optimizer.py).
    """
    n = ids.shape[0]
    if n == 0:  # every field lives in the side bank - nothing to combine
        return ids, g, jnp.zeros((0,), jnp.bool_)
    order = jnp.argsort(ids)
    si = ids[order]
    sg = jnp.take(g, order, axis=0)
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), si[1:] != si[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    summed = jax.ops.segment_sum(sg, seg, num_segments=n)
    rep = jax.ops.segment_max(si, seg, num_segments=n)
    count = seg[-1] + 1
    valid = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0] < count
    return rep, summed, valid


def _eqgemm_impl() -> str:
    """Which equality-GEMM computes the per-position duplicate sums.

    ``xla`` (default): the einsum - exact f32 on CPU, one bf16 MXU pass on
    TPU (default f32 dot precision).  ``pallas``: ops/pallas/eqgemm.py
    builds the equality tiles in VMEM (same bf16 error class, NO [F, B, B]
    HBM tensor - 2.7 GB f32 at headline shapes).  Standalone the kernel
    wins (2.58 vs 2.97 ms, bench_results/eqgemm_probe_v5e_r4.json) but the
    end-to-end lazy step showed NO win in a 2x2 A/B on v5e (xla 315.7k /
    316.5k ex/s vs pallas 314.6k / 315.2k - XLA overlaps the einsum with
    the surrounding update chain, the opaque kernel serializes), so per
    the measured-win rule the default stays ``xla``; the kernel remains
    the memory-headroom option for batch shapes where the einsum's HBM
    tensor would not fit.  ``interpret``: the kernel in interpret mode
    (CPU tests).  Env ``SATRANS_EQGEMM`` overrides.

    Also probed and rejected (round 4): materializing the equality tensor
    in bf16 and feeding an explicit-bf16 einsum (standalone 2.44 vs
    2.97 ms, eqgemm_probe_v5e_r4.json) - e2e A/B on v5e showed no win
    (bf16 316.8k vs f32 317.2k ex/s), so the f32-materialized einsum
    stays: same speed, exact-f32 combine numerics.
    """
    mode = os.environ.get("SATRANS_EQGEMM", "auto")
    if mode in ("xla", "pallas", "interpret"):
        return mode
    return "xla"


def eqgemm_combine(ids_fb, g_fb, shared_rows=(), impl: str | None = None):
    """Duplicate-summed gradients per POSITION via per-field equality GEMMs.

    ``ids_fb`` int32 ``[F, B]`` physical row ids (each field's ids are drawn
    from its own bank row range), ``g_fb`` ``[F, B, W]`` row cotangents.
    Returns ``s_fb [F, B, W]`` where ``s[f, i]`` is the TOTAL gradient of row
    ``ids_fb[f, i]`` - i.e. what a segment-sum over duplicates yields, but
    broadcast back to every duplicate position.

    Why a GEMM: the sort-based combine costs ~7 ms on v5e at N=82k (argsort
    + payload permute + segment_sum are all ~36-60 ns/index ops), while one
    ``[F,B,B] @ [F,B,W]`` equality matmul rides the MXU at ~2.7 ms
    (bench/scatter_primitives.py).  Within a field the equality matrix
    catches every duplicate; across fields, rows can only be shared where a
    128-lane physical row straddles a field boundary (``pack_factor``
    logical rows per physical row) - those few static ``shared_rows`` are
    OVERWRITTEN with one common total per row.

    Bit-identity guarantee (the row-DMA scatter's precondition,
    ops/pallas/scatter.py): every position carrying the same physical row id
    receives the byte-identical total.  Within a field the equality GEMM
    reduces every duplicate position in the same order; for a shared row the
    per-field masked sums and their cross-field sum are computed ONCE and
    broadcast to all matching positions, so positions seen from different
    fields agree exactly (not just up to f32 summation order).

    ``shared_rows``: static list of ``(phys_row, [field_idx, ...])``.

    ``impl``: ``None`` resolves via :func:`_eqgemm_impl` (env
    ``SATRANS_EQGEMM``; default ``xla`` - the measured e2e choice, see
    that docstring).  ``pallas`` opts into the kernel
    (ops/pallas/eqgemm.py), which computes the same per-field sums
    without materializing the ``[F, B, B]`` equality tensor in HBM; the
    shared-row overwrite below runs in exact f32 either way.  Mesh
    callers pass ``impl='xla'`` explicitly - the opaque kernel cannot be
    SPMD-partitioned.
    """
    impl = impl or _eqgemm_impl()
    if impl in ("pallas", "interpret"):
        from .ops.pallas import eqgemm as _eq
        s = _eq.eqgemm_positions(ids_fb, g_fb,
                                 interpret=impl == "interpret")
    else:
        e = (ids_fb[:, :, None] == ids_fb[:, None, :])
        s = jnp.einsum("fij,fjw->fiw", e.astype(g_fb.dtype), g_fb)
    for row, fields in shared_rows:
        fi = jnp.asarray(list(fields))
        mask = ids_fb[fi] == row                       # [k, B]
        t = jnp.sum(jnp.where(mask[..., None], g_fb[fi], 0.0),
                    axis=1)                            # [k, W] per-field sum
        total = jnp.sum(t, axis=0)                     # [W] one fixed order
        s = s.at[fi].set(jnp.where(mask[..., None],
                                   total[None, None, :], s[fi]))
    return s


# Forward bank-gather implementation.  "xla" is the safe default (SPMD-
# partitionable); the row-DMA kernel (ops/pallas/gather.py) engages only
# when the execution-context owner opts in: the Trainer on a SINGLE device
# (a pallas_call cannot be partitioned by pjit over a sharded batch) and
# the serving Predictor.  A process mixing meshed and unmeshed trainers
# would race this flag - last set wins; both settings are correct, only
# speed differs.
_FWD_GATHER = {"impl": "xla"}


def set_forward_gather(mode: str = "auto") -> str:
    """Select how ``_gather_packed`` reads bank rows.  ``auto`` resolves
    via env ``SATRANS_GATHER`` and defaults to XLA - the row-DMA kernel
    measured NO end-to-end win on the forward gather (XLA fuses the
    single-array take into its consumers; bank_modes A/B,
    docs/PERFORMANCE.md r3).  ``xla``/``pallas``/``interpret`` force.
    Returns the resolved impl."""
    if mode == "auto":
        mode = os.environ.get("SATRANS_GATHER", "auto")
        if mode == "auto":
            mode = "xla"
    if mode not in ("xla", "pallas", "interpret"):
        raise ValueError(f"unknown forward gather impl {mode!r}")
    _FWD_GATHER["impl"] = mode
    return mode


def _do_gather(bank, phys_ids):
    """``bank[phys_ids]`` through the selected impl (clip-OOB semantics
    either way).  Small gathers keep XLA - the kernel's dispatch + id pad
    only amortizes over thousands of rows."""
    impl = _FWD_GATHER["impl"]
    n = int(np.prod(phys_ids.shape)) if phys_ids.shape else 1
    if impl in ("pallas", "interpret") \
            and n >= (4096 if impl == "pallas" else 1):
        from .ops.pallas import gather as pg
        ids = jnp.clip(phys_ids.reshape(n), 0, bank.shape[0] - 1)
        rows = pg.gather_rows((bank,), ids,
                              interpret=impl == "interpret")[0]
        return rows.reshape(*phys_ids.shape, bank.shape[1])
    return bank[phys_ids]


@jax.custom_vjp
def _gather_packed(bank, phys_ids):
    return _do_gather(bank, phys_ids)


def _gather_packed_fwd(bank, phys_ids):
    return _do_gather(bank, phys_ids), (bank.shape, phys_ids)


def _gather_packed_bwd(res, g):
    """Combine-then-scatter embedding gradient.

    XLA's generic scatter-add over 155k duplicate-laden indices measured
    16.5 ms on v5e; sorting the ids, segment-summing duplicate rows and
    issuing one sorted+unique scatter-add measured 13 ms - and tells the
    compiler the fast story (indices_are_sorted + unique_indices).
    """
    bank_shape, phys_ids = res
    n = int(np.prod(phys_ids.shape)) if phys_ids.shape else 1
    rep, summed, valid = combine_duplicate_rows(
        phys_ids.reshape(n), g.reshape(n, bank_shape[1]))
    tgt = jnp.where(valid, rep, bank_shape[0])  # out-of-range rows drop
    dbank = jnp.zeros(bank_shape, g.dtype).at[tgt].add(
        summed, indices_are_sorted=True, unique_indices=True, mode="drop")
    return dbank, np.zeros(phys_ids.shape, jax.dtypes.float0)


_gather_packed.defvjp(_gather_packed_fwd, _gather_packed_bwd)


class BankIdCollector:
    """Trace-time stand-in for the packed bank that records the physical row
    ids a lookup would gather (and returns zeros for the values).

    Used by :func:`bank_gather_plan` so the Trainer's sparse bank-update modes
    (train/bank_optimizer.py) learn the exact gather list by running the SAME
    lookup code the model runs - nothing to keep in sync.  The zero values it
    returns never reach a kept output, so XLA dead-code-eliminates the fake
    compute.
    """

    def __init__(self, shape, dtype):
        self.shape = tuple(shape)
        self.dtype = dtype
        self.ids: list = []


class BankRowFeed:
    """Stand-in for the packed bank holding pre-gathered physical rows.

    The Trainer's sparse bank-update modes gather every row the step needs
    up front (one fused gather) and differentiate the loss with respect to
    those rows instead of the full bank - the bank gradient then stays a
    compact ``[N, row_width]`` tensor and never materializes densely.
    ``lookup_rows`` consumes slices of ``rows`` in call order, which matches
    the plan because both are produced by the same lookup code.
    """

    def __init__(self, rows, shape):
        self.rows = rows
        self.shape = tuple(shape)
        self.dtype = rows.dtype
        self._pos = 0

    def take(self, n: int):
        if self._pos + n > self.rows.shape[0]:
            raise ValueError(
                "BankRowFeed exhausted: the model gathers more bank rows than "
                "bank_gather_plan planned. This model is not standard_bank_"
                "access - use bank_update='dense'.")
        out = self.rows[self._pos:self._pos + n]
        self._pos += n
        return out

    def assert_consumed(self):
        if self._pos != self.rows.shape[0]:
            raise ValueError(
                f"BankRowFeed under-consumed ({self._pos} of "
                f"{self.rows.shape[0]} rows): model lookups do not match "
                "bank_gather_plan - use bank_update='dense'.")


def lookup_rows(params, ids, d: int):
    """Gather logical rows ``ids -> [..., d]`` through the packed layout."""
    bank = params["bank"]
    rp = bank.shape[1] // d
    if isinstance(bank, BankIdCollector):
        bank.ids.append((ids if rp == 1 else ids // rp).reshape(-1))
        return jnp.zeros((*ids.shape, d), bank.dtype)
    if isinstance(bank, BankRowFeed):
        n = int(np.prod(ids.shape)) if ids.shape else 1
        phys = bank.take(n).reshape(*ids.shape, bank.shape[1])
    elif rp == 1:
        return _gather_packed(bank, ids)
    else:
        phys = _gather_packed(bank, ids // rp)            # [..., rp*d]
    if rp == 1:
        return phys
    oh = jax.nn.one_hot(ids % rp, rp, dtype=phys.dtype)   # [..., rp]
    return jnp.einsum("...f,...fd->...d", oh,
                      phys.reshape(*phys.shape[:-1], rp, d))


def bank_gather_plan(params, layout: FeatureLayout, batch, dim=None):
    """Physical row ids :func:`embed_fields` will gather from the packed
    bank, flattened in consumption order - int32 ``[N]``.

    Computed by running ``embed_fields`` itself against a
    :class:`BankIdCollector`, so the plan is correct by construction for any
    model whose only packed-bank access is one ``embed_fields`` call
    (``standard_bank_access`` models; see train/bank_optimizer.py).
    """
    col = BankIdCollector(params["bank"].shape, params["bank"].dtype)
    fake = dict(params)
    fake["bank"] = col
    embed_fields(fake, layout, batch, dim)
    if not col.ids:
        return jnp.zeros((0,), jnp.int32)
    return col.ids[0] if len(col.ids) == 1 else jnp.concatenate(col.ids)


def _small_lookup(small_bank, ids):
    """One-hot matmul read of the side bank: ``[..., Rs] @ [Rs, d]``.
    Autodiff gives a dense GEMM gradient - no scatter rows."""
    onehot = jax.nn.one_hot(ids, small_bank.shape[0], dtype=small_bank.dtype)
    return jnp.einsum("...r,rd->...d", onehot, small_bank)


def lookup_sparse(params, layout: FeatureLayout, sparse_ids, dim=None):
    """``[B, S] int32 -> [B, S, dim]``: one fused gather for large-table
    fields + a one-hot matmul for small-table fields."""
    d = dim or layout.embedding_dim
    split = layout.small_split(SMALL_TABLE_THRESHOLD)
    small_idx, large_idx = split["small_idx"], split["large_idx"]
    if not small_idx:
        offsets = jnp.asarray(split["large_offsets"])
        return lookup_rows(params, sparse_ids + offsets[None, :], d)
    parts = []
    if large_idx:
        ids = sparse_ids[:, jnp.asarray(large_idx)] \
            + jnp.asarray(split["large_offsets"])[None, :]
        parts.append(lookup_rows(params, ids, d))
    sids = sparse_ids[:, jnp.asarray(small_idx)] \
        + jnp.asarray(split["small_offsets"])[None, :]
    parts.append(_small_lookup(params["small"], sids))
    emb = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    order = list(large_idx) + list(small_idx)
    inv = np.argsort(order)
    if list(inv) == list(range(len(order))):
        return emb
    return emb[:, jnp.asarray(inv)]


def lookup_field(params, layout: FeatureLayout, name: str, ids, dim=None):
    """Read one sparse field's embeddings for arbitrary ``ids`` (routes to
    the correct bank - used where a model reads a single field directly,
    e.g. AdaSparse's domain embedding, reference adasparse.py:641-642)."""
    d = dim or layout.embedding_dim
    split = layout.small_split(SMALL_TABLE_THRESHOLD)
    i = layout.sparse_index(name)
    if i in split["small_idx"]:
        off = int(split["small_offsets"][split["small_idx"].index(i)])
        return _small_lookup(params["small"], ids + off)
    off = int(split["large_offsets"][split["large_idx"].index(i)])
    return lookup_rows(params, ids + off, d)


def lookup_varlen(params, layout: FeatureLayout, varlen_ids, dim=None):
    """``[B, V, maxlen] -> [B, V, dim]`` with per-field combiner pooling.

    Pad id is 0 (reference aliccp_dataset_processing.py:226); pooling masks
    pads, matching deepctr's ``get_varlen_pooling_list`` semantics
    (reference basemodel.py:479-482).
    """
    split = layout.small_split(SMALL_TABLE_THRESHOLD)
    offsets = jnp.asarray(split["varlen_offsets"])
    emb = lookup_rows(params, varlen_ids + offsets[None, :, None],
                      dim or layout.embedding_dim)  # [B,V,L,dim]
    mask = (varlen_ids > 0)[..., None]  # [B,V,L,1]
    pooled = []
    for i, feat in enumerate(layout.varlen):
        e, m = emb[:, i], mask[:, i]
        if feat.combiner == "max":
            neg = jnp.where(m, e, -jnp.inf)
            p = jnp.max(neg, axis=1)
            p = jnp.where(jnp.isfinite(p), p, 0.0)  # all-pad rows -> 0
        elif feat.combiner == "sum":
            p = jnp.sum(jnp.where(m, e, 0.0), axis=1)
        elif feat.combiner == "mean":
            s = jnp.sum(jnp.where(m, e, 0.0), axis=1)
            cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
            p = s / cnt
        else:
            raise ValueError(f"unknown combiner {feat.combiner!r}")
        pooled.append(p)
    return jnp.stack(pooled, axis=1)


def embed_fields(params, layout: FeatureLayout, batch, dim=None):
    """All field embeddings ``[B, F, dim]`` (sparse then pooled varlen),
    in the declaration order the reference uses (basemodel.py:475-487)."""
    parts = []
    if layout.sparse:
        parts.append(lookup_sparse(params, layout, batch["sparse"], dim))
    if layout.varlen:
        parts.append(lookup_varlen(params, layout, batch["varlen"], dim))
    if not parts:
        raise ValueError("no sparse features")
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def l2_loss(params, l2: float):
    """Full-table L2, matching reference basemodel.py:519-535.

    When the packed bank is substituted by a sparse-update stand-in
    (BankRowFeed/BankIdCollector), its term is omitted here: the Trainer's
    fused/lazy bank optimizers account for the bank's L2 analytically
    (train/bank_optimizer.py) - the side bank's term stays in the loss.
    """
    if l2 <= 0.0:
        return 0.0
    loss = 0.0
    if not isinstance(params["bank"], (BankIdCollector, BankRowFeed)):
        loss = l2 * jnp.sum(jnp.square(params["bank"]))
    if "small" in params:
        loss = loss + l2 * jnp.sum(jnp.square(params["small"]))
    return loss


# ---------------------------------------------------------------------------
# first-order Linear model (reference basemodel.py:34-92)
# ---------------------------------------------------------------------------

def linear_model_init(key, layout: FeatureLayout, *, init_std: float = 1e-4):
    """1-dim embedding bank + dense-feature weight vector."""
    k1, k2 = jax.random.split(key)
    p = {"emb": bank_init(k1, layout, dim=1, init_std=init_std)}
    if layout.dense_dim > 0:
        p["dense_w"] = init.normal(k2, (layout.dense_dim, 1), init_std)
    return p


def linear_model_apply(p, layout: FeatureLayout, batch):
    """First-order logit ``[B, 1]``: sum of 1-dim embeddings + dense dot."""
    logit = jnp.zeros((next(iter(batch.values())).shape[0], 1))
    emb = embed_fields(p["emb"], layout, batch, dim=1)  # [B, F, 1]
    logit = logit + jnp.sum(emb, axis=(1, 2), keepdims=False)[:, None]
    if "dense_w" in p and "dense" in batch:
        logit = logit + batch["dense"] @ p["dense_w"]
    return logit


def linear_model_l2(p, l2: float):
    loss = l2_loss(p["emb"], l2)
    if "dense_w" in p:
        loss = loss + l2 * jnp.sum(jnp.square(p["dense_w"]))
    return loss
