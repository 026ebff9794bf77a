"""Sparse-aware Adam updates for the packed embedding bank.

The reference trains with BCE-sum + full-table L2 through Adam
(reference models/basemodel.py:316-319, 519-535), which makes every step's
embedding-table gradient DENSE: ``grad = scatter(batch_grads) + 2*l2*W``.
Round-1 paid for that faithfully - a 155k-row combine-then-scatter into an
840 MB zero bank (~13 ms) plus a dense Adam pass reading/writing bank+mu+nu
(~8 ms) dominated the step.  Both are avoidable without changing the math:

* The model's loss is differentiated with respect to the GATHERED rows
  (``embeddings.BankRowFeed``), so the bank cotangent stays a compact
  ``[N, row_width]`` tensor - the dense scatter never happens.
* ``fused`` mode: the L2 part of the gradient is analytic (``2*l2*W``),
  so one fused elementwise Adam pass over bank/mu/nu handles every
  untouched row EXACTLY as dense Adam would, and the touched rows are
  corrected by a tiny gather -> Adam -> sorted/unique scatter-overwrite.
  Same numbers as the dense path (same formulas, same combine order).
  Measured on v5e it does NOT beat 'dense' (the overwrite scatters cost
  what the avoided dense-gradient scatter did - scatter_primitives
  artifact), so ``'auto'`` resolves to ``'dense'``; 'fused' remains the
  mode that composes with the explicit all-to-all embedding exchange.
* ``lazy`` mode (opt-in, DOCUMENTED DEVIATION - see PARITY.md): no dense
  pass at all.  Adam moments for untouched rows decay analytically on next
  touch (``mu *= b1**k``, ``nu *= b2**k`` - exactly the value dense Adam
  reaches with zero gradients), the full-table L2 becomes decoupled weight
  decay applied lazily (``W *= (1 - 2*l2*lr)**k``), and the parameter drift
  dense Adam's momentum tail would apply to untouched rows is skipped
  (geometrically decaying, the classic torch ``SparseAdam`` trade).

Eligibility: the model's only packed-bank access is one ``embed_fields``
call on ``params['emb']`` (``standard_bank_access`` class attribute), and
the optimizer is the stock Adam from ``Trainer.compile('adam', ...)``.
Everything else falls back to the round-1 dense path.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .. import embeddings

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8


def pallas_scatter():
    """Deferred import of the row-DMA scatter kernel module (keeps CPU-only
    import paths free of pallas.tpu)."""
    from ..ops.pallas import scatter
    return scatter


def pallas_gather():
    """Deferred import of the row-DMA gather kernel module."""
    from ..ops.pallas import gather
    return gather


def _scatter_impl() -> str:
    """Which scatter commits the touched rows (trace-time decision).

    ``pallas`` (TPU default): ops/pallas/scatter.py row-DMA kernel -
    measured ~3.5x faster than XLA's serialized row scatter and truly
    in-place (bench/pallas_scatter_probe.py).  ``xla``: ``.at[].set``
    (CPU default, and the only path with sentinel/drop semantics).
    ``interpret``: the Pallas kernel in interpret mode (CPU tests).
    Env ``SATRANS_SCATTER`` overrides.
    """
    mode = os.environ.get("SATRANS_SCATTER", "auto")
    if mode in ("xla", "pallas", "interpret"):
        return mode
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _lazy_tail_impl() -> str:
    """How the lazy update's row tail (read -> decayed Adam -> commit) runs.

    ``split`` (default): the separate gather / XLA-fused Adam chain /
    row-DMA scatter (round-3 behavior; the only path under a mesh - opaque
    kernels cannot be SPMD-partitioned).  ``fused``: ops/pallas/
    lazy_tail.py does the whole row path in one kernel - built for round
    4's "one HBM round trip" hypothesis and measured a consistent LOSS on
    v5e (lazy step 30.0 ms vs split 25.96; 272.8k/273.2k vs 315.6k ex/s,
    bench_results/lazy_tail_v5e_r4.json): the kernel's per-row read DMAs
    stall each grid block (no cross-step pipelining of manual DMAs) while
    XLA overlaps its fused gather+Adam chain with the neighboring step
    work - the same lesson as the round-3 forward-gather kernel, now
    confirmed on the write+read fused form.  The kernel stays equality-
    tested (tests/test_lazy_tail.py) as the opt-in.  ``interpret``: the
    fused kernel in interpret mode (CPU tests).  Env ``SATRANS_LAZY_TAIL``
    overrides."""
    mode = os.environ.get("SATRANS_LAZY_TAIL", "auto")
    if mode in ("fused", "split", "interpret"):
        return mode
    return "split"


def _gather_impl() -> str:
    """Which gather reads touched/forward bank rows (trace-time decision).

    Default XLA: unlike the scatter (where the row-DMA kernel wins 3.5x),
    the gather kernel does NOT win end-to-end - standalone it beats the
    3-array ``jnp.take`` 0.2 vs 0.7 ms (bench/pallas_gather_probe.py,
    bench_results/pallas_gather_probe_v5e_r3.json), but in the real step
    XLA fuses the takes into the decay/Adam chain while the opaque kernel
    forces three [N, 128] materializations: measured lazy 276.6k vs 280.2k
    ex/s, dense 214.6k vs 215.6k (bank_modes A/B, docs/PERFORMANCE.md r3).
    Env ``SATRANS_GATHER=pallas|interpret`` opts in (the kernel stays
    correct and equality-tested)."""
    mode = os.environ.get("SATRANS_GATHER", "auto")
    if mode in ("xla", "pallas", "interpret"):
        return mode
    return "xla"


def gather_rows_impl(arrays, ids, impl: str | None = None):
    """Row gather of one id set from several equal-row-count arrays,
    through the resolved kernel.  ``ids`` must be in range (callers clip;
    ``jnp.take``'s default clip and the DMA kernel then agree)."""
    impl = impl or _gather_impl()
    if impl in ("pallas", "interpret"):
        return pallas_gather().gather_rows(
            arrays, ids, interpret=impl == "interpret")
    # mode='clip' matches the kernel path and the forward gather's clip
    # semantics (jnp.take's DEFAULT is NaN-fill for OOB ids)
    return tuple(jnp.take(a, ids, axis=0, mode="clip") for a in arrays)


def default_row_gather():
    """The ``gather_fn`` the Trainer injects into sparse_bank_grads on a
    SINGLE device (mesh callers keep XLA/all-to-all: an opaque pallas_call
    cannot be SPMD-partitioned).  None when the resolved impl is XLA -
    sparse_bank_grads' plain ``jnp.take`` is that path already."""
    impl = _gather_impl()
    if impl not in ("pallas", "interpret"):
        return None

    def fn(bank, flat_ids):
        ids = jnp.clip(flat_ids, 0, bank.shape[0] - 1)  # = take's clip
        return pallas_gather().gather_rows(
            (bank,), ids, interpret=impl == "interpret")[0]
    return fn


class EqPlan(NamedTuple):
    """Static shape info for the equality-GEMM duplicate combine
    (embeddings.eqgemm_combine): the lazy update reshapes the flat gather
    plan to ``[B, fields]`` and sums duplicates per field on the MXU instead
    of sort+segment-sum (~7 ms of ~36-60 ns/index ops at N=82k on v5e).

    ``ranges``: per-field INCLUSIVE physical-row range ``(lo, hi)``.  The
    combine is per-field, so a position whose id escapes its own field's
    range (per-field out-of-vocab data: offset+raw lands in a NEIGHBOR
    field's rows) is a cross-field duplicate the equality GEMMs cannot
    see - _eq_combine drops those positions deterministically (round-4
    review; racing them against the victim field's writers would lose one
    side's gradient nondeterministically)."""
    fields: int
    shared: tuple  # ((phys_row, (field_idx, ...)), ...)
    ranges: tuple  # ((lo, hi), ...) per field, inclusive physical rows


# The equality GEMM materializes an [F, B, B] f32 tensor: F*B^2*4 bytes.
# Measured win at the production shape (F=10, B=8192 -> 2.7 GB, fits v5e's
# 16 GB HBM beside the 840 MB bank); at B=32768 it would be 43 GB.  Above
# this cap the sort combine engages instead - it is O(N log N) memory-lean
# and only ~4 ms slower at the production shape.  Env override for tests
# and bigger-HBM parts.
EQGEMM_MAX_BYTES = 4 << 30


def use_eqgemm(eq_plan: EqPlan | None, n_ids: int) -> bool:
    """Trace-time choice of duplicate combine for the lazy update: the
    MXU equality GEMM where its [F, B, B] tensor fits the documented
    memory cap, else the sort+segment-sum combine (VERDICT r2 weak #8 -
    no silent multi-GB equality tensor as the global batch grows)."""
    if eq_plan is None or n_ids == 0:
        return False
    cap = int(os.environ.get("SATRANS_EQGEMM_MAX_BYTES", EQGEMM_MAX_BYTES))
    bsz = n_ids // eq_plan.fields
    return eq_plan.fields * bsz * bsz * 4 <= cap


def _eq_combine(flat_ids, g_rows, eq_plan: EqPlan, n_rows: int,
                force_xla: bool):
    """Equality-GEMM duplicate combine, shared by lazy_update and the
    fused_eq path (one implementation - the two modes must not drift).

    ``flat_ids`` are the RAW gather-plan ids ([B, F] lookup flattened
    row-major).  Returns ``(g_pos, tgt)``: per-position row totals and
    commit targets where every position of the same physical row carries a
    bit-identical value (the duplicate-tolerant scatters' precondition)
    and every tgt is IN RANGE - so callers keep the fast UNPREDICATED
    row-DMA scatter (drop_oob predication measured +2.1 ms/step on the
    v5e headline).

    Out-of-contract positions - an id outside its OWN field's physical-row
    range (per-field out-of-vocab data, incl. negative and bank-level-OOB
    ids) - alias a NEIGHBOR field's rows: a cross-field duplicate the
    per-field equality GEMMs cannot combine, so racing it against the
    victim field's writer would lose one side's gradient
    nondeterministically (round-4 review).  Instead each such position is
    REDIRECTED to the first in-contract position's (row, total): a
    redundant bit-identical write of a row that is being written anyway,
    i.e. the OOV contribution is deterministically dropped with zero
    hot-path cost.  (Degenerate all-positions-OOV batch: everything
    redirects to ``clip(flat_ids[0])`` with position 0's per-field total -
    one spurious touch of one row on garbage-only data.)  Per-field
    equality groups are disjoint across ids, so no masking of ``g_rows``
    is needed: a dropped position's gradient can only ever land in its own
    (dropped) group's total.  Boundary rows genuinely shared by two fields
    are in BOTH ranges and get one broadcast cross-field total
    (eqgemm_combine's ``shared_rows``).  ``force_xla`` pins the combine to
    the einsum (the opaque Pallas eqgemm cannot be SPMD-partitioned under
    a mesh).

    The value redirect (an [N, W] select) measured ~0.16 ms (~0.6%) on
    the v5e headline; pipelines that VALIDATE per-field in-vocab ids at
    ingestion (both bundled dataset pipelines remap ids in-range by
    construction) can set ``SATRANS_EQ_OOV=trust`` to skip it - under
    that precondition the two paths are identical programs modulo a clip.
    """
    n = flat_ids.shape[0]
    fl = eq_plan.fields
    bsz = n // fl
    w = g_rows.shape[1]
    ids_fb = flat_ids.reshape(bsz, fl).T                      # [F, B]
    g_fb = g_rows.reshape(bsz, fl, w).transpose(1, 0, 2)      # [F, B, W]
    s = embeddings.eqgemm_combine(ids_fb, g_fb, eq_plan.shared,
                                  impl="xla" if force_xla else None)
    g_pos = s.transpose(1, 0, 2).reshape(n, w)
    if os.environ.get("SATRANS_EQ_OOV", "redirect") == "trust":
        return g_pos, jnp.clip(flat_ids, 0, n_rows - 1)
    lo = jnp.asarray([r[0] for r in eq_plan.ranges],
                     ids_fb.dtype)[:, None]
    hi = jnp.asarray([r[1] for r in eq_plan.ranges],
                     ids_fb.dtype)[:, None]
    ok = ((ids_fb >= lo) & (ids_fb <= hi)).T.reshape(n)       # flat order
    safe_idx = jnp.argmax(ok)            # first in-contract position
    safe_id = jnp.clip(flat_ids[safe_idx], 0, n_rows - 1)
    tgt = jnp.where(ok, flat_ids, safe_id)
    g_pos = jnp.where(ok[:, None], g_pos, g_pos[safe_idx])
    return g_pos, tgt


def make_eq_plan(model) -> EqPlan | None:
    """EqPlan for models whose packed-bank gather plan is one ``[B, F]``
    sparse lookup; None where the sort-based combine must be used.

    Requirements: no varlen fields (their ``[B, V, L]`` gathers break the
    per-field grouping), at least one large-bank field, no shared embedding
    tables among them (shared tables alias EVERY row across two fields),
    and only a handful of boundary-shared physical rows (always true for
    distinct tables: a 128-lane physical row can straddle a field boundary
    only where a field's first row offset is not a multiple of the pack
    factor).
    """
    layout = model.layout
    if layout.varlen:
        return None
    split = layout.small_split(embeddings.SMALL_TABLE_THRESHOLD)
    li = split["large_idx"]
    if not li:
        return None
    offs = [int(o) for o in split["large_offsets"]]
    if len(set(offs)) != len(offs):
        return None
    rp = embeddings.pack_factor(layout.embedding_dim)
    vocabs = [layout.sparse[i].vocab for i in li]
    ranges = [(o // rp, (o + v - 1) // rp) for o, v in zip(offs, vocabs)]
    shared: dict[int, set] = {}
    for a in range(len(ranges)):
        for c in range(a + 1, len(ranges)):
            lo = max(ranges[a][0], ranges[c][0])
            hi = min(ranges[a][1], ranges[c][1])
            for p in range(lo, hi + 1):
                shared.setdefault(p, set()).update((a, c))
    if len(shared) > 4 * len(li):  # pathological overlap: combine by sort
        return None
    return EqPlan(fields=len(li),
                  shared=tuple((p, tuple(sorted(fs)))
                               for p, fs in sorted(shared.items())),
                  ranges=tuple(ranges))


def eligible(model, params) -> bool:
    """True if the sparse bank-update modes apply to this model."""
    return (getattr(model, "standard_bank_access", False)
            and isinstance(params, dict)
            and isinstance(params.get("emb"), dict)
            and "bank" in params["emb"]
            and hasattr(model, "l2_reg_embedding"))


def _split_bank(params):
    """(params without the emb.bank leaf, bank array)."""
    rest = dict(params)
    emb = dict(params["emb"])
    bank = emb.pop("bank")
    rest["emb"] = emb
    return rest, bank


def _with_bank(rest, bank_leaf):
    full = dict(rest)
    full["emb"] = dict(rest["emb"], bank=bank_leaf)
    return full


def adam_rows(w, m, v, g, count_inc, lr, b1=ADAM_B1, b2=ADAM_B2,
              eps=ADAM_EPS):
    """One Adam step on a row block, mirroring optax.adam's op order
    (optax scale_by_adam: moment update, bias correction by count_inc,
    ``mhat/(sqrt(vhat)+eps)``, then ``-lr``)."""
    m2 = (1.0 - b1) * g + b1 * m
    v2 = (1.0 - b2) * (g * g) + b2 * v
    mhat = m2 / (1.0 - b1 ** count_inc.astype(m2.dtype))
    vhat = v2 / (1.0 - b2 ** count_inc.astype(v2.dtype))
    w2 = w - lr * (mhat / (jnp.sqrt(vhat) + eps))
    return w2, m2, v2


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState inside an optax.adam chain state."""
    for i, s in enumerate(opt_state):
        if hasattr(s, "mu") and hasattr(s, "nu") and hasattr(s, "count"):
            return i, s
    raise ValueError("no ScaleByAdamState in opt_state")


def sparse_bank_grads(model, strategy, params, state, batch, y, weight, rng,
                      gather_fn=None):
    """Differentiate the step loss with the bank gradient kept sparse.

    Returns ``(flat_ids, g_rows, g_rest, new_state, data_loss, reg, aux)``
    where ``reg`` EXCLUDES the packed bank's L2 term (handled analytically
    by the caller) and ``g_rest`` is the gradient for every other param.

    ``gather_fn(bank, flat_ids) -> rows`` overrides the row read - the
    Trainer injects the explicit all-to-all exchange here when
    ``embedding_exchange='alltoall'`` (parallel/embedding_sharded.py);
    the default leaves the sharded gather to XLA SPMD.
    """
    rest, bank = _split_bank(params)
    flat_ids = embeddings.bank_gather_plan(params["emb"], model.layout, batch)
    if gather_fn is None:
        # clip, not jnp.take's default NaN-fill: OOB ids (out-of-vocab
        # data) must read the clip row like the dense forward gather does
        rows = jnp.take(bank, flat_ids, axis=0, mode="clip")
    else:
        rows = gather_fn(bank, flat_ids)

    def loss_fn(rest_, rows_):
        feed = embeddings.BankRowFeed(rows_, bank.shape)
        p_full = _with_bank(rest_, feed)
        pred, new_state, aux = model.apply(p_full, state, batch,
                                           train=True, rng=rng)
        feed.assert_consumed()
        data_loss = strategy.loss(pred, y, batch, weight)
        reg = model.reg_loss(p_full)  # bank term omitted (wrapper-aware)
        total = data_loss + reg + aux
        return total, (new_state, data_loss, reg, aux)

    (g_rest, g_rows), (new_state, data_loss, reg, aux) = jax.grad(
        loss_fn, argnums=(0, 1), has_aux=True)(rest, rows)
    return flat_ids, g_rows, g_rest, new_state, data_loss, reg, aux


def fused_update(optimizer, params, opt_state, flat_ids, g_rows, g_rest,
                 *, lr: float, l2: float, force_xla: bool = False,
                 eq_plan: EqPlan | None = None):
    """Exact-parity bank update: analytic-L2 dense Adam pass + touched-row
    correction.  Returns ``(new_params, new_opt_state)`` identical (same
    formulas, same duplicate-combine order) to dense Adam on
    ``scatter(g_rows) + 2*l2*bank``.

    ``force_xla``: mesh callers must pass True - the row-DMA kernels are
    opaque to the SPMD partitioner, so under pjit-sharded operands only the
    XLA gather/scatter lower correctly (shard-LOCAL kernel use lives in
    parallel/bank_sharded.py instead).

    ``eq_plan`` (the ``'fused_eq'`` Trainer mode): combine duplicates with
    the equality GEMMs instead of sort+segment-sum (the sort is ~7 ms of
    serialized index ops at N=155k on v5e - docs/PERFORMANCE.md).  Same
    update FORMULAS, but the f32 summation order of duplicate gradients
    differs (ulp-level) - the same class of difference as the reference's
    own order-nondeterministic CUDA ``scatter_add_``, so this is reduction
    -order freedom, not a semantic deviation (PARITY.md).  Every position
    then carries its row's bit-identical total, so the duplicate-tolerant
    scatter-set commits per POSITION (no unique pass).  Out-of-contract
    ids (per-field OOV, incl. negative and bank-level OOB) are dropped
    deterministically by :func:`_eq_combine` - see its docstring.
    """
    bank = params["emb"]["bank"]
    _, adam = _find_adam_state(opt_state)
    mu_b = adam.mu["emb"]["bank"]
    nu_b = adam.nu["emb"]["bank"]
    count_inc = adam.count + 1

    # touched rows, computed from PRE-update values with the full gradient
    if use_eqgemm(eq_plan, flat_ids.shape[0]):
        gu, tgt = _eq_combine(flat_ids, g_rows, eq_plan, bank.shape[0],
                              force_xla)
        u_safe = tgt                 # _eq_combine returns in-range targets
        unique = sorted_ids = False
    else:
        u, gu, valid = embeddings.combine_duplicate_rows(flat_ids, g_rows)
        # clip for the ROW READS only (the Pallas gather requires in-range
        # ids; an OOB/negative data id would DMA outside the arrays).  The
        # WRITE keeps drop semantics; negatives are sentineled explicitly
        # because XLA's .at[].set(mode='drop') WRAPS them numpy-style
        # (writing the LAST row) while the row-DMA kernel predicates them
        # off - the sentinel makes both impls drop identically.
        u_safe = jnp.clip(jnp.where(valid, u, 0), 0, bank.shape[0] - 1)
        tgt = jnp.where(valid & (u >= 0), u, bank.shape[0])
        unique = sorted_ids = True
    w_u, m_u, v_u = gather_rows_impl(
        (bank, mu_b, nu_b), u_safe,
        impl="xla" if force_xla else None)
    g_full = gu + (2.0 * l2) * w_u
    w_u2, m_u2, v_u2 = adam_rows(w_u, m_u, v_u, g_full, count_inc, lr)

    # dense pass: for untouched rows grad is exactly 2*l2*W (analytic).
    # NOTE a Pallas fused Adam pass buys nothing here: XLA already fuses
    # the elementwise chain to ~80% of HBM bandwidth (7.7 ms on-chip for
    # bank+mu+nu, measured against an aliased Pallas twin - PERFORMANCE.md
    # round-2 dead ends); the full-table-L2 semantics are a ~5 GB/step
    # bandwidth floor no kernel removes.
    grads = _with_bank(g_rest, (2.0 * l2) * bank)
    updates, new_opt = optimizer.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    # overwrite touched rows with their exact values.  On the eq_plan path
    # tgt holds every POSITION (duplicates carry bit-identical values -
    # the racing row-DMA kernel and XLA's unordered duplicate set both
    # store one well-defined value); sentinel ids (== row count) are
    # dropped either way.
    idx, adam_new = _find_adam_state(new_opt)
    impl = "xla" if force_xla else _scatter_impl()
    if impl in ("pallas", "interpret"):
        nb, nm, nn_ = pallas_scatter().scatter_rows_set(
            (new_params["emb"]["bank"], adam_new.mu["emb"]["bank"],
             adam_new.nu["emb"]["bank"]), tgt, (w_u2, m_u2, v_u2),
            drop_oob=True, interpret=impl == "interpret")
    else:
        def _over(arr, vals):
            return arr.at[tgt].set(vals, mode="drop",
                                   indices_are_sorted=sorted_ids,
                                   unique_indices=unique)
        nb = _over(new_params["emb"]["bank"], w_u2)
        nm = _over(adam_new.mu["emb"]["bank"], m_u2)
        nn_ = _over(adam_new.nu["emb"]["bank"], v_u2)
    new_params["emb"]["bank"] = nb
    mu = dict(adam_new.mu)
    nu = dict(adam_new.nu)
    mu["emb"] = dict(mu["emb"], bank=nm)
    nu["emb"] = dict(nu["emb"], bank=nn_)
    new_opt = (new_opt[:idx]
               + (adam_new._replace(mu=mu, nu=nu),)
               + new_opt[idx + 1:])
    return new_params, new_opt


def lazy_init(optimizer, params):
    """Opt state for lazy mode: optax state over the non-bank params plus
    dense Adam moments, a per-row last-touch step, and a global count for
    the bank."""
    rest, bank = _split_bank(params)
    return (optimizer.init(rest), {
        "mu": jnp.zeros_like(bank),
        "nu": jnp.zeros_like(bank),
        "last": jnp.zeros((bank.shape[0],), jnp.int32),
        "count": jnp.zeros((), jnp.int32),
    })


def lazy_update(optimizer, params, opt_state, flat_ids, g_rows, g_rest,
                *, lr: float, l2: float, eq_plan: EqPlan | None = None,
                force_xla: bool = False, oob: str = "clip", count_add=1):
    """Touched-rows-only bank update (documented deviation, module doc).

    ``oob='drop_negative'`` (the stale-commit pipeline's contract,
    :func:`Trainer` ``bank_update='lazy_stale'``): NEGATIVE ids are
    sentinel "no pending row" slots - they are redirected one-past-end so
    every write (XLA ``mode='drop'`` and the kernel's ``0 <= id < R``
    predicate) drops them, while in-range ids keep the clip semantics.
    ``g_rest=None`` skips the non-bank optimizer update entirely (the
    pipeline's trailing flush commits bank rows only - an Adam step on
    zero rest-grads would NOT be a no-op: nonzero moments still move the
    params).

    With ``eq_plan`` (make_eq_plan), duplicates are combined by equality
    GEMMs instead of sort+segment-sum and every POSITION carries its row's
    total gradient, so a sorted scatter-set with duplicate indices (any
    writer wins) replaces the unique scatter.  Duplicate positions within
    one field compute bit-identical Adam results (same reduction order);
    positions of a boundary-SHARED row seen from different fields receive
    the SAME bit-identical total (eqgemm_combine computes one cross-field
    sum per shared row and broadcasts it), so duplicate-index scatters -
    XLA or the racing row-DMA kernel - store one well-defined value.  Same
    update values as the sort path up to f32 summation order.

    Out-of-contract ids: on the SORT path, bank-level OOB ids (out-of-vocab
    data rows) are clipped to the last bank row, mirroring the forward
    gather's clip semantics, so every scatter (bank/mu/nu/last, Pallas or
    XLA) sees identical in-range ids.  On the EQ-GEMM path, any position
    whose id escapes its OWN field's row range (incl. negatives and
    bank-level OOB) has its contribution DROPPED deterministically via a
    redirect - see :func:`_eq_combine`; clipping them would collide
    distinct fields' OOV positions on the last row with non-identical
    totals, breaking the racing scatter's bit-identity precondition.
    (The dense/fused paths DROP the OOB backward contribution - torch
    scatter semantics; lazy is already a documented deviation.)
    """
    bank = params["emb"]["bank"]
    rest_state, b = opt_state
    # ``count_add`` (default 1) lets the stale pipeline keep ``count`` at
    # "steps COMMITTED": its first scan iteration commits an empty
    # pending and passes 0, so every deferred commit then runs with the
    # step index its gradients were computed at - same decay exponents
    # and bias corrections as an immediate commit.  (The add-0 path
    # computes garbage corrections at cnt=0; every one of its writes is
    # sentinel-dropped.)
    count_inc = b["count"] + count_add

    rest = _split_bank(params)[0]
    if g_rest is None:  # bank-only commit (stale-pipeline flush)
        rest_new = rest
    else:
        updates, rest_state = optimizer.update(g_rest, rest_state, rest)
        rest_new = optax.apply_updates(rest, updates)

    if oob == "drop_negative":
        # sentinel slots (< 0) must be DROPPED, not clipped onto row 0:
        # redirect them one-past-end where every write path drops them;
        # real ids keep the clip contract
        flat_ids = jnp.where(flat_ids < 0, bank.shape[0],
                             jnp.clip(flat_ids, 0, bank.shape[0] - 1))
    elif oob != "clip":
        raise ValueError(f"unknown oob mode {oob!r}")

    tail = "split" if force_xla else _lazy_tail_impl()
    if use_eqgemm(eq_plan, flat_ids.shape[0]):
        n = flat_ids.shape[0]
        g_pos, tgt0 = _eq_combine(flat_ids, g_rows, eq_plan,
                                  bank.shape[0], force_xla)
        if (not force_xla and tail == "split"
                and _scatter_impl() in ("pallas", "interpret")):
            # The racing row-DMA scatter is order-independent (duplicate
            # positions carry bit-identical totals), so the per-step
            # lax.sort of 82k ids + the [N, W] payload permute buy nothing
            # - skip them (measured win, docs/PERFORMANCE.md r4).
            tgt, gu, sorted_ids = tgt0, g_pos, False
        else:
            tgt, order = jax.lax.sort(
                (tgt0, jax.lax.iota(jnp.int32, n)))
            gu = jnp.take(g_pos, order, axis=0)
            sorted_ids = True
        u_safe = tgt                 # _eq_combine returns in-range targets
        valid, unique = None, False
    else:
        if oob == "clip":
            flat_ids = jnp.clip(flat_ids, 0, bank.shape[0] - 1)
        # drop_negative: ids already in [0, R-1] + the R sentinel, which
        # rides the combine as a normal id and is dropped by every write
        u, gu, valid = embeddings.combine_duplicate_rows(flat_ids, g_rows)
        u_safe = jnp.where(valid & (u < bank.shape[0]), u, 0)
        tgt = jnp.where(valid, u, bank.shape[0])
        unique = True
        sorted_ids = True

    # the 'last' read stays jnp.take (int32 [N]: 4-byte rows are no DMA
    # workload); the three W-wide row reads ride the row-DMA gather kernel
    k = (count_inc - 1 - jnp.take(b["last"], u_safe)).astype(jnp.float32)

    if tail in ("fused", "interpret"):
        # one-kernel tail (ops/pallas/lazy_tail.py): the kernel writes rows
        # of earlier blocks before later blocks read, so every REAL row id
        # must appear at most once - mask duplicate positions (which carry
        # identical totals on the EqPlan path) to the sentinel R
        from ..ops.pallas import lazy_tail as _lt
        if unique:
            ids_k = tgt  # sort path: unique-or-sentinel already
        else:
            assert sorted_ids  # first-occurrence masking needs sorted ids
            first = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), tgt[1:] != tgt[:-1]])
            ids_k = jnp.where(first, tgt, bank.shape[0])
        d1 = ADAM_B1 ** k
        d2 = ADAM_B2 ** k
        dww = (1.0 - 2.0 * l2 * lr) ** (k + 1.0)
        cnt = count_inc.astype(jnp.float32)
        c1inv = 1.0 / (1.0 - ADAM_B1 ** cnt)
        c2inv = 1.0 / (1.0 - ADAM_B2 ** cnt)
        new_bank, new_mu, new_nu = _lt.lazy_adam_rows(
            bank, b["mu"], b["nu"], ids_k, gu, d1, d2, dww, c1inv, c2inv,
            lr=lr, b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS,
            interpret=tail == "interpret")
    else:
        w_u0, m_u0, v_u0 = gather_rows_impl(
            (bank, b["mu"], b["nu"]), u_safe,
            impl="xla" if force_xla else None)
        m_u = m_u0 * (ADAM_B1 ** k)[:, None]
        v_u = v_u0 * (ADAM_B2 ** k)[:, None]
        # decoupled weight decay for the k skipped steps plus this one
        w_u = w_u0 * ((1.0 - 2.0 * l2 * lr) ** (k + 1.0))[:, None]
        w_u2, m_u2, v_u2 = adam_rows(w_u, m_u, v_u, gu, count_inc, lr)

        impl = "xla" if force_xla else _scatter_impl()
        if not unique and impl in ("pallas", "interpret"):
            # EqPlan path: every position is in range with a bit-identical
            # value per row (_eq_combine redirects out-of-contract
            # positions; eqgemm_combine broadcasts shared-row totals) -
            # exactly the racing row-DMA kernel's precondition, and NO
            # drop predication (measured +2.1 ms/step).
            new_bank, new_mu, new_nu = pallas_scatter().scatter_rows_set(
                (bank, b["mu"], b["nu"]), tgt, (w_u2, m_u2, v_u2),
                interpret=impl == "interpret")
        else:
            def over(arr, vals):
                return arr.at[tgt].set(vals, mode="drop",
                                       indices_are_sorted=sorted_ids,
                                       unique_indices=unique)
            new_bank = over(bank, w_u2)
            new_mu = over(b["mu"], m_u2)
            new_nu = over(b["nu"], v_u2)

    new_params = _with_bank(rest_new, new_bank)
    new_b = {
        "mu": new_mu,
        "nu": new_nu,
        "last": b["last"].at[tgt].set(count_inc, mode="drop",
                                      indices_are_sorted=sorted_ids,
                                      unique_indices=unique),
        "count": count_inc,
    }
    return new_params, (rest_state, new_b)


def lazy_update_sharded(optimizer, params, opt_state, flat_ids, g_rows,
                        g_rest, *, lr: float, l2: float, mesh,
                        axis: str = "data",
                        capacity_factor: float | None = 2.0):
    """Mesh version of :func:`lazy_update`: the touched-row commit is routed
    to each row's owning device and applied shard-locally
    (parallel/bank_sharded.lazy_routed_update - same formulas, duplicate
    combine split local-then-owner).  Returns
    ``(new_params, new_opt_state, overflow)`` where ``overflow`` counts
    unique rows dropped by the exchange capacity this step (0 under
    ``capacity_factor=None``)."""
    from ..parallel import bank_sharded

    rest_state, b = opt_state
    rest, bank = _split_bank(params)
    updates, rest_state = optimizer.update(g_rest, rest_state, rest)
    rest_new = optax.apply_updates(rest, updates)
    nb, nm, nn_, nlast, ncount, overflow = bank_sharded.lazy_routed_update(
        bank, b["mu"], b["nu"], b["last"], b["count"], flat_ids, g_rows,
        lr=lr, l2=l2, mesh=mesh, axis=axis,
        capacity_factor=capacity_factor)
    new_params = _with_bank(rest_new, nb)
    new_b = {"mu": nm, "nu": nn_, "last": nlast, "count": ncount}
    return new_params, (rest_state, new_b), overflow
