"""Decompose the lazy-mode train step's wall-clock (round-2 perf hunt).

bench.py's headline step is ~41 ms; the 3 fused layers account for ~25
(bench/layer_ablation.py).  This bench knocks out one stage at a time to
pin the residual ~16 ms before optimizing the wrong thing:

  fwd_only        model.apply, no loss/grad
  fwd_loss        + strategy loss (still no grad)
  grad_no_bank    full backward but the gathered bank rows are
                  stop_gradient'ed (no [N, W] bank cotangent)
  grad_all        full sparse backward incl. g_rows, NO optimizer at all
                  (g_rows kept live via a sum)
  rest_update     grad_all + optax update of the non-bank params only
  full_lazy       the exact production step (lazy_update with the EqPlan
                  combine the Trainer passes)
  full_lazy_sort  same update through the sort-based combine

Each variant runs SCAN steps inside one lax.scan per jit call (same shape
as the Trainer's production program) and is timed over CHUNKS dependent
calls with a scalar fence.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -m satrans_tpu.bench.step_ablation
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os

TINY = os.environ.get("SATRANS_BENCH_TINY", "") == "1"  # CPU smoke mode
SCAN = 2 if TINY else 10
CHUNKS = 1 if TINY else 4
BATCH = 256 if TINY else 8192

from ..data.aliccp import DATA_MAX as _DM, SPARSE_FEATURES as _SF

# AliCCP vocab sizes (reference main.py:124-128), +2 like main.py:182 -
# single source of truth: satrans_tpu.data.aliccp.DATA_MAX.
ALICCP_DATA_MAX = {k: _DM[k] for k in _SF}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from satrans_tpu.features import FeatureLayout, SparseFeature
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import Trainer
    from satrans_tpu.train import bank_optimizer

    shrink = 100 if TINY else 1
    cols = [SparseFeature(name, max(vocab // shrink, 3) + 2, 32)
            for name, vocab in ALICCP_DATA_MAX.items()]
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["301"], num_domains_list=[3],
                    domain_att_layer_num=3, att_head_num=4, meta_mode="QK",
                    meta_dnn_hidden_units=(64, 32))
    trainer = Trainer(model, seed=1021)
    trainer.compile(learning_rate=0.005, bank_update="lazy")
    trainer._strategy = trainer._resolve_strategy(None)
    trainer._ensure_initialized()
    strategy = trainer._strategy
    optimizer = trainer.optimizer
    l2 = float(model.l2_reg_embedding)
    lr = trainer._lr

    rng = np.random.default_rng(0)
    sparse = np.stack([rng.integers(0, c.vocab, size=(SCAN, BATCH))
                       for c in cols], axis=-1).astype(np.int32)
    batch = {"sparse": jnp.asarray(sparse)}
    y = jnp.asarray(rng.integers(0, 2, size=(SCAN, BATCH, 1))
                    .astype(np.float32))
    w = jnp.ones((SCAN, BATCH), np.float32)
    rngs = jax.random.split(jax.random.PRNGKey(7), SCAN)

    params0 = trainer.params
    opt0 = trainer.opt_state
    state0 = trainer.state

    def scan_of(step):
        """Wrap a per-step fn into the production-shaped SCAN-step scan."""
        def run(params, opt_state, state, batches, ys, ws, rs):
            def body(carry, inp):
                p, o, s, acc = carry
                b, yy, ww, r = inp
                p, o, s, stat = step(p, o, s, b, yy, ww, r)
                return (p, o, s, acc + stat), ()
            (params, opt_state, state, acc), _ = jax.lax.scan(
                body, (params, opt_state, state, jnp.zeros(())),
                (batches, ys, ws, rs))
            return params, opt_state, state, acc
        return jax.jit(run, donate_argnums=(0, 1, 2))

    def sparse_grads(params, state, b, yy, ww, r):
        b = dict(b, _weight=ww)
        return bank_optimizer.sparse_bank_grads(
            model, strategy, params, state, b, yy, ww, r)

    # --- variants ---------------------------------------------------------
    def fwd_only(p, o, s, b, yy, ww, r):
        b = dict(b, _weight=ww)
        pred, s2, aux = model.apply(p, s, b, train=True, rng=r)
        return p, o, s2, jnp.sum(pred) + aux

    def fwd_loss(p, o, s, b, yy, ww, r):
        b = dict(b, _weight=ww)
        pred, s2, aux = model.apply(p, s, b, train=True, rng=r)
        return p, o, s2, strategy.loss(pred, yy, b, ww) + aux

    def grad_no_bank(p, o, s, b, yy, ww, r):
        from satrans_tpu import embeddings
        b = dict(b, _weight=ww)
        rest, bank = bank_optimizer._split_bank(p)
        flat_ids = embeddings.bank_gather_plan(p["emb"], model.layout, b)
        rows = jax.lax.stop_gradient(jnp.take(bank, flat_ids, axis=0))

        def loss_fn(rest_):
            feed = embeddings.BankRowFeed(rows, bank.shape)
            pf = bank_optimizer._with_bank(rest_, feed)
            pred, s2, aux = model.apply(pf, s, b, train=True, rng=r)
            return strategy.loss(pred, yy, b, ww) + model.reg_loss(pf) + aux, s2
        g, s2 = jax.grad(loss_fn, has_aux=True)(rest)
        live = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return p, o, s2, live

    def grad_all(p, o, s, b, yy, ww, r):
        flat_ids, g_rows, g_rest, s2, dl, reg, aux = sparse_grads(
            p, s, b, yy, ww, r)
        live = jnp.sum(g_rows) + sum(
            jnp.sum(x) for x in jax.tree_util.tree_leaves(g_rest))
        return p, o, s2, live + dl

    def rest_update(p, o, s, b, yy, ww, r):
        flat_ids, g_rows, g_rest, s2, dl, reg, aux = sparse_grads(
            p, s, b, yy, ww, r)
        rest_state, bstate = o
        rest = bank_optimizer._split_bank(p)[0]
        updates, rest_state = optimizer.update(g_rest, rest_state, rest)
        rest_new = optax.apply_updates(rest, updates)
        p2 = bank_optimizer._with_bank(rest_new, p["emb"]["bank"])
        return p2, (rest_state, bstate), s2, jnp.sum(g_rows) + dl

    eq_plan = bank_optimizer.make_eq_plan(model)

    def full_lazy(p, o, s, b, yy, ww, r):
        # the production step: eq-GEMM combine (what Trainer passes)
        flat_ids, g_rows, g_rest, s2, dl, reg, aux = sparse_grads(
            p, s, b, yy, ww, r)
        p2, o2 = bank_optimizer.lazy_update(
            optimizer, p, o, flat_ids, g_rows, g_rest, lr=lr, l2=l2,
            eq_plan=eq_plan)
        return p2, o2, s2, dl

    def full_lazy_sort(p, o, s, b, yy, ww, r):
        # same update through the sort-based combine (pre-EqPlan path)
        flat_ids, g_rows, g_rest, s2, dl, reg, aux = sparse_grads(
            p, s, b, yy, ww, r)
        p2, o2 = bank_optimizer.lazy_update(
            optimizer, p, o, flat_ids, g_rows, g_rest, lr=lr, l2=l2)
        return p2, o2, s2, dl

    # --- interior slices of lazy_update (localize its cost) ---------------
    from satrans_tpu import embeddings

    def _rest_applied(p, o, g_rest):
        rest_state, bstate = o
        rest = bank_optimizer._split_bank(p)[0]
        updates, rest_state = optimizer.update(g_rest, rest_state, rest)
        rest_new = optax.apply_updates(rest, updates)
        return rest_new, rest_state, bstate

    def _combine(flat_ids, g_rows):
        n = flat_ids.shape[0]
        fl = eq_plan.fields
        bsz = n // fl
        wdt = g_rows.shape[1]
        cs = embeddings.eqgemm_combine(
            flat_ids.reshape(bsz, fl).T,
            g_rows.reshape(bsz, fl, wdt).transpose(1, 0, 2),
            eq_plan.shared)
        g_pos = cs.transpose(1, 0, 2).reshape(n, wdt)
        tgt, order = jax.lax.sort((flat_ids, jax.lax.iota(jnp.int32, n)))
        gu = jnp.take(g_pos, order, axis=0)
        return tgt, gu

    def lazy_combine(p, o, s, b, yy, ww, r):
        # rest_update + the eq-GEMM combine + sort (no row Adam, no scatters)
        flat_ids, g_rows, g_rest, s2, dl, reg, aux = sparse_grads(
            p, s, b, yy, ww, r)
        rest_new, rest_state, bstate = _rest_applied(p, o, g_rest)
        tgt, gu = _combine(flat_ids, g_rows)
        p2 = bank_optimizer._with_bank(rest_new, p["emb"]["bank"])
        return p2, (rest_state, bstate), s2, dl + jnp.sum(gu) + jnp.sum(tgt)

    def lazy_adam_noscat(p, o, s, b, yy, ww, r):
        # + row gathers, decay powers, adam_rows — but NO scatters
        flat_ids, g_rows, g_rest, s2, dl, reg, aux = sparse_grads(
            p, s, b, yy, ww, r)
        rest_new, rest_state, bstate = _rest_applied(p, o, g_rest)
        tgt, gu = _combine(flat_ids, g_rows)
        bank = p["emb"]["bank"]
        count_inc = bstate["count"] + 1
        k = (count_inc - 1 - jnp.take(bstate["last"], tgt)).astype(jnp.float32)
        m_u = jnp.take(bstate["mu"], tgt, axis=0) \
            * (bank_optimizer.ADAM_B1 ** k)[:, None]
        v_u = jnp.take(bstate["nu"], tgt, axis=0) \
            * (bank_optimizer.ADAM_B2 ** k)[:, None]
        w_u = jnp.take(bank, tgt, axis=0) \
            * ((1.0 - 2.0 * l2 * lr) ** (k + 1.0))[:, None]
        w_u2, m_u2, v_u2 = bank_optimizer.adam_rows(
            w_u, m_u, v_u, gu, count_inc, lr)
        p2 = bank_optimizer._with_bank(rest_new, bank)
        live = dl + jnp.sum(w_u2) + jnp.sum(m_u2) + jnp.sum(v_u2)
        return p2, (rest_state, bstate), s2, live

    def lazy_scat_bank(p, o, s, b, yy, ww, r):
        # + the bank scatter ONLY (mu/nu/last kept stale; count advanced)
        flat_ids, g_rows, g_rest, s2, dl, reg, aux = sparse_grads(
            p, s, b, yy, ww, r)
        rest_new, rest_state, bstate = _rest_applied(p, o, g_rest)
        tgt, gu = _combine(flat_ids, g_rows)
        bank = p["emb"]["bank"]
        count_inc = bstate["count"] + 1
        k = (count_inc - 1 - jnp.take(bstate["last"], tgt)).astype(jnp.float32)
        m_u = jnp.take(bstate["mu"], tgt, axis=0) \
            * (bank_optimizer.ADAM_B1 ** k)[:, None]
        v_u = jnp.take(bstate["nu"], tgt, axis=0) \
            * (bank_optimizer.ADAM_B2 ** k)[:, None]
        w_u = jnp.take(bank, tgt, axis=0) \
            * ((1.0 - 2.0 * l2 * lr) ** (k + 1.0))[:, None]
        w_u2, m_u2, v_u2 = bank_optimizer.adam_rows(
            w_u, m_u, v_u, gu, count_inc, lr)
        bank2 = bank.at[tgt].set(w_u2, mode="drop", indices_are_sorted=True,
                                 unique_indices=False)
        p2 = bank_optimizer._with_bank(rest_new, bank2)
        new_b = dict(bstate, count=count_inc)
        live = dl + jnp.sum(m_u2) + jnp.sum(v_u2)
        return p2, (rest_state, new_b), s2, live

    variants = [
        ("fwd_only", fwd_only),
        ("fwd_loss", fwd_loss),
        ("grad_no_bank", grad_no_bank),
        ("grad_all", grad_all),
        ("rest_update", rest_update),
        ("full_lazy", full_lazy),
        ("full_lazy_sort", full_lazy_sort),
        ("lazy_combine", lazy_combine),
        ("lazy_adam_noscat", lazy_adam_noscat),
        ("lazy_scat_bank", lazy_scat_bank),
    ]
    only = os.environ.get("SATRANS_ABLATION_ONLY", "")
    if only:
        want = set(only.split(","))
        variants = [v for v in variants if v[0] in want]

    results = {}
    for name, step in variants:
        fn = scan_of(step)
        p = jax.tree.map(jnp.copy, params0)
        o = jax.tree.map(jnp.copy, opt0)
        s = jax.tree.map(jnp.copy, state0)
        t0 = time.time()
        p, o, s, acc = fn(p, o, s, batch, y, w, rngs)
        float(acc)
        log(f"[{name}] compile+first: {time.time() - t0:.1f}s")
        p, o, s, acc = fn(p, o, s, batch, y, w, rngs)
        float(acc)
        t0 = time.time()
        for _ in range(CHUNKS):
            p, o, s, acc = fn(p, o, s, batch, y, w, rngs)
        float(acc)
        ms = (time.time() - t0) / (CHUNKS * SCAN) * 1e3
        results[name] = round(ms, 2)
        log(f"[{name}] {ms:.2f} ms/step")

    print(json.dumps({
        "workload": "SATrans AliCCP sota, batch 8192, lazy mode pieces",
        "method": f"{SCAN}-step scan x {CHUNKS} chunks, scalar fence",
        "ms_per_step": results,
    }))


if __name__ == "__main__":
    main()
