"""Fused lazy-tail kernel (ops/pallas/lazy_tail.py) vs the split path.

The kernel fuses row gather -> decayed Adam -> in-place commit into one
pass.  Interpret-mode tests pin:

* kernel math == bank_optimizer.adam_rows + the lazy decays (same op
  order; multiply-by-reciprocal bias correction is the only difference -
  1-ulp class);
* sentinel ids (>= R) leave their rows byte-untouched (the skip predicate
  guards BOTH the read and the write DMA);
* full lazy_update equality: SATRANS_LAZY_TAIL=interpret vs =split on both
  combine paths (EqPlan positions-with-duplicates and sort-unique), which
  exercises the duplicate -> sentinel first-occurrence masking the
  in-place kernel requires.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satrans_tpu import embeddings
from satrans_tpu.ops.pallas import lazy_tail
from satrans_tpu.train import bank_optimizer


def _rows(R=64, W=16, n=24, seed=0, with_sentinel=True):
    rng = np.random.default_rng(seed)
    bank = rng.normal(size=(R, W)).astype(np.float32)
    mu = (rng.normal(size=(R, W)) * 0.1).astype(np.float32)
    nu = np.abs(rng.normal(size=(R, W)) * 0.01).astype(np.float32)
    ids = rng.permutation(R)[:n].astype(np.int32)   # unique
    if with_sentinel:
        ids[3] = R          # sentinel: must be skipped
        ids[n - 1] = R + 7  # far out of range too
    g = (rng.normal(size=(n, W)) * 0.05).astype(np.float32)
    k = rng.integers(0, 9, n).astype(np.float32)
    return bank, mu, nu, ids, g, k


@pytest.mark.parametrize("rb", [8, 16])
def test_kernel_matches_reference_math(rb):
    lr, l2, b1, b2, eps = 0.01, 1e-4, 0.9, 0.999, 1e-8
    count_inc = 5
    bank, mu, nu, ids, g, k = _rows()
    d1 = b1 ** k
    d2 = b2 ** k
    dw = (1.0 - 2.0 * l2 * lr) ** (k + 1.0)
    c1inv = 1.0 / (1.0 - b1 ** count_inc)
    c2inv = 1.0 / (1.0 - b2 ** count_inc)
    nb, nm, nn_ = lazy_tail.lazy_adam_rows(
        jnp.asarray(bank), jnp.asarray(mu), jnp.asarray(nu),
        jnp.asarray(ids), jnp.asarray(g), jnp.asarray(d1), jnp.asarray(d2),
        jnp.asarray(dw), c1inv, c2inv, lr=lr, b1=b1, b2=b2, eps=eps,
        rb=rb, interpret=True)
    nb, nm, nn_ = np.asarray(nb), np.asarray(nm), np.asarray(nn_)

    want_b, want_m, want_v = bank.copy(), mu.copy(), nu.copy()
    for i, rid in enumerate(ids):
        if rid >= bank.shape[0]:
            continue
        m = mu[rid] * d1[i]
        v = nu[rid] * d2[i]
        w = bank[rid] * dw[i]
        m2 = (1 - b1) * g[i] + b1 * m
        v2 = (1 - b2) * g[i] ** 2 + b2 * v
        want_m[rid] = m2
        want_v[rid] = v2
        want_b[rid] = w - lr * (m2 * c1inv) / (np.sqrt(v2 * c2inv) + eps)
    np.testing.assert_allclose(nm, want_m, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(nn_, want_v, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(nb, want_b, rtol=1e-6, atol=1e-7)
    # sentinel rows byte-untouched
    touched = set(int(r) for r in ids if r < bank.shape[0])
    untouched = [r for r in range(bank.shape[0]) if r not in touched]
    np.testing.assert_array_equal(nb[untouched], bank[untouched])
    np.testing.assert_array_equal(nm[untouched], mu[untouched])
    np.testing.assert_array_equal(nn_[untouched], nu[untouched])


def _lazy_setup(seed=0):
    import optax

    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans

    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    x, _ = synthetic_data(n=256, num_sparse=3, vocab=300, seed=seed)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8),
                    l2_reg_embedding=1e-4)
    params, _ = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(0.01)
    opt_state = bank_optimizer.lazy_init(opt, params)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    flat_ids = embeddings.bank_gather_plan(params["emb"], layout, batch)
    rng = np.random.default_rng(seed + 1)
    g_rows = jnp.asarray(rng.normal(
        size=(flat_ids.shape[0],
              params["emb"]["bank"].shape[1])).astype(np.float32) * 1e-2)
    g_rest = jax.tree.map(jnp.zeros_like,
                          bank_optimizer._split_bank(params)[0])
    plan = bank_optimizer.make_eq_plan(model)
    return opt, model, params, opt_state, flat_ids, g_rows, g_rest, plan


@pytest.mark.parametrize("use_plan", [False, True])
def test_lazy_update_fused_tail_matches_split(monkeypatch, use_plan):
    (opt, model, params, opt_state, flat_ids, g_rows, g_rest,
     plan) = _lazy_setup()
    if use_plan:
        assert plan is not None

    def run():
        return bank_optimizer.lazy_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4, eq_plan=plan if use_plan else None)

    monkeypatch.setenv("SATRANS_LAZY_TAIL", "split")
    p_s, s_s = run()
    monkeypatch.setenv("SATRANS_LAZY_TAIL", "interpret")
    p_f, s_f = run()
    for key in ("bank",):
        np.testing.assert_allclose(np.asarray(p_f["emb"][key]),
                                   np.asarray(p_s["emb"][key]),
                                   rtol=1e-6, atol=1e-7)
    for key in ("mu", "nu", "last", "count"):
        np.testing.assert_allclose(np.asarray(s_f[1][key]),
                                   np.asarray(s_s[1][key]),
                                   rtol=1e-6, atol=1e-8)


def test_lazy_update_fused_two_steps_consistent(monkeypatch):
    """Two consecutive fused-tail steps == two split steps (exercises the
    'last'/decay interaction the fused path must preserve).  The second
    step uses a DIFFERENT batch's gather plan (a fresh [B, F] lookup - the
    EqPlan combine's bit-identity guarantee requires the per-field id
    grouping, so an arbitrary permutation of flat_ids would be invalid)."""
    (opt, model, params, opt_state, flat_ids, g_rows, g_rest,
     plan) = _lazy_setup(seed=5)
    from satrans_tpu.data.synthetic import synthetic_data
    x2, _ = synthetic_data(n=256, num_sparse=3, vocab=300, seed=11)
    batch2 = {k: jnp.asarray(v)
              for k, v in model.layout.batch_from_dict(x2).items()}
    ids2 = embeddings.bank_gather_plan(params["emb"], model.layout, batch2)

    def two(tail):
        monkeypatch.setenv("SATRANS_LAZY_TAIL", tail)
        p, s = bank_optimizer.lazy_update(
            opt, params, opt_state, flat_ids, g_rows, g_rest,
            lr=0.01, l2=1e-4, eq_plan=plan)
        return bank_optimizer.lazy_update(
            opt, p, s, ids2, g_rows, g_rest, lr=0.01, l2=1e-4,
            eq_plan=plan)

    p_s, s_s = two("split")
    p_f, s_f = two("interpret")
    np.testing.assert_allclose(np.asarray(p_f["emb"]["bank"]),
                               np.asarray(p_s["emb"]["bank"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_f[1]["mu"]),
                               np.asarray(s_s[1]["mu"]),
                               rtol=1e-6, atol=1e-8)
