"""SATrans model + Trainer end-to-end on synthetic multi-domain data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
from satrans_tpu.features import FeatureLayout
from satrans_tpu.models.satrans import SATrans
from satrans_tpu.train import Trainer, metrics


def _make(num_sparse=5, vocab=50, dim=8, num_domains=3, **kw):
    cols = synthetic_columns(num_sparse=num_sparse, vocab=vocab, dim=dim,
                             num_domains=num_domains)
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[num_domains],
                    domain_att_layer_num=2, att_head_num=2,
                    meta_dnn_hidden_units=(16, 8), **kw)
    return layout, model


def test_init_shapes():
    layout, model = _make()
    params, state = model.init(jax.random.PRNGKey(0))
    # all synthetic tables are small (vocab<=256) -> side bank holds them
    split = layout.small_split()
    assert params["emb"]["small"].shape == (split["small_rows"], 8)
    assert split["small_rows"] == layout.total_rows
    # meta units [8,16,8] -> P = 8*16+16*8 = 256
    assert params["encoder"]["layers"][0]["w"].shape == (8, 256)
    assert params["domain_emb"].shape == (3 + 1, 8)
    assert len(params["layers"]) == 2


def test_forward_shapes_and_range():
    layout, model = _make()
    x, y = synthetic_data(n=64, num_sparse=5, vocab=50)
    batch = layout.batch_from_dict(x)
    params, state = model.init(jax.random.PRNGKey(0))
    pred, _, aux = model.apply(params, state,
                               {k: jnp.asarray(v) for k, v in batch.items()})
    assert pred.shape == (64,)
    assert ((pred > 0) & (pred < 1)).all()


@pytest.mark.parametrize("kw", [
    dict(),                      # sota QK metanet
    dict(use_pos=True),          # 'pos'
    dict(variant="gate"),        # 'gate'
    dict(variant="bilinear"),    # 'bilinear'
    dict(only_emb=True),         # 'onlyemb'
    dict(relu_out=True),         # 'relu'
    dict(meta_mode="Q"),
    dict(dense_select=True),
])
def test_variants_forward(kw):
    layout, model = _make(**kw)
    x, y = synthetic_data(n=32, num_sparse=5, vocab=50)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = model.init(jax.random.PRNGKey(1))
    pred, _, _ = model.apply(params, state, batch)
    assert pred.shape == (32,)
    assert np.isfinite(np.asarray(pred)).all()


def test_dense_select_equals_gather():
    """The two TPU meta-apply paths must agree."""
    layout, m1 = _make(dense_select=False)
    _, m2 = _make(dense_select=True)
    x, _ = synthetic_data(n=32, num_sparse=5, vocab=50)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m1.init(jax.random.PRNGKey(2))
    p1, _, _ = m1.apply(params, state, batch)
    p2, _, _ = m2.apply(params, state, batch)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-4,
                               atol=2e-5)


def test_training_learns():
    """A few hundred steps on learnable synthetic data must beat AUC 0.6."""
    layout, model = _make(dim=8)
    x, y = synthetic_data(n=6000, num_sparse=5, vocab=50, seed=3)
    xt = {k: v[:4000] for k, v in x.items()}
    xv = {k: v[4000:] for k, v in x.items()}
    trainer = Trainer(model, seed=0)
    trainer.compile(learning_rate=0.01)
    trainer.fit(xt, y[:4000], batch_size=512, epochs=8, verbose=0)
    pred = trainer.predict(xv, batch_size=1024)
    assert pred.shape == (2000,)
    auc = metrics.auc(y[4000:], pred)
    assert auc > 0.6, f"model failed to learn, AUC={auc}"


def test_multi_domain_cols_forward():
    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8, num_domains=3)
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["domain", "f0"],
                    num_domains_list=[3, 30], domain_att_layer_num=1,
                    att_head_num=2, meta_dnn_hidden_units=(16, 8))
    x, _ = synthetic_data(n=16, num_sparse=4, vocab=30)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = model.init(jax.random.PRNGKey(4))
    pred, _, _ = model.apply(params, state, batch)
    assert pred.shape == (16,)


def test_bfloat16_compute_close_to_fp32():
    """bf16 stack: predictions close; model still learns."""
    layout, m32 = _make()
    _, m16 = _make()
    m16.compute_dtype = "bfloat16"
    x, y = synthetic_data(n=512, num_sparse=5, vocab=50)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m32.init(jax.random.PRNGKey(0))
    p32, _, _ = m32.apply(params, state, batch)
    p16, _, _ = m16.apply(params, state, batch)
    # same params: outputs agree to bf16 tolerance
    np.testing.assert_allclose(np.asarray(p32), np.asarray(p16), atol=0.03)
    corr = np.corrcoef(np.asarray(p32), np.asarray(p16))[0, 1]
    assert corr > 0.99


@pytest.mark.parametrize("kw", [dict(variant="gate"),
                                dict(variant="bilinear"),
                                dict(use_pos=True),
                                dict(only_emb=True)])
def test_variant_training_step(kw):
    """Each variant must produce finite grads and train one step."""
    layout, model = _make(**kw)
    x, y = synthetic_data(n=256, num_sparse=5, vocab=50)
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=0.01)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0)
    pred = tr.predict(x, batch_size=128)
    assert np.isfinite(pred).all()


def test_invalid_configs_rejected():
    """Round-4 review: configs the reference would crash on (or silently
    degrade) are rejected at construction."""
    import pytest
    from satrans_tpu.data.synthetic import synthetic_columns
    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    kw = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
              domain_att_layer_num=1, meta_dnn_hidden_units=(16, 8))
    with pytest.raises(ValueError, match="att_head_num"):
        SATrans(att_head_num=3, **kw)   # 8 % 3 != 0
    with pytest.raises(ValueError, match="mutually exclusive"):
        SATrans(att_head_num=2, only_emb=True, use_pos=True, **kw)


def test_deep_stack_init_has_enough_keys():
    """init() splits keys by the actual need (round-4 review: a fixed 16
    raised StopIteration for deep pos+multicol stacks)."""
    from satrans_tpu.data.synthetic import synthetic_columns
    cols = synthetic_columns(num_sparse=3, vocab=300, dim=8)
    layout = FeatureLayout(cols)
    m = SATrans(layout=layout, domain_cols=["domain", "s0"],
                num_domains_list=[3, 300], domain_att_layer_num=10,
                att_head_num=2, use_pos=True,
                meta_dnn_hidden_units=(16, 8))
    params, _ = m.init(jax.random.PRNGKey(0))
    assert len(params["layers"]) == 10


# ---------------------------------------------------------------------------
# round-5: multi-column composite product-domain table (VERDICT r4 next #1)
# ---------------------------------------------------------------------------

def _multicol_setup(**kw):
    cols = synthetic_columns(num_sparse=4, vocab=30, dim=8, num_domains=3)
    layout = FeatureLayout(cols)
    base = dict(layout=layout, domain_cols=["domain", "f0"],
                num_domains_list=[3, 30], domain_att_layer_num=2,
                att_head_num=2, meta_dnn_hidden_units=(16, 8))
    base.update(kw)
    x, y = synthetic_data(n=64, num_sparse=4, vocab=30)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    return layout, base, batch, jnp.asarray(y)


@pytest.mark.parametrize("kw", [dict(), dict(use_pos=True),
                                dict(variant="gate"),
                                dict(variant="bilinear")])
def test_multicol_composite_matches_per_example(kw):
    """The composite product-domain table is the per-example path's math
    evaluated once per combo (mean of scenario-column embeddings -> relu
    -> encoder, reference satrans.py:205-207): predictions and gradients
    must match the faithful per-example formulation."""
    from satrans_tpu.train import losses

    _, base, batch, yb = _multicol_setup(**kw)
    m_comp = SATrans(use_fused_kernel=False, **base)
    assert m_comp.use_composite and m_comp.product_domains == 4 * 31
    m_pe = SATrans(use_fused_kernel=False, **base)
    m_pe.use_composite = False  # force the faithful per-example path
    params, state = m_comp.init(jax.random.PRNGKey(0))
    p_c, _, _ = m_comp.apply(params, state, batch)
    p_p, _, _ = m_pe.apply(params, state, batch)
    np.testing.assert_allclose(np.asarray(p_c), np.asarray(p_p),
                               rtol=1e-5, atol=1e-6, err_msg=str(kw))

    def grads(m):
        def f(p):
            pred, _, _ = m.apply(p, state, batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.bce_sum(pred, yb)
        return jax.grad(f)(params)

    # dropout off for grad equality (different rng consumption patterns)
    import dataclasses
    g_c = grads(dataclasses.replace(m_comp, dropout_rate=0.0))
    m_pe0 = dataclasses.replace(m_pe, dropout_rate=0.0)
    m_pe0.use_composite = False  # replace() re-runs __post_init__
    g_p = grads(m_pe0)
    for path, a in jax.tree_util.tree_leaves_with_path(g_p):
        b = g_c
        for k in path:
            b = b[k.key] if hasattr(k, "key") else b[k.idx]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"{kw} {path}")


def test_multicol_composite_rides_tiled_kernel():
    """With a small domain product the multi-column config must actually
    run the dispatched tiled kernel (spy on the entry point) and equal
    the XLA path - forward AND parameter grads (the per-tile gradient
    blocks route back to the [D, P] tables through the gather's
    scatter-add)."""
    from test_pallas_meta_block import spy_fused_calls
    from satrans_tpu.train import losses

    _, base, batch, yb = _multicol_setup()
    base["dropout_rate"] = 0.0
    m_xla = SATrans(use_fused_kernel=False, **base)
    m_fused = SATrans(use_fused_kernel=True, fused_interpret=True, **base)
    params, state = m_xla.init(jax.random.PRNGKey(0))
    p_ref, _, _ = m_xla.apply(params, state, batch)
    with spy_fused_calls() as calls:
        p_fused, _, _ = m_fused.apply(params, state, batch)
    assert calls["tiled"] == 2 and calls["metanet"] == 0  # one per layer
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-5)

    def grads(m):
        def f(p):
            pred, _, _ = m.apply(p, state, batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.bce_sum(pred, yb)
        return jax.grad(f)(params)

    g_ref, g_fused = grads(m_xla), grads(m_fused)
    for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
        b = g_fused
        for k in path:
            b = b[k.key] if hasattr(k, "key") else b[k.idx]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4, err_msg=str(path))


def test_multicol_tiled_dropout_deterministic_and_finite():
    """Train-mode tiled kernel under dropout: same seed -> identical
    output; grads finite (fwd/bwd PRNG draw-order self-consistency)."""
    from satrans_tpu.train import losses

    _, base, batch, yb = _multicol_setup()
    base["dropout_rate"] = 0.3
    m = SATrans(use_fused_kernel=True, fused_interpret=True, **base)
    params, state = m.init(jax.random.PRNGKey(0))
    r = jax.random.PRNGKey(3)
    p1, _, _ = m.apply(params, state, batch, train=True, rng=r)
    p2, _, _ = m.apply(params, state, batch, train=True, rng=r)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def f(p):
        pred, _, _ = m.apply(p, state, batch, train=True, rng=r)
        return losses.bce_sum(pred, yb)

    g = jax.grad(f)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_multicol_large_product_stays_per_example():
    """Above the composite cap the faithful per-example path remains."""
    cols = synthetic_columns(num_sparse=4, vocab=300, dim=8, num_domains=3)
    layout = FeatureLayout(cols)
    m = SATrans(layout=layout, domain_cols=["domain", "f0"],
                num_domains_list=[3, 300], domain_att_layer_num=1,
                att_head_num=2, meta_dnn_hidden_units=(16, 8))
    assert not m.use_composite  # 4 * 301 > 256
    x, _ = synthetic_data(n=16, num_sparse=4, vocab=300)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m.init(jax.random.PRNGKey(0))
    pred, _, _ = m.apply(params, state, batch)
    assert pred.shape == (16,)


def test_multicol_composite_trains():
    """Composite path end-to-end through the Trainer (fit + predict)."""
    _, base, _, _ = _multicol_setup()
    model = SATrans(**base)
    x, y = synthetic_data(n=256, num_sparse=4, vocab=30)
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=0.01)
    tr.fit(x, y, batch_size=128, epochs=1, verbose=0)
    pred = tr.predict(x, batch_size=128)
    assert np.isfinite(pred).all()


def test_multicol_tiled_bwd_modes_agree(monkeypatch):
    """The tiled kernel's stash and recompute backwards must produce the
    same grads under active dropout (each regenerates the same PRNG masks
    from a different starting point)."""
    from satrans_tpu.train import losses

    _, base, batch, yb = _multicol_setup()
    base["dropout_rate"] = 0.3
    m = SATrans(use_fused_kernel=True, fused_interpret=True, **base)
    params, state = m.init(jax.random.PRNGKey(0))
    r = jax.random.PRNGKey(3)

    def grads():
        def f(p):
            pred, _, _ = m.apply(p, state, batch, train=True, rng=r)
            return losses.bce_sum(pred, yb)
        return jax.grad(f)(params)

    monkeypatch.setenv("SATRANS_TILED_BWD", "stash")
    g_stash = grads()
    monkeypatch.setenv("SATRANS_TILED_BWD", "recompute")
    g_rec = grads()
    nonzero = 0
    for path, a in jax.tree_util.tree_leaves_with_path(g_stash):
        b = g_rec
        for k in path:
            b = b[k.key] if hasattr(k, "key") else b[k.idx]
        nonzero += int(np.abs(np.asarray(a)).max() > 0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path))
    assert nonzero > 4  # not trivially zero
