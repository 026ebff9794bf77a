"""Forward/learn tests across the model zoo + STAR + MTL engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
from satrans_tpu.features import FeatureLayout
from satrans_tpu.models import (AFM, DCN, ESMM, MMOE, NFM, PLE, PNN,
                                AdaSparse, AutoInt, DeepFM, FiBiNET,
                                SharedBottom, StarNet, WDL, XDeepFM)
from satrans_tpu.train import Trainer, metrics

NUM_DOMAINS = 3


def _data(n=256, **kw):
    cols = synthetic_columns(num_sparse=5, vocab=40, dim=8,
                             num_domains=NUM_DOMAINS, **kw)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=n, num_sparse=5, vocab=40,
                          num_domains=NUM_DOMAINS, **kw)
    return layout, x, y


SINGLE_TASK_MODELS = [
    ("WDL", WDL, {}),
    ("DeepFM", DeepFM, {}),
    ("DeepFM-metatrans", DeepFM,
     {"flag": "metatrans", "domain_col": "domain", "num_domains": NUM_DOMAINS}),
    ("DCN", DCN, {}),
    ("xDeepFM", XDeepFM, {"cin_layer_size": (8, 4)}),
    ("NFM", NFM, {}),
    ("AFM", AFM, {}),
    ("PNN", PNN, {}),
    ("AutoInt", AutoInt, {"att_layer_num": 2}),
    ("AutoInt-meta", AutoInt,
     {"att_layer_num": 2, "flag": "usemetatrans", "domain_col": "domain",
      "num_domains": NUM_DOMAINS}),
    ("FiBiNET", FiBiNET, {}),
    ("AdaSparse", AdaSparse, {"domain_col": "domain",
                              "num_domains": NUM_DOMAINS,
                              "domain_emb_dim": 8}),
]


@pytest.mark.parametrize("name,cls,kw",
                         SINGLE_TASK_MODELS,
                         ids=[m[0] for m in SINGLE_TASK_MODELS])
def test_single_task_forward(name, cls, kw):
    layout, x, y = _data()
    model = cls(layout=layout, **kw)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    pred, _, aux = model.apply(params, state, batch)
    assert pred.shape == (256,)
    assert np.isfinite(np.asarray(pred)).all()
    assert ((np.asarray(pred) >= 0) & (np.asarray(pred) <= 1)).all()
    # train mode with dropout rng works too
    pred_t, _, _ = model.apply(params, state, batch, train=True,
                               rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(pred_t)).all()
    # reg loss is a finite scalar
    assert np.isfinite(float(model.reg_loss(params)))


def test_deepfm_learns():
    layout, x, y = _data(n=4000)
    model = DeepFM(layout=layout)
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=0.02)
    tr.fit(x, y, batch_size=512, epochs=6, verbose=0)
    auc = metrics.auc(y, tr.predict(x, batch_size=1024))
    assert auc > 0.65, auc


def test_star_forward_and_routing():
    layout, x, y = _data()
    model = StarNet(layout=layout, domain_col="domain",
                    num_domains=NUM_DOMAINS, dnn_hidden_units=(16, 8))
    model.set_domain_offset(int(x["domain"].min()))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    pred, new_state, _ = model.apply(params, state, batch, train=True,
                                     rng=jax.random.PRNGKey(1))
    assert pred.shape == (256,)
    assert np.isfinite(np.asarray(pred)).all()
    # BN running stats updated for every domain
    for d in range(NUM_DOMAINS):
        assert int(new_state["bn"][d]["count"]) == 1
        assert not np.allclose(np.asarray(new_state["bn"][d]["mean"]), 0.0)


def test_star_matches_per_domain_oracle():
    """Stacked dense-select routing == looping domains like the reference."""
    layout, x, y = _data(n=64)
    model = StarNet(layout=layout, domain_col="domain",
                    num_domains=NUM_DOMAINS, dnn_hidden_units=(8,),
                    use_domain_bn=False)
    model.set_domain_offset(1)
    params, state = model.init(jax.random.PRNGKey(0))
    batch_np = layout.batch_from_dict(x)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    pred, _, _ = model.apply(params, state, batch)

    # numpy oracle: route each domain's rows through its fused subnet
    from satrans_tpu import embeddings as emb
    h = np.asarray(emb.embed_fields(params["emb"], layout, batch)
                   ).reshape(64, -1)
    ids = batch_np["sparse"][:, layout.sparse_index("domain")]
    want = np.zeros(64)
    for d in range(NUM_DOMAINS):
        m = ids == d + 1
        hd = h[m]
        w = np.asarray(params["domain_w"][0][d]) * np.asarray(
            params["shared_w"][0])
        b = np.asarray(params["domain_b"][0][d]) + np.asarray(
            params["shared_b"][0])
        hd = np.maximum(hd @ w + b, 0)
        wo = np.asarray(params["domain_out_w"][d]) * np.asarray(
            params["shared_out_w"])
        bo = np.asarray(params["domain_out_b"][d]) + np.asarray(
            params["shared_out_b"])
        want[m] = 1 / (1 + np.exp(-(hd @ wo + bo)[:, 0]))
    np.testing.assert_allclose(np.asarray(pred), want, rtol=1e-4, atol=1e-5)


MTL_MODELS = [
    ("SharedBottom", SharedBottom, {}),
    ("MMOE", MMOE, {}),
    ("PLE", PLE, {}),
    ("SharedBottom-trans", SharedBottom, {"flag": "usetrans"}),
]


@pytest.mark.parametrize("name,cls,kw", MTL_MODELS,
                         ids=[m[0] for m in MTL_MODELS])
def test_mtl_forward(name, cls, kw):
    layout, x, y = _data()
    model = cls(layout=layout, num_tasks=NUM_DOMAINS, domain_col="domain",
                **kw)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    pred, _, _ = model.apply(params, state, batch)
    assert pred.shape == (256, NUM_DOMAINS)
    assert np.isfinite(np.asarray(pred)).all()


def test_esmm_two_domains():
    cols = synthetic_columns(num_sparse=5, vocab=40, dim=8, num_domains=2)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=128, num_sparse=5, vocab=40, num_domains=2)
    model = ESMM(layout=layout, num_tasks=2, domain_col="domain")
    params, state = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    pred, _, _ = model.apply(params, state, batch)
    assert pred.shape == (128, 2)
    # ctcvr = ctr * cvr <= ctr
    assert (np.asarray(pred[:, 1]) <= np.asarray(pred[:, 0]) + 1e-6).all()


def test_mtl_engine_trains_and_routes():
    """DomainRouted strategy: masked loss + per-domain head routing."""
    layout, x, y = _data(n=2000)
    model = MMOE(layout=layout, num_tasks=NUM_DOMAINS, domain_col="domain")
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=0.01,
               loss=["binary_crossentropy"] * NUM_DOMAINS)
    tr.fit(x, y, batch_size=256, epochs=6, verbose=0)
    pred = tr.predict(x, batch_size=512)
    assert pred.shape == (2000,)  # routed to scalar per sample
    assert metrics.auc(y, pred) > 0.6


def test_deepfm_ablation_flags():
    """nofm / nodnn change the forward (reference deepfm.py:95, 100)."""
    layout, x, y = _data(n=64)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    # larger init so the DNN branch contributes visibly at init
    base = DeepFM(layout=layout, init_std=0.1)
    params, state = base.init(jax.random.PRNGKey(0))
    p0, _, _ = base.apply(params, state, batch)
    p_nofm, _, _ = DeepFM(layout=layout, init_std=0.1, flag="nofm").apply(
        params, state, batch)
    p_nodnn, _, _ = DeepFM(layout=layout, init_std=0.1, flag="nodnn").apply(
        params, state, batch)
    assert not np.allclose(np.asarray(p0), np.asarray(p_nofm))
    assert not np.allclose(np.asarray(p0), np.asarray(p_nodnn))


def test_cal_ctr_util():
    from satrans_tpu.utils import cal_ctr
    rng = np.random.default_rng(0)
    data = {"click": rng.integers(0, 2, 500),
            "dom": rng.integers(0, 3, 500),
            "wide": rng.integers(0, 100, 500)}
    out = cal_ctr(data)
    assert "dom" in out and "wide" not in out


def test_star_bn_stats_freeze_for_absent_domain():
    """A domain absent from a batch must not decay its BN running stats."""
    layout, x, y = _data(n=128)
    x = {k: v.copy() for k, v in x.items()}
    x["domain"][:] = np.where(x["domain"] == 3, 1, x["domain"])  # no domain 3
    model = StarNet(layout=layout, domain_col="domain",
                    num_domains=NUM_DOMAINS, dnn_hidden_units=(16, 8))
    model.set_domain_offset(1)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    _, new_state, _ = model.apply(params, state, batch, train=True,
                                  rng=jax.random.PRNGKey(1))
    # domains 1,2 present -> stats moved; domain 3 absent -> unchanged
    assert not np.allclose(np.asarray(new_state["bn"][0]["mean"]), 0.0)
    np.testing.assert_array_equal(np.asarray(new_state["bn"][2]["mean"]),
                                  np.asarray(state["bn"][2]["mean"]))
    np.testing.assert_array_equal(np.asarray(new_state["bn"][2]["var"]),
                                  np.asarray(state["bn"][2]["var"]))


def test_adasparse_usetrans_forward():
    layout, x, y = _data(n=64)
    model = AdaSparse(layout=layout, domain_col="domain", num_domains=3,
                      domain_emb_dim=8, flag="usetrans")
    params, state = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    pred, _, _ = model.apply(params, state, batch, train=True,
                             rng=jax.random.PRNGKey(1))
    assert pred.shape == (64,) and np.isfinite(np.asarray(pred)).all()
