"""Legacy Star_Trans lineage tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
from satrans_tpu.features import FeatureLayout
from satrans_tpu.models import (StarTrans, Starv2Trans, Starv3Trans,
                                Starv4Trans)
from satrans_tpu.models.star_trans_legacy import attn_regularization_loss
from satrans_tpu.ops import segment


def _setup(n=64, **kw):
    cols = synthetic_columns(num_sparse=5, vocab=40, dim=8, num_domains=3)
    layout = FeatureLayout(cols)
    x, y = synthetic_data(n=n, num_sparse=5, vocab=40)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    return layout, batch, x, y


def test_segment_mean_matches_numpy():
    data = np.arange(12, dtype=np.float32).reshape(6, 2)
    ids = np.array([1, 2, 1, 3, 2, 1])
    got = np.asarray(segment.segment_mean(jnp.asarray(data), jnp.asarray(ids),
                                          num_segments=4))
    for d in range(4):
        m = ids == d
        want = data[m].mean(0) if m.any() else np.zeros(2)
        np.testing.assert_allclose(got[d], want, rtol=1e-6)


LEGACY = [
    ("StarTrans-no", StarTrans, {"merge": "no"}),
    ("StarTrans-sum", StarTrans, {"merge": "sum"}),
    ("StarTrans-dot", StarTrans, {"merge": "dot"}),
    ("StarTrans-trans", StarTrans, {"att_layer_type": "trans"}),
    ("StarTrans-domhead", StarTrans, {"use_domain_dnn_linear": True}),
    ("Starv2", Starv2Trans, {}),
    ("Starv2-ffn", Starv2Trans, {"att_layer_type": "trans"}),
    ("Starv3", Starv3Trans, {}),
    ("Starv3-pos", Starv3Trans, {"flag": "layerid-qkvid-cat"}),
    ("Starv3-large", Starv3Trans, {"flag": "large-norelu"}),
    ("Starv4", Starv4Trans, {}),
    ("Starv4-aggmap", Starv4Trans, {"flag": "aggmap"}),
]


@pytest.mark.parametrize("name,cls,kw", LEGACY, ids=[m[0] for m in LEGACY])
def test_legacy_forward(name, cls, kw):
    layout, batch, x, y = _setup()
    model = cls(layout=layout, domain_col="domain", num_domains=3,
                att_layer_num=1, domain_att_layer_num=2, **kw)
    params, state = model.init(jax.random.PRNGKey(0))
    pred, _, aux = model.apply(params, state, batch, train=True,
                               rng=jax.random.PRNGKey(1))
    assert pred.shape == (64,)
    assert np.isfinite(np.asarray(pred)).all()
    assert np.isfinite(float(aux))


def test_starv2_aux_loss_positive_when_uniform():
    """Identical mixture weights across domains -> maximal penalty."""
    w = jnp.ones((30, 3)) / 3.0
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 4, 30))
    loss = attn_regularization_loss(w, ids, num_domains=3)
    # var=0 -> std = 1-sqrt(1e-4) ~ 0.99 -> sum(2*std)/(2*3) ~ 0.99
    assert 0.9 < float(loss) < 1.0


def test_starv2_aux_flows_into_training_loss():
    layout, batch, x, y = _setup()
    model = Starv2Trans(layout=layout, domain_col="domain", num_domains=3,
                        domain_att_layer_num=1, attn_batch_reg=0.1)
    params, state = model.init(jax.random.PRNGKey(0))
    _, _, aux = model.apply(params, state, batch)
    # scaled by attn_batch_reg * batch size (star_trans.py:876)
    assert float(aux) > 0.5


def test_domain_col_excluded_from_fields_by_default():
    layout, batch, x, y = _setup()
    m1 = StarTrans(layout=layout, domain_col="domain", num_domains=3)
    m2 = StarTrans(layout=layout, domain_col="domain", num_domains=3,
                   domain_id_as_feature=True)
    assert len(m1.active_fields) == len(m2.active_fields) - 1
    assert m1.head_in == m2.head_in - layout.embedding_dim
