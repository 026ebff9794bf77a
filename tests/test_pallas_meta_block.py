"""Fused meta-transformer kernel vs. the XLA reference (interpret mode)."""

import contextlib
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satrans_tpu.nn import attention, metanet
from satrans_tpu.ops.pallas import gate_block, meta_block


@contextlib.contextmanager
def spy_fused_calls():
    """Count invocations of the two fused-kernel entry points.

    Reading back ``model.use_fused_kernel`` is vacuous - forced-True falls
    back transparently when the support gate rejects the config, which
    would silently turn a fused-vs-XLA equality test into XLA-vs-XLA
    (ADVICE r4).  Wrapping the entry points proves the fused path ran."""
    from satrans_tpu.ops.pallas import tiled_meta

    calls = {"metanet": 0, "simple": 0, "tiled": 0}
    orig_m = meta_block.fused_meta_layer_vjp
    orig_s = gate_block.fused_simple_layer_vjp
    orig_t = tiled_meta.fused_tiled_layer_vjp

    def wrap_m(*a, **k):
        calls["metanet"] += 1
        return orig_m(*a, **k)

    def wrap_s(*a, **k):
        calls["simple"] += 1
        return orig_s(*a, **k)

    def wrap_t(*a, **k):
        calls["tiled"] += 1
        return orig_t(*a, **k)

    meta_block.fused_meta_layer_vjp = wrap_m
    gate_block.fused_simple_layer_vjp = wrap_s
    tiled_meta.fused_tiled_layer_vjp = wrap_t
    try:
        yield calls
    finally:
        meta_block.fused_meta_layer_vjp = orig_m
        gate_block.fused_simple_layer_vjp = orig_s
        tiled_meta.fused_tiled_layer_vjp = orig_t


def _setup(B=32, F=19, d=32, D=4, head_num=4, seed=0, meta_units=None):
    rng = np.random.default_rng(seed)
    if meta_units is None:
        meta_units = [d, 2 * d, d]
    P = metanet.param_size(meta_units)
    x = jnp.asarray(rng.normal(size=(B, F, d)).astype(np.float32))
    params = attention.meta_transformer_init(
        jax.random.PRNGKey(seed), d, meta_units, share_kv_metanet=True)
    tables = {"Q": jnp.asarray(rng.normal(size=(D, P)).astype(np.float32)
                               * 0.1)}
    tables["K"] = tables["Q"]
    tables["V"] = tables["Q"]
    dom = jnp.asarray(rng.integers(0, D, size=B))
    onehot = jax.nn.one_hot(dom, D)
    return x, params, tables, dom, onehot, meta_units, head_num


def test_fused_forward_matches_reference():
    x, params, tables, dom, onehot, units, H = _setup()
    want = attention.meta_transformer_apply(
        params, x, tables, units, mode="QK", head_num=H, train=False,
        domain_ids=dom, dense_select=True)
    got = meta_block.fused_meta_layer(
        x, params, tables, onehot, meta_units=units, head_num=H,
        train=False, block_b=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("B,blk", [(64, 32), (32, 32)])
def test_fused_forward_tilings(B, blk):
    x, params, tables, dom, onehot, units, H = _setup(B=B)
    want = attention.meta_transformer_apply(
        params, x, tables, units, mode="QK", head_num=H, train=False,
        domain_ids=dom, dense_select=True)
    got = meta_block.fused_meta_layer(
        x, params, tables, onehot, meta_units=units, head_num=H,
        train=False, block_b=blk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("bwd", ["stash", "stash_light", "recompute"])
def test_fused_vjp_matches_reference_grads(bwd):
    """Backward kernels (both modes) vs jax.grad of the XLA reference."""
    x, params, tables, dom, onehot, units, H = _setup(B=32)

    def ref_loss(x, params, tables):
        t = tables["Q"]
        y = attention.meta_transformer_apply(
            params, x, {"Q": t, "K": t, "V": t}, units, mode="QK",
            head_num=H, train=False, domain_ids=dom, dense_select=True)
        return jnp.sum(jnp.sin(y))  # nontrivial upstream grads

    def fused_loss(x, params, tables):
        y = meta_block.fused_meta_layer_vjp(
            x, params, tables, onehot, meta_units=units, head_num=H,
            train=False, block_b=16, interpret=True, bwd=bwd,
            stash_dtype="f32")
        return jnp.sum(jnp.sin(y))

    args = (x, params, {"Q": tables["Q"]})
    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(*args)
    got_grads = jax.grad(fused_loss, argnums=(0, 1, 2))(*args)

    # dx
    np.testing.assert_allclose(np.asarray(got_grads[0]),
                               np.asarray(ref_grads[0]), rtol=2e-3, atol=2e-4)
    # param grads: wq/wk/wv/wout/ln and metanet ln
    for key in ("wq", "wk", "wv", "wout"):
        np.testing.assert_allclose(np.asarray(got_grads[1][key]),
                                   np.asarray(ref_grads[1][key]),
                                   rtol=2e-3, atol=2e-4, err_msg=key)
    for key in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(got_grads[1]["ln"][key]),
                                   np.asarray(ref_grads[1]["ln"][key]),
                                   rtol=2e-3, atol=2e-4, err_msg="ln." + key)
        np.testing.assert_allclose(
            np.asarray(got_grads[1]["q_meta"]["ln"][key]),
            np.asarray(ref_grads[1]["q_meta"]["ln"][key]),
            rtol=2e-3, atol=2e-4, err_msg="q_meta.ln." + key)
    # meta-table grads (per-domain flat)
    np.testing.assert_allclose(np.asarray(got_grads[2]["Q"]),
                               np.asarray(ref_grads[2]["Q"]),
                               rtol=2e-3, atol=2e-4)


def _interp_dropout_masks(seed, rate, N, d, H, groups, n_attn):
    """Reproduce the masks the interpret-mode kernels draw: the emulated
    PRNG is a pure function of (seed, call index, element index), so drawing
    the same shapes in the kernels' documented order (yq, yk, s per head, z)
    outside the kernel yields bit-identical masks."""
    with meta_block._interp_prng_scope(True):
        meta_block._prng_seed(jnp.int32(seed))  # one tile: program_id == 0
        m_yq = meta_block._dropout_mask((N, d), rate)
        m_yk = meta_block._dropout_mask((N, d), rate)
        m_s = [meta_block._dropout_mask((groups, n_attn, n_attn), rate)
               for _ in range(H)]
        m_z = meta_block._dropout_mask((N, d), rate)
    return m_yq, m_yk, m_s, m_z


def test_fused_train_dropout_mask_consistency():
    """Train mode, interpret PRNG: the fused fwd must equal a pure-JAX
    reference forward with the SAME masks injected (verifies the fwd draw
    order), and the fused grads must match the reference's grads (verifies
    the bwd regenerates identical masks - a fwd/bwd draw-order mismatch
    would corrupt dx through every dropout site)."""
    # F=24 avoids the wrapper's field padding (24 % SATRANS_PAD_F == 0), so
    # the kernel tile sees exactly the test's shapes.
    B, F_, d, D, H = 16, 24, 32, 4, 4
    rate, seed = 0.3, 123
    x, params, tables, dom, onehot, units, _ = _setup(B=B, F=F_)

    def fused_y(x):
        return meta_block.fused_meta_layer_vjp(
            x, params, tables, onehot, meta_units=units, head_num=H,
            train=True, drop_rate=rate, seed=seed, block_b=B,
            interpret=True, stash_dtype="f32")

    y1 = fused_y(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(fused_y(x)))

    # ---- pure-JAX reference with the kernels' exact masks injected ----
    N = B * F_
    h = units[1]
    g = meta_block._attn_group(B, F_)
    groups, n_attn = B // g, g * F_
    m_yq, m_yk, m_s, m_z = _interp_dropout_masks(
        seed, rate, N, d, H, groups, n_attn)
    P = d * h + h * d
    flat = tables["Q"][:, :P]
    w1cat = jnp.concatenate(list(flat[:, :d * h].reshape(D, d, h)), axis=1)
    w2cat = jnp.concatenate(list(flat[:, d * h:].reshape(D, h, d)), axis=0)
    wqkv = jnp.concatenate([params["wq"], params["wk"], params["wv"]],
                           axis=1)
    lnq = params["q_meta"]["ln"]
    lno = params["ln"]
    onehot_rows = jnp.repeat(onehot, F_, axis=0)
    blk_mask = meta_block._block_mask(groups, g, F_, F_)
    dh = d // H
    scale = 1.0 / np.sqrt(dh)

    def ref_y(x):
        x2 = x.reshape(N, d)
        qkv = x2 @ wqkv
        q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        yq, _ = meta_block._meta_apply(q0, w1cat, None, w2cat,
                                       onehot_rows, D, h, d)
        qn, _, _ = meta_block._layer_norm_fwd(
            yq * m_yq + q0, lnq["scale"], lnq["bias"])
        yk, _ = meta_block._meta_apply(k0, w1cat, None, w2cat,
                                       onehot_rows, D, h, d)
        kn, _, _ = meta_block._layer_norm_fwd(
            yk * m_yk + k0, lnq["scale"], lnq["bias"])
        q3 = (qn * scale).reshape(groups, n_attn, d)
        k3 = kn.reshape(groups, n_attn, d)
        v3 = v0.reshape(groups, n_attn, d)
        outs = []
        for hd in range(H):
            sl = slice(hd * dh, (hd + 1) * dh)
            s = jnp.einsum("gik,gjk->gij", q3[..., sl], k3[..., sl])
            s = meta_block._softmax_lastdim(
                meta_block._clip_logits(s) + blk_mask)
            outs.append(jnp.einsum("gij,gjc->gic", s * m_s[hd],
                                   v3[..., sl]))
        o2 = jnp.concatenate(outs, axis=-1).reshape(N, d)
        z = (o2 @ params["wout"]) * m_z
        y, _, _ = meta_block._layer_norm_fwd(
            z.reshape(B, F_, d) + x, lno["scale"], lno["bias"])
        return y

    np.testing.assert_allclose(np.asarray(y1), np.asarray(ref_y(x)),
                               rtol=2e-4, atol=2e-5)
    g_fused = jax.grad(lambda x: jnp.sum(jnp.sin(fused_y(x))))(x)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(ref_y(x))))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-4)


def test_satrans_fused_path_matches_unfused():
    """SATrans with the fused kernel == the XLA path (eval mode)."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans

    cols = synthetic_columns(num_sparse=5, vocab=50, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    kw = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
              domain_att_layer_num=2, att_head_num=4,
              meta_dnn_hidden_units=(64, 32))
    m_ref = SATrans(use_fused_kernel=False, **kw)
    m_fused = SATrans(use_fused_kernel=True, fused_interpret=True,
                      fused_block_b=16, **kw)
    x, _ = synthetic_data(n=32, num_sparse=5, vocab=50)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m_ref.init(jax.random.PRNGKey(0))
    p_ref, _, _ = m_ref.apply(params, state, batch)
    p_fused, _, _ = m_fused.apply(params, state, batch)
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-5)


def test_satrans_fused_grads_match_unfused():
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import losses

    cols = synthetic_columns(num_sparse=4, vocab=40, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    kw = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
              domain_att_layer_num=1, att_head_num=4,
              meta_dnn_hidden_units=(64, 32), dropout_rate=0.0)
    m_ref = SATrans(use_fused_kernel=False, **kw)
    m_fused = SATrans(use_fused_kernel=True, fused_interpret=True,
                      fused_block_b=16, **kw)
    x, y = synthetic_data(n=32, num_sparse=4, vocab=40)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m_ref.init(jax.random.PRNGKey(0))
    yb = jnp.asarray(y)

    def loss(m):
        def f(p):
            pred, _, _ = m.apply(p, state, batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.bce_sum(pred, yb)
        return jax.grad(f)(params)

    g_ref = loss(m_ref)
    g_fused = loss(m_fused)
    for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
        b = g_fused
        for k in path:
            b = b[k.key] if hasattr(k, "key") else b[k.idx]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=str(path))


def test_satrans_qkv_mode_fused_and_identical_to_qk():
    """meta_mode='QKV' rides the fused kernel and equals 'QK' exactly.

    The reference never meta-transforms V in the metanet variant - its
    forward checks only 'Q'/'K' in mode (reference satrans.py:61-75) and
    V_meta_mlp is dead weight - so QKV and QK are the same program.  The
    kernel support gate admits both; pin (a) QKV-fused == QKV-unfused and
    (b) QKV == QK bitwise on the unfused path."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans

    cols = synthetic_columns(num_sparse=5, vocab=50, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    kw = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
              domain_att_layer_num=2, att_head_num=4,
              meta_dnn_hidden_units=(64, 32))
    m_qk = SATrans(use_fused_kernel=False, meta_mode="QK", **kw)
    m_qkv = SATrans(use_fused_kernel=False, meta_mode="QKV", **kw)
    m_qkv_fused = SATrans(use_fused_kernel=True, fused_interpret=True,
                          fused_block_b=16, meta_mode="QKV", **kw)
    x, _ = synthetic_data(n=32, num_sparse=5, vocab=50)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m_qk.init(jax.random.PRNGKey(0))
    p_qk, _, _ = m_qk.apply(params, state, batch)
    p_qkv, _, _ = m_qkv.apply(params, state, batch)
    np.testing.assert_array_equal(np.asarray(p_qkv), np.asarray(p_qk))
    # the gate must actually admit QKV (not silently fall back)
    with spy_fused_calls() as calls:
        p_fused, _, _ = m_qkv_fused.apply(params, state, batch)
    assert calls["metanet"] == 2  # one per layer
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_qkv),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("kw", [
    dict(variant="gate"),
    dict(variant="gate", meta_mode="Q"),       # K stays ungated
    dict(variant="gate", use_pos=True),        # per-(layer,qkv) gates
    dict(variant="gate", relu_out=True),
    dict(variant="bilinear"),
    dict(variant="bilinear", only_emb=True),
])
def test_satrans_gate_bilinear_fused_matches_unfused(kw):
    """gate/bilinear variants (ops/pallas/gate_block.py) == XLA path,
    forward and parameter grads (reference satrans.py:61-66, 79-81)."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import losses

    cols = synthetic_columns(num_sparse=4, vocab=40, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    base = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
                domain_att_layer_num=2, att_head_num=4,
                meta_dnn_hidden_units=(64, 32), **kw)
    m_ref = SATrans(use_fused_kernel=False, **base)
    m_fused = SATrans(use_fused_kernel=True, fused_interpret=True,
                      fused_block_b=16, **base)
    x, y = synthetic_data(n=32, num_sparse=4, vocab=40)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m_ref.init(jax.random.PRNGKey(0))
    p_ref, _, _ = m_ref.apply(params, state, batch)
    with spy_fused_calls() as calls:
        p_fused, _, _ = m_fused.apply(params, state, batch)
    assert calls["simple"] == 2, kw  # one per layer, actually fused
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-5)
    yb = jnp.asarray(y)

    def grads(m):
        def f(p):
            pred, _, _ = m.apply(p, state, batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.bce_sum(pred, yb)
        return jax.grad(f)(params)

    # dropout off for grad equality (kernel PRNG vs XLA masks differ)
    m_ref0 = dataclasses.replace(m_ref, dropout_rate=0.0)
    m_fused0 = dataclasses.replace(m_fused, dropout_rate=0.0)
    g_ref, g_fused = grads(m_ref0), grads(m_fused0)
    for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
        b = g_fused
        for k in path:
            b = b[k.key] if hasattr(k, "key") else b[k.idx]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=f"{kw} {path}")


def test_gate_fused_train_dropout_deterministic_and_finite():
    """Train-mode gate kernel: same seed -> identical output; grads under
    dropout are finite (fwd/bwd PRNG draw-order self-consistency is what
    the recompute backward depends on)."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import losses

    cols = synthetic_columns(num_sparse=4, vocab=40, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    m = SATrans(layout=layout, domain_cols=["domain"], num_domains_list=[3],
                domain_att_layer_num=1, att_head_num=4,
                meta_dnn_hidden_units=(64, 32), variant="gate",
                dropout_rate=0.3, use_fused_kernel=True,
                fused_interpret=True, fused_block_b=16)
    x, y = synthetic_data(n=16, num_sparse=4, vocab=40)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m.init(jax.random.PRNGKey(0))
    r = jax.random.PRNGKey(3)
    p1, _, _ = m.apply(params, state, batch, train=True, rng=r)
    p2, _, _ = m.apply(params, state, batch, train=True, rng=r)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def f(p):
        pred, _, _ = m.apply(p, state, batch, train=True, rng=r)
        return losses.bce_sum(pred, jnp.asarray(y))

    g = jax.grad(f)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fused_relu_out_dropout_bwd_modes_agree():
    """relu_out + dropout: the three backward kernels (stash /
    stash_light / recompute) must produce the same grads - each
    regenerates the same PRNG masks and recomputes the relu mask from a
    different starting point (stashed o vs full recompute)."""
    x, params, tables, dom, onehot, units, _ = _setup(B=16, F=24)

    def gr(bwd):
        def f(x):
            y = meta_block.fused_meta_layer_vjp(
                x, params, tables, onehot, meta_units=units, head_num=4,
                train=True, drop_rate=0.3, seed=7, block_b=16,
                interpret=True, bwd=bwd, stash_dtype="f32", relu_out=True)
            return jnp.sum(jnp.sin(y))
        return jax.grad(f)(x)

    base = np.asarray(gr("stash"))
    assert np.abs(base).max() > 0  # not trivially zero
    for mode in ("stash_light", "recompute"):
        np.testing.assert_allclose(np.asarray(gr(mode)), base,
                                   rtol=2e-4, atol=2e-5, err_msg=mode)


def test_satrans_relu_out_fused_matches_unfused():
    """'relu' flag (reference satrans.py:91-92): fused kernel == XLA path,
    forward and parameter grads (dropout off: kernel PRNG and XLA masks
    differ by design; the dropout interaction is covered by
    test_fused_relu_out_dropout_bwd_modes_agree)."""
    drop = 0.0
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import losses

    cols = synthetic_columns(num_sparse=4, vocab=40, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    kw = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
              domain_att_layer_num=2, att_head_num=4,
              meta_dnn_hidden_units=(64, 32), relu_out=True,
              dropout_rate=drop)
    m_ref = SATrans(use_fused_kernel=False, **kw)
    m_fused = SATrans(use_fused_kernel=True, fused_interpret=True,
                      fused_block_b=16, **kw)
    x, y = synthetic_data(n=32, num_sparse=4, vocab=40)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m_ref.init(jax.random.PRNGKey(0))
    p_ref, _, _ = m_ref.apply(params, state, batch)
    with spy_fused_calls() as calls:
        p_fused, _, _ = m_fused.apply(params, state, batch)
    assert calls["metanet"] == 2  # one per layer, actually fused
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-5)
    yb = jnp.asarray(y)

    def grads(m):
        def f(p):
            pred, _, _ = m.apply(p, state, batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.bce_sum(pred, yb)
        return jax.grad(f)(params)

    g_ref, g_fused = grads(m_ref), grads(m_fused)
    for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
        b = g_fused
        for k in path:
            b = b[k.key] if hasattr(k, "key") else b[k.idx]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4, err_msg=str(path))


def test_forced_fused_falls_back_when_unsupported():
    """use_fused_kernel=True must transparently fall back (not crash or
    silently compute different math) for unsupported configs."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans

    cols = synthetic_columns(num_sparse=4, vocab=40, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    x, _ = synthetic_data(n=32, num_sparse=4, vocab=40)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    for kw in (dict(meta_dnn_hidden_units=(32,)),  # 1-matrix MetaNet
               # 4-matrix MetaNet (kernel covers 2- and 3-matrix only)
               dict(meta_dnn_hidden_units=(64, 64, 64, 32))):
        ref = SATrans(layout=layout, domain_cols=["domain"],
                      num_domains_list=[3], domain_att_layer_num=1,
                      att_head_num=4, use_fused_kernel=False, **kw)
        forced = SATrans(layout=layout, domain_cols=["domain"],
                         num_domains_list=[3], domain_att_layer_num=1,
                         att_head_num=4, use_fused_kernel=True,
                         fused_interpret=True, **kw)
        params, state = ref.init(jax.random.PRNGKey(0))
        p_ref, _, _ = ref.apply(params, state, batch)
        p_forced, _, _ = forced.apply(params, state, batch)
        np.testing.assert_allclose(np.asarray(p_forced), np.asarray(p_ref),
                                   rtol=1e-5, err_msg=str(kw))


@pytest.mark.parametrize("cap", [48, 192, 768])
def test_fused_vjp_attn_cap_variants(cap):
    """Larger block-diagonal attention pack factors (attn_cap) keep forward
    AND gradients exact: off-diagonal logits are -inf-masked so packed
    examples never mix."""
    x, params, tables, dom, onehot, units, H = _setup(B=32)

    def ref_loss(x):
        y = attention.meta_transformer_apply(
            params, x, tables, units, mode="QK", head_num=H, train=False,
            domain_ids=dom, dense_select=True)
        return jnp.sum(jnp.sin(y))

    def fused_loss(x):
        y = meta_block.fused_meta_layer_vjp(
            x, params, tables, onehot, meta_units=units, head_num=H,
            train=False, block_b=32, interpret=True, attn_cap=cap,
            stash_dtype="f32")
        return jnp.sum(jnp.sin(y))

    want, gw = jax.value_and_grad(ref_loss)(x)
    got, gg = jax.value_and_grad(fused_loss)(x)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                               rtol=3e-3, atol=3e-4)


def test_eval_forward_never_stashes(monkeypatch):
    """The custom-vjp PRIMAL (eval/serving: no grad requested) must run the
    plain forward kernel - the stash variant writes ~450 MB/layer of
    residuals nobody reads."""
    x, params, tables, dom, onehot, units, H = _setup(B=32)
    calls = {"stash": 0, "plain": 0}
    real_stash = meta_block._fwd_kernel_stash
    real_plain = meta_block._fwd_kernel

    def spy_stash(*a, **k):
        calls["stash"] += 1
        return real_stash(*a, **k)

    def spy_plain(*a, **k):
        calls["plain"] += 1
        return real_plain(*a, **k)

    monkeypatch.setattr(meta_block, "_fwd_kernel_stash", spy_stash)
    monkeypatch.setattr(meta_block, "_fwd_kernel", spy_plain)

    def fwd(x):
        return meta_block.fused_meta_layer_vjp(
            x, params, tables, onehot, meta_units=units, head_num=H,
            train=False, block_b=16, interpret=True, bwd="stash")

    fwd(x)  # no grad -> primal path
    assert calls["stash"] == 0 and calls["plain"] > 0

    calls["stash"] = calls["plain"] = 0
    jax.grad(lambda x: jnp.sum(fwd(x)))(x)  # grad -> stash fwd + stash bwd
    assert calls["stash"] > 0


def test_softmax_all_underflow_row_no_nan():
    """Regression: a row whose unmasked logits ALL sit below f32 exp
    underflow (~-87) must not produce 0/0 NaN - the round-1 one-sided
    min-clip did exactly that (exp of every entry == 0)."""
    raw = jnp.full((1, 2, 4), -1000.0)  # every in-block logit deeply neg
    mask = jnp.asarray([[[0.0, 0.0, -1e30, -1e30],
                         [0.0, 0.0, -1e30, -1e30]]])
    s = meta_block._softmax_lastdim(meta_block._clip_logits(raw) + mask)
    got = np.asarray(s)
    assert np.isfinite(got).all()
    # the two unmasked entries share the row mass; masked are exactly 0
    np.testing.assert_allclose(got[0, :, :2], 0.5, atol=1e-6)
    np.testing.assert_allclose(got[0, :, 2:], 0.0, atol=0)


def test_softmax_extreme_logits_no_nan():
    """Kernel-level smoke: huge-|logit| inputs keep fwd and grads finite."""
    x, params, tables, dom, onehot, units, H = _setup(B=32)
    x_big = x * 300.0  # LN keeps q,k O(1) but wq/wk scaling below does not

    params_big = dict(params)
    # blow up the out-of-LN path: scale the QKV projection so raw QK^T
    # logits reach +-thousands (both signs)
    params_big["wq"] = params["wq"] * 50.0
    params_big["wk"] = params["wk"] * 50.0

    def fwd(x):
        return meta_block.fused_meta_layer_vjp(
            x, params_big, tables, onehot, meta_units=units, head_num=H,
            train=False, block_b=16, interpret=True)

    y = fwd(x_big)
    assert np.isfinite(np.asarray(y)).all()
    g = jax.grad(lambda x: jnp.sum(fwd(x)))(x_big)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_vjp_bf16_stash_grads():
    """bf16 residual stash (opt-in via SATRANS_STASH=bf16; measured slower
    end-to-end on v5e so f32 is the default - docs/PERFORMANCE.md r3):
    same backward math, residuals stored at 2^-8 resolution.  Gradient
    error vs the XLA reference must stay within bf16-appropriate bounds."""
    x, params, tables, dom, onehot, units, H = _setup(B=32)

    def ref_loss(x, params, tables):
        t = tables["Q"]
        y = attention.meta_transformer_apply(
            params, x, {"Q": t, "K": t, "V": t}, units, mode="QK",
            head_num=H, train=False, domain_ids=dom, dense_select=True)
        return jnp.sum(jnp.sin(y))

    def fused_loss(x, params, tables):
        y = meta_block.fused_meta_layer_vjp(
            x, params, tables, onehot, meta_units=units, head_num=H,
            train=False, block_b=16, interpret=True, bwd="stash",
            stash_dtype="bf16")
        return jnp.sum(jnp.sin(y))

    args = (x, params, {"Q": tables["Q"]})
    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(*args)
    got_grads = jax.grad(fused_loss, argnums=(0, 1, 2))(*args)
    # per-element rtol is meaningless for bf16 noise on near-zero entries;
    # pin the relative ERROR NORM instead (measured <=4.5e-3 on this
    # fixture; 2e-2 gives 4x headroom without hiding a real math break,
    # which shows up as O(1) relnorm).
    for got, want, name in (
            (got_grads[0], ref_grads[0], "dx"),
            (got_grads[1]["wq"], ref_grads[1]["wq"], "wq"),
            (got_grads[1]["wk"], ref_grads[1]["wk"], "wk"),
            (got_grads[1]["wout"], ref_grads[1]["wout"], "wout"),
            (got_grads[2]["Q"], ref_grads[2]["Q"], "tables.Q")):
        g, w = np.asarray(got), np.asarray(want)
        relnorm = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert relnorm < 2e-2, (name, relnorm)


def test_masked_attn_variant_matches_slice(monkeypatch):
    """The masked-head attention (full-width GEMMs with 0/1 lane masks -
    the TPU default after the r3 A/B) must match the lane-slice variant to
    f32 contraction-order noise, forward AND gradients, in both backward
    modes."""
    x, params, tables, dom, onehot, units, H = _setup(B=32)

    def loss(x, bwd):
        y = meta_block.fused_meta_layer_vjp(
            x, params, tables, onehot, meta_units=units, head_num=H,
            train=False, block_b=16, interpret=True, bwd=bwd,
            stash_dtype="f32")
        return jnp.sum(jnp.sin(y))

    for bwd in ("stash", "recompute"):
        monkeypatch.setenv("SATRANS_ATTN", "slice")
        want, gw = jax.value_and_grad(lambda x: loss(x, bwd))(x)
        monkeypatch.setenv("SATRANS_ATTN", "masked")
        got, gg = jax.value_and_grad(lambda x: loss(x, bwd))(x)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6,
                                   err_msg=bwd)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=1e-4, atol=1e-6, err_msg=bwd)


# ---------------------------------------------------------------------------
# 'pos' variant: distinct Q/K meta tables + separate k_meta LayerNorm
# (reference satrans.py:44-47, 225-234) - round-4 kernel extension
# ---------------------------------------------------------------------------

def _setup_pos(B=32, F=15, d=32, D=4, head_num=4, seed=5):
    rng = np.random.default_rng(seed)
    meta_units = [d, 2 * d, d]
    P = metanet.param_size(meta_units)
    x = jnp.asarray(rng.normal(size=(B, F, d)).astype(np.float32))
    params = attention.meta_transformer_init(
        jax.random.PRNGKey(seed), d, meta_units, share_kv_metanet=False)
    # make the k_meta LN visibly different from q_meta's torch defaults
    params["k_meta"]["ln"]["scale"] = jnp.asarray(
        1.0 + 0.1 * rng.normal(size=(d,)).astype(np.float32))
    params["k_meta"]["ln"]["bias"] = jnp.asarray(
        0.1 * rng.normal(size=(d,)).astype(np.float32))
    tables = {
        "Q": jnp.asarray(rng.normal(size=(D, P)).astype(np.float32) * 0.1),
        "K": jnp.asarray(rng.normal(size=(D, P)).astype(np.float32) * 0.1),
    }
    tables["V"] = tables["Q"]
    dom = jnp.asarray(rng.integers(0, D, size=B))
    onehot = jax.nn.one_hot(dom, D)
    return x, params, tables, dom, onehot, meta_units, head_num


def test_fused_pos_forward_matches_reference():
    """Distinct Q/K tables + separate K LayerNorm == the XLA path."""
    x, params, tables, dom, onehot, units, H = _setup_pos()
    want = attention.meta_transformer_apply(
        params, x, tables, units, mode="QK", head_num=H, train=False,
        domain_ids=dom, dense_select=True)
    got = meta_block.fused_meta_layer(
        x, params, tables, onehot, meta_units=units, head_num=H,
        train=False, block_b=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("bwd", ["stash", "stash_light", "recompute"])
def test_fused_pos_vjp_matches_reference_grads(bwd):
    """Backward with distinct Q/K meta weights: dQ-table and dK-table must
    come out separately (and the k_meta LN grads route to k_meta)."""
    x, params, tables, dom, onehot, units, H = _setup_pos()

    def ref_loss(x, params, tables):
        y = attention.meta_transformer_apply(
            params, x, tables, units, mode="QK", head_num=H, train=False,
            domain_ids=dom, dense_select=True)
        return jnp.sum(jnp.sin(y))

    def fused_loss(x, params, tables):
        y = meta_block.fused_meta_layer_vjp(
            x, params, tables, onehot, meta_units=units, head_num=H,
            train=False, block_b=16, interpret=True, bwd=bwd,
            stash_dtype="f32")
        return jnp.sum(jnp.sin(y))

    args = (x, params, {"Q": tables["Q"], "K": tables["K"]})
    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(*args)
    got_grads = jax.grad(fused_loss, argnums=(0, 1, 2))(*args)

    np.testing.assert_allclose(np.asarray(got_grads[0]),
                               np.asarray(ref_grads[0]), rtol=2e-3,
                               atol=2e-4)
    for key in ("wq", "wk", "wv", "wout"):
        np.testing.assert_allclose(np.asarray(got_grads[1][key]),
                                   np.asarray(ref_grads[1][key]),
                                   rtol=2e-3, atol=2e-4, err_msg=key)
    for meta in ("q_meta", "k_meta"):
        for key in ("scale", "bias"):
            np.testing.assert_allclose(
                np.asarray(got_grads[1][meta]["ln"][key]),
                np.asarray(ref_grads[1][meta]["ln"][key]),
                rtol=2e-3, atol=2e-4, err_msg=f"{meta}.ln.{key}")
    for t in ("Q", "K"):
        np.testing.assert_allclose(np.asarray(got_grads[2][t]),
                                   np.asarray(ref_grads[2][t]),
                                   rtol=2e-3, atol=2e-4, err_msg=t)
    # the two table grads must genuinely differ (distinct paths)
    assert not np.allclose(np.asarray(got_grads[2]["Q"]),
                           np.asarray(got_grads[2]["K"]))


def test_satrans_pos_fused_matches_unfused():
    """SATrans use_pos=True: fused kernel == XLA path, fwd + grads."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import losses

    cols = synthetic_columns(num_sparse=5, vocab=50, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    kw = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
              domain_att_layer_num=2, att_head_num=4,
              meta_dnn_hidden_units=(64, 32), use_pos=True,
              dropout_rate=0.0)
    m_ref = SATrans(use_fused_kernel=False, **kw)
    m_fused = SATrans(use_fused_kernel=True, fused_interpret=True,
                      fused_block_b=16, **kw)
    x, y = synthetic_data(n=32, num_sparse=5, vocab=50)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m_ref.init(jax.random.PRNGKey(0))
    assert "layerid_emb" in params and "k_meta" in params["layers"][0]
    p_ref, _, _ = m_ref.apply(params, state, batch)
    p_fused, _, _ = m_fused.apply(params, state, batch)
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-5)

    yb = jnp.asarray(y)

    def loss(m):
        def f(p):
            pred, _, _ = m.apply(p, state, batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.bce_sum(pred, yb)
        return jax.grad(f)(params)

    g_ref = loss(m_ref)
    g_fused = loss(m_fused)
    for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
        b = g_fused
        for k in path:
            b = b[k.key] if hasattr(k, "key") else b[k.idx]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=str(path))


# ---------------------------------------------------------------------------
# round-5: Q-only/K-only modes (the CLI default 'Query') and 3-matrix MetaNets
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(meta_mode="Query"),                  # CLI/reference default: Q-only
    dict(meta_mode="K"),                      # K-only
    dict(meta_mode="Query", use_pos=True),    # Q-only with per-(layer,qkv)
    dict(meta_dnn_hidden_units=(64, 64, 32)),               # 3-matrix, QK
    dict(meta_dnn_hidden_units=(64, 64, 32), meta_mode="Query"),
    dict(meta_dnn_hidden_units=(64, 64, 32), use_pos=True),
])
def test_satrans_qmode_and_3matrix_fused_matches_unfused(kw):
    """Round-5 kernel coverage (VERDICT r4 next #2): containment meta
    modes ('Query' transforms Q only, reference satrans.py:61-75) and the
    3-matrix MetaNet (meta_dnn_hidden_units of length 3) ride the fused
    kernel and match the XLA path, forward and parameter grads."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans
    from satrans_tpu.train import losses

    cols = synthetic_columns(num_sparse=4, vocab=40, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    base = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
                domain_att_layer_num=2, att_head_num=4, dropout_rate=0.0)
    base.setdefault("meta_dnn_hidden_units", (64, 32))
    base.update(kw)
    m_ref = SATrans(use_fused_kernel=False, **base)
    m_fused = SATrans(use_fused_kernel=True, fused_interpret=True,
                      fused_block_b=16, **base)
    x, y = synthetic_data(n=32, num_sparse=4, vocab=40)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m_ref.init(jax.random.PRNGKey(0))
    p_ref, _, _ = m_ref.apply(params, state, batch)
    with spy_fused_calls() as calls:
        p_fused, _, _ = m_fused.apply(params, state, batch)
    assert calls["metanet"] == 2, kw  # one per layer, actually fused
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-5, err_msg=str(kw))
    yb = jnp.asarray(y)

    def grads(m):
        def f(p):
            pred, _, _ = m.apply(p, state, batch, train=True,
                                 rng=jax.random.PRNGKey(1))
            return losses.bce_sum(pred, yb)
        return jax.grad(f)(params)

    g_ref, g_fused = grads(m_ref), grads(m_fused)
    for path, a in jax.tree_util.tree_leaves_with_path(g_ref):
        b = g_fused
        for k in path:
            b = b[k.key] if hasattr(k, "key") else b[k.idx]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4,
                                   err_msg=f"{kw} {path}")


@pytest.mark.parametrize("mode,units3", [("Query", False), ("QK", True)])
def test_fused_dropout_bwd_modes_agree_qonly_and_3matrix(mode, units3):
    """Dropout draw-order self-consistency for the new kernel paths: an
    unapplied projection draws NO mask (fwd and bwd must both skip it),
    and the 3-matrix path adds no draws.  All three backward kernels must
    agree under active dropout."""
    units = [32, 64, 64, 32] if units3 else None
    x, params, tables, dom, onehot, mu, _ = _setup(B=16, F=24,
                                                   meta_units=units)

    def gr(bwd):
        def f(x):
            y = meta_block.fused_meta_layer_vjp(
                x, params, tables, onehot, meta_units=mu, head_num=4,
                train=True, drop_rate=0.3, seed=7, block_b=16,
                interpret=True, bwd=bwd, stash_dtype="f32", mode=mode)
            return jnp.sum(jnp.sin(y))
        return jax.grad(f)(x)

    base = np.asarray(gr("stash"))
    assert np.abs(base).max() > 0
    for m in ("stash_light", "recompute"):
        np.testing.assert_allclose(np.asarray(gr(m)), base,
                                   rtol=2e-4, atol=2e-5, err_msg=m)


def test_fused_probe_scores_match_xla_path(monkeypatch):
    """return_scores can ride the metanet kernel (stash forward +
    block-diagonal unpack, SATRANS_PROBE_FUSED=1): predictions AND
    per-layer [B, H, F, F] attention probabilities must match the XLA
    probe path.  The XLA route stays the DEFAULT - measured faster for
    inference-mode probes (bench_results/probe_throughput_v5e_r5.json)."""
    from satrans_tpu.data.synthetic import synthetic_columns, synthetic_data
    from satrans_tpu.features import FeatureLayout
    from satrans_tpu.models import SATrans

    monkeypatch.setenv("SATRANS_PROBE_FUSED", "1")
    cols = synthetic_columns(num_sparse=5, vocab=50, dim=32, num_domains=3)
    layout = FeatureLayout(cols)
    kw = dict(layout=layout, domain_cols=["domain"], num_domains_list=[3],
              domain_att_layer_num=2, att_head_num=4,
              meta_dnn_hidden_units=(64, 32))
    m_ref = SATrans(use_fused_kernel=False, **kw)
    m_fused = SATrans(use_fused_kernel=True, fused_interpret=True,
                      fused_block_b=16, **kw)
    x, _ = synthetic_data(n=32, num_sparse=5, vocab=50)
    batch = {k: jnp.asarray(v) for k, v in layout.batch_from_dict(x).items()}
    params, state = m_ref.init(jax.random.PRNGKey(0))
    p_ref, _, _, s_ref = m_ref.apply(params, state, batch,
                                     return_scores=True)
    p_fused, _, _, s_fused = m_fused.apply(params, state, batch,
                                           return_scores=True)
    np.testing.assert_allclose(np.asarray(p_fused), np.asarray(p_ref),
                               rtol=2e-4, atol=2e-5)
    assert len(s_fused) == len(s_ref) == 2
    for i, (a, b) in enumerate(zip(s_ref, s_fused)):
        assert b.shape == a.shape  # [B, H, F, F]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=f"layer{i}")
        # probabilities: rows sum to 1
        np.testing.assert_allclose(np.asarray(b).sum(-1), 1.0, atol=1e-4)
