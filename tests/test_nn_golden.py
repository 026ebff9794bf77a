"""Golden-value tests: each NN building block vs. a naive numpy oracle.

The reference has no tests (SURVEY.md section 4); these pin the module math
independently of both the reference and our JAX implementations.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satrans_tpu.nn import attention, core, interactions, metanet


def _np_layer_norm(x, scale, bias, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def test_layer_norm_matches_numpy(rng):
    x = rng.normal(size=(4, 5, 8)).astype(np.float32)
    p = core.layer_norm_init(jax.random.PRNGKey(0), 8)
    got = core.layer_norm_apply(p, jnp.asarray(x))
    want = _np_layer_norm(x, np.asarray(p["scale"]), np.asarray(p["bias"]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_mlp_final_activation_semantics(rng):
    """DNN_v2: last layer must have no activation (can go negative)."""
    x = rng.normal(size=(16, 8)).astype(np.float32)
    p = core.mlp_init(jax.random.PRNGKey(1), 8, [16, 4], init_std=0.5,
                      final_activation=False)
    y = np.asarray(core.mlp_apply(p, jnp.asarray(x), final_activation=False))
    assert (y < 0).any()
    # DNN: relu everywhere -> non-negative
    y2 = np.asarray(core.mlp_apply(p, jnp.asarray(x), final_activation=True))
    assert (y2 >= 0).all()


def test_mlp_matches_numpy(rng):
    x = rng.normal(size=(16, 8)).astype(np.float32)
    p = core.mlp_init(jax.random.PRNGKey(2), 8, [16, 4], init_std=0.5,
                      final_activation=False)
    h = x @ np.asarray(p["layers"][0]["w"]) + np.asarray(p["layers"][0]["b"])
    h = np.maximum(h, 0)
    want = h @ np.asarray(p["layers"][1]["w"]) + np.asarray(p["layers"][1]["b"])
    got = np.asarray(core.mlp_apply(p, jnp.asarray(x), final_activation=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_metanet_flat_matches_numpy(rng):
    """MetaNet: slice flat params -> batched matmul chain -> residual + LN
    (reference submodules.py:77-103)."""
    B, F, d = 6, 5, 8
    units = [d, 12, d]
    P = metanet.param_size(units)
    x = rng.normal(size=(B, F, d)).astype(np.float32)
    flat = rng.normal(size=(B, P)).astype(np.float32)
    p = metanet.init(jax.random.PRNGKey(3), d, use_norm=True)
    got = np.asarray(metanet.apply_flat(p, jnp.asarray(x), jnp.asarray(flat),
                                        units, dropout_rate=0.0, train=False))
    w1 = flat[:, : d * 12].reshape(B, d, 12)
    w2 = flat[:, d * 12:].reshape(B, 12, d)
    h = np.maximum(np.einsum("bfi,bio->bfo", x, w1), 0)
    h = np.einsum("bfi,bio->bfo", h, w2)
    want = _np_layer_norm(h + x, np.asarray(p["ln"]["scale"]),
                          np.asarray(p["ln"]["bias"]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dense_select", [False, True])
def test_metanet_domainwise_equals_flat(rng, dense_select):
    """Gathering per-domain params must equal the per-example path."""
    B, F, d, D = 10, 4, 8, 3
    units = [d, 6, d]
    P = metanet.param_size(units)
    x = rng.normal(size=(B, F, d)).astype(np.float32)
    table = rng.normal(size=(D, P)).astype(np.float32)
    dom = rng.integers(0, D, size=B)
    p = metanet.init(jax.random.PRNGKey(4), d, use_norm=True)
    flat = table[dom]
    want = np.asarray(metanet.apply_flat(p, jnp.asarray(x), jnp.asarray(flat),
                                         units, dropout_rate=0.0, train=False))
    got = np.asarray(metanet.apply_domainwise(
        p, jnp.asarray(x), jnp.asarray(dom), jnp.asarray(table), units,
        dropout_rate=0.0, train=False, dense_select=dense_select))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_self_attention_matches_numpy(rng):
    B, F, d, H = 3, 5, 8, 2
    x = rng.normal(size=(B, F, d)).astype(np.float32)
    p = attention.self_attention_init(jax.random.PRNGKey(5), d)
    got = np.asarray(attention.self_attention_apply(
        p, jnp.asarray(x), H, train=False))

    q = x @ np.asarray(p["wq"])
    k = x @ np.asarray(p["wk"])
    v = x @ np.asarray(p["wv"])
    dh = d // H

    def split(t):  # [B,F,d] -> [B,H,F,dh]
        return t.reshape(B, F, H, dh).transpose(0, 2, 1, 3)

    qs, ks, vs = split(q), split(k), split(v)
    scores = np.einsum("bhik,bhjk->bhij", qs, ks) / np.sqrt(dh)
    scores = np.exp(scores - scores.max(-1, keepdims=True))
    scores /= scores.sum(-1, keepdims=True)
    out = np.einsum("bhij,bhjk->bhik", scores, vs)
    out = out.transpose(0, 2, 1, 3).reshape(B, F, d)
    out = out + x @ np.asarray(p["wres"])
    out = np.maximum(out, 0)
    want = _np_layer_norm(out, np.asarray(p["ln"]["scale"]),
                          np.asarray(p["ln"]["bias"]))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fm_matches_bruteforce(rng):
    x = rng.normal(size=(4, 6, 5)).astype(np.float32)
    got = np.asarray(interactions.fm(jnp.asarray(x)))
    want = np.zeros((4, 1), np.float32)
    for i in range(6):
        for j in range(i + 1, 6):
            want[:, 0] += np.sum(x[:, i] * x[:, j], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_crossnet_vector(rng):
    x = rng.normal(size=(4, 10)).astype(np.float32)
    p = interactions.crossnet_init(jax.random.PRNGKey(6), 10, layer_num=2)
    got = np.asarray(interactions.crossnet_apply(p, jnp.asarray(x)))
    x0 = x[:, :, None]
    xl = x0
    for i in range(2):
        w = np.asarray(p["kernels"][i])  # [10,1]
        xl_w = np.einsum("bil,io->bol", xl, w)  # [B,1,1]
        xl = x0 * xl_w + np.asarray(p["bias"][i]) + xl
    np.testing.assert_allclose(got, xl[:, :, 0], rtol=1e-4, atol=1e-4)


def test_cin_output_dim(rng):
    x = rng.normal(size=(3, 7, 5)).astype(np.float32)
    p = interactions.cin_init(jax.random.PRNGKey(7), 7, (8, 4))
    out = interactions.cin_apply(p, jnp.asarray(x), (8, 4))
    assert out.shape == (3, interactions.cin_output_dim((8, 4)))
    assert out.shape[1] == 8 // 2 + 4


def test_cin_matches_bruteforce(rng):
    """One CIN layer, no split: x^1_s = act(sum_{h,m} W[s,h,m] x0_h * x0_m)."""
    B, F, d = 2, 4, 3
    x = rng.normal(size=(B, F, d)).astype(np.float32)
    p = interactions.cin_init(jax.random.PRNGKey(8), F, (5,), split_half=False)
    got = np.asarray(interactions.cin_apply(p, jnp.asarray(x), (5,),
                                            split_half=False))
    w = np.asarray(p["convs"][0]["w"]).reshape(F, F, 5)
    b = np.asarray(p["convs"][0]["b"])
    z = np.einsum("bhd,bmd->bhmd", x, x)
    feat = np.einsum("bhmd,hms->bsd", z, w) + b[None, :, None]
    feat = np.maximum(feat, 0)
    np.testing.assert_allclose(got, feat.sum(-1), rtol=1e-4, atol=1e-4)


def test_senet_and_bilinear_shapes(rng):
    x = rng.normal(size=(4, 6, 8)).astype(np.float32)
    ps = interactions.senet_init(jax.random.PRNGKey(9), 6)
    assert interactions.senet_apply(ps, jnp.asarray(x)).shape == (4, 6, 8)
    pb = interactions.bilinear_init(jax.random.PRNGKey(10), 6, 8)
    assert interactions.bilinear_apply(pb, jnp.asarray(x)).shape == (4, 15, 8)


def test_inner_product(rng):
    x = rng.normal(size=(2, 4, 3)).astype(np.float32)
    got = np.asarray(interactions.inner_product(jnp.asarray(x)))
    want = []
    for i in range(4):
        for j in range(i + 1, 4):
            want.append(np.sum(x[:, i] * x[:, j], -1))
    np.testing.assert_allclose(got, np.stack(want, 1), rtol=1e-4, atol=1e-4)


def test_afm_shape(rng):
    x = rng.normal(size=(4, 5, 8)).astype(np.float32)
    p = interactions.afm_init(jax.random.PRNGKey(11), 8)
    assert interactions.afm_apply(p, jnp.asarray(x)).shape == (4, 1)


def test_packed_gather_custom_vjp_grads(rng):
    """Sorted/segment-summed scatter grad == plain gather grad."""
    import jax
    import jax.numpy as jnp
    from satrans_tpu import embeddings

    R, d = 64, 8
    bank = rng.normal(size=(R, d)).astype(np.float32)
    ids = rng.integers(0, R, size=37).astype(np.int32)
    ids[5:12] = ids[0]  # force duplicates

    def loss_custom(b):
        return jnp.sum(jnp.sin(embeddings._gather_packed(b, jnp.asarray(ids))))

    def loss_plain(b):
        return jnp.sum(jnp.sin(b[jnp.asarray(ids)]))

    g1 = jax.grad(loss_custom)(jnp.asarray(bank))
    g2 = jax.grad(loss_plain)(jnp.asarray(bank))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)


def test_lookup_rows_grads_match_direct(rng):
    """End-to-end lookup_rows grad (packed layout + quarter select)."""
    import jax
    import jax.numpy as jnp
    from satrans_tpu import embeddings
    from satrans_tpu.features import FeatureLayout, SparseFeature

    # vocab above SMALL_TABLE_THRESHOLD so the packed-gather path is tested
    layout = FeatureLayout([SparseFeature("f", 1000, 8)])
    params = embeddings.bank_init(jax.random.PRNGKey(0), layout)
    ids = jnp.asarray(rng.integers(0, 1000, size=(16, 1)).astype(np.int32))

    def loss(p):
        return jnp.sum(jnp.square(embeddings.lookup_sparse(p, layout, ids)))

    g = jax.grad(loss)(params)
    # numerical check on a couple of entries
    eps = 1e-3
    flat = params["bank"]
    i, j = int(ids[0, 0]) // 16, 0
    p_plus = {"bank": flat.at[i, j].add(eps)}
    p_minus = {"bank": flat.at[i, j].add(-eps)}
    fd = (loss(p_plus) - loss(p_minus)) / (2 * eps)
    np.testing.assert_allclose(float(g["bank"][i, j]), float(fd), rtol=1e-2,
                               atol=1e-4)


def test_small_table_storage_fwd_and_grads(rng):
    """Small tables in the side bank: values and grads match a monolithic
    reference implementation."""
    import jax
    import jax.numpy as jnp
    from satrans_tpu import embeddings
    from satrans_tpu.features import FeatureLayout, SparseFeature

    cols = [SparseFeature("big", 5000, 8), SparseFeature("tiny", 7, 8),
            SparseFeature("big2", 3000, 8), SparseFeature("tiny2", 250, 8)]
    layout = FeatureLayout(cols)
    split = layout.small_split(256)
    assert split["small_idx"] == [1, 3] and split["large_idx"] == [0, 2]
    assert split["small_rows"] == 7 + 250
    params = embeddings.bank_init(jax.random.PRNGKey(0), layout)
    assert params["small"].shape == (257, 8)

    ids = np.stack([rng.integers(1, 5000, 20), rng.integers(1, 7, 20),
                    rng.integers(1, 3000, 20), rng.integers(1, 250, 20)],
                   axis=1).astype(np.int32)
    ids_j = jnp.asarray(ids)

    emb = np.asarray(embeddings.lookup_sparse(params, layout, ids_j))
    # field order preserved; values come from the right banks
    big_bank = np.asarray(embeddings.bank_logical(params, 8))
    np.testing.assert_allclose(emb[:, 0], big_bank[ids[:, 0]], rtol=1e-6)
    small = np.asarray(params["small"])
    np.testing.assert_allclose(emb[:, 1], small[ids[:, 1]], rtol=1e-6)
    np.testing.assert_allclose(emb[:, 3], small[7 + ids[:, 3]], rtol=1e-6)

    # grads: small-bank grad is dense and matches a take-based oracle
    def loss(p):
        return jnp.sum(jnp.sin(embeddings.lookup_sparse(p, layout, ids_j)))

    g = jax.grad(loss)(params)
    want_small = np.zeros_like(small)
    cos_emb = np.cos(emb)
    for b in range(20):
        want_small[ids[b, 1]] += cos_emb[b, 1]
        want_small[7 + ids[b, 3]] += cos_emb[b, 3]
    np.testing.assert_allclose(np.asarray(g["small"]), want_small,
                               rtol=1e-4, atol=1e-5)

    # lookup_field routes to the right bank for both classes
    one = np.asarray(embeddings.lookup_field(params, layout, "tiny",
                                             jnp.asarray(ids[:, 1])))
    np.testing.assert_allclose(one, small[ids[:, 1]], rtol=1e-6)
    one_big = np.asarray(embeddings.lookup_field(params, layout, "big",
                                                 jnp.asarray(ids[:, 0])))
    np.testing.assert_allclose(one_big, big_bank[ids[:, 0]], rtol=1e-6)
