"""End-to-end numerical parity oracle for the full SATrans train step.

Two independent re-derivations of the whole pipeline (VERDICT r1 item 3):

* a PURE-NUMPY forward of SATrans (embeddings incl. packed/side-bank split
  and varlen max-pooling, scenario encoder, MetaNet-transformed Q/K
  attention stack, head) checked against ``model.apply`` and
  ``Trainer.predict``;
* a torch-CPU replica of the same forward whose BCE-sum + full-table-L2
  loss is differentiated by torch autograd and stepped by
  ``torch.optim.Adam`` - the reference's own framework semantics
  (reference models/basemodel.py:316-319, 519-535, compile at :554-560) -
  checked against one jitted Trainer train step for EVERY parameter, in
  both ``bank_update='dense'`` and ``'fused'`` modes.

Dropout is set to 0 so the step is PRNG-free (the in-step dropout math is
covered by tests/test_pallas_meta_block.py and test_nn_golden.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from satrans_tpu import embeddings
from satrans_tpu.features import (FeatureLayout, SparseFeature,
                                  VarLenSparseFeature)
from satrans_tpu.models import SATrans
from satrans_tpu.train import Trainer

D_EMB = 8
LR = 0.01
L2 = 1e-4
META_UNITS = [D_EMB, 16, D_EMB]
LAYERS = 2
HEADS = 2
B = 64


def _layout():
    cols = [SparseFeature("f0", 300, D_EMB),
            SparseFeature("f1", 500, D_EMB),
            SparseFeature("domain", 5, D_EMB),   # vocab<=256 -> side bank
            VarLenSparseFeature("hist", 300, D_EMB, 3, "max")]
    return FeatureLayout(cols)


def _model(layout):
    return SATrans(layout=layout, domain_cols=["domain"],
                   num_domains_list=[3], domain_att_layer_num=LAYERS,
                   att_head_num=HEADS, meta_mode="QK",
                   meta_dnn_hidden_units=tuple(META_UNITS[1:]),
                   l2_reg_embedding=L2, dropout_rate=0.0)


def _data(n=B, seed=0):
    rng = np.random.default_rng(seed)
    x = {"f0": rng.integers(1, 300, n), "f1": rng.integers(1, 500, n),
         "domain": rng.integers(1, 4, n),
         "hist": rng.integers(0, 300, (n, 3))}
    y = rng.integers(0, 2, n).astype(np.float32)
    return x, y


# ---------------------------------------------------------------------------
# shared forward structure, written per-backend (numpy / torch)
# ---------------------------------------------------------------------------

def _split_info(layout):
    s = layout.small_split(embeddings.SMALL_TABLE_THRESHOLD)
    return s


def _np_forward(params, layout, batch):
    """Pure-numpy SATrans forward (train=False, dropout 0)."""
    p = jax.tree.map(np.asarray, params)
    sp = batch["sparse"]
    info = _split_info(layout)
    bank = p["emb"]["bank"].reshape(-1, D_EMB)       # logical rows
    small = p["emb"]["small"]

    def ln(x, scale, bias, eps=1e-6):
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        return (x - m) / np.sqrt(v + eps) * scale + bias

    # field embeddings in declaration order (embeddings.embed_fields)
    fields = []
    for i, c in enumerate(layout.sparse):
        if i in info["small_idx"]:
            off = int(info["small_offsets"][info["small_idx"].index(i)])
            fields.append(small[sp[:, i] + off])
        else:
            off = int(info["large_offsets"][info["large_idx"].index(i)])
            fields.append(bank[sp[:, i] + off])
    for j, c in enumerate(layout.varlen):
        ids = batch["varlen"][:, j]                   # [B, L]
        e = bank[ids + int(info["varlen_offsets"][j])]  # [B, L, d]
        e = np.where((ids > 0)[..., None], e, -np.inf)
        pooled = e.max(axis=1)
        pooled = np.where(np.isfinite(pooled), pooled, 0.0)
        fields.append(pooled)
    x = np.stack(fields, axis=1)                      # [B, F, d]

    dom = sp[:, layout.sparse_index("domain")]
    table = np.maximum(p["domain_emb"], 0.0)          # relu
    enc = p["encoder"]["layers"][0]
    vec_table = table @ enc["w"] + enc["b"]           # [D+1, P]
    flat = vec_table[dom]                             # [B, P]
    n1 = META_UNITS[0] * META_UNITS[1]
    w1 = flat[:, :n1].reshape(B, META_UNITS[0], META_UNITS[1])
    w2 = flat[:, n1:n1 + META_UNITS[1] * META_UNITS[2]].reshape(
        B, META_UNITS[1], META_UNITS[2])

    def metanet(t, lp):
        h = np.einsum("bfi,bio->bfo", t, w1)
        h = np.maximum(h, 0.0)
        h = np.einsum("bfi,bio->bfo", h, w2)
        return ln(h + t, lp["ln"]["scale"], lp["ln"]["bias"])

    dh = D_EMB // HEADS
    for lp in p["layers"]:
        q, k, v = x @ lp["wq"], x @ lp["wk"], x @ lp["wv"]
        q = metanet(q, lp["q_meta"])
        k = metanet(k, lp["q_meta"])                  # shared (non-pos)
        bsz, f, _ = q.shape

        def heads(t):
            return t.reshape(bsz, f, HEADS, dh).transpose(0, 2, 1, 3)

        s = np.einsum("bhik,bhjk->bhij", heads(q), heads(k)) / np.sqrt(dh)
        s = np.exp(s - s.max(-1, keepdims=True))
        s = s / s.sum(-1, keepdims=True)
        o = np.einsum("bhij,bhjk->bhik", s, heads(v))
        o = o.transpose(0, 2, 1, 3).reshape(bsz, f, D_EMB)
        x = ln(o @ lp["wout"] + x, lp["ln"]["scale"], lp["ln"]["bias"])

    logit = x.reshape(B, -1) @ p["head"]["w"] + p["head"]["b"]
    return 1.0 / (1.0 + np.exp(-logit[:, 0]))


def _torch_step(params, layout, batch, y):
    """Torch replica + autograd + torch.optim.Adam: one full train step.
    Returns (post-step params pytree as numpy, loss value)."""
    import torch

    info = _split_info(layout)
    t = jax.tree.map(
        lambda a: torch.tensor(np.asarray(a), requires_grad=True), params)
    sp = torch.tensor(np.asarray(batch["sparse"]), dtype=torch.long)
    vl = torch.tensor(np.asarray(batch["varlen"]), dtype=torch.long)
    yy = torch.tensor(y)

    def ln(x, lp):
        m = x.mean(-1, keepdim=True)
        v = ((x - m) ** 2).mean(-1, keepdim=True)
        return (x - m) / torch.sqrt(v + 1e-6) * lp["ln"]["scale"] \
            + lp["ln"]["bias"]

    bank = t["emb"]["bank"].reshape(-1, D_EMB)
    fields = []
    for i, c in enumerate(layout.sparse):
        if i in info["small_idx"]:
            off = int(info["small_offsets"][info["small_idx"].index(i)])
            fields.append(t["emb"]["small"][sp[:, i] + off])
        else:
            off = int(info["large_offsets"][info["large_idx"].index(i)])
            fields.append(bank[sp[:, i] + off])
    for j, c in enumerate(layout.varlen):
        ids = vl[:, j]
        e = bank[ids + int(info["varlen_offsets"][j])]
        e = torch.where((ids > 0)[..., None], e,
                        torch.tensor(float("-inf")))
        pooled = e.max(dim=1).values
        pooled = torch.where(torch.isfinite(pooled), pooled,
                             torch.tensor(0.0))
        fields.append(pooled)
    x = torch.stack(fields, dim=1)

    dom = sp[:, layout.sparse_index("domain")]
    table = torch.relu(t["domain_emb"])
    enc = t["encoder"]["layers"][0]
    vec = (table @ enc["w"] + enc["b"])[dom]
    n1 = META_UNITS[0] * META_UNITS[1]
    w1 = vec[:, :n1].reshape(B, META_UNITS[0], META_UNITS[1])
    w2 = vec[:, n1:].reshape(B, META_UNITS[1], META_UNITS[2])

    def metanet(q, lp):
        h = torch.einsum("bfi,bio->bfo", q, w1)
        h = torch.relu(h)
        h = torch.einsum("bfi,bio->bfo", h, w2)
        return ln(h + q, lp)

    dh = D_EMB // HEADS
    for lp in t["layers"]:
        q, k, v = x @ lp["wq"], x @ lp["wk"], x @ lp["wv"]
        q = metanet(q, lp["q_meta"])
        k = metanet(k, lp["q_meta"])
        bsz, f, _ = q.shape

        def heads(u):
            return u.reshape(bsz, f, HEADS, dh).permute(0, 2, 1, 3)

        s = torch.einsum("bhik,bhjk->bhij", heads(q), heads(k)) \
            / (dh ** 0.5)
        s = torch.softmax(s, dim=-1)
        o = torch.einsum("bhij,bhjk->bhik", s, heads(v))
        o = o.permute(0, 2, 1, 3).reshape(bsz, f, D_EMB)
        x = ln(o @ lp["wout"] + x, lp)

    logit = x.reshape(B, -1) @ t["head"]["w"] + t["head"]["b"]
    pred = torch.sigmoid(logit[:, 0])
    loss = torch.nn.functional.binary_cross_entropy(
        pred, yy, reduction="sum")
    reg = L2 * ((t["emb"]["bank"] ** 2).sum()
                + (t["emb"]["small"] ** 2).sum())
    total = loss + reg

    leaves = jax.tree_util.tree_leaves(t)
    opt = torch.optim.Adam(leaves, lr=LR, betas=(0.9, 0.999), eps=1e-8)
    opt.zero_grad()
    total.backward()
    opt.step()
    return (jax.tree.map(lambda a: a.detach().numpy(), t),
            float(loss), float(reg))


@pytest.fixture(scope="module")
def setup():
    layout = _layout()
    model = _model(layout)
    params, state = model.init(jax.random.PRNGKey(3))
    x, y = _data()
    batch = {k: jnp.asarray(v)
             for k, v in layout.batch_from_dict(x).items()}
    return layout, model, params, state, x, y, batch


def test_numpy_forward_oracle(setup):
    layout, model, params, state, x, y, batch = setup
    want = _np_forward(params, layout, batch)
    got, _, _ = model.apply(params, state, batch)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6, rtol=1e-5)
    # and through the Trainer predict path (padding + routing)
    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=LR)
    tr.params, tr.state = params, state
    np.testing.assert_allclose(tr.predict(x, batch_size=B), want,
                               atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("mode", ["dense", "fused"])
def test_full_train_step_matches_torch_adam(setup, mode):
    layout, model, params, state, x, y, batch = setup
    want, want_loss, want_reg = _torch_step(params, layout, batch, y)

    tr = Trainer(model, seed=0)
    tr.compile(learning_rate=LR, bank_update=mode)
    tr._strategy = tr._resolve_strategy(None)
    # deep copies: the jitted train step donates params/opt_state/state
    # buffers, and the module-scoped fixture must survive both parametrized
    # runs (jnp.asarray would alias, and the donation would delete it)
    tr.params = jax.tree.map(lambda a: jnp.array(np.asarray(a)), params)
    tr.state = jax.tree.map(lambda a: jnp.array(np.asarray(a)), state)
    tr._resolve_bank_mode()
    assert tr._bank_mode == mode
    from satrans_tpu.train import bank_optimizer
    tr.opt_state = (bank_optimizer.lazy_init(tr.optimizer, tr.params)
                    if mode == "lazy" else tr.optimizer.init(tr.params))
    tr._build_steps()
    w = jnp.ones((B,), jnp.float32)
    new_params, _, _, stats = tr._train_step(
        tr.params, tr.opt_state, tr.state, batch, jnp.asarray(y), w,
        jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(stats["loss"]), want_loss, rtol=1e-5)
    np.testing.assert_allclose(float(stats["reg_loss"]), want_reg,
                               rtol=1e-5)
    flat_want, treedef_w = jax.tree_util.tree_flatten(want)
    flat_got, treedef_g = jax.tree_util.tree_flatten(
        jax.tree.map(np.asarray, new_params))
    assert treedef_w == treedef_g
    # f32 gradient roundoff is amplified by Adam's first step (update ~
    # g/(|g|+eps) acts sign-like for small g): measured cross-framework
    # deviation is <=3e-5 absolute; a formula error shows up at O(lr)=1e-2.
    for a, b in zip(flat_want, flat_got):
        np.testing.assert_allclose(b, a, atol=5e-5, rtol=1e-3)
