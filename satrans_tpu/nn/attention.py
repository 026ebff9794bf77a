"""Field-wise multi-head self-attention layers.

Covers the reference's three attention variants:

* :func:`interacting_*`      - deepctr-torch 0.2.9 ``InteractingLayer``
                               (AutoInt): no scaling, no dropout, no LayerNorm;
                               residual via ``W_Res``; ReLU after residual.
* :func:`self_attention_*`   - the reference's enhanced ``SelfAttention_Layer``
                               (models/submodules.py:178-238): adds 1/sqrt(dh)
                               scaling, attention+output dropout 0.1, and a
                               LayerNorm after the ReLU.  Used by the
                               ``usetrans`` flag in STAR/AdaSparse/MTL models.
* :func:`meta_transformer_*` - ``Meta_Transformer_Layer`` (models/satrans.py:
                               13-100), the SATrans core: shared W_Q/K/V, then
                               per ``meta_mode`` ('Q'/'K'/'V' chars) a MetaNet
                               with scenario-generated weights transforms the
                               projections; gate/bilinear variants; bias-free
                               output linear; residual from the RAW inputs;
                               LayerNorm ("important!", satrans.py:99).

Head split follows torch's ``torch.stack(torch.split(q, dh, dim=2))``:
``[B, F, d] -> [H, B, F, d/H]`` - equivalent to reshape+transpose here.

All weights init N(0, 0.05) including the post-residual LayerNorm of the meta
transformer layer (an intentional quirk of the reference: the LN is created
before the init loop, satrans.py:40-43).  MetaNet LNs keep torch defaults.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import core, initializers as init, metanet


def _split_heads(x, head_num: int):
    """[B, F, d] -> [B, H, F, d/H]"""
    b, f, d = x.shape
    return x.reshape(b, f, head_num, d // head_num).transpose(0, 2, 1, 3)


def _merge_heads(x):
    """[B, H, F, dh] -> [B, F, H*dh]"""
    b, h, f, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, f, h * dh)


def _mha(q, k, v, head_num: int, *, scaling: bool, attn_dropout: float,
         train: bool, rng):
    """Multi-head attention over the F field axis. Returns (out, scores)."""
    dh = q.shape[-1] // head_num
    qh, kh, vh = (_split_heads(t, head_num) for t in (q, k, v))
    scores = jnp.einsum("bhik,bhjk->bhij", qh, kh)
    if scaling:
        scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(
            scores.dtype)
    # softmax in fp32 for bf16 compute paths
    scores = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    scores = scores.astype(q.dtype)
    if attn_dropout > 0.0 and train:
        scores = core.dropout(scores, attn_dropout, train, rng)
    out = jnp.einsum("bhij,bhjk->bhik", scores, vh)
    return _merge_heads(out), scores


# ---------------------------------------------------------------------------
# deepctr InteractingLayer (AutoInt)
# ---------------------------------------------------------------------------

def interacting_init(key, dim: int, *, use_res: bool = True, std: float = 0.05):
    ks = jax.random.split(key, 4)
    p = {"wq": init.normal(ks[0], (dim, dim), std),
         "wk": init.normal(ks[1], (dim, dim), std),
         "wv": init.normal(ks[2], (dim, dim), std)}
    if use_res:
        p["wres"] = init.normal(ks[3], (dim, dim), std)
    return p


def interacting_apply(p, x, head_num: int):
    q, k, v = x @ p["wq"], x @ p["wk"], x @ p["wv"]
    out, _ = _mha(q, k, v, head_num, scaling=False, attn_dropout=0.0,
                  train=False, rng=None)
    if "wres" in p:
        out = out + x @ p["wres"]
    return jax.nn.relu(out)


# ---------------------------------------------------------------------------
# SelfAttention_Layer (reference submodules.py:178-238)
# ---------------------------------------------------------------------------

def self_attention_init(key, dim: int, *, use_res: bool = True, std: float = 0.05):
    ks = jax.random.split(key, 6)
    p = {"wq": init.normal(ks[0], (dim, dim), std),
         "wk": init.normal(ks[1], (dim, dim), std),
         "wv": init.normal(ks[2], (dim, dim), std),
         # The init loop runs over *all* parameters incl. the LayerNorm
         # (submodules.py:203-204) - honored here for accuracy parity.
         "ln": core.layer_norm_init(
             ks[3], dim,
             weight_init=lambda k, s: init.normal(k, s, std),
             bias_init=lambda k, s: init.normal(k, s, std))}
    if use_res:
        p["wres"] = init.normal(ks[4], (dim, dim), std)
    return p


def self_attention_apply(p, x, head_num: int, *, scaling: bool = True,
                         dropout_rate: float = 0.1, train: bool = False,
                         rng=None, return_scores: bool = False):
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    q, k, v = x @ p["wq"], x @ p["wk"], x @ p["wv"]
    out, scores = _mha(q, k, v, head_num, scaling=scaling,
                       attn_dropout=dropout_rate, train=train, rng=r1)
    out = core.dropout(out, dropout_rate, train, r2)
    if "wres" in p:
        out = out + x @ p["wres"]
    out = jax.nn.relu(out)
    out = core.layer_norm_apply(p["ln"], out)
    if return_scores:
        return out, scores
    return out


# ---------------------------------------------------------------------------
# Meta_Transformer_Layer (reference satrans.py:13-100)
# ---------------------------------------------------------------------------

def meta_transformer_init(key, dim: int, meta_units: Sequence[int], *,
                          variant: str = "metanet", share_kv_metanet: bool = True,
                          std: float = 0.05):
    """``variant`` in {'metanet', 'gate', 'bilinear'}; ``share_kv_metanet``
    mirrors the 'pos' flag (satrans.py:44-47): without 'pos', K and V reuse
    Q's MetaNet LayerNorm; with 'pos' each gets its own."""
    ks = jax.random.split(key, 8)
    p = {"wq": init.normal(ks[0], (dim, dim), std),
         "wk": init.normal(ks[1], (dim, dim), std),
         "wv": init.normal(ks[2], (dim, dim), std),
         "wout": init.normal(ks[3], (dim, dim), std),
         # Quirk: this LN is inside the reference's init loop (satrans.py:40-43).
         "ln": core.layer_norm_init(
             ks[4], dim,
             weight_init=lambda k, s: init.normal(k, s, std),
             bias_init=lambda k, s: init.normal(k, s, std))}
    if variant == "metanet":
        p["q_meta"] = metanet.init(ks[5], dim, use_norm=True)
        if not share_kv_metanet:
            p["k_meta"] = metanet.init(ks[6], dim, use_norm=True)
            # Quirk, kept deliberately: initialized but NEVER applied -
            # the reference's V_meta_mlp (satrans.py:48) is dead weight
            # too (its forward checks only 'Q'/'K' in mode, satrans.py:
            # 60-73), and meta_transformer_apply matches.  Kept so param
            # trees/checkpoints mirror the reference's state_dict shape.
            p["v_meta"] = metanet.init(ks[7], dim, use_norm=True)
    return p


def meta_transformer_apply(
        p, x, meta_params, meta_units: Sequence[int], *,
        mode: str = "QK", head_num: int = 4, variant: str = "metanet",
        use_res: bool = True, scaling: bool = True, relu_out: bool = False,
        dropout_rate: float = 0.1, train: bool = False, rng=None,
        domain_ids=None, dense_select: bool = False,
        return_scores: bool = False):
    """One SATrans block.

    ``meta_params``: dict with keys 'Q','K','V' (and 'bilinear' for that
    variant).  Each value is either per-example ``[B, P]`` flat params, or -
    when ``domain_ids`` is given - per-domain ``[D, P]`` (the fast path; see
    :mod:`satrans_tpu.nn.metanet`).

    ``mode`` is the reference's ``meta_mode`` string: a projection is
    transformed iff its letter appears (satrans.py:60-73; note the reference
    never transforms V in the metanet variant - only Q and K - and we match).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rq, rk, rattn, rout = jax.random.split(rng, 4)

    q, k, v = x @ p["wq"], x @ p["wk"], x @ p["wv"]

    def transform(t, params, ln_params, r):
        if variant == "gate":
            # t * g * 2, g broadcast over fields (satrans.py:61-62)
            g = params if domain_ids is None else params[domain_ids]
            return t * g[:, None, :] * 2.0
        if variant == "bilinear":
            return t  # applied after head split
        if domain_ids is None:
            return metanet.apply_flat(ln_params, t, params, meta_units,
                                      dropout_rate=dropout_rate, train=train,
                                      rng=r)
        return metanet.apply_domainwise(ln_params, t, domain_ids, params,
                                        meta_units, dropout_rate=dropout_rate,
                                        train=train, rng=r,
                                        dense_select=dense_select)

    q_meta = p.get("q_meta", {})
    k_meta = p.get("k_meta", q_meta)
    if "Q" in mode:
        q = transform(q, meta_params["Q"], q_meta, rq)
    if "K" in mode:
        k = transform(k, meta_params["K"], k_meta, rk)

    if variant == "bilinear":
        # Per-head bilinear map on Q (satrans.py:79-81).
        dh = q.shape[-1] // head_num
        bp = meta_params["bilinear"]
        if domain_ids is not None:
            bp = bp[domain_ids]
        w = bp.reshape(-1, head_num, dh, dh)
        qh = _split_heads(q, head_num)  # [B,H,F,dh]
        qh = jnp.einsum("bhfk,bhkl->bhfl", qh, w)
        q = _merge_heads(qh)

    out, scores = _mha(q, k, v, head_num, scaling=scaling,
                       attn_dropout=dropout_rate, train=train, rng=rattn)
    out = out @ p["wout"]  # bias-free Out_linear (satrans.py:35)
    if relu_out:  # 'relu' flag (satrans.py:91-92)
        out = jax.nn.relu(out)
    out = core.dropout(out, dropout_rate, train, rout)
    if use_res:
        out = out + x
    out = core.layer_norm_apply(p["ln"], out)
    if return_scores:
        return out, scores
    return out
