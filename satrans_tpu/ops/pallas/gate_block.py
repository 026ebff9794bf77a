"""Fused SATrans layer kernels for the 'gate' and 'bilinear' variants.

The published MetaNet variant rides :mod:`.meta_block`; the reference's two
simpler scenario-transform variants (reference satrans.py:61-81):

- ``gate``   - ``Q = Q0 * g_Q[dom] * 2`` (and K likewise when 'K' is in the
  meta mode): a per-domain d-vector gate, broadcast over fields.  No
  MetaNet, no per-projection LayerNorm (satrans.py:61-66).
- ``bilinear`` - a per-(domain, head) ``[dh, dh]`` map applied to Q AFTER
  the head split, K/V untouched (satrans.py:79-81).  Per-head maps on
  8-lane slices are exactly the relayout trap the masked-head attention
  avoids, so the kernel applies the equivalent BLOCK-DIAGONAL full-width
  ``[d, d]`` matrix with the same masked wide-GEMM trick as
  ``meta_block._meta_apply`` (minus the relu): the per-domain block-diag
  matrices sit side by side in ``[d, D*d]``, the row's own domain block is
  selected by a 0/1 mask, and a stacked-identity GEMM folds ``[N, D*d]``
  back to ``[N, d]``.

Everything downstream of the transform (block-diagonal-packed masked-head
attention, Wout, dropout, residual, outer LayerNorm, optional relu-out) is
shared with the metanet kernel via its module-level helpers.  The backward
is recompute-style only (the round-1 meta_block design): these variants are
not the published headline, so the stash machinery's extra surface isn't
carried here; the forward recompute is ~40% of the metanet one (no MetaNet
GEMMs, no Q/K LayerNorms).

Dropout draw order (fwd == bwd, in-kernel PRNG): per-head attention masks,
then the output mask - the gate/bilinear transforms have NO dropout site
(reference applies dropout only inside MetaNet, satrans.py:16-27).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .meta_block import (F32, _attention, _attn_bwd_heads, _attn_group,
                         _block_mask, _clip_logits, _dropout_mask,
                         _expand_const, _interp_prng_scope, _layer_norm_bwd,
                         _layer_norm_fwd, _prng_seed, _softmax_lastdim,
                         _attn_variant, _head_masks)


def _identity_stack(D: int, d: int):
    """[D*d, d] vertical stack of D identity matrices: folds the masked
    [N, D*d] per-domain blocks back to [N, d] (sum over domains; all but
    the own-domain block are exact zeros)."""
    rr = jax.lax.broadcasted_iota(jnp.int32, (D * d, d), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (D * d, d), 1)
    return (rr % d == cc).astype(F32)


def _transform(t0, t_ref, onehot_rows, *, variant: str, D: int, d: int):
    """Apply the variant's scenario transform to one projection.

    gate: ``t0 * (onehot @ G) * 2`` (G rows are the per-domain gates).
    bilinear: masked wide GEMM against the per-domain block-diag maps.
    Returns ``(t, aux)`` where ``aux`` is what the backward needs
    (the gate rows, resp. the masked hidden block)."""
    if variant == "gate":
        rows = jnp.dot(onehot_rows, t_ref[:],
                       preferred_element_type=F32)      # [N, d]
        return t0 * rows * 2.0, rows
    # bilinear: t_ref is w1cat [d, D*d] (block-diag maps side by side)
    mask = jnp.dot(onehot_rows, _expand_const(D, d),
                   preferred_element_type=F32)          # [N, D*d]
    hm = jnp.dot(t0, t_ref[:], preferred_element_type=F32) * mask
    y = jnp.dot(hm, _identity_stack(D, d), preferred_element_type=F32)
    # aux is just the mask: the recompute backward never reads hm, so
    # returning it would only widen the kernel's live set
    return y, mask


def _transform_bwd(dt, t0, aux, t_ref, *, variant: str, D: int, d: int,
                   onehot_rows):
    """Returns ``(dt0, dtable)`` for one transformed projection."""
    if variant == "gate":
        rows = aux
        dt0 = dt * rows * 2.0
        dtable = jnp.dot(onehot_rows.T, dt * t0 * 2.0,
                         preferred_element_type=F32)    # [D, d]
        return dt0, dtable
    mask = aux
    dhm = jnp.dot(dt, _identity_stack(D, d).T,
                  preferred_element_type=F32) * mask    # [N, D*d]
    dt0 = jnp.dot(dhm, t_ref[:].T, preferred_element_type=F32)
    dtable = jnp.dot(t0.T, dhm, preferred_element_type=F32)  # [d, D*d]
    return dt0, dtable


def _sfwd_kernel(seed_ref, dom_ref, x_ref, wqkv_ref, tq_ref, tk_ref,
                 wout_ref, lno_ref, mask_ref, out_ref, *,
                 D: int, head_num: int, drop_rate: float, train: bool,
                 variant: str, apply_q: bool, apply_k: bool, relu_out: bool,
                 f_real: int | None = None, attn_cap: int | None = None):
    TB, F_, d = x_ref.shape
    N = TB * F_
    if train and drop_rate > 0.0:
        _prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(F32)
    x2 = x.reshape(N, d)
    onehot = dom_ref[:]
    onehot_rows = jnp.broadcast_to(onehot[:, None, :],
                                   (TB, F_, onehot.shape[1])
                                   ).reshape(N, onehot.shape[1])
    qkv = jnp.dot(x2, wqkv_ref[:], preferred_element_type=F32)
    q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    q = _transform(q0, tq_ref, onehot_rows, variant=variant, D=D, d=d)[0] \
        if apply_q else q0
    k = _transform(k0, tk_ref, onehot_rows, variant=variant, D=D, d=d)[0] \
        if apply_k else k0
    o, _ = _attention(q.reshape(TB, F_, d), k.reshape(TB, F_, d),
                      v0.reshape(TB, F_, d), head_num, F_, d,
                      drop_rate=drop_rate, train=train, f_real=f_real,
                      attn_cap=attn_cap, mask=mask_ref[:])
    z = jnp.dot(o.reshape(N, d), wout_ref[:], preferred_element_type=F32)
    if relu_out:
        z = jax.nn.relu(z)
    if train and drop_rate > 0.0:
        z = z * _dropout_mask(z.shape, drop_rate)
    u = z.reshape(TB, F_, d) + x
    y, _, _ = _layer_norm_fwd(u, lno_ref[0], lno_ref[1])
    out_ref[:] = y.astype(out_ref.dtype)


def _sbwd_kernel(seed_ref, dom_ref, x_ref, wqkv_ref, tq_ref, tk_ref,
                 wout_ref, lno_ref, mask_ref, g_ref,
                 dx_ref, dwqkv_ref, dtq_ref, dtk_ref, dwout_ref, dlno_ref,
                 *, D: int, head_num: int, drop_rate: float, train: bool,
                 variant: str, apply_q: bool, apply_k: bool, relu_out: bool,
                 f_real: int | None = None, attn_cap: int | None = None):
    TB, F_, d = x_ref.shape
    N = TB * F_
    dh = d // head_num
    scale = 1.0 / math.sqrt(dh)
    use_drop = train and drop_rate > 0.0

    # regenerate dropout masks in the forward draw order (s heads, then z)
    if use_drop:
        _prng_seed(seed_ref[0] + pl.program_id(0))
        g_attn0 = _attn_group(TB, F_, attn_cap)
        m_s = [_dropout_mask((TB // g_attn0, g_attn0 * F_, g_attn0 * F_),
                             drop_rate) for _ in range(head_num)]
        m_z = _dropout_mask((N, d), drop_rate)

    x = x_ref[:].astype(F32)
    x2 = x.reshape(N, d)
    onehot = dom_ref[:]
    onehot_rows = jnp.broadcast_to(onehot[:, None, :],
                                   (TB, F_, onehot.shape[1])
                                   ).reshape(N, onehot.shape[1])
    wqkv = wqkv_ref[:]
    wout = wout_ref[:]

    # ---- recompute forward ----
    qkv = jnp.dot(x2, wqkv, preferred_element_type=F32)
    q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    if apply_q:
        q, aux_q = _transform(q0, tq_ref, onehot_rows, variant=variant,
                              D=D, d=d)
    else:
        q, aux_q = q0, None
    if apply_k:
        k, aux_k = _transform(k0, tk_ref, onehot_rows, variant=variant,
                              D=D, d=d)
    else:
        k, aux_k = k0, None

    g_attn = _attn_group(TB, F_, attn_cap)
    groups = TB // g_attn
    n_attn = g_attn * F_
    q3 = (q.reshape(TB, F_, d) * scale).reshape(groups, n_attn, d)
    k3 = k.reshape(groups, n_attn, d)
    v3 = v0.reshape(groups, n_attn, d)
    blk_mask = mask_ref[:]
    masked_attn = _attn_variant() == "masked"
    hm = _head_masks(d, head_num) if masked_attn else None
    s_list, sm_list, o_parts = [], [], []
    for hd in range(head_num):
        sl = slice(hd * dh, (hd + 1) * dh)
        if masked_attn:
            qh, kh, vh = q3 * hm[hd], k3, v3 * hm[hd]
        else:
            qh, kh, vh = q3[..., sl], k3[..., sl], v3[..., sl]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=F32)
        s = _softmax_lastdim(_clip_logits(s) + blk_mask)
        s_list.append(s)
        sm = s * m_s[hd] if use_drop else s
        sm_list.append(sm)
        o_parts.append(jax.lax.dot_general(sm, vh,
                                           (((2,), (1,)), ((0,), (0,))),
                                           preferred_element_type=F32))
    o3 = sum(o_parts) if masked_attn else jnp.concatenate(o_parts, axis=-1)
    o2 = o3.reshape(N, d)
    zlin = jnp.dot(o2, wout, preferred_element_type=F32)
    z = jax.nn.relu(zlin) if relu_out else zlin
    if use_drop:
        z = z * m_z
    u = z.reshape(TB, F_, d) + x
    _, xhat_o, inv_o = _layer_norm_fwd(u, lno_ref[0], lno_ref[1])

    # ---- backward ----
    g = g_ref[:].astype(F32)
    dlno_s = jnp.sum(g * xhat_o, axis=(0, 1))
    dlno_b = jnp.sum(g, axis=(0, 1))
    du = _layer_norm_bwd(g, xhat_o, inv_o, lno_ref[0])
    dx = du
    dz = du.reshape(N, d)
    if use_drop:
        dz = dz * m_z
    if relu_out:
        dz = dz * (zlin > 0).astype(F32)
    dwout = jnp.dot(o2.T, dz, preferred_element_type=F32)
    do2 = jnp.dot(dz, wout.T, preferred_element_type=F32)
    do3 = do2.reshape(groups, n_attn, d)
    dq3, dk3, dv3 = _attn_bwd_heads(do3, q3, k3, v3, s_list, sm_list,
                                    m_s if use_drop else None, use_drop,
                                    head_num, dh)
    dqt = (dq3.reshape(TB, F_, d) * scale).reshape(N, d)
    dkt = dk3.reshape(N, d)
    if apply_q:
        dq0, dtq = _transform_bwd(dqt, q0, aux_q, tq_ref, variant=variant,
                                  D=D, d=d, onehot_rows=onehot_rows)
    else:
        dq0, dtq = dqt, jnp.zeros(dtq_ref.shape, F32)
    if apply_k:
        dk0, dtk = _transform_bwd(dkt, k0, aux_k, tk_ref, variant=variant,
                                  D=D, d=d, onehot_rows=onehot_rows)
    else:
        dk0, dtk = dkt, jnp.zeros(dtk_ref.shape, F32)

    dqkv = jnp.concatenate([dq0, dk0, dv3.reshape(N, d)], axis=1)
    dwqkv = jnp.dot(x2.T, dqkv, preferred_element_type=F32)
    dx = dx + jnp.dot(dqkv, wqkv.T,
                      preferred_element_type=F32).reshape(TB, F_, d)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dtq_ref[:] = jnp.zeros_like(dtq_ref)
        dtk_ref[:] = jnp.zeros_like(dtk_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dlno_ref[:] = jnp.zeros_like(dlno_ref)

    dwqkv_ref[:] += dwqkv
    dtq_ref[:] += dtq
    dtk_ref[:] += dtk
    dwout_ref[:] += dwout
    dlno_ref[0] += dlno_s
    dlno_ref[1] += dlno_b


def _in_specs(block_b, F_, d, D, t_shape, mask_shape):
    return [
        pl.BlockSpec((block_b, D), lambda i, *_: (i, 0)),
        pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((d, 3 * d), lambda i, *_: (0, 0)),
        pl.BlockSpec(t_shape, lambda i, *_: (0, 0)),      # tq
        pl.BlockSpec(t_shape, lambda i, *_: (0, 0)),      # tk
        pl.BlockSpec((d, d), lambda i, *_: (0, 0)),       # wout
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),       # lno
        pl.BlockSpec(mask_shape, lambda i, *_: (0, 0, 0)),
    ]


def _sfwd_call(x, wqkv, tq, tk, wout, lno, onehot, seed, cfg):
    B, F_, d = x.shape
    (D, head_num, drop_rate, train, block_b, interpret, f_real, attn_cap,
     variant, apply_q, apply_k, relu_out) = cfg
    if B % block_b:
        raise ValueError(f"batch {B} must divide block_b {block_b}")
    g_att = _attn_group(block_b, F_, attn_cap)
    mask = _block_mask(block_b // g_att, g_att, F_,
                       f_real if f_real is not None else F_)
    kernel = functools.partial(
        _sfwd_kernel, D=D, head_num=head_num, drop_rate=drop_rate,
        train=train, variant=variant, apply_q=apply_q, apply_k=apply_k,
        relu_out=relu_out, f_real=f_real, attn_cap=attn_cap)
    with _interp_prng_scope(interpret):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // block_b,),
                in_specs=_in_specs(block_b, F_, d, D, tq.shape, mask.shape),
                out_specs=pl.BlockSpec((block_b, F_, d),
                                       lambda i, *_: (i, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((B, F_, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, onehot, x, wqkv, tq, tk, wout, lno, mask)


def _sbwd_call(x, wqkv, tq, tk, wout, lno, onehot, seed, g, cfg):
    B, F_, d = x.shape
    (D, head_num, drop_rate, train, block_b, interpret, f_real, attn_cap,
     variant, apply_q, apply_k, relu_out) = cfg
    g_att = _attn_group(block_b, F_, attn_cap)
    mask = _block_mask(block_b // g_att, g_att, F_,
                       f_real if f_real is not None else F_)
    kernel = functools.partial(
        _sbwd_kernel, D=D, head_num=head_num, drop_rate=drop_rate,
        train=train, variant=variant, apply_q=apply_q, apply_k=apply_k,
        relu_out=relu_out, f_real=f_real, attn_cap=attn_cap)
    in_specs = _in_specs(block_b, F_, d, D, tq.shape, mask.shape)
    in_specs.append(pl.BlockSpec((block_b, F_, d),
                                 lambda i, *_: (i, 0, 0)))  # g
    with _interp_prng_scope(interpret):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // block_b,),
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)),
                    pl.BlockSpec((d, 3 * d), lambda i, *_: (0, 0)),
                    pl.BlockSpec(tq.shape, lambda i, *_: (0, 0)),
                    pl.BlockSpec(tq.shape, lambda i, *_: (0, 0)),
                    pl.BlockSpec((d, d), lambda i, *_: (0, 0)),
                    pl.BlockSpec((2, d), lambda i, *_: (0, 0)),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, F_, d), x.dtype),
                jax.ShapeDtypeStruct((d, 3 * d), F32),
                jax.ShapeDtypeStruct(tq.shape, F32),
                jax.ShapeDtypeStruct(tq.shape, F32),
                jax.ShapeDtypeStruct((d, d), F32),
                jax.ShapeDtypeStruct((2, d), F32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, onehot, x, wqkv, tq, tk, wout, lno, mask, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _simple_layer(x, wqkv, tq, tk, wout, lno, onehot, seed, cfg):
    return _sfwd_call(x, wqkv, tq, tk, wout, lno, onehot, seed, cfg)


def _simple_layer_fwd(x, wqkv, tq, tk, wout, lno, onehot, seed, cfg):
    y = _sfwd_call(x, wqkv, tq, tk, wout, lno, onehot, seed, cfg)
    return y, (x, wqkv, tq, tk, wout, lno, onehot, seed)


def _simple_layer_bwd(cfg, res, g):
    x, wqkv, tq, tk, wout, lno, onehot, seed = res
    dx, dwqkv, dtq, dtk, dwout, dlno = _sbwd_call(
        x, wqkv, tq, tk, wout, lno, onehot, seed, g, cfg)
    return (dx, dwqkv, dtq, dtk, dwout, dlno, jnp.zeros_like(onehot),
            jnp.zeros_like(seed))


_simple_layer.defvjp(_simple_layer_fwd, _simple_layer_bwd)


def _pack_bilinear(table, D: int, d: int, head_num: int):
    """[D, H*dh*dh] flat per-(domain, head) maps -> [d, D*d] side-by-side
    block-diagonal matrices (differentiable; autodiff routes the kernel's
    dw1cat back to the flat table, dropping the off-block entries that the
    packing never reads)."""
    dh = d // head_num
    bp = table[:, :head_num * dh * dh].reshape(D, head_num, dh, dh)
    w = jnp.zeros((D, d, d), F32)
    for h_ in range(head_num):
        w = w.at[:, h_ * dh:(h_ + 1) * dh, h_ * dh:(h_ + 1) * dh].set(
            bp[:, h_])
    return w.transpose(1, 0, 2).reshape(d, D * d)


def fused_simple_layer_vjp(x, layer_params, meta_tables, domain_onehot, *,
                           variant: str, mode: str = "QK", head_num: int = 4,
                           drop_rate: float = 0.1, train: bool = False,
                           seed: int = 0, block_b: int = 128,
                           interpret: bool = False,
                           attn_cap: int | None = None,
                           relu_out: bool = False, pad_mult: int = 8):
    """Differentiable fused layer for ``variant`` in {'gate', 'bilinear'}.

    gate: Q/K gated iff their letter is in ``mode`` (reference
    satrans.py:61-66); ``meta_tables['Q']/['K']`` are [D, d] gates.
    bilinear: Q always mapped, K/V untouched (the reference applies the
    bilinear map outside the mode checks, satrans.py:79-81);
    ``meta_tables['bilinear']`` is the [D, H*dh*dh] flat per-head maps.
    """
    B, F_, d = x.shape
    D = domain_onehot.shape[1]
    if variant == "gate":
        apply_q, apply_k = "Q" in mode, "K" in mode
        tq = meta_tables["Q"][:, :d]
        # require an explicit K table whenever K is gated: silently reusing
        # Q's gate under 'pos' (distinct per-qkv tables) would be
        # wrong-but-plausible; tk is unread when apply_k is False.
        tk = meta_tables["K"][:, :d] if apply_k else tq
    elif variant == "bilinear":
        apply_q, apply_k = True, False
        tq = _pack_bilinear(meta_tables["bilinear"], D, d, head_num)
        tk = tq
    else:
        raise ValueError(f"unsupported variant {variant!r}")
    wqkv = jnp.concatenate([layer_params["wq"], layer_params["wk"],
                            layer_params["wv"]], axis=1)
    lno = jnp.stack([layer_params["ln"]["scale"], layer_params["ln"]["bias"]])
    # same odd-F padding as the metanet kernel (padded keys softmax-masked)
    f_real = F_
    pad_f = (-F_) % pad_mult if pad_mult > 1 else 0
    if pad_f:
        x = jnp.pad(x, ((0, 0), (0, pad_f), (0, 0)))
    cfg = (D, head_num, drop_rate, train, block_b, interpret,
           f_real if pad_f else None, attn_cap, variant, apply_q, apply_k,
           relu_out)
    seed_arr = jnp.asarray([seed], jnp.int32)
    y = _simple_layer(x, wqkv, tq, tk, layer_params["wout"], lno,
                      domain_onehot.astype(F32), seed_arr, cfg)
    return y[:, :f_real, :] if pad_f else y
