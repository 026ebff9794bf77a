"""Fused SATrans meta-transformer layer with PER-TILE MetaNet weights.

Companion to :mod:`.meta_block` for the composite multi-scenario-column
path (reference satrans.py:205-207).  meta_block's masked wide GEMM
computes every row against every domain's weights - cost linear in the
domain count, a wash at the 56-combo product table (measured 72 ms/step,
bench/variant_matrix.py r5).  Here the batch has been dispatched by
:mod:`satrans_tpu.ops.dispatch` so each tile of ``block_b`` examples
belongs to EXACTLY ONE domain: the kernel reads one small per-tile weight
block (``[d, h]`` / ``[h, h2]`` / ``[h_last, d]``) via its BlockSpec and
runs the same plain GEMMs as the single-column kernel - D-independent
FLOPs, no one-hot masks.

The per-tile weights are gathered OUTSIDE the custom-vjp boundary
(``table[tile_dom]``), so XLA autodiff routes the kernel's per-tile
gradient blocks back to the ``[D, P]`` flat tables via scatter-add.
Each per-tile gradient block is visited exactly once by the grid, so no
cross-step accumulation is needed for them (shared weights - wqkv, LNs,
wout - still accumulate across steps as in meta_block).

Backward modes mirror meta_block: ``stash`` (default) stores the
forward residuals (qkv, pre-LN sums, attention probabilities, attention
output) so the backward recomputes only the cheap per-tile hiddens and
``z``; ``recompute`` regenerates everything flash-style.  Both are
pinned to the XLA path by tests; A/B measured in
bench/variant_matrix.py 'multicol'.

Dropout draw order (fwd == bwd, in-kernel PRNG): yq (if Q applied), yk
(if K applied), per-head attention masks, output mask.
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
                         _interp_prng_scope, _layer_norm_bwd,
                         _layer_norm_fwd, _pack_lns, _prng_seed,
                         _softmax_lastdim, _attn_variant, _head_masks,
                         _stash_specs,
                         # the weight-ref unpacking CONTRACT is shared
                         # with meta_block (same ordering, per-tile
                         # blocks here vs packed-wide there) - one
                         # definition so the two kernels cannot diverge
                         _split_w, _w_operands)


def _tile_meta(t0, w1_ref, wmid_ref, w2_ref):
    """MetaNet MLP with this tile's weights; returns (y, hiddens)."""
    h1 = jax.nn.relu(jnp.dot(t0, w1_ref[0], preferred_element_type=F32))
    if wmid_ref is None:
        return jnp.dot(h1, w2_ref[0], preferred_element_type=F32), (h1,)
    h2 = jax.nn.relu(jnp.dot(h1, wmid_ref[0], preferred_element_type=F32))
    return jnp.dot(h2, w2_ref[0], preferred_element_type=F32), (h1, h2)


def _tile_meta_bwd(dyn, xhat, inv, t0, hs, y_mask, w1_ref, wmid_ref,
                   w2_ref, ln_scale):
    """MetaNet+LN backward with this tile's weights.

    Returns (dt0, dw1, dwmid-or-None, dw2, dls, dlb)."""
    dls = jnp.sum(dyn * xhat, axis=0)
    dlb = jnp.sum(dyn, axis=0)
    duq = _layer_norm_bwd(dyn, xhat, inv, ln_scale)
    dy = duq * y_mask if y_mask is not None else duq
    dt0 = duq  # residual branch
    h1 = hs[0]
    if wmid_ref is None:
        dh = jnp.dot(dy, w2_ref[0].T, preferred_element_type=F32)
        dw2 = jnp.dot(h1.T, dy, preferred_element_type=F32)
        dwmid = None
    else:
        h2 = hs[1]
        dh2 = jnp.dot(dy, w2_ref[0].T, preferred_element_type=F32) \
            * (h2 > 0).astype(F32)
        dw2 = jnp.dot(h2.T, dy, preferred_element_type=F32)
        dwmid = jnp.dot(h1.T, dh2, preferred_element_type=F32)
        dh = jnp.dot(dh2, wmid_ref[0].T, preferred_element_type=F32)
    dh0 = dh * (h1 > 0).astype(F32)
    dw1 = jnp.dot(t0.T, dh0, preferred_element_type=F32)
    dt0 = dt0 + jnp.dot(dh0, w1_ref[0].T, preferred_element_type=F32)
    return dt0, dw1, dwmid, dw2, dls, dlb


def _fwd_compute(seed_ref, x_ref, wqkv_ref, ws, mask_ref, *,
                 h2: int | None, head_num: int, drop_rate: float,
                 train: bool, f_real: int | None, attn_cap: int | None,
                 relu_out: bool, apply_q: bool, apply_k: bool):
    """Shared forward body; returns ``(y, qkv, uq, uk, s_keep, o)`` -
    the extras are the stash-mode residuals (an unapplied projection's
    ``uq``/``uk`` carries the raw projection so the shapes stay fixed)."""
    (w1q_ref, wmidq_ref, w2q_ref, lnq_ref, w1k_ref, wmidk_ref, w2k_ref,
     lnk_ref, wout_ref, lno_ref) = ws
    TB, F_, d = x_ref.shape
    N = TB * F_
    if train and drop_rate > 0.0:
        _prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(F32)
    x2 = x.reshape(N, d)
    qkv = jnp.dot(x2, wqkv_ref[:], preferred_element_type=F32)
    q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

    if apply_q:
        yq, _ = _tile_meta(q0, w1q_ref, wmidq_ref, w2q_ref)
        if train and drop_rate > 0.0:
            yq = yq * _dropout_mask(yq.shape, drop_rate)
        uq = yq + q0
        qn, _, _ = _layer_norm_fwd(uq, lnq_ref[0], lnq_ref[1])
    else:
        uq, qn = q0, q0
    if apply_k:
        yk, _ = _tile_meta(k0, w1k_ref, wmidk_ref, w2k_ref)
        if train and drop_rate > 0.0:
            yk = yk * _dropout_mask(yk.shape, drop_rate)
        uk = yk + k0
        kn, _, _ = _layer_norm_fwd(uk, lnk_ref[0], lnk_ref[1])
    else:
        uk, kn = k0, k0

    o, s_keep = _attention(qn.reshape(TB, F_, d), kn.reshape(TB, F_, d),
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
    return y, qkv, uq, uk, s_keep, o


def _fwd_kernel(seed_ref, x_ref, wqkv_ref, *rest, h2: int | None,
                head_num: int, drop_rate: float, train: bool,
                f_real: int | None = None, attn_cap: int | None = None,
                relu_out: bool = False, apply_q: bool = True,
                apply_k: bool = True):
    ws, (mask_ref, out_ref) = _split_w(rest, h2)
    y, *_ = _fwd_compute(seed_ref, x_ref, wqkv_ref, ws, mask_ref,
                         h2=h2, head_num=head_num, drop_rate=drop_rate,
                         train=train, f_real=f_real, attn_cap=attn_cap,
                         relu_out=relu_out, apply_q=apply_q,
                         apply_k=apply_k)
    out_ref[:] = y.astype(out_ref.dtype)


def _fwd_kernel_stash(seed_ref, x_ref, wqkv_ref, *rest, h2: int | None,
                      head_num: int, drop_rate: float, train: bool,
                      f_real: int | None = None,
                      attn_cap: int | None = None,
                      relu_out: bool = False, apply_q: bool = True,
                      apply_k: bool = True):
    ws, tail = _split_w(rest, h2)
    mask_ref, out_ref, qkv_ref, uq_ref, uk_ref, s_ref, o_ref = tail
    TB, F_, d = x_ref.shape
    y, qkv, uq, uk, s_keep, o = _fwd_compute(
        seed_ref, x_ref, wqkv_ref, ws, mask_ref,
        h2=h2, head_num=head_num, drop_rate=drop_rate, train=train,
        f_real=f_real, attn_cap=attn_cap, relu_out=relu_out,
        apply_q=apply_q, apply_k=apply_k)
    out_ref[:] = y.astype(out_ref.dtype)
    qkv_ref[:] = qkv.reshape(TB, F_, 3 * d).astype(qkv_ref.dtype)
    uq_ref[:] = uq.reshape(TB, F_, d).astype(uq_ref.dtype)
    uk_ref[:] = uk.reshape(TB, F_, d).astype(uk_ref.dtype)
    for hd in range(len(s_keep)):
        s_ref[hd] = s_keep[hd].astype(s_ref.dtype)
    o_ref[:] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, wqkv_ref, *rest, h2: int | None,
                head_num: int, drop_rate: float, train: bool,
                f_real: int | None = None, attn_cap: int | None = None,
                relu_out: bool = False, apply_q: bool = True,
                apply_k: bool = True):
    ws, tail = _split_w(rest, h2)
    (w1q_ref, wmidq_ref, w2q_ref, lnq_ref, w1k_ref, wmidk_ref, w2k_ref,
     lnk_ref, wout_ref, lno_ref) = ws
    mask_ref, g_ref, dx_ref = tail[:3]
    grad_refs = tail[3:]
    TB, F_, d = x_ref.shape
    N = TB * F_
    dh = d // head_num
    scale = 1.0 / math.sqrt(dh)
    use_drop = train and drop_rate > 0.0

    if use_drop:
        _prng_seed(seed_ref[0] + pl.program_id(0))
        m_yq = _dropout_mask((N, d), drop_rate) if apply_q else None
        m_yk = _dropout_mask((N, d), drop_rate) if apply_k else None
        g_attn0 = _attn_group(TB, F_, attn_cap)
        m_s = [_dropout_mask((TB // g_attn0, g_attn0 * F_, g_attn0 * F_),
                             drop_rate) for _ in range(head_num)]
        m_z = _dropout_mask((N, d), drop_rate)

    x = x_ref[:].astype(F32)
    x2 = x.reshape(N, d)
    wqkv = wqkv_ref[:]
    wout = wout_ref[:]

    # ---- recompute forward ----
    qkv = jnp.dot(x2, wqkv, preferred_element_type=F32)
    q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    if apply_q:
        yq, hq = _tile_meta(q0, w1q_ref, wmidq_ref, w2q_ref)
        if use_drop:
            yq = yq * m_yq
        qn, xhat_q, inv_q = _layer_norm_fwd(yq + q0, lnq_ref[0], lnq_ref[1])
    else:
        qn = q0
    if apply_k:
        yk, hk = _tile_meta(k0, w1k_ref, wmidk_ref, w2k_ref)
        if use_drop:
            yk = yk * m_yk
        kn, xhat_k, inv_k = _layer_norm_fwd(yk + k0, lnk_ref[0], lnk_ref[1])
    else:
        kn = k0

    g_attn = _attn_group(TB, F_, attn_cap)
    groups = TB // g_attn
    n_attn = g_attn * F_
    q3 = (qn * scale).reshape(groups, n_attn, d)
    k3 = kn.reshape(groups, n_attn, d)
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
    dqn = (dq3.reshape(TB, F_, d) * scale).reshape(N, d)
    dkn = dk3.reshape(N, d)

    h1w = w1q_ref.shape[-1]
    hl = w2q_ref.shape[-2]
    zeros_ln = lambda: jnp.zeros((d,), F32)
    if apply_q:
        dq0, dw1_q, dwm_q, dw2_q, dls_q, dlb_q = _tile_meta_bwd(
            dqn, xhat_q, inv_q, q0, hq, m_yq if use_drop else None,
            w1q_ref, wmidq_ref, w2q_ref, lnq_ref[0])
    else:
        dq0 = dqn
        dw1_q, dw2_q = jnp.zeros((d, h1w), F32), jnp.zeros((hl, d), F32)
        dwm_q = jnp.zeros((h1w, h2), F32) if h2 else None
        dls_q = dlb_q = zeros_ln()
    if apply_k:
        dk0, dw1_k, dwm_k, dw2_k, dls_k, dlb_k = _tile_meta_bwd(
            dkn, xhat_k, inv_k, k0, hk, m_yk if use_drop else None,
            w1k_ref, wmidk_ref, w2k_ref, lnk_ref[0])
    else:
        dk0 = dkn
        dw1_k, dw2_k = jnp.zeros((d, h1w), F32), jnp.zeros((hl, d), F32)
        dwm_k = jnp.zeros((h1w, h2), F32) if h2 else None
        dls_k = dlb_k = zeros_ln()

    dqkv = jnp.concatenate([dq0, dk0, dv3.reshape(N, d)], axis=1)
    dwqkv = jnp.dot(x2.T, dqkv, preferred_element_type=F32)
    dx = dx + jnp.dot(dqkv, wqkv.T,
                      preferred_element_type=F32).reshape(TB, F_, d)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    # per-tile weight-grad blocks: each (i, ...) block is visited exactly
    # once, so they are plain writes; shared grads accumulate across steps
    if h2 is not None:
        (dw1q_ref, dwmidq_ref, dw2q_ref, dlnq_ref, dw1k_ref, dwmidk_ref,
         dw2k_ref, dlnk_ref, dwqkv_ref, dwout_ref, dlno_ref) = grad_refs
        dwmidq_ref[0] = dwm_q
        dwmidk_ref[0] = dwm_k
    else:
        (dw1q_ref, dw2q_ref, dlnq_ref, dw1k_ref, dw2k_ref, dlnk_ref,
         dwqkv_ref, dwout_ref, dlno_ref) = grad_refs
    dw1q_ref[0] = dw1_q
    dw2q_ref[0] = dw2_q
    dw1k_ref[0] = dw1_k
    dw2k_ref[0] = dw2_k

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dlnq_ref[:] = jnp.zeros_like(dlnq_ref)
        dlnk_ref[:] = jnp.zeros_like(dlnk_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dlno_ref[:] = jnp.zeros_like(dlno_ref)

    dwqkv_ref[:] += dwqkv
    dlnq_ref[0] += dls_q
    dlnq_ref[1] += dlb_q
    dlnk_ref[0] += dls_k
    dlnk_ref[1] += dlb_k
    dwout_ref[:] += dwout
    dlno_ref[0] += dlno_s
    dlno_ref[1] += dlno_b


def _bwd_kernel_stash(seed_ref, x_ref, wqkv_ref, *rest, h2: int | None,
                      head_num: int, drop_rate: float, train: bool,
                      f_real: int | None = None,
                      attn_cap: int | None = None,
                      relu_out: bool = False, apply_q: bool = True,
                      apply_k: bool = True):
    """Backward consuming the forward's stashed residuals (qkv, pre-LN
    sums, attention probabilities, attention output); recomputes only the
    cheap per-tile hiddens and ``z``.  Same math as :func:`_bwd_kernel` -
    both pinned to the XLA path by tests."""
    ws, tail = _split_w(rest, h2)
    (w1q_ref, wmidq_ref, w2q_ref, lnq_ref, w1k_ref, wmidk_ref, w2k_ref,
     lnk_ref, wout_ref, lno_ref) = ws
    g_ref, qkv_ref, uq_ref, uk_ref, s_ref, o_ref = tail[:6]
    dx_ref = tail[6]
    grad_refs = tail[7:]
    TB, F_, d = x_ref.shape
    N = TB * F_
    dh = d // head_num
    scale = 1.0 / math.sqrt(dh)
    use_drop = train and drop_rate > 0.0

    if use_drop:
        _prng_seed(seed_ref[0] + pl.program_id(0))
        m_yq = _dropout_mask((N, d), drop_rate) if apply_q else None
        m_yk = _dropout_mask((N, d), drop_rate) if apply_k else None
        g_attn0 = _attn_group(TB, F_, attn_cap)
        m_s = [_dropout_mask((TB // g_attn0, g_attn0 * F_, g_attn0 * F_),
                             drop_rate) for _ in range(head_num)]
        m_z = _dropout_mask((N, d), drop_rate)

    x = x_ref[:].astype(F32)
    x2 = x.reshape(N, d)
    wqkv = wqkv_ref[:]
    wout = wout_ref[:]

    # ---- load residuals; recompute only the cheap pieces ----
    qkv = qkv_ref[:].reshape(N, 3 * d).astype(F32)
    q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

    def _hiddens(t0, w1_ref, wmid_ref):
        h1 = jax.nn.relu(jnp.dot(t0, w1_ref[0],
                                 preferred_element_type=F32))
        if wmid_ref is None:
            return (h1,)
        return (h1, jax.nn.relu(jnp.dot(h1, wmid_ref[0],
                                        preferred_element_type=F32)))

    if apply_q:
        hq = _hiddens(q0, w1q_ref, wmidq_ref)
        qn, xhat_q, inv_q = _layer_norm_fwd(
            uq_ref[:].reshape(N, d).astype(F32), lnq_ref[0], lnq_ref[1])
    else:
        qn = q0
    if apply_k:
        hk = _hiddens(k0, w1k_ref, wmidk_ref)
        kn, xhat_k, inv_k = _layer_norm_fwd(
            uk_ref[:].reshape(N, d).astype(F32), lnk_ref[0], lnk_ref[1])
    else:
        kn = k0

    g_attn = _attn_group(TB, F_, attn_cap)
    groups = TB // g_attn
    n_attn = g_attn * F_
    q3 = (qn * scale).reshape(groups, n_attn, d)
    k3 = kn.reshape(groups, n_attn, d)
    v3 = v0.reshape(groups, n_attn, d)
    s_list = [s_ref[hd].astype(F32) for hd in range(head_num)]
    sm_list = [s * m_s[hd] if use_drop else s
               for hd, s in enumerate(s_list)]

    o2 = o_ref[:].reshape(N, d).astype(F32)
    zlin = jnp.dot(o2, wout, preferred_element_type=F32)
    z = jax.nn.relu(zlin) if relu_out else zlin
    if use_drop:
        z = z * m_z
    u = z.reshape(TB, F_, d) + x
    _, xhat_o, inv_o = _layer_norm_fwd(u, lno_ref[0], lno_ref[1])

    # ---- backward (same math as _bwd_kernel) ----
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
    dqn = (dq3.reshape(TB, F_, d) * scale).reshape(N, d)
    dkn = dk3.reshape(N, d)

    h1w = w1q_ref.shape[-1]
    hl = w2q_ref.shape[-2]
    zeros_ln = lambda: jnp.zeros((d,), F32)
    if apply_q:
        dq0, dw1_q, dwm_q, dw2_q, dls_q, dlb_q = _tile_meta_bwd(
            dqn, xhat_q, inv_q, q0, hq, m_yq if use_drop else None,
            w1q_ref, wmidq_ref, w2q_ref, lnq_ref[0])
    else:
        dq0 = dqn
        dw1_q, dw2_q = jnp.zeros((d, h1w), F32), jnp.zeros((hl, d), F32)
        dwm_q = jnp.zeros((h1w, h2), F32) if h2 else None
        dls_q = dlb_q = zeros_ln()
    if apply_k:
        dk0, dw1_k, dwm_k, dw2_k, dls_k, dlb_k = _tile_meta_bwd(
            dkn, xhat_k, inv_k, k0, hk, m_yk if use_drop else None,
            w1k_ref, wmidk_ref, w2k_ref, lnk_ref[0])
    else:
        dk0 = dkn
        dw1_k, dw2_k = jnp.zeros((d, h1w), F32), jnp.zeros((hl, d), F32)
        dwm_k = jnp.zeros((h1w, h2), F32) if h2 else None
        dls_k = dlb_k = zeros_ln()

    dqkv = jnp.concatenate([dq0, dk0, dv3.reshape(N, d)], axis=1)
    dwqkv = jnp.dot(x2.T, dqkv, preferred_element_type=F32)
    dx = dx + jnp.dot(dqkv, wqkv.T,
                      preferred_element_type=F32).reshape(TB, F_, d)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    if h2 is not None:
        (dw1q_ref, dwmidq_ref, dw2q_ref, dlnq_ref, dw1k_ref, dwmidk_ref,
         dw2k_ref, dlnk_ref, dwqkv_ref, dwout_ref, dlno_ref) = grad_refs
        dwmidq_ref[0] = dwm_q
        dwmidk_ref[0] = dwm_k
    else:
        (dw1q_ref, dw2q_ref, dlnq_ref, dw1k_ref, dw2k_ref, dlnk_ref,
         dwqkv_ref, dwout_ref, dlno_ref) = grad_refs
    dw1q_ref[0] = dw1_q
    dw2q_ref[0] = dw2_q
    dw1k_ref[0] = dw1_k
    dw2k_ref[0] = dw2_k

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dlnq_ref[:] = jnp.zeros_like(dlnq_ref)
        dlnk_ref[:] = jnp.zeros_like(dlnk_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dlno_ref[:] = jnp.zeros_like(dlno_ref)

    dwqkv_ref[:] += dwqkv
    dlnq_ref[0] += dls_q
    dlnq_ref[1] += dlb_q
    dlnk_ref[0] += dls_k
    dlnk_ref[1] += dlb_k
    dwout_ref[:] += dwout
    dlno_ref[0] += dlno_s
    dlno_ref[1] += dlno_b


def _w_specs(block_b, F_, d, h, h2, hl, mask_shape=None):
    mid = [pl.BlockSpec((1, h, h2), lambda i, *_: (i, 0, 0))] \
        if h2 is not None else []
    specs = [
        pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)),  # x
        pl.BlockSpec((d, 3 * d), lambda i, *_: (0, 0)),           # wqkv
        pl.BlockSpec((1, d, h), lambda i, *_: (i, 0, 0)),         # w1q
        *mid,                                                     # wmidq
        pl.BlockSpec((1, hl, d), lambda i, *_: (i, 0, 0)),        # w2q
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),               # lnq
        pl.BlockSpec((1, d, h), lambda i, *_: (i, 0, 0)),         # w1k
        *mid,                                                     # wmidk
        pl.BlockSpec((1, hl, d), lambda i, *_: (i, 0, 0)),        # w2k
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),               # lnk
        pl.BlockSpec((d, d), lambda i, *_: (0, 0)),               # wout
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),               # lno
    ]
    if mask_shape is not None:
        specs.append(pl.BlockSpec(mask_shape, lambda i, *_: (0, 0, 0)))
    return specs


def _fwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout,
              lno, seed, cfg):
    B, F_, d = x.shape
    (h, h2, head_num, drop_rate, train, block_b, interpret, f_real,
     attn_cap, relu_out, apply_q, apply_k, stash) = cfg
    hl = h2 or h
    if B % block_b:
        raise ValueError(f"batch {B} must divide block_b {block_b}")
    g_att = _attn_group(block_b, F_, attn_cap)
    mask = _block_mask(block_b // g_att, g_att, F_,
                       f_real if f_real is not None else F_)
    y_shape = jax.ShapeDtypeStruct((B, F_, d), x.dtype)
    y_spec = pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0))
    if stash:
        st_shapes, st_specs = _stash_specs(B, block_b, F_, d, head_num,
                                           g_att, F32, with_s=True)
        kern = _fwd_kernel_stash
        out_shape, out_specs = (y_shape,) + st_shapes, (y_spec,) + st_specs
    else:
        kern, out_shape, out_specs = _fwd_kernel, y_shape, y_spec
    kernel = functools.partial(
        kern, h2=h2, head_num=head_num, drop_rate=drop_rate,
        train=train, f_real=f_real, attn_cap=attn_cap, relu_out=relu_out,
        apply_q=apply_q, apply_k=apply_k)
    with _interp_prng_scope(interpret):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // block_b,),
                in_specs=_w_specs(block_b, F_, d, h, h2, hl, mask.shape),
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, x, *_w_operands(wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk,
                                w2k, lnk, wout, lno, h2), mask)


def _bwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout,
              lno, seed, g, cfg, stash_res=None):
    B, F_, d = x.shape
    (h, h2, head_num, drop_rate, train, block_b, interpret, f_real,
     attn_cap, relu_out, apply_q, apply_k, stash) = cfg
    hl = h2 or h
    n_tiles = B // block_b
    g_att = _attn_group(block_b, F_, attn_cap)
    kern = _bwd_kernel_stash if stash else _bwd_kernel
    kernel = functools.partial(
        kern, h2=h2, head_num=head_num, drop_rate=drop_rate,
        train=train, f_real=f_real, attn_cap=attn_cap, relu_out=relu_out,
        apply_q=apply_q, apply_k=apply_k)
    if stash:
        # the stash carries the probabilities - no attention mask operand
        in_specs = _w_specs(block_b, F_, d, h, h2, hl, None)
    else:
        mask = _block_mask(block_b // g_att, g_att, F_,
                           f_real if f_real is not None else F_)
        in_specs = _w_specs(block_b, F_, d, h, h2, hl, mask.shape)
    in_specs.append(pl.BlockSpec((block_b, F_, d),
                                 lambda i, *_: (i, 0, 0)))  # g
    if stash:
        _, st_specs = _stash_specs(B, block_b, F_, d, head_num, g_att,
                                   with_s=True)
        in_specs.extend(st_specs)
    mid_shape = [jax.ShapeDtypeStruct((n_tiles, h, h2), F32)] \
        if h2 is not None else []
    mid_spec = [pl.BlockSpec((1, h, h2), lambda i, *_: (i, 0, 0))] \
        if h2 is not None else []
    per_tile_shapes = (
        jax.ShapeDtypeStruct((n_tiles, d, h), F32),       # dw1q
        *mid_shape,                                       # dwmidq
        jax.ShapeDtypeStruct((n_tiles, hl, d), F32),      # dw2q
        jax.ShapeDtypeStruct((2, d), F32),                # dlnq
        jax.ShapeDtypeStruct((n_tiles, d, h), F32),       # dw1k
        *mid_shape,                                       # dwmidk
        jax.ShapeDtypeStruct((n_tiles, hl, d), F32),      # dw2k
        jax.ShapeDtypeStruct((2, d), F32),                # dlnk
    )
    per_tile_specs = (
        pl.BlockSpec((1, d, h), lambda i, *_: (i, 0, 0)),
        *mid_spec,
        pl.BlockSpec((1, hl, d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),
        pl.BlockSpec((1, d, h), lambda i, *_: (i, 0, 0)),
        *mid_spec,
        pl.BlockSpec((1, hl, d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((B, F_, d), x.dtype),        # dx
        *per_tile_shapes,
        jax.ShapeDtypeStruct((d, 3 * d), F32),            # dwqkv
        jax.ShapeDtypeStruct((d, d), F32),                # dwout
        jax.ShapeDtypeStruct((2, d), F32),                # dlno
    )
    out_specs = (
        pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)),
        *per_tile_specs,
        pl.BlockSpec((d, 3 * d), lambda i, *_: (0, 0)),
        pl.BlockSpec((d, d), lambda i, *_: (0, 0)),
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),
    )
    with _interp_prng_scope(interpret):
        operands = [seed, x, *_w_operands(wqkv, w1q, wmidq, w2q, lnq, w1k,
                                          wmidk, w2k, lnk, wout, lno, h2)]
        if not stash:
            operands.append(mask)
        operands.append(g)
        if stash:
            operands.extend(stash_res)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // block_b,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*operands)
    if h2 is not None:
        (dx, dw1q, dwmidq, dw2q, dlnq, dw1k, dwmidk, dw2k, dlnk, dwqkv,
         dwout, dlno) = out
    else:
        (dx, dw1q, dw2q, dlnq, dw1k, dw2k, dlnk, dwqkv, dwout, dlno) = out
        dwmidq = dwmidk = None
    return (dx, dwqkv, dw1q, dwmidq, dw2q, dlnq, dw1k, dwmidk, dw2k, dlnk,
            dwout, dlno)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def _tiled_layer(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                 wout, lno, seed, cfg):
    # primal (no grad requested): never stash - the residuals would be
    # written and read by nobody
    return _fwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                     wout, lno, seed, cfg[:12] + (False,))


def _tiled_layer_fwd(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                     wout, lno, seed, cfg):
    out = _fwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                    wout, lno, seed, cfg)
    if cfg[12]:
        y, *stash_res = out
        return y, (x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                   wout, lno, seed, tuple(stash_res))
    return out, (x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout,
                 lno, seed, None)


def _tiled_layer_bwd(cfg, res, g):
    (x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout, lno,
     seed, stash_res) = res
    (dx, dwqkv, dw1q, dwmidq, dw2q, dlnq, dw1k, dwmidk, dw2k, dlnk, dwout,
     dlno) = _bwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k,
                       lnk, wout, lno, seed, g, cfg, stash_res=stash_res)
    if dwmidq is None:
        dwmidq = jnp.zeros_like(wmidq)
        dwmidk = jnp.zeros_like(wmidk)
    return (dx, dwqkv, dw1q, dwmidq, dw2q, dlnq, dw1k, dwmidk, dw2k, dlnk,
            dwout, dlno, jnp.zeros_like(seed))


_tiled_layer.defvjp(_tiled_layer_fwd, _tiled_layer_bwd)


def fused_tiled_layer_vjp(x, layer_params, tile_tables, *, meta_units,
                          head_num: int, drop_rate: float = 0.1,
                          train: bool = False, seed: int = 0,
                          block_b: int = 32, interpret: bool = False,
                          attn_cap: int | None = None,
                          relu_out: bool = False, mode: str = "QK",
                          pad_mult: int | None = None,
                          bwd: str | None = None):
    """Differentiable tiled layer over a domain-dispatched batch.

    ``x``: [n_slots, F, d] where ``n_slots == n_tiles * block_b`` and
    every ``block_b`` tile holds one domain's rows (ops/dispatch.py).
    ``tile_tables``: {'Q': [n_tiles, P], 'K': [n_tiles, P]} flat MetaNet
    params PRE-GATHERED per tile (``table[plan.tile_dom]``) - keeping the
    gather outside the custom-vjp boundary makes the per-tile gradient
    blocks flow back to the [D, P] tables via XLA's scatter-add.

    ``bwd``: ``'stash'`` (default; env ``SATRANS_TILED_BWD`` overrides)
    stores the forward residuals so the backward skips the attention /
    projection recompute; ``'recompute'`` regenerates everything.
    """
    import os

    B, F_, d = x.shape
    if len(meta_units) not in (3, 4):
        raise ValueError(f"2- or 3-matrix MetaNets only, got "
                         f"units {list(meta_units)}")
    h = meta_units[1]
    h2 = meta_units[2] if len(meta_units) == 4 else None
    hl = h2 or h
    n_tiles = B // block_b
    apply_q, apply_k = "Q" in mode, "K" in mode
    dummy3 = jnp.zeros((1, 1, 1), F32)

    def pack(key):
        flat = tile_tables.get(key, tile_tables["Q"])
        o1 = d * h
        w1 = flat[:, :o1].reshape(n_tiles, d, h)
        if h2 is None:
            return w1, dummy3, flat[:, o1:o1 + h * d].reshape(n_tiles, h, d)
        o2 = o1 + h * h2
        wmid = flat[:, o1:o2].reshape(n_tiles, h, h2)
        return w1, wmid, flat[:, o2:o2 + h2 * d].reshape(n_tiles, h2, d)

    zeros = (jnp.zeros((n_tiles, d, h), F32),
             jnp.zeros((n_tiles, h, h2), F32) if h2 else dummy3,
             jnp.zeros((n_tiles, hl, d), F32))
    w1q, wmidq, w2q = pack("Q") if apply_q else zeros
    w1k, wmidk, w2k = pack("K") if apply_k else zeros
    wqkv = jnp.concatenate([layer_params["wq"], layer_params["wk"],
                            layer_params["wv"]], axis=1)
    lnq, lnk = _pack_lns(layer_params, d)
    lno = jnp.stack([layer_params["ln"]["scale"],
                     layer_params["ln"]["bias"]])
    f_real = F_
    if pad_mult is None:
        pad_mult = int(os.environ.get("SATRANS_PAD_F", "8"))
    pad_f = (-F_) % pad_mult if pad_mult > 1 else 0
    if pad_f:
        x = jnp.pad(x, ((0, 0), (0, pad_f), (0, 0)))
    if bwd is None:
        bwd = os.environ.get("SATRANS_TILED_BWD", "stash")
    if bwd not in ("stash", "recompute"):
        raise ValueError(f"unknown bwd mode {bwd!r}")
    cfg = (h, h2, head_num, drop_rate, train, block_b, interpret,
           f_real if pad_f else None, attn_cap, relu_out, apply_q, apply_k,
           bwd == "stash")
    seed_arr = jnp.asarray([seed], jnp.int32)
    y = _tiled_layer(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                     layer_params["wout"], lno, seed_arr, cfg)
    return y[:, :f_real] if pad_f else y
