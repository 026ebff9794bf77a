"""Fused SATrans meta-transformer layer as a Pallas TPU kernel.

One kernel evaluates the whole layer (reference Meta_Transformer_Layer,
satrans.py:50-100) for a tile of examples entirely in VMEM:

    Q0,K0,V = x@Wq, x@Wk, x@Wv
    Q = LN(drop(relu(Q0@W1[dom])@W2[dom]) + Q0)     # MetaNet, dense-select
    K = LN(drop(relu(K0@W1[dom])@W2[dom]) + K0)     # shared MetaNet (non-pos)
    S = drop(softmax(per-head QK^T / sqrt(dh)))
    out = LN(drop((S@V)@Wout) + x)

Why a kernel: under XLA each of the ~12 small ops on ``[B, F=19, d=32]``
tensors materializes an HBM intermediate padded to 128 lanes and runs as its
own kernel; measured 3.9 ms/layer forward on v5e for B=8192 vs ~0.1 ms of
MXU math.  Here the per-tile working set (~6 MB at TB=256) stays in VMEM,
the projections and MetaNet run as wide GEMMs over all domains at once
(``[TB*F, d] @ [d, D*h]``) with one-hot selection, and the tiny F x F
attention is computed as VPU outer-product accumulation (no batched matmul,
which Mosaic would serialize).

Dropout: in-kernel PRNG (pltpu.prng_*) seeded per (layer_seed, tile), so the
backward kernel regenerates identical masks without storing them.

The custom VJP's backward is a second Pallas kernel (same tiling) that
recomputes the forward internals flash-attention-style and accumulates
parameter gradients across grid steps into single-block outputs.
"""

from __future__ import annotations

import contextlib
import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _layer_norm_fwd(u, scale, bias, eps=1e-6):
    mu = jnp.mean(u, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(u - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (u - mu) * inv
    return xhat * scale + bias, xhat, inv


def _layer_norm_bwd(g, xhat, inv, scale):
    """d u given upstream g for y = xhat*scale + bias."""
    n = g.shape[-1]
    gg = g * scale
    mean_gg = jnp.mean(gg, axis=-1, keepdims=True)
    mean_ggx = jnp.mean(gg * xhat, axis=-1, keepdims=True)
    return (gg - mean_gg - xhat * mean_ggx) * inv


def _clip_logits(s):
    """Two-sided static clamp applied to raw logits BEFORE the additive
    block mask: with entries in [-60, 60], plain ``exp`` can neither
    overflow nor underflow a whole row to zero (denominator >= e^-60 > 0),
    while masked entries (-1e30 after the mask add) still come out exactly
    0.  Gradients through saturated entries are treated as if unclipped -
    the same approximation every flash-attention-style static-clip makes;
    |logits| stays a few units in practice (LayerNormed q, k)."""
    return jnp.clip(s, -60.0, 60.0)


def _softmax_lastdim(s):
    """Softmax without the max-subtraction pass.

    ``jax.nn.softmax``'s running max is a LANE-dim reduction + broadcast
    that measured ~0.6 ms/layer on v5e (bench/layer_ablation.py round-2
    notes); callers pre-clamp raw logits with :func:`_clip_logits`, which
    makes plain exp overflow- AND underflow-proof (a one-sided min-clip
    left a 0/0 NaN open when every unmasked logit fell below ~-87).
    """
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# In-kernel PRNG with an interpret-mode emulation.  pltpu.prng_* has no
# interpret rule, so on CPU (tests) the same seed/draw-order contract is
# provided by a stateless counter hash: each _prng_seed resets a trace-time
# call counter, and every draw mixes (seed, call index, element index)
# through lowbias32.  fwd and bwd regenerate identical masks because they
# seed identically and draw the same shapes in the same order - the same
# contract the hardware PRNG path relies on.  The two paths produce
# DIFFERENT masks from the same seed (different generators); each is
# self-consistent, which is all dropout needs.
_INTERP_PRNG = {"active": False, "seed": None, "calls": 0}


@contextlib.contextmanager
def _interp_prng_scope(active: bool):
    """Arm the emulated PRNG while a pallas_call traces in interpret mode."""
    prev = _INTERP_PRNG["active"]
    _INTERP_PRNG["active"] = active
    try:
        yield
    finally:
        _INTERP_PRNG["active"] = prev
        _INTERP_PRNG["seed"] = None


def _prng_seed(val):
    if _INTERP_PRNG["active"]:
        _INTERP_PRNG["seed"] = val
        _INTERP_PRNG["calls"] = 0
    else:
        pltpu.prng_seed(val)


def _random_bits(shape):
    if not _INTERP_PRNG["active"]:
        return pltpu.prng_random_bits(shape)  # uint32
    salt = _INTERP_PRNG["calls"]
    _INTERP_PRNG["calls"] += 1
    seed = jnp.asarray(_INTERP_PRNG["seed"]).astype(jnp.uint32)
    idx = jnp.zeros(shape, jnp.uint32)
    stride = 1
    for dim in reversed(range(len(shape))):
        idx = idx + jax.lax.broadcasted_iota(jnp.uint32, shape, dim) \
            * jnp.uint32(stride)
        stride *= shape[dim]
    x = idx ^ (seed * jnp.uint32(0x9E3779B9))
    x = x + jnp.uint32((salt * 0x85EBCA6B + 0xC2B2AE35) & 0xFFFFFFFF)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _dropout_mask(shape, rate: float):
    """Generate a keep-mask from the already-seeded in-kernel PRNG.

    Draw order matters: fwd and bwd must call in the same sequence.
    """
    bits = _random_bits(shape)  # uint32
    # keep if bits >= rate * 2^32
    threshold = jnp.uint32(int(rate * (2 ** 32)))
    return (bits >= threshold).astype(F32) / (1.0 - rate)


def _expand_const(D: int, block: int):
    """[D, D*block] 0/1 matrix: row d is 1 on its block of columns.
    Mosaic-friendly alternative to lane-splitting reshapes."""
    dd = jax.lax.broadcasted_iota(jnp.int32, (D, D * block), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (D, D * block), 1)
    return (jj // block == dd).astype(F32)


def _meta_apply(t0, w1cat, wmid, w2stack, onehot_rows, D: int, h: int,
                d: int):
    """MetaNet MLP with the per-domain selection IMPLICIT in masked wide
    GEMMs - no per-domain gather, no fold matmuls.

    2-matrix (``wmid is None``): ``relu(t0 @ W1[dom]) @ W2[dom]``.
    t0: [N, d]; w1cat: [d, D*h] (per-domain W1 side by side); w2stack:
    [D*h, d] (per-domain W2 stacked VERTICALLY); onehot_rows: [N, D].
    ``Hm = relu(t0 @ w1cat) * mask`` is zero outside each row's own domain
    column block, so ``Hm @ w2stack`` contracts exactly against that
    domain's W2 - one GEMM replaces select+GEMM+select, and the gradients
    ``dW = Hm^T @ dY`` / ``dHm = dY @ w2stack^T`` stay per-domain-correct
    for free (zero rows contribute zero).

    3-matrix (``wmid``: [D*h, D*h2] BLOCK-DIAGONAL per-domain middle
    matrices, reference ``meta_dnn_hidden_units`` of length 3):
    ``H2 = relu(Hm @ wmid)`` keeps the block structure - Hm is zero
    outside the own-domain block and wmid maps block i -> block i, so H2
    is nonzero only on the own domain's h2 columns (relu(0) == 0) and a
    second mask is unnecessary; ``Y = H2 @ w2stack`` with w2stack now
    [D*h2, d].  The off-diagonal blocks of the kernel's dwmid are exactly
    zero (disjoint row/column domain supports), and the block-diagonal
    packing outside the custom-vjp boundary drops them when routing
    gradients back to the flat tables.

    Returns ``(Y, hs)`` with ``hs`` the hidden activations the backward
    needs: ``(Hm,)`` resp. ``(Hm, H2)``.
    """
    mask = jnp.dot(onehot_rows, _expand_const(D, h),
                   preferred_element_type=F32)           # [N, D*h]
    H = jax.nn.relu(jnp.dot(t0, w1cat, preferred_element_type=F32))
    Hm = H * mask
    if wmid is None:
        Y = jnp.dot(Hm, w2stack, preferred_element_type=F32)  # [N, d]
        return Y, (Hm,)
    H2 = jax.nn.relu(jnp.dot(Hm, wmid, preferred_element_type=F32))
    Y = jnp.dot(H2, w2stack, preferred_element_type=F32)  # [N, d]
    return Y, (Hm, H2)


def _attn_group(TB: int, F_: int, cap: int | None = None) -> int:
    """Examples packed per block-diagonal attention GEMM.

    Per-example F x F attention maps to MXU ops of ~F x dh x F - tiny, and
    Mosaic SERIALIZES batched dots over the group dim, so the group count is
    the dominant per-tile op count.  Packing g examples gives [g*F, dh] x
    [dh, g*F] GEMMs (one op instead of g); off-diagonal example-cross terms
    are masked to -inf before the softmax, so they come out exactly 0 and
    the S@V / backward contractions stay correct over the full matrix.
    Score-tensor FLOPs/VMEM grow linearly in g while the serialized op
    count falls as 1/g; ``cap`` bounds g*F (measured sweet spot recorded in
    docs/PERFORMANCE.md).
    """
    if cap is None:
        cap = int(os.environ.get("SATRANS_ATTN_CAP", "128"))
    best = 1
    for g in range(1, TB + 1):
        if TB % g == 0 and g * F_ <= cap:
            best = g
    return best


def _attn_variant() -> str:
    """How per-head attention GEMMs address the head's d/H lanes.

    ``slice`` (round-2 behavior): ``q3[..., hd*dh:(hd+1)*dh]`` - every
    8-wide lane slice of a 128-lane-padded f32 tensor costs a Mosaic
    relayout, and the attention block is relayout-bound (interior ablation,
    docs/PERFORMANCE.md round 1).

    ``masked``: full-width GEMMs with the head's lanes selected by an
    elementwise 0/1 mask: ``S_h = (q*mask_h) @ k^T`` (masked-out lanes
    contribute exact zero products) and ``o = sum_h S_h @ (v*mask_h)``
    (each term is nonzero only on its head's lanes, so the sum IS the
    head concat).  4x the MXU flops - which are idle - and zero lane
    relayouts.  Same math up to f32 contraction order.

    Env ``SATRANS_ATTN`` selects; default recorded in docs/PERFORMANCE.md
    with the bank_modes A/B that chose it.
    """
    mode = os.environ.get("SATRANS_ATTN", "masked")
    if mode not in ("slice", "masked"):
        raise ValueError(f"unknown attention variant {mode!r}")
    return mode


def _head_masks(d: int, head_num: int):
    """[H, d] 0/1 lane masks: row h is 1 on head h's dh lanes."""
    dh = d // head_num
    lane = jax.lax.broadcasted_iota(jnp.int32, (head_num, d), 1)
    hh = jax.lax.broadcasted_iota(jnp.int32, (head_num, d), 0)
    return (lane // dh == hh).astype(F32)


def _block_mask(groups: int, g: int, F_: int, f_real: int):
    """[groups, g*F, g*F] additive mask: -inf off own example block or on
    padded key columns (j % F >= f_real)."""
    n = g * F_
    row = jax.lax.broadcasted_iota(jnp.int32, (groups, n, n), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (groups, n, n), 2)
    ok = (row // F_ == col // F_) & (col % F_ < f_real)
    return jnp.where(ok, 0.0, -1e30).astype(F32)


def _attention(q, k, v, head_num: int, F_: int, d: int, *,
               drop_rate: float, train: bool, f_real: int | None = None,
               attn_cap: int | None = None, mask=None):
    """Block-diagonal-packed multi-head attention for tiny F.

    q,k,v: [TB, F, d].  Returns (o [TB, F, d], s_all per head
    [TB//g, g*F, g*F] block-diagonal scores).

    The 1/sqrt(dh) scale is folded into Q ONCE on [TB*F, d] instead of a
    per-head pass over every [G, n, n] score tensor, and ``mask`` (the
    additive block mask) can be passed in precomputed - rebuilding it from
    iotas cost ~6 VPU passes over [G, n, n] per kernel invocation.
    """
    TB = q.shape[0]
    dh = d // head_num
    scale = 1.0 / math.sqrt(dh)
    g = _attn_group(TB, F_, attn_cap)
    groups = TB // g
    n = g * F_
    if mask is None:
        mask = _block_mask(groups, g, F_,
                           f_real if f_real is not None else F_)
    qg = (q * scale).reshape(groups, n, d)
    kg = k.reshape(groups, n, d)
    vg = v.reshape(groups, n, d)
    masked = _attn_variant() == "masked"
    hm = _head_masks(d, head_num) if masked else None
    outs = []
    s_keep = []
    for hd in range(head_num):
        sl = slice(hd * dh, (hd + 1) * dh)
        if masked:
            # full-width GEMM, head lanes selected by the 0/1 mask: the
            # other lanes multiply to exact zeros (see _attn_variant)
            qh, kh, vh = qg * hm[hd], kg, vg * hm[hd]
        else:
            qh, kh, vh = qg[..., sl], kg[..., sl], vg[..., sl]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=F32)  # [G, n, n]
        s = _clip_logits(s) + mask
        s = _softmax_lastdim(s)
        s_keep.append(s)  # PRE-dropout probabilities (the stash residual)
        if train and drop_rate > 0.0:
            s = s * _dropout_mask(s.shape, drop_rate)
        o = jax.lax.dot_general(s, vh, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=F32)
        outs.append(o)  # masked: [G, n, d] nonzero only on head lanes
    if masked:
        o = sum(outs).reshape(TB, F_, d)  # the sum IS the head concat
    else:
        o = jnp.concatenate(outs, axis=-1).reshape(TB, F_, d)
    return o, s_keep


def _split_w(rest, h2):
    """Unpack the weight refs that follow ``wqkv`` in kernel signatures.

    Returns ``((w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout, lno),
    tail)``; the 2-matrix case (``h2 is None``) has no wmid operands and
    gets ``None`` in their slots."""
    if h2 is not None:
        return tuple(rest[:10]), rest[10:]
    w1q, w2q, lnq, w1k, w2k, lnk, wout, lno = rest[:8]
    return (w1q, None, w2q, lnq, w1k, None, w2k, lnk, wout, lno), rest[8:]


def _fwd_compute(seed_ref, dom_ref, x_ref, wqkv_ref, ws, mask_ref, *,
                 D: int, h: int, h2: int | None, head_num: int,
                 drop_rate: float, train: bool,
                 f_real: int | None, attn_cap: int | None,
                 relu_out: bool = False, apply_q: bool = True,
                 apply_k: bool = True):
    """Shared forward body.  Returns ``(y, qkv, uq, uk, s_keep, o)`` -
    the extras are the stash-mode residuals (``uq``/``uk`` are the pre-LN
    sums, ``s_keep`` the PRE-dropout attention probabilities per head).

    Q and K carry SEPARATE MetaNet weights + LayerNorms (``w1q/w2q/lnq`` vs
    ``w1k/w2k/lnk``): the 'pos' variant (reference satrans.py:44-47,
    225-234) generates distinct per-(layer, qkv) meta params; the shared
    (non-pos) case passes the same arrays twice and autodiff outside the
    custom-vjp boundary sums the two gradient paths.

    ``apply_q``/``apply_k`` mirror the reference's containment checks
    (``'Q' in meta_mode`` / ``'K' in meta_mode``, satrans.py:60-73): an
    unapplied projection skips its MetaNet, dropout draw AND LayerNorm
    entirely (the raw projection feeds attention), which is what
    meta_mode='Query' - the CLI default - does for K.  ``uq``/``uk`` then
    carry the raw projection so the stash shapes stay fixed."""
    TB, F_, d = x_ref.shape
    (w1q_ref, wmidq_ref, w2q_ref, lnq_ref, w1k_ref, wmidk_ref, w2k_ref,
     lnk_ref, wout_ref, lno_ref) = ws
    if train and drop_rate > 0.0:
        _prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(F32)
    x2 = x.reshape(TB * F_, d)
    onehot = dom_ref[:]                                   # [TB, D]
    onehot_rows = jnp.broadcast_to(onehot[:, None, :],
                                   (TB, F_, onehot.shape[1])
                                   ).reshape(TB * F_, onehot.shape[1])

    qkv = jnp.dot(x2, wqkv_ref[:], preferred_element_type=F32)  # [N, 3d]
    q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

    if apply_q:
        yq, _ = _meta_apply(q0, w1q_ref[:],
                            None if wmidq_ref is None else wmidq_ref[:],
                            w2q_ref[:], onehot_rows, D, h, d)
        if train and drop_rate > 0.0:
            yq = yq * _dropout_mask(yq.shape, drop_rate)
        uq = yq + q0
        qn, _, _ = _layer_norm_fwd(uq, lnq_ref[0], lnq_ref[1])
    else:
        uq, qn = q0, q0

    if apply_k:
        yk, _ = _meta_apply(k0, w1k_ref[:],
                            None if wmidk_ref is None else wmidk_ref[:],
                            w2k_ref[:], onehot_rows, D, h, d)
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
    z = jnp.dot(o.reshape(TB * F_, d), wout_ref[:],
                preferred_element_type=F32)
    if relu_out:
        # 'relu' flag: relu BEFORE dropout (reference satrans.py:91-92:
        # ``self.dropout(F.relu(self.Out_linear(result)))``)
        z = jax.nn.relu(z)
    if train and drop_rate > 0.0:
        z = z * _dropout_mask(z.shape, drop_rate)
    u = z.reshape(TB, F_, d) + x
    y, _, _ = _layer_norm_fwd(u, lno_ref[0], lno_ref[1])
    return y, qkv, uq, uk, s_keep, o


def _fwd_kernel(seed_ref, dom_ref, x_ref, wqkv_ref, *rest,
                D: int, h: int, h2: int | None, head_num: int,
                drop_rate: float, train: bool,
                f_real: int | None = None, attn_cap: int | None = None,
                relu_out: bool = False, apply_q: bool = True,
                apply_k: bool = True):
    ws, (mask_ref, out_ref) = _split_w(rest, h2)
    y, *_ = _fwd_compute(seed_ref, dom_ref, x_ref, wqkv_ref, ws, mask_ref,
                         D=D, h=h, h2=h2, head_num=head_num,
                         drop_rate=drop_rate,
                         train=train, f_real=f_real, attn_cap=attn_cap,
                         relu_out=relu_out, apply_q=apply_q,
                         apply_k=apply_k)
    out_ref[:] = y.astype(out_ref.dtype)


def _fwd_kernel_stash(seed_ref, dom_ref, x_ref, wqkv_ref, *rest,
                      stash_s: bool,
                      D: int, h: int, h2: int | None, head_num: int,
                      drop_rate: float,
                      train: bool, f_real: int | None = None,
                      attn_cap: int | None = None, relu_out: bool = False,
                      apply_q: bool = True, apply_k: bool = True):
    """Forward that also stores the backward's residuals (see
    _bwd_kernel_stash): HBM traffic (~450 MB/layer at B=8192) bought back
    ~2x in skipped backward recompute on v5e (docs/PERFORMANCE.md r2).

    After the weight refs and mask, outputs are ``out, qkv, uq, uk`` +
    ``(s_ref, o_ref)`` when ``stash_s`` else ``(o_ref,)``: the
    'light' mode drops the attention-probability stash (its [H, B/g, n, n]
    tensor is the bulk of the residual traffic) and the backward
    recomputes the probabilities from the stashed pre-LN sums."""
    ws, tail = _split_w(rest, h2)
    mask_ref, out_ref, qkv_ref, uq_ref, uk_ref = tail[:5]
    s_ref, o_ref = tail[5:] if stash_s else (None, tail[5])
    TB, F_, d = x_ref.shape
    y, qkv, uq, uk, s_keep, o = _fwd_compute(
        seed_ref, dom_ref, x_ref, wqkv_ref, ws, mask_ref,
        D=D, h=h, h2=h2, head_num=head_num,
        drop_rate=drop_rate, train=train, f_real=f_real, attn_cap=attn_cap,
        relu_out=relu_out, apply_q=apply_q, apply_k=apply_k)
    out_ref[:] = y.astype(out_ref.dtype)
    qkv_ref[:] = qkv.reshape(TB, F_, 3 * d).astype(qkv_ref.dtype)
    uq_ref[:] = uq.reshape(TB, F_, d).astype(uq_ref.dtype)
    uk_ref[:] = uk.reshape(TB, F_, d).astype(uk_ref.dtype)
    if stash_s:
        for hd in range(len(s_keep)):
            s_ref[hd] = s_keep[hd].astype(s_ref.dtype)
    o_ref[:] = o.astype(o_ref.dtype)


def _pack_meta(meta_tables, key: str, d: int, units, D: int):
    """[D, P] flat per-domain params -> the masked-wide-GEMM layout.

    2-matrix ``units=[d, h, d]``: ``([d, D*h], None, [D*h, d])``.
    3-matrix ``units=[d, h, h2, d]``: ``([d, D*h], [D*h, D*h2] block-
    diagonal, [D*h2, d])`` - see :func:`_meta_apply`.  The packing is
    differentiable; autodiff routes the kernel's dwmid back to the flat
    table, dropping the off-diagonal blocks the packing never reads.

    A missing 'K' falls back to 'Q' (the documented shared non-pos
    contract: one table drives both paths and autodiff sums the two
    gradient contributions).  SATrans itself always populates 'K'
    explicitly - including under 'pos' - so the fallback only serves
    direct kernel callers."""
    h = units[1]
    flat = meta_tables.get(key, meta_tables["Q"])
    w1 = flat[:, : d * h].reshape(D, d, h)
    w1cat = jnp.concatenate([w1[i] for i in range(D)], axis=1)
    if len(units) == 3:
        w2 = flat[:, d * h: d * h + h * d].reshape(D, h, d)
        w2cat = jnp.concatenate([w2[i] for i in range(D)], axis=0)
        return w1cat, None, w2cat
    h2 = units[2]
    o1, o2 = d * h, d * h + h * h2
    wm = flat[:, o1:o2].reshape(D, h, h2)
    w2 = flat[:, o2: o2 + h2 * d].reshape(D, h2, d)
    wmid = jnp.zeros((D * h, D * h2), F32)
    for i in range(D):
        wmid = wmid.at[i * h:(i + 1) * h, i * h2:(i + 1) * h2].set(wm[i])
    w2cat = jnp.concatenate([w2[i] for i in range(D)], axis=0)
    return w1cat, wmid, w2cat


def _pack_lns(layer_params, d: int):
    """(lnq [2, d], lnk [2, d]): K falls back to Q's MetaNet LayerNorm when
    there is no separate 'k_meta' (the shared non-pos case, reference
    satrans.py:44-47) - then lnk IS lnq and autodiff sums both paths."""
    default = {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}
    lnq_p = layer_params.get("q_meta", {}).get("ln", default)
    lnk_p = layer_params.get("k_meta",
                             layer_params.get("q_meta", {})).get("ln", lnq_p)
    lnq = jnp.stack([lnq_p["scale"], lnq_p["bias"]])
    lnk = lnq if lnk_p is lnq_p else jnp.stack([lnk_p["scale"],
                                                lnk_p["bias"]])
    return lnq, lnk


def fused_meta_layer_with_scores(x, layer_params, meta_tables,
                                 domain_onehot, *, meta_units,
                                 head_num: int, drop_rate: float = 0.1,
                                 train: bool = False, seed: int = 0,
                                 block_b: int = 128,
                                 interpret: bool = False,
                                 relu_out: bool = False,
                                 mode: str = "QK"):
    """Forward that ALSO returns the attention probabilities
    ``[B, H, F, F]`` for the showattn/instattn probes (VERDICT r4 weak
    #3: probe mode previously forced the XLA path).

    Rides the stash forward (the probabilities are already computed and
    written for the backward's benefit); the block-diagonal packed
    ``[H, B/g, g*F, g*F]`` stash is unpacked to per-example maps outside
    the kernel.  Probe prediction is inference, so the unused residual
    writes (qkv/pre-LN/o) are the documented cost of this path - measured
    in bench/probe_throughput.py against the XLA fallback it replaces.
    """
    import os as _os

    B, F_, d = x.shape
    pad_mult = int(_os.environ.get("SATRANS_PAD_F", "8"))
    pad_f = (-F_) % pad_mult if pad_mult > 1 else 0
    f_pad = F_ + pad_f
    g = _attn_group(block_b, f_pad)
    y, _qkv, _uq, _uk, s, _o = _fused_stash_forward(
        x, layer_params, meta_tables, domain_onehot,
        meta_units=meta_units, head_num=head_num, drop_rate=drop_rate,
        train=train, seed=seed, block_b=block_b, interpret=interpret,
        relu_out=relu_out, mode=mode)
    # [H, B/g, n, n] block-diagonal -> per-example [B, H, F, F]
    H = s.shape[0]
    G = s.shape[1]
    s5 = s.reshape(H, G, g, f_pad, g, f_pad)
    diag = jnp.diagonal(s5, axis1=2, axis2=4)   # [H, G, f, f, g]
    diag = jnp.moveaxis(diag, -1, 2)            # [H, G, g, f, f]
    scores = diag.reshape(H, B, f_pad, f_pad).transpose(1, 0, 2, 3)
    return y, scores[:, :, :F_, :F_].astype(jnp.float32)


def _fused_stash_forward(x, layer_params, meta_tables, domain_onehot, *,
                         meta_units, head_num, drop_rate, train, seed,
                         block_b, interpret, relu_out, mode):
    """One stash-mode forward invocation (no custom vjp - probe path)."""
    import os as _os

    B, F_, d = x.shape
    D = domain_onehot.shape[1]
    h = meta_units[1]
    h2 = meta_units[2] if len(meta_units) == 4 else None
    apply_q, apply_k = "Q" in mode, "K" in mode
    w1q, wmidq, w2q = _pack_meta(meta_tables, "Q", d, meta_units, D)
    w1k, wmidk, w2k = _pack_meta(meta_tables, "K", d, meta_units, D)
    if h2 is None:
        wmidq = wmidk = jnp.zeros((1, 1), F32)
    wqkv = jnp.concatenate([layer_params["wq"], layer_params["wk"],
                            layer_params["wv"]], axis=1)
    lnq, lnk = _pack_lns(layer_params, d)
    lno = jnp.stack([layer_params["ln"]["scale"],
                     layer_params["ln"]["bias"]])
    f_real = F_
    pad_mult = int(_os.environ.get("SATRANS_PAD_F", "8"))
    pad_f = (-F_) % pad_mult if pad_mult > 1 else 0
    if pad_f:
        x = jnp.pad(x, ((0, 0), (0, pad_f), (0, 0)))
    cfg = (D, h, head_num, drop_rate, train, block_b, interpret,
           f_real if pad_f else None, None, "full", F32, relu_out,
           apply_q, apply_k, h2)
    seed_arr = jnp.asarray([seed], jnp.int32)
    y, qkv, uq, uk, s, o = _fwd_call(
        x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
        layer_params["wout"], lno, domain_onehot.astype(F32), seed_arr,
        cfg)
    if pad_f:
        y = y[:, :f_real]
    return y, qkv, uq, uk, s, o


def fused_meta_layer(x, layer_params, meta_tables, domain_onehot, *,
                     meta_units, head_num: int, drop_rate: float = 0.1,
                     train: bool = False, seed: int = 0,
                     block_b: int = 128, interpret: bool = False,
                     relu_out: bool = False, mode: str = "QK"):
    """Forward of one meta-transformer layer (dense-select).

    Thin delegate to :func:`fused_meta_layer_vjp` (one code path; the
    primal of the custom vjp never stashes, so a no-grad call IS the plain
    forward kernel).  x: [B, F, d] fp32; layer_params: dict from
    attention.meta_transformer_init (metanet variant); meta_tables:
    {'Q': [D, P], 'K': [D, P]} flat per-domain params (the same array for
    both in the shared non-pos case; distinct per (layer, qkv) under
    'pos'); domain_onehot: [B, D].
    """
    return fused_meta_layer_vjp(
        x, layer_params, meta_tables, domain_onehot, meta_units=meta_units,
        head_num=head_num, drop_rate=drop_rate, train=train, seed=seed,
        block_b=block_b, interpret=interpret, relu_out=relu_out, mode=mode)


# ---------------------------------------------------------------------------
# backward kernel (recompute-forward, flash-attention style)
# ---------------------------------------------------------------------------

def _attn_bwd_heads(do3, q3, k3, v3, s_list, sm_list, m_s, use_drop,
                    head_num: int, dh: int):
    """Per-head attention gradient contractions on the grouped
    ``[G, n, d]`` shapes; returns ``(dq3, dk3, dv3)``.  ``q3`` carries the
    1/sqrt(dh) scale (see the callers).  The ``masked`` variant replaces
    every lane slice with a full-width GEMM against a head-masked operand
    (exact-zero products off the head's lanes; the per-head results are
    lane-disjoint so their SUM is the head concat) - see _attn_variant."""
    d = q3.shape[-1]
    if _attn_variant() == "masked":
        hm = _head_masks(d, head_num)
        dq = dk = dv = 0.0
        for hd in range(head_num):
            s, sm = s_list[hd], sm_list[hd]
            ds_used = jax.lax.dot_general(do3, v3 * hm[hd],
                                          (((2,), (2,)), ((0,), (0,))),
                                          preferred_element_type=F32)
            dvh = jax.lax.dot_general(sm, do3 * hm[hd],
                                      (((1,), (1,)), ((0,), (0,))),
                                      preferred_element_type=F32)
            ds = ds_used * m_s[hd] if use_drop else ds_used
            da = s * (ds - jnp.sum(ds * s, axis=-1, keepdims=True))
            dq = dq + jax.lax.dot_general(da, k3 * hm[hd],
                                          (((2,), (1,)), ((0,), (0,))),
                                          preferred_element_type=F32)
            dk = dk + jax.lax.dot_general(da, q3 * hm[hd],
                                          (((1,), (1,)), ((0,), (0,))),
                                          preferred_element_type=F32)
            dv = dv + dvh
        return dq, dk, dv
    dqn_parts, dkn_parts, dv_parts = [], [], []
    for hd in range(head_num):
        sl = slice(hd * dh, (hd + 1) * dh)
        do_h = do3[..., sl]
        vh = v3[..., sl]
        s = s_list[hd]
        sm = sm_list[hd]
        # dS_used[g,i,j] = sum_c do[g,i,c] v[g,j,c]
        ds_used = jax.lax.dot_general(do_h, vh, (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=F32)
        # dV_h[g,j,c] = sum_i sm[g,i,j] do[g,i,c]
        dvh = jax.lax.dot_general(sm, do_h, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=F32)
        dv_parts.append(dvh)
        ds = ds_used * m_s[hd] if use_drop else ds_used
        da = s * (ds - jnp.sum(ds * s, axis=-1, keepdims=True))
        # q3 carries the 1/sqrt(dh) scale, so da needs none: dkh contracts
        # against the scaled q3 and dq is unscaled by the caller
        qh, kh = q3[..., sl], k3[..., sl]
        dqh = jax.lax.dot_general(da, kh, (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=F32)
        dkh = jax.lax.dot_general(da, qh, (((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=F32)
        dqn_parts.append(dqh)
        dkn_parts.append(dkh)
    return (jnp.concatenate(dqn_parts, axis=-1),
            jnp.concatenate(dkn_parts, axis=-1),
            jnp.concatenate(dv_parts, axis=-1))



def _write_param_grads(out_refs, h2, vals):
    """Zero-init on the first grid step, then accumulate the per-tile
    parameter gradients.  ``out_refs``/``vals`` ordered dwqkv, dw1q,
    [dwmidq], dw2q, dlnq(2 rows), dw1k, [dwmidk], dw2k, dlnk, dwout,
    dlno; LN grads arrive as (scale_row, bias_row) tuples."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in out_refs:
            ref[:] = jnp.zeros_like(ref)

    for ref, val in zip(out_refs, vals):
        if isinstance(val, tuple):  # LayerNorm (scale, bias) rows
            ref[0] += val[0]
            ref[1] += val[1]
        else:
            ref[:] += val


def _bwd_kernel(seed_ref, dom_ref, x_ref, wqkv_ref, *rest,
                D: int, h: int, h2: int | None, head_num: int,
                drop_rate: float, train: bool,
                f_real: int | None = None, attn_cap: int | None = None,
                relu_out: bool = False, apply_q: bool = True,
                apply_k: bool = True):
    ws, tail = _split_w(rest, h2)
    (w1q_ref, wmidq_ref, w2q_ref, lnq_ref, w1k_ref, wmidk_ref, w2k_ref,
     lnk_ref, wout_ref, lno_ref) = ws
    mask_ref, g_ref = tail[:2]
    dx_ref = tail[2]
    grad_refs = tail[3:]
    TB, F_, d = x_ref.shape
    N = TB * F_
    dh = d // head_num
    scale = 1.0 / math.sqrt(dh)
    use_drop = train and drop_rate > 0.0

    # ---- regenerate dropout masks in the forward draw order (an
    # unapplied projection drew no mask in the forward) ----
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
    onehot = dom_ref[:]
    onehot_rows = jnp.broadcast_to(onehot[:, None, :],
                                   (TB, F_, onehot.shape[1])
                                   ).reshape(N, onehot.shape[1])
    w1q = w1q_ref[:] if apply_q else None
    w2q = w2q_ref[:] if apply_q else None
    wmidq = wmidq_ref[:] if (apply_q and wmidq_ref is not None) else None
    w1k = w1k_ref[:] if apply_k else None
    w2k = w2k_ref[:] if apply_k else None
    wmidk = wmidk_ref[:] if (apply_k and wmidk_ref is not None) else None
    wqkv = wqkv_ref[:]
    wout = wout_ref[:]

    # ---- recompute forward ----
    qkv = jnp.dot(x2, wqkv, preferred_element_type=F32)
    q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

    if apply_q:
        yq, hq = _meta_apply(q0, w1q, wmidq, w2q, onehot_rows, D, h, d)
        if use_drop:
            yq = yq * m_yq
        qn, xhat_q, inv_q = _layer_norm_fwd(yq + q0, lnq_ref[0], lnq_ref[1])
    else:
        qn = q0
    if apply_k:
        yk, hk = _meta_apply(k0, w1k, wmidk, w2k, onehot_rows, D, h, d)
        if use_drop:
            yk = yk * m_yk
        kn, xhat_k, inv_k = _layer_norm_fwd(yk + k0, lnk_ref[0], lnk_ref[1])
    else:
        kn = k0

    g_attn = _attn_group(TB, F_, attn_cap)
    groups = TB // g_attn
    n_attn = g_attn * F_
    # scale folded into Q once (see _attention); dqn unfolds it at the end
    q3 = (qn * scale).reshape(groups, n_attn, d)
    k3 = kn.reshape(groups, n_attn, d)
    v3 = v0.reshape(groups, n_attn, d)
    blk_mask = mask_ref[:]

    masked_attn = _attn_variant() == "masked"
    hm = _head_masks(d, head_num) if masked_attn else None
    s_list, sm_list = [], []
    o_parts = []
    for hd in range(head_num):
        sl = slice(hd * dh, (hd + 1) * dh)
        if masked_attn:
            qh, kh, vh = q3 * hm[hd], k3, v3 * hm[hd]
        else:
            qh, kh, vh = q3[..., sl], k3[..., sl], v3[..., sl]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=F32)
        s = _clip_logits(s) + blk_mask
        s = _softmax_lastdim(s)
        s_list.append(s)
        sm = s * m_s[hd] if use_drop else s
        sm_list.append(sm)
        o = jax.lax.dot_general(sm, vh, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=F32)
        o_parts.append(o)
    o3 = sum(o_parts) if masked_attn \
        else jnp.concatenate(o_parts, axis=-1)   # [G, n, d]
    o2 = o3.reshape(N, d)
    zlin = jnp.dot(o2, wout, preferred_element_type=F32)
    z = jax.nn.relu(zlin) if relu_out else zlin
    if use_drop:
        z = z * m_z
    u = z.reshape(TB, F_, d) + x
    _, xhat_o, inv_o = _layer_norm_fwd(u, lno_ref[0], lno_ref[1])

    # ---- backward ----
    g = g_ref[:].astype(F32)
    # outer LN
    dlno_s = jnp.sum(g * xhat_o, axis=(0, 1))
    dlno_b = jnp.sum(g, axis=(0, 1))
    du = _layer_norm_bwd(g, xhat_o, inv_o, lno_ref[0])
    dx = du  # residual
    dz = du.reshape(N, d)
    if use_drop:
        dz = dz * m_z
    if relu_out:
        dz = dz * (zlin > 0).astype(F32)
    dwout = jnp.dot(o2.T, dz, preferred_element_type=F32)
    do2 = jnp.dot(dz, wout.T, preferred_element_type=F32)
    do3 = do2.reshape(groups, n_attn, d)

    # All grads stay on the grouped [G, n, *] shapes: S is exactly zero off
    # the example-diagonal blocks, so full-matrix contractions are correct.
    dq3, dk3, dv3 = _attn_bwd_heads(do3, q3, k3, v3, s_list, sm_list,
                                    m_s if use_drop else None, use_drop,
                                    head_num, dh)
    dqn = dq3.reshape(TB, F_, d) * scale
    dkn = dk3.reshape(TB, F_, d)

    # meta/LN backward for the Q and K paths, each against its OWN meta
    # weights + LayerNorm (shared case: same arrays, grads summed outside).
    # hm = relu(t0@w1)*mask is zero outside each row's domain block, so
    # plain wide GEMMs give per-domain-correct grads with no select/fold
    # matmuls and no per-domain loop (see _meta_apply).  An unapplied
    # projection passes its gradient straight through (zero meta grads).
    zeros_w1 = lambda: jnp.zeros((d, D * h), F32)
    zeros_w2 = lambda: jnp.zeros((D * (h2 or h), d), F32)
    zeros_mid = (lambda: jnp.zeros((D * h, D * h2), F32)) if h2 else \
        (lambda: None)
    zeros_ln = lambda: jnp.zeros((d,), F32)
    if apply_q:
        dq0, dw1c_q, dwm_q, dw2c_q, dls_q, dlb_q = _meta_bwd(
            dqn.reshape(N, d), xhat_q, inv_q, q0, hq,
            m_yq if use_drop else None, w1q, wmidq, w2q, lnq_ref[0])
    else:
        dq0, dw1c_q, dwm_q, dw2c_q = (dqn.reshape(N, d), zeros_w1(),
                                      zeros_mid(), zeros_w2())
        dls_q = dlb_q = zeros_ln()
    if apply_k:
        dk0, dw1c_k, dwm_k, dw2c_k, dls_k, dlb_k = _meta_bwd(
            dkn.reshape(N, d), xhat_k, inv_k, k0, hk,
            m_yk if use_drop else None, w1k, wmidk, w2k, lnk_ref[0])
    else:
        dk0, dw1c_k, dwm_k, dw2c_k = (dkn.reshape(N, d), zeros_w1(),
                                      zeros_mid(), zeros_w2())
        dls_k = dlb_k = zeros_ln()

    dqkv = jnp.concatenate([dq0, dk0, dv3.reshape(N, d)], axis=1)  # [N, 3d]
    dwqkv = jnp.dot(x2.T, dqkv, preferred_element_type=F32)
    dx = dx + jnp.dot(dqkv, wqkv.T,
                      preferred_element_type=F32).reshape(TB, F_, d)

    dx_ref[:] = dx.astype(dx_ref.dtype)

    vals = [dwqkv, dw1c_q]
    if h2 is not None:
        vals.append(dwm_q)
    vals += [dw2c_q, (dls_q, dlb_q), dw1c_k]
    if h2 is not None:
        vals.append(dwm_k)
    vals += [dw2c_k, (dls_k, dlb_k), dwout, (dlno_s, dlno_b)]
    _write_param_grads(grad_refs, h2, vals)


def _bwd_ablate() -> frozenset:
    """BENCH-ONLY knockout knob for the backward-interior ablation
    (bench/bwd_ablation.py, VERDICT r3 weak #4): comma list env
    ``SATRANS_BWD_ABLATE`` of stages to SKIP in the backward kernels -
    'attn' (the per-head gradient contractions), 'meta_q'/'meta_k' (the
    MetaNet+LN backward of that path), 'wqkv' (the input-projection grad
    GEMMs), 'lnout' (the outer LayerNorm backward).  Outputs are
    mathematically WRONG when non-empty; read at trace time, never set in
    production paths (equality tests run with it unset)."""
    v = os.environ.get("SATRANS_BWD_ABLATE", "")
    return frozenset(s for s in v.split(",") if s)


def _meta_bwd(dyn, xhat, inv, t0, hs, y_mask, w1, wmid, w2, ln_scale):
    """MetaNet+LN backward for one projection path.

    dyn/xhat/inv/t0 [N, d]; hs = (hm,) or (hm, h2) from :func:`_meta_apply`;
    w1 [d, D*h]; wmid None or [D*h, D*h2]; w2 [D*h_last, d].
    Returns (dt0, dW1, dWmid-or-None, dW2, dls, dlb)."""
    dls = jnp.sum(dyn * xhat, axis=0)
    dlb = jnp.sum(dyn, axis=0)
    duq = _layer_norm_bwd(dyn, xhat, inv, ln_scale)
    dy = duq * y_mask if y_mask is not None else duq
    dt0 = duq  # residual branch
    hm = hs[0]
    if wmid is None:
        dhm = jnp.dot(dy, w2.T, preferred_element_type=F32)   # [N, D*h]
        dw2c = jnp.dot(hm.T, dy, preferred_element_type=F32)  # [D*h, d]
        dwmid = None
    else:
        h2 = hs[1]
        # relu' at the block-diag middle layer: (h2 > 0) is zero outside
        # the own-domain block too, keeping dwmid's off-diagonal blocks
        # exactly zero (disjoint supports)
        dh2 = jnp.dot(dy, w2.T, preferred_element_type=F32) \
            * (h2 > 0).astype(F32)                            # [N, D*h2]
        dw2c = jnp.dot(h2.T, dy, preferred_element_type=F32)  # [D*h2, d]
        dwmid = jnp.dot(hm.T, dh2, preferred_element_type=F32)
        dhm = jnp.dot(dh2, wmid.T, preferred_element_type=F32)
    # d/dH0 of relu+mask: both fold into (hm > 0)
    dh0 = dhm * (hm > 0).astype(F32)
    dw1c = jnp.dot(t0.T, dh0, preferred_element_type=F32)  # [d, D*h]
    dt0 = dt0 + jnp.dot(dh0, w1.T, preferred_element_type=F32)
    return dt0, dw1c, dwmid, dw2c, dls, dlb


def _bwd_kernel_stash(seed_ref, dom_ref, x_ref, wqkv_ref, *rest,
                      stash_s: bool,
                      D: int, h: int, h2: int | None, head_num: int,
                      drop_rate: float,
                      train: bool, f_real: int | None = None,
                      attn_cap: int | None = None, relu_out: bool = False,
                      apply_q: bool = True, apply_k: bool = True):
    """Backward consuming the forward's stashed residuals.

    Twin of :func:`_bwd_kernel` (same backward math - both are pinned to the
    XLA path by tests/test_pallas_meta_block.py); instead of recomputing the
    whole forward it reads ``qkv``/``uq``/``uk``[/``s``]/``o`` and
    recomputes only the relu hidden layers and ``z`` (one GEMM each).
    Dropout masks are regenerated from the PRNG in the forward's draw order.

    ``rest`` layout after the weight refs: ``[mask]`` (light mode only) +
    ``g, qkv, uq, uk`` + ``[s]`` (full mode only) + ``o`` + the outputs
    (dx + parameter grads).  In 'light' mode the attention probabilities
    are recomputed from the stashed pre-LN sums (2 GEMMs + softmax per
    head) instead of read from HBM - the s stash is the bulk of the
    residual traffic.
    """
    ws, tail = _split_w(rest, h2)
    (w1q_ref, wmidq_ref, w2q_ref, lnq_ref, w1k_ref, wmidk_ref, w2k_ref,
     lnk_ref, wout_ref, lno_ref) = ws
    if stash_s:
        mask_ref = None
        g_ref, qkv_ref, uq_ref, uk_ref, s_ref, o_ref = tail[:6]
        dx_ref, grad_refs = tail[6], tail[7:]
    else:
        mask_ref, g_ref, qkv_ref, uq_ref, uk_ref, o_ref = tail[:6]
        s_ref = None
        dx_ref, grad_refs = tail[6], tail[7:]
    TB, F_, d = x_ref.shape
    N = TB * F_
    dh = d // head_num
    scale = 1.0 / math.sqrt(dh)
    use_drop = train and drop_rate > 0.0

    # ---- regenerate dropout masks in the forward draw order (an
    # unapplied projection drew no mask in the forward) ----
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
    onehot = dom_ref[:]
    onehot_rows = jnp.broadcast_to(onehot[:, None, :],
                                   (TB, F_, onehot.shape[1])
                                   ).reshape(N, onehot.shape[1])
    w1q = w1q_ref[:] if apply_q else None
    w2q = w2q_ref[:] if apply_q else None
    wmidq = wmidq_ref[:] if (apply_q and wmidq_ref is not None) else None
    w1k = w1k_ref[:] if apply_k else None
    w2k = w2k_ref[:] if apply_k else None
    wmidk = wmidk_ref[:] if (apply_k and wmidk_ref is not None) else None
    wqkv = wqkv_ref[:]
    wout = wout_ref[:]

    # ---- load stashed residuals; light recompute of the cheap pieces ----
    qkv = qkv_ref[:].reshape(N, 3 * d).astype(F32)
    q0, k0, v0 = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
    mask_rows = jnp.dot(onehot_rows, _expand_const(D, h),
                        preferred_element_type=F32)

    def _hiddens(t0, w1, wmid):
        hm_ = jax.nn.relu(jnp.dot(t0, w1, preferred_element_type=F32)) \
            * mask_rows
        if wmid is None:
            return (hm_,)
        return (hm_, jax.nn.relu(jnp.dot(hm_, wmid,
                                         preferred_element_type=F32)))

    if apply_q:
        hq = _hiddens(q0, w1q, wmidq)
        qn, xhat_q, inv_q = _layer_norm_fwd(uq_ref[:].reshape(N, d)
                                            .astype(F32),
                                            lnq_ref[0], lnq_ref[1])
    else:
        qn = q0
    if apply_k:
        hk = _hiddens(k0, w1k, wmidk)
        kn, xhat_k, inv_k = _layer_norm_fwd(uk_ref[:].reshape(N, d)
                                            .astype(F32),
                                            lnk_ref[0], lnk_ref[1])
    else:
        kn = k0

    g_attn = _attn_group(TB, F_, attn_cap)
    groups = TB // g_attn
    n_attn = g_attn * F_
    q3 = (qn * scale).reshape(groups, n_attn, d)
    k3 = kn.reshape(groups, n_attn, d)
    v3 = v0.reshape(groups, n_attn, d)

    if stash_s:
        s_list = [s_ref[hd].astype(F32) for hd in range(head_num)]
    else:
        # recompute the pre-dropout probabilities from qn/kn (the same
        # contraction order as the forward - bit-matching softmax inputs)
        blk_mask = mask_ref[:]
        masked_attn = _attn_variant() == "masked"
        hm_attn = _head_masks(d, head_num) if masked_attn else None
        s_list = []
        for hd in range(head_num):
            sl = slice(hd * (d // head_num), (hd + 1) * (d // head_num))
            if masked_attn:
                qh, kh = q3 * hm_attn[hd], k3
            else:
                qh, kh = q3[..., sl], k3[..., sl]
            sh = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                     preferred_element_type=F32)
            s_list.append(_softmax_lastdim(_clip_logits(sh) + blk_mask))
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
    ablate = _bwd_ablate()  # bench-only knockouts, empty in production
    g = g_ref[:].astype(F32)
    dlno_s = jnp.sum(g * xhat_o, axis=(0, 1))
    dlno_b = jnp.sum(g, axis=(0, 1))
    du = g if "lnout" in ablate \
        else _layer_norm_bwd(g, xhat_o, inv_o, lno_ref[0])
    dx = du  # residual
    dz = du.reshape(N, d)
    if use_drop:
        dz = dz * m_z
    if relu_out:
        dz = dz * (zlin > 0).astype(F32)
    dwout = jnp.dot(o2.T, dz, preferred_element_type=F32)
    do2 = jnp.dot(dz, wout.T, preferred_element_type=F32)
    do3 = do2.reshape(groups, n_attn, d)

    # All grads stay on the grouped [G, n, *] shapes: S is exactly zero off
    # the example-diagonal blocks, so full-matrix contractions are correct.
    if "attn" in ablate:
        dq3 = dk3 = dv3 = do3
    else:
        dq3, dk3, dv3 = _attn_bwd_heads(do3, q3, k3, v3, s_list, sm_list,
                                        m_s if use_drop else None, use_drop,
                                        head_num, dh)
    dqn = dq3.reshape(TB, F_, d) * scale
    dkn = dk3.reshape(TB, F_, d)

    zeros_w1 = lambda: jnp.zeros((d, D * h), F32)
    zeros_w2 = lambda: jnp.zeros((D * (h2 or h), d), F32)
    zeros_mid = (lambda: jnp.zeros((D * h, D * h2), F32)) if h2 else \
        (lambda: None)
    zeros_ln = lambda: jnp.zeros((d,), F32)
    if not apply_q or "meta_q" in ablate:
        dq0, dw1c_q, dwm_q, dw2c_q = (dqn.reshape(N, d), zeros_w1(),
                                      zeros_mid(), zeros_w2())
        dls_q = dlb_q = zeros_ln()
    else:
        dq0, dw1c_q, dwm_q, dw2c_q, dls_q, dlb_q = _meta_bwd(
            dqn.reshape(N, d), xhat_q, inv_q, q0, hq,
            m_yq if use_drop else None, w1q, wmidq, w2q, lnq_ref[0])
    if not apply_k or "meta_k" in ablate:
        dk0, dw1c_k, dwm_k, dw2c_k = (dkn.reshape(N, d), zeros_w1(),
                                      zeros_mid(), zeros_w2())
        dls_k = dlb_k = zeros_ln()
    else:
        dk0, dw1c_k, dwm_k, dw2c_k, dls_k, dlb_k = _meta_bwd(
            dkn.reshape(N, d), xhat_k, inv_k, k0, hk,
            m_yk if use_drop else None, w1k, wmidk, w2k, lnk_ref[0])

    if "wqkv" in ablate:
        dwqkv = jnp.zeros((d, 3 * d), F32)
    else:
        dqkv = jnp.concatenate([dq0, dk0, dv3.reshape(N, d)], axis=1)
        dwqkv = jnp.dot(x2.T, dqkv, preferred_element_type=F32)
        dx = dx + jnp.dot(dqkv, wqkv.T,
                          preferred_element_type=F32).reshape(TB, F_, d)

    dx_ref[:] = dx.astype(dx_ref.dtype)

    vals = [dwqkv, dw1c_q]
    if h2 is not None:
        vals.append(dwm_q)
    vals += [dw2c_q, (dls_q, dlb_q), dw1c_k]
    if h2 is not None:
        vals.append(dwm_k)
    vals += [dw2c_k, (dls_k, dlb_k), dwout, (dlno_s, dlno_b)]
    _write_param_grads(grad_refs, h2, vals)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

def _common_in_specs(block_b, F_, d, D, h, mask_shape=None, h2=None):
    """Input specs shared by the kernels; ``mask_shape=None`` omits the
    attention block-mask operand (the stash backward reads probabilities
    from the residuals and never touches the mask).  ``h2`` adds the two
    block-diagonal middle-matrix operands of the 3-matrix MetaNet (their
    w2stack rows become D*h2)."""
    w_last = D * (h2 or h)
    mid = [pl.BlockSpec((D * h, D * h2), lambda i, *_: (0, 0))] \
        if h2 is not None else []
    specs = [
        pl.BlockSpec((block_b, D), lambda i, *_: (i, 0)),
        pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((d, 3 * d), lambda i, *_: (0, 0)),
        pl.BlockSpec((d, D * h), lambda i, *_: (0, 0)),    # w1q
        *mid,                                              # wmidq
        pl.BlockSpec((w_last, d), lambda i, *_: (0, 0)),   # w2q
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),        # lnq
        pl.BlockSpec((d, D * h), lambda i, *_: (0, 0)),    # w1k
        *mid,                                              # wmidk
        pl.BlockSpec((w_last, d), lambda i, *_: (0, 0)),   # w2k
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),        # lnk
        pl.BlockSpec((d, d), lambda i, *_: (0, 0)),        # wout
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),        # lno
    ]
    if mask_shape is not None:
        specs.append(pl.BlockSpec(mask_shape, lambda i, *_: (0, 0, 0)))
    return specs


def _stash_specs(B, block_b, F_, d, head_num, g_att, dtype=F32,
                 with_s: bool = True):
    """(out_shapes, out_specs) for the stashed residuals.

    ``dtype=bf16`` halves the stash HBM traffic (~450 MB/layer fp32 at
    B=8192, dominated by the [H, B/g, n, n] attention probabilities);
    backward math stays fp32 - residuals are cast back on load.  The
    softmax probabilities and pre-LN sums tolerate bf16's 2^-8 resolution
    (gradient error bounded by the parametrized bf16 grad test).
    ``with_s=False`` ('light' mode) drops the s stash entirely - the
    backward recomputes the probabilities."""
    groups_t = block_b // g_att
    n = g_att * F_
    shapes = [
        jax.ShapeDtypeStruct((B, F_, 3 * d), dtype),               # qkv
        jax.ShapeDtypeStruct((B, F_, d), dtype),                   # uq
        jax.ShapeDtypeStruct((B, F_, d), dtype),                   # uk
    ]
    specs = [
        pl.BlockSpec((block_b, F_, 3 * d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)),
    ]
    if with_s:
        shapes.append(
            jax.ShapeDtypeStruct((head_num, B // g_att, n, n), dtype))
        specs.append(pl.BlockSpec((head_num, groups_t, n, n),
                                  lambda i, *_: (0, i, 0, 0)))
    shapes.append(jax.ShapeDtypeStruct((B, F_, d), dtype))          # o
    specs.append(pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)))
    return tuple(shapes), tuple(specs)


def _w_operands(wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout,
                lno, h2):
    """Pallas weight-operand list: the wmid dummies are dropped in the
    2-matrix case so Mosaic never sees them."""
    if h2 is not None:
        return [wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout, lno]
    return [wqkv, w1q, w2q, lnq, w1k, w2k, lnk, wout, lno]


def _fwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout,
              lno, onehot, seed, cfg):
    """Forward kernel dispatch.  With ``cfg.stash`` returns
    ``(y, qkv, uq, uk, s, o)``; otherwise just ``y``."""
    B, F_, d = x.shape
    (D, h, head_num, drop_rate, train, block_b, interpret, f_real,
     attn_cap, stash, stash_dtype, relu_out, apply_q, apply_k, h2) = cfg
    if B % block_b:
        # a non-dividing batch would leave the tail rows of the output
        # uninitialized HBM (grid floor-divides) - fail loudly like the
        # inference-only fused_meta_layer does
        raise ValueError(f"batch {B} must divide block_b {block_b}")
    g_att = _attn_group(block_b, F_, attn_cap)
    mask = _block_mask(block_b // g_att, g_att, F_,
                       f_real if f_real is not None else F_)
    in_specs = _common_in_specs(block_b, F_, d, D, h, mask.shape, h2)
    y_shape = jax.ShapeDtypeStruct((B, F_, d), x.dtype)
    y_spec = pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0))
    if stash:
        st_shapes, st_specs = _stash_specs(B, block_b, F_, d, head_num,
                                           g_att, stash_dtype,
                                           with_s=stash != "light")
        kern = functools.partial(_fwd_kernel_stash,
                                 stash_s=stash != "light")
        out_shape, out_specs = (y_shape,) + st_shapes, (y_spec,) + st_specs
    else:
        kern, out_shape, out_specs = _fwd_kernel, y_shape, y_spec
    kernel = functools.partial(kern, D=D, h=h, h2=h2, head_num=head_num,
                               drop_rate=drop_rate, train=train,
                               f_real=f_real, attn_cap=attn_cap,
                               relu_out=relu_out, apply_q=apply_q,
                               apply_k=apply_k)
    w_ops = _w_operands(wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                        wout, lno, h2)
    with _interp_prng_scope(interpret):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B // block_b,),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(seed, onehot, x, *w_ops, mask)


def _bwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout,
              lno, onehot, seed, g, cfg, stash_res=None):
    B, F_, d = x.shape
    (D, h, head_num, drop_rate, train, block_b, interpret, f_real,
     attn_cap, stash, _stash_dtype, relu_out, apply_q, apply_k, h2) = cfg
    kern = (functools.partial(_bwd_kernel_stash, stash_s=stash != "light")
            if stash else _bwd_kernel)
    kernel = functools.partial(kern, D=D, h=h, h2=h2, head_num=head_num,
                               drop_rate=drop_rate, train=train,
                               f_real=f_real, attn_cap=attn_cap,
                               relu_out=relu_out, apply_q=apply_q,
                               apply_k=apply_k)
    g_att = _attn_group(block_b, F_, attn_cap)
    w_ops = _w_operands(wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                        wout, lno, h2)
    if stash == "full":
        in_specs = _common_in_specs(block_b, F_, d, D, h, None, h2)
        operands = [seed, onehot, x, *w_ops, g]
    else:
        # light-stash and recompute modes both need the attention mask
        mask = _block_mask(block_b // g_att, g_att, F_,
                           f_real if f_real is not None else F_)
        in_specs = _common_in_specs(block_b, F_, d, D, h, mask.shape, h2)
        operands = [seed, onehot, x, *w_ops, mask, g]
    in_specs.append(pl.BlockSpec((block_b, F_, d),
                                 lambda i, *_: (i, 0, 0)))  # g
    if stash:
        _, st_specs = _stash_specs(B, block_b, F_, d, head_num, g_att,
                                   with_s=stash != "light")
        in_specs.extend(st_specs)
        operands.extend(stash_res)
    w_last = D * (h2 or h)
    mid_shape = [jax.ShapeDtypeStruct((D * h, D * h2), F32)] \
        if h2 is not None else []
    mid_spec = [pl.BlockSpec((D * h, D * h2), lambda i, *_: (0, 0))] \
        if h2 is not None else []
    out_shapes = (
        jax.ShapeDtypeStruct((B, F_, d), x.dtype),        # dx
        jax.ShapeDtypeStruct((d, 3 * d), F32),            # dwqkv
        jax.ShapeDtypeStruct((d, D * h), F32),            # dw1q
        *mid_shape,                                       # dwmidq
        jax.ShapeDtypeStruct((w_last, d), F32),           # dw2q
        jax.ShapeDtypeStruct((2, d), F32),                # dlnq
        jax.ShapeDtypeStruct((d, D * h), F32),            # dw1k
        *mid_shape,                                       # dwmidk
        jax.ShapeDtypeStruct((w_last, d), F32),           # dw2k
        jax.ShapeDtypeStruct((2, d), F32),                # dlnk
        jax.ShapeDtypeStruct((d, d), F32),                # dwout
        jax.ShapeDtypeStruct((2, d), F32),                # dlno
    )
    out_specs = (
        pl.BlockSpec((block_b, F_, d), lambda i, *_: (i, 0, 0)),
        pl.BlockSpec((d, 3 * d), lambda i, *_: (0, 0)),
        pl.BlockSpec((d, D * h), lambda i, *_: (0, 0)),
        *mid_spec,
        pl.BlockSpec((w_last, d), lambda i, *_: (0, 0)),
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),
        pl.BlockSpec((d, D * h), lambda i, *_: (0, 0)),
        *mid_spec,
        pl.BlockSpec((w_last, d), lambda i, *_: (0, 0)),
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),
        pl.BlockSpec((d, d), lambda i, *_: (0, 0)),
        pl.BlockSpec((2, d), lambda i, *_: (0, 0)),
    )
    with _interp_prng_scope(interpret):
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
        return out
    # splice None into the wmid gradient slots for a uniform return layout
    (dx, dwqkv, dw1q, dw2q, dlnq, dw1k, dw2k, dlnk, dwout, dlno) = out
    return (dx, dwqkv, dw1q, None, dw2q, dlnq, dw1k, None, dw2k, dlnk,
            dwout, dlno)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14,))
def _fused_layer(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout,
                 lno, onehot, seed, cfg):
    # primal (no grad requested -> eval/serving): never stash - the
    # residuals would be written and read by nobody
    return _fwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                     wout, lno, onehot, seed, cfg[:9] + (False,) + cfg[10:])


def _fused_layer_fwd(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                     wout, lno, onehot, seed, cfg):
    out = _fwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                    wout, lno, onehot, seed, cfg)
    if cfg[9]:
        y, *stash_res = out
        return y, (x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                   wout, lno, onehot, seed, tuple(stash_res))
    return out, (x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                 wout, lno, onehot, seed, None)


def _fused_layer_bwd(cfg, res, g):
    (x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk, wout, lno,
     onehot, seed, stash_res) = res
    (dx, dwqkv, dw1q, dwmidq, dw2q, dlnq, dw1k, dwmidk, dw2k, dlnk, dwout,
     dlno) = _bwd_call(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                       wout, lno, onehot, seed, g, cfg,
                       stash_res=stash_res)
    if dwmidq is None:  # 2-matrix: the dummies get zero cotangents
        dwmidq = jnp.zeros_like(wmidq)
        dwmidk = jnp.zeros_like(wmidk)
    return (dx, dwqkv, dw1q, dwmidq, dw2q, dlnq, dw1k, dwmidk, dw2k, dlnk,
            dwout, dlno, jnp.zeros_like(onehot), jnp.zeros_like(seed))


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_meta_layer_vjp(x, layer_params, meta_tables, domain_onehot, *,
                         meta_units, head_num: int, drop_rate: float = 0.1,
                         train: bool = False, seed: int = 0,
                         block_b: int = 128, interpret: bool = False,
                         attn_cap: int | None = None,
                         bwd: str | None = None,
                         stash_dtype: str | None = None,
                         relu_out: bool = False, mode: str = "QK"):
    """Differentiable fused layer.  The packing (concats/reshapes) happens
    outside the custom-vjp boundary so XLA autodiffs it, routing gradients
    back to the original parameter structure including the per-domain flat
    meta tables.

    ``bwd``: ``'stash'`` (default; env ``SATRANS_BWD`` overrides) stores the
    forward residuals (qkv, pre-LN sums, attention probs, attention output)
    to HBM and the backward skips the flash-style recompute;
    ``'stash_light'`` stashes everything EXCEPT the attention
    probabilities (the [H, B/g, n, n] tensor is the bulk of the residual
    traffic) and recomputes them from the stashed pre-LN sums;
    ``'recompute'`` is the round-1 behavior (backward regenerates all the
    forward internals).  Same math in every mode - all backward kernels
    are pinned to the XLA reference by tests.

    ``mode`` is the reference ``meta_mode`` string: a projection is
    MetaNet-transformed iff its letter appears (containment semantics,
    reference satrans.py:61-75) - 'Query' (the CLI default) transforms Q
    only, leaving K the raw projection.  ``meta_units`` of length 4
    selects the 3-matrix MetaNet (``meta_dnn_hidden_units`` with three
    entries); the middle matrices ride as block-diagonal operands.

    'pos' support: ``meta_tables['Q']``/``['K']`` may be DISTINCT [D, P]
    arrays (per-(layer, qkv) params, reference satrans.py:225-234) and
    ``layer_params`` may carry a separate ``k_meta`` LayerNorm; the shared
    case packs the same arrays twice and autodiff sums the two paths."""
    B, F_, d = x.shape
    D = domain_onehot.shape[1]
    h = meta_units[1]
    if len(meta_units) not in (3, 4):
        raise ValueError(f"kernel supports 2- or 3-matrix MetaNets, got "
                         f"units {list(meta_units)}")
    h2 = meta_units[2] if len(meta_units) == 4 else None
    apply_q, apply_k = "Q" in mode, "K" in mode
    dummy = jnp.zeros((1, 1), F32)
    if apply_q:
        w1q, wmidq, w2q = _pack_meta(meta_tables, "Q", d, meta_units, D)
    else:
        w1q = jnp.zeros((d, D * h), F32)
        wmidq = jnp.zeros((D * h, D * h2), F32) if h2 else None
        w2q = jnp.zeros((D * (h2 or h), d), F32)
    if apply_k:
        w1k, wmidk, w2k = _pack_meta(meta_tables, "K", d, meta_units, D)
    else:
        w1k = jnp.zeros((d, D * h), F32)
        wmidk = jnp.zeros((D * h, D * h2), F32) if h2 else None
        w2k = jnp.zeros((D * (h2 or h), d), F32)
    if h2 is None:
        wmidq = wmidk = dummy
    wqkv = jnp.concatenate([layer_params["wq"], layer_params["wk"],
                            layer_params["wv"]], axis=1)
    lnq, lnk = _pack_lns(layer_params, d)
    lno = jnp.stack([layer_params["ln"]["scale"], layer_params["ln"]["bias"]])
    # pad the field axis to a sublane multiple - odd F (19) provokes very
    # slow Mosaic relayout codegen; padded key columns are softmax-masked.
    # SATRANS_PAD_F tunes the multiple (every [N, *] tensor in the kernel
    # scales with the padded F, so smaller legal multiples are cheaper).
    f_real = F_
    pad_mult = int(os.environ.get("SATRANS_PAD_F", "8"))
    pad_f = (-F_) % pad_mult if pad_mult > 1 else 0  # <=1 disables padding
    if pad_f:
        x = jnp.pad(x, ((0, 0), (0, pad_f), (0, 0)))
    if bwd is None:
        bwd = os.environ.get("SATRANS_BWD", "stash")
    if bwd not in ("stash", "stash_light", "recompute"):
        raise ValueError(f"unknown bwd mode {bwd!r}")
    # Residual stash dtype.  bf16 halves the stash HBM traffic (~450 MB/
    # layer fp32 at B=8192) but measured SLOWER end-to-end on v5e: lazy
    # 260.7k vs 280.2k ex/s, dense 205.9k vs 215.6k (bank_modes A/B,
    # docs/PERFORMANCE.md r3) - the layer is relayout/VPU-bound, not HBM-
    # bound, and bf16's (16, 128) tiling + cast passes cost more than the
    # saved bandwidth.  Default stays f32; SATRANS_STASH=bf16 opts in
    # (grad error pinned by the bf16 test in tests/test_pallas_meta_block).
    if stash_dtype is None:
        stash_dtype = os.environ.get("SATRANS_STASH", "f32")
    if stash_dtype not in ("bf16", "f32"):
        raise ValueError(f"unknown stash dtype {stash_dtype!r}")
    stash_mode = {"stash": "full", "stash_light": "light",
                  "recompute": False}[bwd]
    cfg = (D, h, head_num, drop_rate, train, block_b, interpret,
           f_real if pad_f else None, attn_cap, stash_mode,
           jnp.bfloat16 if stash_dtype == "bf16" else F32, relu_out,
           apply_q, apply_k, h2)
    seed_arr = jnp.asarray([seed], jnp.int32)
    y = _fused_layer(x, wqkv, w1q, wmidq, w2q, lnq, w1k, wmidk, w2k, lnk,
                     layer_params["wout"], lno,
                     domain_onehot.astype(F32), seed_arr, cfg)
    return y[:, :f_real] if pad_f else y
