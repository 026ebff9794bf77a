"""Probe: precision variants of the equality-GEMM duplicate combine.

The lazy bank update's eq-GEMM combine (embeddings.eqgemm_combine) costs
~2.7 ms/step at the headline shapes - an ``[F,B,B] @ [F,B,W]`` einsum whose
left operand is an exactly-representable 0/1 matrix.  XLA's default f32 dot
on TPU decomposes into multiple bf16 MXU passes; because ``e`` is bf16-exact
we can drop it to ONE pass, and split only ``g`` into bf16 hi/lo halves
(``g == hi + lo + O(2^-17 |g|)``), giving a 2-pass GEMM that keeps ~17
mantissa bits of the combined gradient instead of 8.

Bit-identity (the row-DMA scatter's precondition) is precision-INDEPENDENT:
duplicate positions within a field have identical equality-matrix rows, so
their dot products are the same computation at any precision; boundary-shared
rows are overwritten with one exact f32 total regardless.

Variants timed at the headline shapes (large AliCCP fields, B=8192, W=128):
  f32_default   - the XLA einsum (jnp default precision)
  f32_highest   - 6-pass reference (also the accuracy reference)
  onepass_bf16  - e bf16 @ g bf16 einsum (the kernel's error class)
  twopass_split - e bf16 @ (g_hi + g_lo), two 1-pass GEMMs
  pallas_kernel - ops/pallas/eqgemm.eqgemm_positions: equality tiles built
                  in VMEM, one bf16 MXU pass, NO [F,B,B] HBM tensor

Run: PYTHONPATH=/root/repo:/root/.axon_site python -m satrans_tpu.bench.eqgemm_probe
Artifact: bench_results/eqgemm_probe_v5e_r4.json
"""

import json
import sys
import time

import numpy as np

REPS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from satrans_tpu import embeddings
    from satrans_tpu.data.aliccp import DATA_MAX, SPARSE_FEATURES

    B = 8192
    W = 128
    rp = 4  # pack factor at dim 32

    # the headline large fields: AliCCP vocabs above the side-bank threshold
    vocabs = [DATA_MAX[k] + 2 for k in SPARSE_FEATURES
              if DATA_MAX[k] + 2 > embeddings.SMALL_TABLE_THRESHOLD]
    F = len(vocabs)
    offs = np.cumsum([0] + vocabs[:-1])
    rng = np.random.default_rng(0)
    # zipf-flavored ids inside each field's physical-row range, matching the
    # production skew (uniform draws would understate duplicate density)
    ids = np.stack([
        (o + np.minimum(rng.zipf(1.3, size=B) - 1, v - 1)) // rp
        for o, v in zip(offs, vocabs)]).astype(np.int32)
    g = rng.normal(size=(F, B, W)).astype(np.float32) * 1e-2

    ids_d = jax.device_put(ids)
    g_d = jax.device_put(g)

    def timed(name, fn):
        def run(i_, g_):
            def it(r, carry):
                return fn(i_, g_ + carry * 0.0)
            out = lax.fori_loop(0, REPS, it, jnp.zeros_like(g_))
            return jnp.sum(out)
        f = jax.jit(run)
        float(f(ids_d, g_d))
        t0 = time.time()
        s = float(f(ids_d, g_d))
        dt = (time.time() - t0) / REPS * 1e3
        log(f"{name:24s} {dt:8.3f} ms  (sum {s:.6e})")
        return dt

    def combine(precision=None):
        def fn(i_, g_):
            e = (i_[:, :, None] == i_[:, None, :])
            return jnp.einsum("fij,fjw->fiw", e.astype(g_.dtype), g_,
                              precision=precision)
        return fn

    def onepass_bf16(i_, g_):
        e = (i_[:, :, None] == i_[:, None, :]).astype(jnp.bfloat16)
        return jnp.einsum("fij,fjw->fiw", e, g_.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def twopass_split(i_, g_):
        e = (i_[:, :, None] == i_[:, None, :]).astype(jnp.bfloat16)
        hi = g_.astype(jnp.bfloat16)
        lo = (g_ - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s = jnp.einsum("fij,fjw->fiw", e, hi,
                       preferred_element_type=jnp.float32)
        return s + jnp.einsum("fij,fjw->fiw", e, lo,
                              preferred_element_type=jnp.float32)

    from satrans_tpu.ops.pallas import eqgemm as eqk

    def pallas_kernel(i_, g_):
        return eqk.eqgemm_positions(i_, g_)

    out = {"F": F, "B": B, "W": W, "reps_in_jit": REPS,
           "device": str(jax.devices()[0]).split(":")[0]}
    out["f32_default_ms"] = timed("f32_default", combine(None))
    out["f32_highest_ms"] = timed("f32_highest", combine("highest"))
    out["onepass_bf16_ms"] = timed("onepass_bf16", onepass_bf16)
    out["twopass_split_ms"] = timed("twopass_split", twopass_split)
    out["pallas_kernel_ms"] = timed("pallas_kernel", pallas_kernel)

    # accuracy vs the 6-pass reference, plus the bit-identity check
    ref = jax.jit(combine("highest"))(ids_d, g_d)
    scale = float(jnp.max(jnp.abs(ref)))
    for name, fn in [("f32_default", combine(None)),
                     ("onepass_bf16", onepass_bf16),
                     ("twopass_split", twopass_split),
                     ("pallas_kernel", pallas_kernel)]:
        v = jax.jit(fn)(ids_d, g_d)
        err = float(jnp.max(jnp.abs(v - ref))) / scale
        out[f"{name}_relerr"] = err
        log(f"{name:24s} max rel err vs highest: {err:.3e}")
        # duplicate positions must be byte-identical
        vn = np.asarray(v)
        ok = True
        for f_i in range(F):
            _, inv = np.unique(ids[f_i], return_inverse=True)
            for u in range(inv.max() + 1):
                rows = vn[f_i][inv == u]
                if rows.shape[0] > 1 and not (rows == rows[0]).all():
                    ok = False
        out[f"{name}_dup_bit_identical"] = ok
        log(f"{name:24s} duplicate bit-identity: {ok}")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
