"""Microbenchmark the primitives the embedding-bank update is built from.

Round-2 diagnostic: fused/lazy bank updates underperformed the cost model;
first measurements showed the COMBINE (argsort 5ms + segment_sum 5.7ms) is
the true bottleneck of every mode, and duplicate scatters cost ~0.4us/row.
This bench times each primitive and the redesign candidates at the exact
headline shapes: bank [1.64M, 128] fp32 (840 MB), N = 81,920 touched rows
(10 fields x B=8192).

All timings loop REPS times INSIDE one jit (lax.fori_loop) - one compile,
one dispatch, donation-free in-place steady state.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -m satrans_tpu.bench.scatter_primitives
"""

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

    R = 1_638_400
    W = 128
    F = 10
    B = 8192
    N = F * B

    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, R, N).astype(np.int32)
    args = {
        "ids": jax.device_put(ids_np),
        "ids_f": jax.device_put(ids_np.reshape(F, B)),
        "ids_sorted": jax.device_put(np.sort(ids_np)),
        "g": jax.device_put(rng.normal(size=(N, W)).astype(np.float32)),
        "g_f": jax.device_put(
            rng.normal(size=(F, B, W)).astype(np.float32)),
        "bank": jax.device_put(np.zeros((R, W), np.float32)),
        "seg_sorted": jax.device_put(
            np.sort(rng.integers(0, N, N)).astype(np.int32)),
    }

    def timed(name, body, *names):
        """body(i, *tensors) -> one tensor; looped REPS times in-jit.

        The jit returns ONE SCALAR (sum of the final carry): fetching the
        full result through the axon tunnel costs seconds per 100 MB and
        was swamping every measurement - the fence must move 4 bytes.
        """
        tensors = [args[n] for n in names]

        def run(*ts):
            def it(i, carry):
                return body(i, carry, *ts[1:])
            out = lax.fori_loop(0, REPS, it, ts[0])
            return jnp.sum(jax.tree_util.tree_leaves(out)[0])

        f = jax.jit(run)
        float(f(*tensors))  # compile + warm
        t0 = time.time()
        s = float(f(*tensors))  # scalar device->host fence
        dt = (time.time() - t0) / REPS * 1e3
        log(f"{name:58s} {dt:8.2f} ms   (sum {s:.3e})")
        return dt

    log(f"bank [{R},{W}] = {R*W*4/1e9:.2f} GB; N={N} ({F}x{B}); "
        f"in-jit x{REPS}")

    # sorts
    timed("argsort [N]",
          lambda i, c, ids: jnp.argsort(ids + i).astype(jnp.float32)[:, None]
          * jnp.ones((1, W)), "g", "ids")
    timed("argsort batched [F,B] per-field",
          lambda i, c, ids_f: jnp.argsort(ids_f + i, axis=-1).astype(
              jnp.float32).reshape(N)[:, None] * jnp.ones((1, W)),
          "g", "ids_f")
    timed("lax.sort (ids, iota) pairs [N]",
          lambda i, c, ids: lax.sort(
              (ids + i, lax.iota(jnp.int32, N)))[1].astype(
              jnp.float32)[:, None] * jnp.ones((1, W)), "g", "ids")

    # reductions over sorted runs
    timed("segment_sum sorted -> N segs",
          lambda i, c, g, s: jax.ops.segment_sum(g + i, s, num_segments=N),
          "g", "g", "seg_sorted")
    def cumsum_dup(i, c, g, si):
        cs = jnp.cumsum(g + i, axis=0)
        is_last = jnp.concatenate([si[1:] != si[:-1],
                                   jnp.ones((1,), jnp.bool_)])
        # sum of run ending at j = cs[j] - cs[start-1]
        return jnp.where(is_last[:, None], cs, 0.0)
    timed("cumsum [N,128] + run masks (dup-sum core)", cumsum_dup,
          "g", "g", "ids_sorted")

    # scatters into the bank (in-place: carry is the bank)
    timed("scatter-SET sorted unique -> bank",
          lambda i, b, ids, g: b.at[ids].set(
              g + i, mode="drop", indices_are_sorted=True,
              unique_indices=True), "bank", "ids_sorted", "g")
    timed("scatter-SET UNsorted unique -> bank",
          lambda i, b, ids, g: b.at[ids].set(
              g + i, mode="drop", unique_indices=True), "bank", "ids", "g")
    timed("scatter-SET unsorted dup -> bank",
          lambda i, b, ids, g: b.at[ids].set(g + i, mode="drop"),
          "bank", "ids", "g")
    timed("scatter-ADD sorted unique -> bank",
          lambda i, b, ids, g: b.at[ids].add(
              g + i, mode="drop", indices_are_sorted=True,
              unique_indices=True), "bank", "ids_sorted", "g")

    # gathers
    timed("gather bank[ids] (fill default)",
          lambda i, c, b, ids: jnp.take(b, ids + 0 * i, axis=0), "g",
          "bank", "ids")
    timed("gather bank[ids] (clip)",
          lambda i, c, b, ids: jnp.take(b, ids + 0 * i, axis=0,
                                        mode="clip"), "g", "bank", "ids")

    # equality-GEMM duplicate-sum (per-field, XLA)
    def eq_gemm(i, c, ids_f, g_f):
        e = (ids_f[:, :, None] == ids_f[:, None, :])
        return jnp.einsum("fij,fjw->fiw", e.astype(jnp.float32), g_f + i)
    timed("equality-GEMM dup-sum f32 [F,B,B]@[F,B,W]", eq_gemm,
          "g_f", "ids_f", "g_f")

    def eq_gemm_bf16(i, c, ids_f, g_f):
        e = (ids_f[:, :, None] == ids_f[:, None, :])
        return jnp.einsum("fij,fjw->fiw", e.astype(jnp.bfloat16),
                          (g_f + i).astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    timed("equality-GEMM dup-sum bf16xbf16->f32", eq_gemm_bf16,
          "g_f", "ids_f", "g_f")

    # dense adam-ish pass, in-place
    def adam_pass(i, b):
        gg = 2e-5 * b
        m = 0.9 * b + 0.1 * gg
        v = 0.999 * b + 0.001 * gg * gg
        return b - 0.01 * (m / (jnp.sqrt(v) + 1e-8))
    timed("dense elementwise pass over bank (1 array rw)", adam_pass,
          "bank")


if __name__ == "__main__":
    main()
