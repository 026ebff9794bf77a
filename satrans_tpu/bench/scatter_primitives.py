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
    # genuinely unique ids: the '... unique' scatter variants pass
    # unique_indices=True, which is undefined behavior on duplicates
    # (uniform draws over 1.64M rows collide ~2k times at N=82k)
    ids_np = rng.choice(R, size=N, replace=False).astype(np.int32)
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

    # null-body control: any fixed per-iteration fori_loop cost on this
    # backend inflates every number below by the same amount
    args["zero"] = jax.device_put(np.zeros((), np.float32))
    timed("NULL body (scalar carry: loop floor)",
          lambda i, c: c + jnp.float32(i), "zero")
    timed("elementwise [N,128] add only",
          lambda i, c: c + jnp.float32(i), "g")

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

    # gathers (i-dependent ids so the gather cannot be hoisted out of the
    # rep loop)
    timed("gather bank[ids] (fill default)",
          lambda i, c, b, ids: jnp.take(b, ids + i, axis=0), "g",
          "bank", "ids")
    timed("gather bank[ids] (clip)",
          lambda i, c, b, ids: jnp.take(b, ids + i, axis=0,
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

    # --- scatter cost scaling: index count vs payload bytes ---------------
    # If per-INDEX dominated, merging the bank/mu/nu scatters (same ids)
    # into one wide payload is a ~3x win for the fused/lazy updates.
    args["bank3"] = jax.device_put(np.zeros((R, 3 * W), np.float32))
    args["g3"] = jax.device_put(
        rng.normal(size=(N, 3 * W)).astype(np.float32))
    args["g8k"] = jax.device_put(
        rng.normal(size=(N // 10, W)).astype(np.float32))
    args["ids8k_sorted"] = jax.device_put(np.sort(ids_np[:N // 10]))
    args["map_r"] = jax.device_put(np.zeros((R,), np.int32))
    timed("scatter-SET sorted unique [N,384] -> bank3 (3x payload)",
          lambda i, b, ids, g: b.at[ids].set(
              g + i, mode="drop", indices_are_sorted=True,
              unique_indices=True), "bank3", "ids_sorted", "g3")
    timed("scatter-SET sorted unique N/10 rows [8192,128]",
          lambda i, b, ids, g: b.at[ids].set(
              g + i, mode="drop", indices_are_sorted=True,
              unique_indices=True), "bank", "ids8k_sorted", "g8k")
    timed("scatter-SET int32 slot map [N] -> [R]",
          lambda i, m, ids: m.at[ids].set(
              lax.iota(jnp.int32, N) + i, mode="drop",
              indices_are_sorted=True, unique_indices=True),
          "map_r", "ids_sorted")

    # dense-merge rebuild: slot map + one dense pass with a gather from the
    # compact rows table (scatter-free row overwrite)
    def dense_merge(i, b, ids, g):
        slot = jnp.full((R,), -1, jnp.int32).at[ids].set(
            lax.iota(jnp.int32, N), mode="drop",
            indices_are_sorted=True, unique_indices=True)
        vals = jnp.take(g + i, slot.clip(0), axis=0)
        return jnp.where((slot >= 0)[:, None], vals, b)
    timed("dense-merge rebuild (map scatter + where pass)", dense_merge,
          "bank", "ids_sorted", "g")

    # one-shot fused adam over bank+mu+nu with scattered rows added via
    # dense-merge of the gradient (the fused-mode redesign candidate)
    def fused_adam_merge(i, bmn, ids, g):
        b, m, v = bmn
        slot = jnp.full((R,), -1, jnp.int32).at[ids].set(
            lax.iota(jnp.int32, N), mode="drop",
            indices_are_sorted=True, unique_indices=True)
        rows = jnp.take(g + i, slot.clip(0), axis=0)
        gg = jnp.where((slot >= 0)[:, None], rows, 0.0) + 2e-5 * b
        m2 = 0.9 * m + 0.1 * gg
        v2 = 0.999 * v + 0.001 * gg * gg
        return (b - 0.01 * (m2 / (jnp.sqrt(v2) + 1e-8)), m2, v2)
    args["mu"] = jax.device_put(np.zeros((R, W), np.float32))
    args["nu"] = jax.device_put(np.zeros((R, W), np.float32))

    def timed3(name, body):
        def run(b, m, v, *ts):
            def it(i, carry):
                return body(i, carry, *ts)
            out = lax.fori_loop(0, REPS, it, (b, m, v))
            return jnp.sum(out[0])
        f = jax.jit(run)
        ts = [args["bank"], args["mu"], args["nu"], args["ids_sorted"],
              args["g"]]
        float(f(*ts))
        t0 = time.time()
        s = float(f(*ts))
        dt = (time.time() - t0) / REPS * 1e3
        log(f"{name:58s} {dt:8.2f} ms   (sum {s:.3e})")
        return dt
    timed3("FUSED adam+L2+rows via dense-merge (b,m,v rw)",
           fused_adam_merge)

    # --- do independent scatters overlap?  3 scatters into 3 arrays vs 1 --
    # (lazy mode's real cost depends on whether XLA serializes them)
    def three_scatters(i, bmn, ids, g):
        b, m, v = bmn
        kw = dict(mode="drop", indices_are_sorted=True, unique_indices=True)
        return (b.at[ids].set(g + i, **kw),
                m.at[ids].set(g + i + 1, **kw),
                v.at[ids].set(g + i + 2, **kw))
    timed3("3 independent scatter-SETs (bank, mu, nu)", three_scatters)

    # scatter with no bounds handling at all
    timed("scatter-SET promise_in_bounds sorted unique",
          lambda i, b, ids, g: b.at[ids].set(
              g + i, mode="promise_in_bounds", indices_are_sorted=True,
              unique_indices=True), "bank", "ids_sorted", "g")
    # bf16 payload+operand: half the bytes
    args["bank_bf"] = jax.device_put(
        np.zeros((R, W), np.float32).astype(jnp.bfloat16))
    args["g_bf"] = jax.device_put(
        rng.normal(size=(N, W)).astype(np.float32).astype(jnp.bfloat16))
    timed("scatter-SET bf16 sorted unique -> bf16 bank",
          lambda i, b, ids, g: b.at[ids].set(
              g + i, mode="drop", indices_are_sorted=True,
              unique_indices=True), "bank_bf", "ids_sorted", "g_bf")
    # [N,256] payload (mu+nu merged, bank separate)
    args["bank2"] = jax.device_put(np.zeros((R, 2 * W), np.float32))
    args["g2"] = jax.device_put(
        rng.normal(size=(N, 2 * W)).astype(np.float32))
    timed("scatter-SET sorted unique [N,256] -> bank2 (2x payload)",
          lambda i, b, ids, g: b.at[ids].set(
              g + i, mode="drop", indices_are_sorted=True,
              unique_indices=True), "bank2", "ids_sorted", "g2")

    # --- sorted-hybrid candidates (round-2 lazy-update redesign) ----------
    # per-position identical values let a DUP scatter-set stand in for the
    # unique one; sortedness is the expensive property (5.0 vs 8.1 ms), so:
    # how much does sorted+dup cost?
    ids_dup_sorted = np.sort(rng.integers(0, R, N // 4).astype(np.int32)
                             .repeat(4))
    args["ids_dup_sorted"] = jax.device_put(ids_dup_sorted)
    timed("scatter-SET sorted DUP (4x adjacent) -> bank",
          lambda i, b, ids, g: b.at[ids].set(
              g + i, mode="drop", indices_are_sorted=True),
          "bank", "ids_dup_sorted", "g")
    # the full hybrid critical path: sort pairs -> permute sums -> scatter.
    # ids must be i-DEPENDENT (`+ i`, not `+ 0*i` which folds to a constant
    # and lets XLA hoist the sort out of the rep loop).
    def hybrid_path(i, b, ids, g):
        sid, order = lax.sort((jnp.clip(ids + i, 0, R - 1),
                               lax.iota(jnp.int32, N)))
        vals = jnp.take(g + i, order, axis=0)
        return b.at[sid].set(vals, mode="drop", indices_are_sorted=True)
    timed("HYBRID sort-pairs + take + sorted-dup scatter", hybrid_path,
          "bank", "ids", "g")


if __name__ == "__main__":
    main()
