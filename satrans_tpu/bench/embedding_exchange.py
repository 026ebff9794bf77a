"""Sharded-embedding read schedules, compared (SURVEY.md section 2.3's
"must be benchmarked against replicated lookup").

Four ways to read ``bank[ids]`` when the bank is row-sharded over a mesh:

  xla_spmd      hand the gather to the SPMD partitioner (Trainer default)
  alltoall      explicit two-round exchange (parallel/embedding_sharded.py)
  gather_psum   the round-1 schedule (all-gather ids + psum full partials)
  replicated    unsharded bank, local gather (the single-chip baseline)

Real ICI does not exist in this container, so the bench runs on the
8-virtual-device CPU mesh: the WALL-CLOCK numbers demonstrate the
schedules compile + run under shard_map and rank plausibly, while the
ANALYTIC per-device traffic (exact float counts from the schedule's
collectives, also printed) is the durable comparison - it is what
determines the ranking on a pod.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python -m satrans_tpu.bench.embedding_exchange
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from satrans_tpu.parallel import embedding_sharded as es

    R, d = 1_638_400, 128
    N = 81_920                      # global flat ids (10 fields x B=8192)
    devs = np.array(jax.devices())
    n = len(devs)
    mesh = Mesh(devs, ("data",))

    rng = np.random.default_rng(0)
    bank_h = rng.normal(size=(R, d)).astype(np.float32)
    ids_h = rng.integers(0, R, size=(N,)).astype(np.int32)

    bank_sh = jax.device_put(bank_h, NamedSharding(mesh, P("data", None)))
    ids_sh = jax.device_put(ids_h, NamedSharding(mesh, P("data")))
    bank_rep = jax.device_put(bank_h, NamedSharding(mesh, P(None, None)))

    def timeit(name, fn, *args, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / iters * 1e3
        log(f"{name:42s} {dt:8.2f} ms")
        return dt, out

    results = {}

    xla_gather = jax.jit(
        lambda b, i: jnp.take(b, i, axis=0),
        out_shardings=NamedSharding(mesh, P("data")))
    results["xla_spmd"], ref = timeit("XLA SPMD partitioned gather",
                                      xla_gather, bank_sh, ids_sh)

    a2a = jax.jit(lambda b, i: es.alltoall_lookup(b, i, mesh))
    results["alltoall"], (emb, ovf) = timeit(
        "explicit all_to_all exchange (C=2x)", a2a, bank_sh, ids_sh)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref), atol=0)
    assert int(np.asarray(ovf).sum()) == 0, "capacity overflow in bench"

    gp = jax.jit(lambda b, i: es.sharded_lookup(b, i, mesh))
    results["gather_psum_round1"], out = timeit(
        "all-gather + psum (round-1 schedule)", gp, bank_sh, ids_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)

    rep = jax.jit(lambda b, i: es.replicated_lookup(b, i))
    results["replicated"], _ = timeit("replicated bank local gather",
                                      rep, bank_rep, ids_sh)

    # analytic per-device ICI traffic (floats moved through collectives),
    # local batch Nl = N/n, capacity C = 2 * ceil(Nl/n)
    nl = N // n
    c = 2 * -(-nl // n)
    traffic = {
        "xla_spmd": "partitioner-chosen (typically ~all-to-all of rows)",
        "alltoall_floats_per_device": 2 * n * c * d + n * c,  # vals + ids
        "gather_psum_floats_per_device": n * nl + n * nl * d,  # ids + psum
        "replicated": 0,
    }
    log(f"analytic per-device traffic at n={n}, Nl={nl}, C={c}: "
        f"alltoall {traffic['alltoall_floats_per_device']:,} floats vs "
        f"gather+psum {traffic['gather_psum_floats_per_device']:,}")

    print(json.dumps({
        "workload": f"bank [{R},{d}] row-sharded over {n} CPU devices, "
                    f"N={N} flat ids",
        "unit": "ms (CPU-mesh demonstration; see analytic traffic)",
        "ms": {k: round(v, 2) for k, v in results.items()},
        "analytic_traffic": traffic,
    }))


if __name__ == "__main__":
    main()
