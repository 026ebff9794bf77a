"""Multi-process weak-scaling methodology validation (VERDICT r4 next #6).

The >=85% multi-host scaling target (BASELINE.md) is met by an analytic
projection (docs/SCALING.md, 90.4%) built on SINGLE-process HLO traffic
counts (bench/scaling_hlo.py with n virtual devices).  This tool
validates that methodology one level up, on a real process boundary:

1. **Same program across the boundary**: compile the full train step on a
   TWO-process ``jax.distributed`` CPU cluster (2 local devices each, 4
   global) and on a single process with 4 virtual devices, and count the
   per-device collective wire bytes of both compiled modules.  If they
   match, the DCN-crossing program IS the program the projection counted
   - the projection's inputs are real.
2. **Per-process wall-clock, weak scaling**: run K train steps at a FIXED
   per-device batch on 1 process (2 devices) and on 2 processes (2+2)
   and report per-step times.  CPU wall-clock over loopback is NOT a TPU
   efficiency claim (no ICI, no overlap engine) - it only demonstrates
   the harness measures what the projection models, and bounds the
   software overhead of the multi-process path.

Run:  python -m satrans_tpu.bench.multihost_scaling MULTIHOST_SCALING_r05.json
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

# small shapes: this validates program identity, not throughput
VOCAB = 16_000
FIELDS = 6
DIM = 16
PER_DEVICE_BATCH = 256
STEPS = 12


def _build_trainer(mesh):
    import jax

    from ..features import FeatureLayout, SparseFeature
    from ..models import SATrans
    from ..train import Trainer

    cols = [SparseFeature(f"f{i}", VOCAB, DIM) for i in range(FIELDS - 1)]
    cols.append(SparseFeature("domain", 5, DIM))
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=2,
                    att_head_num=2, meta_dnn_hidden_units=(2 * DIM, DIM),
                    l2_reg_embedding=1e-5)
    tr = Trainer(model, mesh=mesh, shard_embeddings=True,
                 embedding_exchange="alltoall", seed=0,
                 exchange_capacity_factor=2.0)
    tr.compile(learning_rate=0.005, bank_update="lazy",
               lazy_capacity_factor=2.0)
    tr._strategy = tr._resolve_strategy(None)
    tr._ensure_initialized()
    tr._build_steps()
    return tr


def _lower(tr, mesh, n_global):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    B = PER_DEVICE_BATCH * n_global
    bsh = NamedSharding(mesh, P("data"))
    batch = {"sparse": jax.ShapeDtypeStruct(
        (B, FIELDS), jnp.int32,
        sharding=NamedSharding(mesh, P("data", None)))}
    y = jax.ShapeDtypeStruct((B,), jnp.float32, sharding=bsh)
    w = jax.ShapeDtypeStruct((B,), jnp.float32, sharding=bsh)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return tr._train_step.lower(tr.params, tr.opt_state, tr.state, batch,
                                y, w, rng)


def _run_steps(tr, mesh, n_global, host_id, num_hosts):
    """Time STEPS train steps through the host-sharded iterator."""
    import numpy as np

    from ..data.loader import ShardedBatchIterator
    from ..data.synthetic import synthetic_columns, synthetic_data

    del synthetic_columns
    n = PER_DEVICE_BATCH * n_global * 4
    x, y = synthetic_data(n=n, num_sparse=FIELDS - 1, vocab=VOCAB, seed=3)
    data = tr.layout.batch_from_dict(x)
    B = PER_DEVICE_BATCH * n_global
    it = ShardedBatchIterator(data, y.astype(np.float32), batch_size=B,
                              seed=11, host_id=host_id,
                              num_hosts=num_hosts, drop_remainder=True)
    times = []
    import jax
    for rep in range(3):
        t0 = time.time()
        steps = 0
        for bnp, yl, wl in it.epoch(rep):
            batch, y_g, w_g = tr._device_batch(bnp, yl, wl)
            tr.params, tr.opt_state, tr.state, stats = tr._train_step(
                tr.params, tr.opt_state, tr.state, batch, y_g, w_g,
                jax.random.PRNGKey(rep * 100 + steps))
            steps += 1
        float(stats["loss"])  # fence
        times.append((time.time() - t0) / max(steps, 1))
    return min(times) * 1e3  # ms/step, best-of reps (first includes compile)


def worker(pid: int, nprocs: int, coord: str):
    import jax

    from ..bench import scaling_hlo
    from ..parallel import distributed
    from ..parallel.sharding import make_mesh

    if nprocs > 1:
        distributed.initialize(coordinator_address=coord,
                               num_processes=nprocs, process_id=pid)
    n_global = len(jax.devices())
    mesh = make_mesh()
    tr = _build_trainer(mesh)
    txt = _lower(tr, mesh, n_global).compile().as_text()
    wires = scaling_hlo.collective_wire_bytes(txt, n_global)
    ms = _run_steps(tr, mesh, n_global, pid, nprocs)
    print("RESULT " + json.dumps({
        "pid": pid, "nprocs": nprocs, "n_devices": n_global,
        "wire_bytes": wires, "ms_per_step": round(ms, 2)}), flush=True)


def _spawn(nprocs: int, local_devices: int):
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{s.getsockname()[1]}"
    s.close()
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "SATRANS_COMPILE_CACHE": "",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count="
                     f"{local_devices}",
        "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
    })
    procs = [subprocess.Popen(
        [sys.executable, "-m", "satrans_tpu.bench.multihost_scaling",
         "--worker", str(pid), str(nprocs), coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(nprocs)]
    results = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            raise RuntimeError(f"worker {pid} failed:\n{out}")
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        results.append(json.loads(line[0].split(" ", 1)[1]))
    return results


def run(out_path: str | None = None):
    """Orchestrate the three configurations and write the artifact."""
    # (a) 1 process, 4 virtual devices - the projection's configuration
    single4 = _spawn(1, 4)[0]
    # (b) 2 processes x 2 devices - same 4-device mesh across a real
    # process boundary
    two2 = _spawn(2, 2)
    # (c) 1 process, 2 devices - the weak-scaling wall-clock reference
    single2 = _spawn(1, 2)[0]

    same_program = all(r["wire_bytes"] == single4["wire_bytes"]
                       for r in two2)
    doc = {
        "workload": f"satrans lazy+alltoall(cap2.0) weak scaling, "
                    f"per-device batch {PER_DEVICE_BATCH}, CPU loopback",
        "single_process_4dev": single4,
        "two_process_2x2dev": two2,
        "single_process_2dev": single2,
        "collective_traffic_matches_projection_config": same_program,
        "weak_scaling_wallclock_note": (
            "CPU loopback wall-clock is methodology validation, NOT a TPU "
            "efficiency claim (no ICI, no comms/compute overlap): it shows "
            "the 2-process program is the same program the docs/SCALING.md "
            "projection counted, and bounds the multi-process software "
            "overhead of this harness."),
        "weak_scaling_ms_per_step": {
            "1proc_2dev": single2["ms_per_step"],
            "2proc_2x2dev_max": max(r["ms_per_step"] for r in two2),
        },
    }
    line = json.dumps(doc, indent=1)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return doc


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return
    run(sys.argv[1] if len(sys.argv) > 1 else None)


if __name__ == "__main__":
    main()
