"""Analytic multi-chip scaling: collective bytes counted from compiled HLO.

Multi-chip hardware is not available in this container, so the ">=85%
multi-host scaling efficiency" target (BASELINE.md) cannot be measured.
What CAN be measured exactly is the per-device COLLECTIVE TRAFFIC of the
compiled train step: XLA's per-partition module lists every all-reduce /
all-gather / all-to-all / reduce-scatter / collective-permute with its
(local) output shape.  This bench compiles the FULL train step for
n in {2, 4, 8} virtual devices at a FIXED per-device batch (weak scaling -
the production regime: global batch 8192*n) for every bank-update x
exchange-schedule combination, counts wire bytes per device, and projects
scaling efficiency against the v5e ICI bandwidth model in docs/SCALING.md.

Wire-byte accounting per instruction (ring algorithms, n = mesh size):
  all-reduce      2 * bytes * (n-1)/n      (reduce-scatter + all-gather)
  all-gather      bytes_out * (n-1)/n      (each device receives the rest)
  reduce-scatter  bytes_in * (n-1)/n
  all-to-all      bytes * (n-1)/n          (keeps 1/n locally)
  collective-permute  bytes               (one neighbor hop)

Run (CPU, any machine):  python -m satrans_tpu.bench.scaling_hlo out.json
The mesh-size-INdependence of the all-to-all schedules is asserted by
tests/test_scaling_hlo.py.
"""

from __future__ import annotations

import json
import re
import sys

import numpy as np

_DT_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
             "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
             "pred": 1}

_COLLECTIVES = ("all-reduce", "all-gather", "all-to-all", "reduce-scatter",
                "collective-permute")


def _shape_bytes(rhs: str) -> int:
    """Total bytes of the first shape literal (or tuple of literals) on an
    HLO instruction's RHS."""
    total = 0
    for g in re.finditer(r"(\w+)\[([\d,]*)\]", rhs):
        if "(" in rhs[:g.start()] and not rhs.lstrip().startswith("("):
            break  # reached the operand list
        dt = _DT_BYTES.get(g.group(1), 4)
        dims = [int(d) for d in g.group(2).split(",") if d]
        total += dt * int(np.prod(dims) if dims else 1)
        if not rhs.lstrip().startswith("("):
            break
    return total


def collective_wire_bytes(hlo_text: str, n: int) -> dict:
    """Per-device wire bytes by collective kind for one train step."""
    out = {k: 0 for k in _COLLECTIVES}
    counts = {k: 0 for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        ls = line.strip()
        if not (ls.startswith("%") or ls.startswith("ROOT")) or "=" not in ls:
            continue
        rhs = ls.split("=", 1)[1]
        m = re.search(r"\b(all-reduce|all-gather|all-to-all|reduce-scatter|"
                      r"collective-permute)(-start)?\b", rhs)
        if not m or m.group(2) == "-done":
            continue
        if re.search(r"\b\w*-done\b", rhs):
            continue
        kind = m.group(1)
        b = _shape_bytes(rhs)
        ratio = {"all-reduce": 2.0 * (n - 1) / n,
                 "all-gather": (n - 1) / n,
                 "reduce-scatter": (n - 1) / n,
                 "all-to-all": (n - 1) / n,
                 "collective-permute": 1.0}[kind]
        out[kind] += int(b * ratio)
        counts[kind] += 1
    out = {k: v for k, v in out.items() if v}
    out["total"] = sum(out.values())
    out["instruction_counts"] = {k: v for k, v in counts.items() if v}
    return out


def _build(n, bank_update, exchange, *, per_device_batch=1024,
           num_fields=10, vocab=64_000, dim=32, xcapf=None):
    """Compile the full train step on an n-device CPU mesh; returns
    (hlo_text, meta).  Fixed per-device batch = weak scaling."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..features import FeatureLayout, SparseFeature
    from ..models import SATrans
    from ..parallel import sharding as shlib
    from ..train import Trainer

    devices = jax.devices()[:n]
    mesh = shlib.make_mesh(devices)
    cols = [SparseFeature(f"f{i}", vocab, dim) for i in range(num_fields - 1)]
    cols.append(SparseFeature("domain", 5, dim))
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["domain"],
                    num_domains_list=[3], domain_att_layer_num=3,
                    att_head_num=4, meta_dnn_hidden_units=(2 * dim, dim),
                    l2_reg_embedding=1e-5)
    tr = Trainer(model, mesh=mesh, shard_embeddings=True,
                 embedding_exchange=exchange, seed=0,
                 exchange_capacity_factor=xcapf)
    tr.compile(learning_rate=0.005, bank_update=bank_update)
    tr._strategy = tr._resolve_strategy(None)
    tr._ensure_initialized()
    tr._build_steps()

    B = per_device_batch * n
    bsh = NamedSharding(mesh, P("data"))
    batch = {"sparse": jax.ShapeDtypeStruct((B, num_fields), jnp.int32,
                                            sharding=NamedSharding(
                                                mesh, P("data", None)))}
    y = jax.ShapeDtypeStruct((B,), jnp.float32, sharding=bsh)
    w = jax.ShapeDtypeStruct((B,), jnp.float32, sharding=bsh)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    lowered = tr._train_step.lower(tr.params, tr.opt_state, tr.state,
                                   batch, y, w, rng)
    txt = lowered.compile().as_text()
    bank_bytes = int(np.prod(tr.params["emb"]["bank"].shape)) * 4
    return txt, {"bank_bytes": bank_bytes, "global_batch": B}


def run(out_path: str | None = None, sizes=(2, 4, 8)):
    results = {"per_device_batch": 1024, "configs": {}}
    # (bank_update, exchange, forward-exchange capacity factor): 'exact'
    # (None) serves any skew but its table is C=N -> O(n*N*d) traffic;
    # 'capped' (2.0) is the mesh-size-independent production setting.
    for bank_update, exchange, xcapf, key in (
            ("dense", "xla", None, "dense_xla"),
            ("fused", "xla", None, "fused_xla"),
            ("fused", "alltoall", None, "fused_alltoall_exact"),
            ("fused", "alltoall", 2.0, "fused_alltoall_capped"),
            ("lazy", "xla", None, "lazy_xla"),
            ("lazy", "alltoall", 2.0, "lazy_alltoall_capped")):
        results["configs"][key] = {}
        for n in sizes:
            txt, meta = _build(n, bank_update, exchange, xcapf=xcapf)
            wires = collective_wire_bytes(txt, n)
            results["configs"][key][str(n)] = {**wires, **meta}
            print(f"{key} n={n}: total {wires['total']/1e6:.2f} MB/device "
                  f"{wires.get('instruction_counts')}", file=sys.stderr,
                  flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", out_path)
    else:
        print(json.dumps(results, indent=1))
    return results


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else None)
