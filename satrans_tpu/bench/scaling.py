"""Scaling-efficiency measurement: examples/s at 1..N devices.

BASELINE.md asks for scaling measured at 1 chip / 1 host / N hosts with
>=85% efficiency.  This harness runs the same data-parallel training step on
growing sub-meshes of whatever devices exist (a real pod slice in
production; the 8-virtual-device CPU mesh in this container - numbers then
demonstrate the harness, not TPU ICI) and reports throughput + efficiency
relative to 1 device.

Run:  python -m satrans_tpu.bench.scaling  [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import jax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(n_devices: int, *, batch_per_device: int = 1024, steps: int = 10,
            fields: int = 10, vocab: int = 50_000, dim: int = 32,
            shard_embeddings: bool = True) -> float:
    import jax.numpy as jnp

    from ..features import FeatureLayout, SparseFeature
    from ..models import SATrans
    from ..parallel import sharding as shlib
    from ..train import Trainer

    devices = jax.devices()[:n_devices]
    mesh = shlib.make_mesh(devices)
    cols = [SparseFeature(f"f{i}", vocab, dim) for i in range(fields - 1)]
    cols.append(SparseFeature("dom", 5, dim))
    layout = FeatureLayout(cols)
    model = SATrans(layout=layout, domain_cols=["dom"], num_domains_list=[3],
                    domain_att_layer_num=3, att_head_num=4,
                    meta_dnn_hidden_units=(2 * dim, dim))
    trainer = Trainer(model, mesh=mesh, shard_embeddings=shard_embeddings,
                      seed=0)
    trainer.compile(learning_rate=0.005)
    trainer._strategy = trainer._resolve_strategy(None)
    trainer._ensure_initialized()
    trainer._build_steps()

    B = batch_per_device * n_devices
    rng = np.random.default_rng(0)
    sp = np.concatenate([rng.integers(1, vocab, size=(B, fields - 1)),
                         rng.integers(1, 4, size=(B, 1))], axis=1
                        ).astype(np.int32)
    batch = shlib.shard_batch({"sparse": jnp.asarray(sp)}, mesh)
    y = shlib.shard_array(jnp.asarray(rng.integers(0, 2, B), jnp.float32),
                          mesh)
    w = shlib.shard_array(jnp.ones(B, jnp.float32), mesh)
    k = jax.random.PRNGKey(0)

    p, o, s = trainer.params, trainer.opt_state, trainer.state
    p, o, s, st = trainer._train_step(p, o, s, batch, y, w, k)
    float(st["loss"])  # fence (see ops/profiling.py)
    t0 = time.time()
    for _ in range(steps):
        p, o, s, st = trainer._train_step(p, o, s, batch, y, w, k)
    float(st["loss"])
    dt = time.time() - t0
    return B * steps / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--batch_per_device", type=int, default=1024)
    args = ap.parse_args(argv)
    avail = len(jax.devices())
    counts = args.devices or [n for n in (1, 2, 4, 8, 16, 32) if n <= avail]
    results = {}
    base = None
    for n in counts:
        tput = measure(n, batch_per_device=args.batch_per_device)
        if base is None:
            base = tput
        eff = tput / (base * n)
        results[n] = {"examples_per_sec": round(tput, 1),
                      "efficiency_vs_1dev": round(eff, 4)}
        log(f"{n} device(s): {tput:,.0f} ex/s, efficiency {eff:.1%}")
    payload = {"platform": jax.devices()[0].platform, "scaling": results}
    if payload["platform"] == "cpu":
        payload["caveat"] = (
            "virtual CPU devices share one host's physical cores: total "
            "compute is fixed, so efficiency_vs_1dev measures core "
            "oversubscription, not the sharding design; this run "
            "demonstrates the harness + that the sharded program executes "
            "at every mesh size.  Real efficiency needs a TPU pod slice.")
    print(json.dumps(payload))
    return results


if __name__ == "__main__":
    main()
