"""Collective-traffic scaling of the compiled train step (VERDICT r2 #5).

Compiles the FULL train step at n=2/4/8 virtual devices with a fixed
per-device batch (weak scaling) and counts per-device collective wire
bytes from the partitioned HLO.  The production pod configuration -
bank_update='lazy' + embedding_exchange='alltoall' with bounded capacity
factors - must be mesh-size-INDEPENDENT: its per-device bytes, normalized
by the ring factor (n-1)/n, must be equal across mesh sizes.
"""

import numpy as np

from satrans_tpu.bench import scaling_hlo


def test_lazy_alltoall_traffic_is_mesh_size_independent():
    per_n = {}
    for n in (2, 4, 8):
        txt, _ = scaling_hlo._build(n, "lazy", "alltoall", xcapf=2.0,
                                    per_device_batch=256, vocab=8_000,
                                    num_fields=6)
        per_n[n] = scaling_hlo.collective_wire_bytes(txt, n)
    # normalize by the ring factor: a constant per-device payload P costs
    # P*(n-1)/n on the wire
    norm = {n: v["total"] / ((n - 1) / n) for n, v in per_n.items()}
    base = norm[2]
    for n in (4, 8):
        assert abs(norm[n] - base) / base < 0.10, (norm, per_n)
    # and the exchange really is all-to-all based (no all-gather of data)
    assert per_n[8].get("all-to-all", 0) > 0
    assert per_n[8].get("all-gather", 0) < per_n[8]["all-to-all"] / 10


def test_xla_spmd_default_traffic_grows_with_mesh():
    """Control: the SPMD-partitioner default for the dense mode moves
    O(n * B * d) per device - documents WHY the explicit schedules exist
    (if XLA ever fixes this, revisit docs/SCALING.md)."""
    totals = {}
    for n in (2, 8):
        txt, _ = scaling_hlo._build(n, "dense", "xla",
                                    per_device_batch=256, vocab=8_000,
                                    num_fields=6)
        totals[n] = scaling_hlo.collective_wire_bytes(txt, n)["total"]
    assert totals[8] > 2.0 * totals[2], totals
