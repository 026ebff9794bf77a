"""The 2-process DCN-crossing program is the SAME program the scaling
projection counted (VERDICT r4 next #6).

docs/SCALING.md's 90.4% weak-scaling projection rests on collective wire
bytes counted from a SINGLE-process n-virtual-device HLO
(bench/scaling_hlo.py).  This test compiles the identical train step on a
real two-process ``jax.distributed`` cluster (2 local devices each) and
asserts its per-device collective traffic is byte-identical to the
single-process 4-device module - validating the projection's input one
level up.  Wall-clock numbers live in the committed
``MULTIHOST_SCALING_r05.json`` artifact (CPU loopback: methodology
validation, not a TPU efficiency claim)."""

from satrans_tpu.bench import multihost_scaling as mh


def test_two_process_program_matches_projection_config():
    single4 = mh._spawn(1, 4)[0]
    assert single4["n_devices"] == 4
    assert single4["wire_bytes"]["total"] > 0
    two2 = mh._spawn(2, 2)
    assert [r["n_devices"] for r in two2] == [4, 4]
    for r in two2:
        assert r["wire_bytes"] == single4["wire_bytes"], (
            "the multi-process compiled module's collective traffic "
            "diverged from the single-process projection configuration")
