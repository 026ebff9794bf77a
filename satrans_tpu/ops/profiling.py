"""Profiling / tracing utilities.

The reference has no profiler (SURVEY.md section 5: tqdm descriptions only).
First-class here:

* :func:`trace` - context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
* :func:`time_fn` - wall-clock timing with a scalar device->host fence.
  IMPORTANT on remote-tunneled backends (axon): ``block_until_ready`` does
  NOT synchronize - only a device->host transfer fences reliably, so all
  timings here chain the computation into a scalar transfer.
* :func:`roofline` - bytes/FLOP bookkeeping for a kernel against chip peaks
  (defaults: TPU v5e, 197 TFLOP/s bf16, 819 GB/s HBM).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax
import jax.numpy as jnp

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 98.5e12
V5E_HBM_BYTES_PER_S = 819e9


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fence(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.sum(leaf))  # device->host transfer = reliable fence


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Median-free simple timing: total wall clock of ``iters`` calls,
    fenced once at the end (dispatch pipelining stays intact)."""
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _fence(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _fence(out)
    return (time.time() - t0) / iters


def roofline(seconds: float, flops: float = 0.0, bytes_moved: float = 0.0,
             peak_flops: float = V5E_PEAK_BF16_FLOPS,
             peak_bw: float = V5E_HBM_BYTES_PER_S) -> dict:
    """Fraction-of-peak report for a measured kernel time."""
    out = {"seconds": seconds}
    if flops:
        out["tflops"] = flops / seconds / 1e12
        out["flops_frac_of_peak"] = flops / seconds / peak_flops
    if bytes_moved:
        out["gb_per_s"] = bytes_moved / seconds / 1e9
        out["bw_frac_of_peak"] = bytes_moved / seconds / peak_bw
    bound = "compute" if flops / max(peak_flops, 1) > \
        bytes_moved / max(peak_bw, 1) else "memory"
    out["bound"] = bound
    out["speed_of_light_s"] = max(flops / peak_flops,
                                  bytes_moved / peak_bw)
    return out
