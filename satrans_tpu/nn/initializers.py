"""Parameter initializers reproducing the reference's (PyTorch) distributions.

Accuracy parity with the reference depends on initialization scale
(SURVEY.md section 7 "hard parts"):

* feature embeddings ~ N(0, 1e-4)            (reference basemodel.py:119)
* attention / meta weights ~ N(0, 0.05)      (satrans.py:42-43, submodules.py:203-204)
* ``nn.Linear`` default: U(+-1/sqrt(fan_in)) for both weight and bias
  (what torch's ``kaiming_uniform_(a=sqrt(5))`` + bias fan-in bound reduce to)
* ``nn.Embedding`` default: N(0, 1)          (SATrans domain_embeddings, satrans.py:145)
* deepctr ``DNN`` overrides only the *weights* with N(0, init_std); biases keep
  the torch default (submodules.py:41-43)

These are distributional equivalents, not bit-stream matches: JAX PRNG streams
are split per parameter, seeded from the model seed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def normal(key, shape, std: float, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def uniform(key, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_weight(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default weight init; ``shape=(in_dim, out_dim)``.

    Torch stores ``(out, in)`` and draws U(+-1/sqrt(in)); we store the
    transpose (row-vector convention ``y = x @ W + b``) with the same bound.
    """
    fan_in = shape[0]
    return uniform(key, shape, 1.0 / math.sqrt(fan_in), dtype)


def torch_linear_bias(key, shape, fan_in: int, dtype=jnp.float32):
    return uniform(key, shape, 1.0 / math.sqrt(fan_in), dtype)


def torch_embedding_default(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def zeros(_key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(_key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
