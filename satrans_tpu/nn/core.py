"""Core functional NN building blocks.

Plain-pytree functional modules: every module is an ``init(key, ...)->params``
plus an ``apply(params, x, ...)->y`` pair.  No framework class hierarchy -
params are dicts of ``jnp`` arrays, which keeps them transparent to
``jax.jit`` / ``pjit`` / ``shard_map`` and to optax.

Replaces the reference's torch modules:

* :func:`mlp_*`             -> deepctr ``DNN``  (activation+dropout after every
                               layer; weights N(0, init_std), reference
                               models/submodules.py DNN usage)
* ``final_activation=False`` -> ``DNN_v2`` (reference submodules.py:18-61: the
                               LAST layer has no activation/dropout - used as
                               the scenario encoder)
* :func:`layer_norm_*`      -> ``nn.LayerNorm(eps=1e-6)``
* :func:`dropout`           -> ``nn.Dropout``
* :func:`prediction`        -> deepctr ``PredictionLayer`` (sigmoid for
                               'binary', identity for 'regression')
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import initializers as init


# ---------------------------------------------------------------------------
# activations (reference utils.py:239-263 get_activation_function)
# ---------------------------------------------------------------------------

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "linear": lambda x: x,
    "none": lambda x: x,
}


def activation(name: str):
    try:
        return _ACTIVATIONS[name.lower()]
    except KeyError:
        raise ValueError(f"Unknown activation {name!r}") from None


# ---------------------------------------------------------------------------
# dropout
# ---------------------------------------------------------------------------

def dropout(x, rate: float, train: bool, rng):
    """Inverted dropout matching ``torch.nn.Dropout`` (scale by 1/(1-p))."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, *, use_bias: bool = True,
                weight_init=init.torch_linear_weight):
    kw, kb = jax.random.split(key)
    p = {"w": weight_init(kw, (in_dim, out_dim))}
    if use_bias:
        p["b"] = init.torch_linear_bias(kb, (out_dim,), in_dim)
    return p


def linear_apply(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


# ---------------------------------------------------------------------------
# layer norm (torch nn.LayerNorm, eps matches reference 1e-6)
# ---------------------------------------------------------------------------

def layer_norm_init(key, dim: int, *, weight_init=init.ones, bias_init=init.zeros):
    kw, kb = jax.random.split(key)
    return {"scale": weight_init(kw, (dim,)), "bias": bias_init(kb, (dim,))}


def layer_norm_apply(p, x, *, eps: float = 1e-6):
    # Moments in fp32 even under a bf16 compute path; output keeps x.dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"] + p["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# MLP: deepctr DNN / DNN_v2 semantics
# ---------------------------------------------------------------------------

def mlp_init(key, in_dim: int, hidden_units: Sequence[int], *,
             init_std: float = 1e-4, use_bn: bool = False,
             final_activation: bool = True):
    """deepctr ``DNN`` (final_activation=True) or ``DNN_v2`` (False).

    Weights ~ N(0, init_std) (reference submodules.py:41-43); biases keep the
    torch ``nn.Linear`` default U(+-1/sqrt(fan_in)).
    """
    if len(hidden_units) == 0:
        raise ValueError("hidden_units is empty")
    dims = [in_dim] + list(hidden_units)
    layers = []
    for i in range(len(dims) - 1):
        key, kw, kb = jax.random.split(key, 3)
        layers.append({
            "w": init.normal(kw, (dims[i], dims[i + 1]), init_std),
            "b": init.torch_linear_bias(kb, (dims[i + 1],), dims[i]),
        })
    p = {"layers": layers}
    if use_bn:
        # DNN applies BN on every layer output; DNN_v2 only on non-final.
        n_bn = len(dims) - 1 if final_activation else len(dims) - 2
        p["bn"] = [batch_norm_init(jax.random.fold_in(key, i), dims[i + 1])
                   for i in range(n_bn)]
    return p


def mlp_apply(p, x, *, act: str = "relu", dropout_rate: float = 0.0,
              train: bool = False, rng=None, final_activation: bool = True,
              bn_state=None, bn_momentum: float = 0.1, batch_weight=None):
    """Forward pass; returns ``y`` (or ``(y, new_bn_state)`` if BN is used).

    ``batch_weight``: optional ``[B]`` 0/1 mask excluding zero-padded tail
    rows from train-mode BN batch statistics - the reference trains on a
    genuinely smaller tail batch, so padded rows must not pollute running
    stats.  NOTE: no shipped model enables ``use_bn`` (mirroring the
    reference, whose ``dnn_use_bn`` flag is never set by any published
    config); a model that does must thread its pad mask (the Trainer puts
    it in ``batch['_weight']``) into this parameter itself - see
    models/star.py's domain-BN for the pattern.
    """
    fn = activation(act)
    layers = p["layers"]
    use_bn = "bn" in p
    new_bn = [] if use_bn else None
    for i, layer in enumerate(layers):
        x = linear_apply(layer, x)
        is_final = i == len(layers) - 1
        if use_bn and i < len(p["bn"]):
            x, s = batch_norm_apply(p["bn"][i], bn_state[i] if bn_state else None,
                                    x, train=train, momentum=bn_momentum,
                                    batch_weight=batch_weight)
            new_bn.append(s)
        if final_activation or not is_final:
            x = fn(x)
            if dropout_rate > 0.0 and train:
                x = dropout(x, dropout_rate, train, jax.random.fold_in(rng, i))
    if use_bn:
        return x, new_bn
    return x


# ---------------------------------------------------------------------------
# batch norm with explicit running-stats state
# ---------------------------------------------------------------------------

def batch_norm_init(key, dim: int):
    del key
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def batch_norm_state(dim: int):
    return {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,)),
            "count": jnp.zeros((), jnp.int32)}


def batch_norm_apply(p, state, x, *, train: bool, momentum: float = 0.1,
                     eps: float = 1e-5, scale=None, bias=None,
                     batch_weight=None):
    """BatchNorm1d with torch semantics (biased batch var for normalization,
    unbiased var for the running estimate).

    ``scale`` / ``bias`` override the affine params (used by MDR-BN, where the
    effective affine is ``weight*shared_weight`` / ``bias+shared_bias``,
    reference submodules.py:157-169).

    ``batch_weight`` (optional ``[B]`` 0/1 mask) computes moments over a
    masked subset with static shapes - the TPU replacement for the
    reference's boolean-index routing in STAR (star.py:147-170).
    """
    if state is None:
        state = batch_norm_state(x.shape[-1])
    if train:
        if batch_weight is None:
            n = x.shape[0]
            mean = jnp.mean(x, axis=0)
            var = jnp.mean(jnp.square(x - mean), axis=0)
        else:
            w = batch_weight.astype(x.dtype)[:, None]
            n = jnp.maximum(jnp.sum(w), 1.0)
            mean = jnp.sum(x * w, axis=0) / n
            var = jnp.sum(jnp.square(x - mean) * w, axis=0) / n
        # torch tracks the *unbiased* variance in running stats.
        unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
        new_mean = (1 - momentum) * state["mean"] + momentum * mean
        new_var = (1 - momentum) * state["var"] + momentum * unbiased
        if batch_weight is not None:
            # A domain absent from this batch must not decay its running
            # stats toward 0 (the reference's boolean routing never updates
            # BN for empty subsets, star.py:147-170).
            has = jnp.sum(batch_weight.astype(x.dtype)) > 0
            new_mean = jnp.where(has, new_mean, state["mean"])
            new_var = jnp.where(has, new_var, state["var"])
        new_state = {
            "mean": new_mean,
            "var": new_var,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    s = p["scale"] if scale is None else scale
    b = p["bias"] if bias is None else bias
    y = (x - mean) * jax.lax.rsqrt(var + eps) * s + b
    return y, new_state


# ---------------------------------------------------------------------------
# prediction layer (deepctr PredictionLayer, reference basemodel.py:183)
# ---------------------------------------------------------------------------

def prediction(logit, task: str = "binary"):
    if task == "binary":
        return jax.nn.sigmoid(logit)
    if task == "regression":
        return logit
    raise ValueError(f"task must be binary or regression, got {task!r}")
