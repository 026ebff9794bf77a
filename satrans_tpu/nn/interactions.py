"""Feature-interaction layers (deepctr-torch 0.2.9 semantics).

The reference's baseline zoo leans on ``deepctr_torch.layers`` (FM, CIN,
CrossNet, SENET, BilinearInteraction, AFMLayer, Inner/OutterProduct,
BiInteractionPooling - see SURVEY.md section 2).  These are from-scratch JAX
implementations of the same math with matching default initializations.

All take field embeddings ``x: [B, F, d]`` unless noted.
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from . import core, initializers as init


def _xavier_normal(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return init.normal(key, shape, std)


def _xavier_uniform(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return init.uniform(key, shape, bound)


# ---------------------------------------------------------------------------
# FM second-order term and BiInteraction pooling
# ---------------------------------------------------------------------------

def fm(x):
    """0.5 * sum_d((sum_f v)^2 - sum_f v^2) -> ``[B, 1]``."""
    square_of_sum = jnp.square(jnp.sum(x, axis=1))
    sum_of_square = jnp.sum(jnp.square(x), axis=1)
    return 0.5 * jnp.sum(square_of_sum - sum_of_square, axis=1, keepdims=True)


def bi_interaction_pooling(x):
    """Same term without the final d-sum -> ``[B, 1, d]`` (NFM)."""
    square_of_sum = jnp.square(jnp.sum(x, axis=1, keepdims=True))
    sum_of_square = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    return 0.5 * (square_of_sum - sum_of_square)


# ---------------------------------------------------------------------------
# CrossNet (DCN)
# ---------------------------------------------------------------------------

def crossnet_init(key, in_dim: int, layer_num: int = 2,
                  parameterization: str = "vector"):
    ks = jax.random.split(key, layer_num)
    if parameterization == "vector":
        kernels = jnp.stack([_xavier_normal(k, (in_dim, 1)) for k in ks])
    elif parameterization == "matrix":
        kernels = jnp.stack([_xavier_normal(k, (in_dim, in_dim)) for k in ks])
    else:
        raise ValueError("parameterization must be vector or matrix")
    return {"kernels": kernels, "bias": jnp.zeros((layer_num, in_dim, 1))}


def crossnet_apply(p, x, parameterization: str = "vector"):
    """x: [B, in_dim] flat input; returns [B, in_dim]."""
    x0 = x[:, :, None]  # [B, in, 1]
    xl = x0
    for i in range(p["kernels"].shape[0]):
        if parameterization == "vector":
            xl_w = jnp.einsum("bi1,io->bo1", xl, p["kernels"][i])  # [B,1,1]
            xl = x0 * xl_w + p["bias"][i] + xl
        else:
            xl_w = jnp.einsum("ij,bj1->bi1", p["kernels"][i], xl)
            xl = x0 * (xl_w + p["bias"][i]) + xl
    return xl[:, :, 0]


# ---------------------------------------------------------------------------
# CIN (xDeepFM); conv1d == per-output-channel weighted sum of h*m products
# ---------------------------------------------------------------------------

def cin_init(key, field_num: int, layer_sizes: Sequence[int] = (256, 128),
             split_half: bool = True):
    params = []
    h = field_num
    for i, size in enumerate(layer_sizes):
        key, kw, kb = jax.random.split(key, 3)
        in_ch = h * field_num
        bound = 1.0 / math.sqrt(in_ch)  # torch Conv1d default
        params.append({"w": init.uniform(kw, (in_ch, size), bound),
                       "b": init.uniform(kb, (size,), bound)})
        if split_half and i != len(layer_sizes) - 1:
            if size % 2 > 0:
                raise ValueError("layer_size must be even with split_half")
            h = size // 2
        else:
            h = size
    return {"convs": params}


def cin_apply(p, x, layer_sizes: Sequence[int] = (256, 128),
              split_half: bool = True, act: str = "relu"):
    """x: [B, F, d] -> [B, featuremap_num]."""
    fn = core.activation(act)
    x0 = x
    hidden = x
    outs = []
    for i, conv in enumerate(p["convs"]):
        # Outer product over fields, flattened: [B, h*m, d]
        z = jnp.einsum("bhd,bmd->bhmd", hidden, x0)
        b, h, m, d = z.shape
        z = z.reshape(b, h * m, d)
        # Conv1d(kernel=1) == channel-mixing matmul.
        z = jnp.einsum("bcd,cs->bsd", z, conv["w"]) + conv["b"][None, :, None]
        z = fn(z)
        last = i == len(p["convs"]) - 1
        if split_half and not last:
            size = z.shape[1]
            hidden, direct = z[:, : size // 2], z[:, size // 2:]
        else:
            direct = z
            hidden = z
        outs.append(direct)
    result = jnp.concatenate(outs, axis=1)
    return jnp.sum(result, axis=-1)


def cin_output_dim(layer_sizes: Sequence[int], split_half: bool = True) -> int:
    if split_half:
        return sum(layer_sizes[:-1]) // 2 + layer_sizes[-1]
    return sum(layer_sizes)


# ---------------------------------------------------------------------------
# SENET + Bilinear interaction (FiBiNET)
# ---------------------------------------------------------------------------

def senet_init(key, field_num: int, reduction_ratio: int = 3):
    red = max(1, field_num // reduction_ratio)
    k1, k2 = jax.random.split(key)
    return {"w1": init.torch_linear_weight(k1, (field_num, red)),
            "w2": init.torch_linear_weight(k2, (red, field_num))}


def senet_apply(p, x):
    z = jnp.mean(x, axis=-1)  # [B, F]
    a = jax.nn.relu(jax.nn.relu(z @ p["w1"]) @ p["w2"])
    return x * a[:, :, None]


def bilinear_init(key, field_num: int, dim: int, bilinear_type: str = "interaction"):
    if bilinear_type == "all":
        n = 1
    elif bilinear_type == "each":
        n = field_num
    elif bilinear_type == "interaction":
        n = field_num * (field_num - 1) // 2
    else:
        raise ValueError("bilinear_type must be all/each/interaction")
    ks = jax.random.split(key, n)
    return {"w": jnp.stack([init.torch_linear_weight(k, (dim, dim)) for k in ks])}


def bilinear_apply(p, x, bilinear_type: str = "interaction"):
    """[B, F, d] -> [B, F*(F-1)/2, d] of pairwise bilinear interactions."""
    f = x.shape[1]
    pairs = list(itertools.combinations(range(f), 2))
    if bilinear_type == "all":
        proj = x @ p["w"][0]  # [B, F, d]
        out = [proj[:, i] * x[:, j] for i, j in pairs]
    elif bilinear_type == "each":
        proj = jnp.einsum("bfd,fde->bfe", x, p["w"])
        out = [proj[:, i] * x[:, j] for i, j in pairs]
    else:
        out = [(x[:, i] @ p["w"][k]) * x[:, j] for k, (i, j) in enumerate(pairs)]
    return jnp.stack(out, axis=1)


# ---------------------------------------------------------------------------
# AFM attention layer
# ---------------------------------------------------------------------------

def afm_init(key, dim: int, attention_factor: int = 8):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"att_w": _xavier_normal(k1, (dim, attention_factor)),
            "att_b": jnp.zeros((attention_factor,)),
            "proj_h": _xavier_normal(k2, (attention_factor, 1)),
            "proj_p": _xavier_normal(k3, (dim, 1))}


def afm_apply(p, x, *, dropout_rate: float = 0.0, train: bool = False, rng=None):
    """[B, F, d] -> [B, 1] attentional FM logit."""
    f = x.shape[1]
    pi, pj = zip(*itertools.combinations(range(f), 2))
    prod = x[:, list(pi)] * x[:, list(pj)]  # [B, pairs, d]
    att = jax.nn.relu(prod @ p["att_w"] + p["att_b"])
    scores = jax.nn.softmax(att @ p["proj_h"], axis=1)  # [B, pairs, 1]
    out = jnp.sum(scores * prod, axis=1)  # [B, d]
    if dropout_rate > 0.0 and train:
        out = core.dropout(out, dropout_rate, train, rng)
    return out @ p["proj_p"]


# ---------------------------------------------------------------------------
# PNN product layers
# ---------------------------------------------------------------------------

def inner_product(x):
    """[B, F, d] -> [B, F*(F-1)/2] pairwise dots."""
    f = x.shape[1]
    pi, pj = zip(*itertools.combinations(range(f), 2))
    return jnp.sum(x[:, list(pi)] * x[:, list(pj)], axis=-1)


def outer_product_init(key, field_num: int, dim: int, kernel_type: str = "mat"):
    num_pairs = field_num * (field_num - 1) // 2
    if kernel_type == "mat":
        shape = (dim, num_pairs, dim)
    elif kernel_type == "vec":
        shape = (num_pairs, dim)
    elif kernel_type == "num":
        shape = (num_pairs, 1)
    else:
        raise ValueError("kernel_type must be mat/vec/num")
    return {"kernel": _xavier_uniform(key, shape)}


def outer_product_apply(p, x, kernel_type: str = "mat"):
    f = x.shape[1]
    pi, pj = zip(*itertools.combinations(range(f), 2))
    pp, q = x[:, list(pi)], x[:, list(pj)]  # [B, pairs, d]
    if kernel_type == "mat":
        # torch: sum(p.unsqueeze(1)*kernel, -1).permute(0,2,1) then *q, sum
        kp = jnp.sum(pp[:, None] * p["kernel"][None], axis=-1)  # [B,d,pairs]
        kp = kp.transpose(0, 2, 1)  # [B,pairs,d]
        return jnp.sum(kp * q, axis=-1)
    return jnp.sum(pp * q * p["kernel"][None], axis=-1)
