"""Cross-attention LBS-weight delta field (pure JAX).

Re-implementation of `CrossAttention_lbs`
(/root/reference/nets/mlp_delta_weight_lbs.py:6-54): positionally-encoded
Gaussian centers go through a 4-layer 128-wide MLP with a skip connection
(layer 2), producing a 24-d query per Gaussian; keys/values are the 24 joint
rotations flattened to 9 (an all-ones 3x3 prepended for the root, exactly as
the reference does at :43); a scaled dot-product attention over the 9
rotation-component dims yields a per-Gaussian 24-d LBS-weight delta, which the
deformation adds to log skinning weights before softmax
(scene/gaussian_model.py:830-833).

The reference's Conv1d(k=1) layers are per-point Linears — here plain matmuls
over the (N, C) point batch, which XLA tiles onto the MXU. The unused
out_layer/gate_proj of the reference are omitted (dead code there).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

NUM_FREQS = 10
EMBED_DIM = 3 + 3 * 2 * NUM_FREQS  # 63
WIDTH = 128
FEATURE_DIM = 24
ROT_DIM = 9


def positional_embed(x):
    """NeRF-style embedding (mlp_delta_weight_lbs.py:87-133): [x, sin/cos(2^k x)]."""
    freqs = 2.0 ** jnp.arange(NUM_FREQS, dtype=x.dtype)  # 1..512
    ang = x[..., None, :] * freqs[:, None]  # (..., F, 3)
    enc = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-2)  # (..., F, 2, 3)
    return jnp.concatenate([x, enc.reshape(*x.shape[:-1], -1)], axis=-1)


def _linear_init(key, fan_in, fan_out):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound),
        "b": jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound),
    }


def init(key) -> Dict:
    ks = jax.random.split(key, 8)
    return {
        "l0": _linear_init(ks[0], EMBED_DIM, WIDTH),
        "l1": _linear_init(ks[1], WIDTH, WIDTH),
        "l2": _linear_init(ks[2], WIDTH, WIDTH),
        "l3": _linear_init(ks[3], WIDTH + EMBED_DIM, WIDTH),  # after skip concat
        "fc": _linear_init(ks[4], WIDTH, FEATURE_DIM),
        "query": _linear_init(ks[5], FEATURE_DIM, FEATURE_DIM),
        "key": _linear_init(ks[6], ROT_DIM, ROT_DIM),
        "value": _linear_init(ks[7], ROT_DIM, ROT_DIM),
    }


def _lin(p, x):
    return x @ p["w"] + p["b"]


def apply(params: Dict, points, Rs):
    """points: (N, 3) canonical Gaussian centers; Rs: (23, 3, 3) corrections.

    Returns (N, 24) log-space LBS weight deltas.
    """
    feat = positional_embed(points)  # (N, 63)
    net = jax.nn.relu(_lin(params["l0"], feat))
    net = jax.nn.relu(_lin(params["l1"], net))
    net = jax.nn.relu(_lin(params["l2"], net))
    net = jnp.concatenate([feat, net], axis=-1)  # skip at i=2 (reference :37-38)
    net = jax.nn.relu(_lin(params["l3"], net))
    query = _lin(params["fc"], net)  # (N, 24)

    # root slot = all-ones 3x3, exactly as the reference (:43)
    key9 = jnp.concatenate(
        [jnp.ones((1, 3, 3), Rs.dtype), Rs], axis=0
    ).reshape(FEATURE_DIM, ROT_DIM)  # (24, 9)

    Q = _lin(params["query"], query)          # (N, 24)
    K = _lin(params["key"], key9)             # (24, 9)
    V = _lin(params["value"], key9)           # (24, 9)
    scores = (Q @ K) / jnp.sqrt(jnp.asarray(FEATURE_DIM, Q.dtype))  # (N, 9)
    attn = jax.nn.softmax(scores, axis=-1)
    return attn @ V.T  # (N, 24)
