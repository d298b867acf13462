"""k-nearest-neighbour search as blocked MXU matmuls.

TPU-native replacement for the reference's two CUDA KNN dependencies
(SURVEY.md §2.1 N5/N6):

  * knn()            <- KNN_CUDA brute-force k-NN (/root/reference/scene/
                        gaussian_model.py:28,85-86,827): k=1 Gaussian->SMPL
                        vertex lookup, k=2 self-KNN for the KL merge/split.
  * mean_knn_dist2() <- simple_knn._C.distCUDA2 (/root/reference/submodules/
                        simple-knn/spatial.cu:15-26): mean squared distance to
                        the 3 nearest neighbours, used once for initial scales
                        (gaussian_model.py:185-186).

Design: distances ||q - r||^2 = |q|^2 - 2 q.r + |r|^2 with the cross term as a
(blocked) matmul on the MXU — on TPU a dense 46k x 6890 f32 matmul runs at
speed-of-light and beats any tree/hash scheme XLA can't vectorize. Queries are
processed in static chunks so peak memory stays bounded; jax.lax.top_k gives
the k smallest. Everything is jit-safe with static shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(queries, refs, k: int = 1, chunk: int = 4096, ref_valid=None):
    """Return (dists2, idx) of the k nearest refs for each query.

    queries: (N, 3), refs: (M, 3). dists2 are *squared* euclidean distances.

    NOTE on the KNN_CUDA convention (it matters for the SMPL-distance prune):
    the reference thresholds KNN_CUDA's raw output at 0.05
    (gaussian_model.py:657-661). The unlimblue/KNN_CUDA wheel wraps Garcia et
    al.'s kNN-CUDA, whose final kernel applies sqrt to the k selected
    distances before returning — its raw output is EUCLIDEAN, so the
    reference prunes a 5 cm shell around the big-pose body. This function
    returns SQUARED distances (cheaper — no sqrt pass); callers that
    reproduce the reference threshold must compare sqrt(d2) against 0.05
    (train/densify.py does, with a unit test pinning the shell radius).
    ref_valid: optional (M,) bool — invalid refs are pushed to +inf distance
    (used for the capacity-padded Gaussian cloud).
    """
    N = queries.shape[0]
    r2 = jnp.sum(refs * refs, axis=-1)  # (M,)
    if ref_valid is not None:
        r_pen = jnp.where(ref_valid, 0.0, jnp.inf)
    else:
        r_pen = None

    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    q = jnp.pad(queries, ((0, pad), (0, 0))) if pad else queries
    q = q.reshape(n_chunks, chunk, 3)

    def body(q_blk):
        d2 = (
            jnp.sum(q_blk * q_blk, axis=-1, keepdims=True)
            - 2.0 * (q_blk @ refs.T)
            + r2[None, :]
        )
        if r_pen is not None:
            d2 = d2 + r_pen[None, :]
        if k == 1:
            # top_k lowers to a sorting network (~3x the cost of the whole
            # distance computation at k=1, measured); min+argmin fuse into
            # one reduce pass.
            return jnp.min(d2, axis=-1, keepdims=True), jnp.argmin(
                d2, axis=-1, keepdims=True
            ).astype(jnp.int32)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    d2s, idxs = jax.lax.map(body, q)
    d2s = d2s.reshape(-1, k)[:N]
    idxs = idxs.reshape(-1, k)[:N]
    return jnp.maximum(d2s, 0.0), idxs


@partial(jax.jit, static_argnames=("chunk",))
def mean_knn_dist2(points, chunk: int = 2048, valid=None):
    """Mean squared distance to the 3 nearest neighbours (excluding self).

    Matches the semantics of simple-knn's SimpleKNN::knn
    (/root/reference/submodules/simple-knn/simple_knn.cu:147-183); the
    reference uses a Morton-code/BVH approximation, we do it exactly.
    """
    d2, _ = knn(points, points, k=4, chunk=chunk, ref_valid=valid)
    return jnp.mean(d2[:, 1:], axis=-1)
