"""Sharded database build — the distributed "training step".

The reference's 906-second hot path is two k-means phases over the corpus
(``db/build.rs:78-129``; SURVEY.md §3.1). On a mesh, the corpus axis ``N``
shards across devices and the whole build compiles as ONE ``jit`` program:

* coarse k-means++ / Lloyd over ``[N, M]`` — the cluster-sum and count
  reductions become ``psum`` collectives XLA inserts over ICI (the one-hot
  matmul in :func:`..ops.kmeans._centroid_update` contracts over the sharded
  axis, which is exactly a ``reduce_scatter``-friendly pattern);
* residual subtraction — local, no communication;
* batched PQ training over ``[D, N, M/D]`` — same sharded reduction per
  division, all divisions in flight at once.

Centroids and codebooks come back replicated; assignments and codes come back
sharded, ready for :func:`..parallel.query.query_sharded`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kmeans
from .mesh import AXIS


class ShardedBuild(NamedTuple):
    """Device-resident build output.

    ``partition_centroids: [P, M]`` replicated; ``partition_indices: [N]``
    sharded; ``codebooks: [D, C, M/D]`` replicated; ``codes: [N, D]``
    sharded.
    """
    partition_centroids: jax.Array
    partition_indices: jax.Array
    codebooks: jax.Array
    codes: jax.Array


def _build_fn(x: jax.Array, key: jax.Array, *, p: int, d: int,
              c: int) -> ShardedBuild:
    n, m = x.shape
    k_coarse, k_pq = jax.random.split(key)

    coarse = kmeans.fit(x[None], p, k_coarse)
    cents, idx = coarse.centroids[0], coarse.indices[0]
    residues = x - jnp.take(cents, idx, axis=0)
    divided = residues.reshape(n, d, m // d).transpose(1, 0, 2)
    pq = kmeans.fit(divided, c, k_pq)
    codes = pq.indices.T.astype(jnp.int32)               # [N, D]
    return ShardedBuild(cents, idx, pq.centroids, codes)


_build_step = jax.jit(_build_fn, static_argnames=("p", "d", "c"))

#: Donating variant: the input buffer is released to XLA so the residual
#: array can alias it — needed for corpora within ~2× of HBM (GIST1M-scale
#: 1M×960 peaks at ~11.5 GB without donation and crashes a 16 GB chip).
#: The caller's device array is invalidated; re-``device_put`` to rebuild.
build_step_donating = jax.jit(_build_fn, static_argnames=("p", "d", "c"),
                              donate_argnums=(0,))


def build_sharded(x, p: int, d: int, c: int, key: jax.Array, *,
                  mesh: Mesh) -> ShardedBuild:
    """Builds the full IVF-PQ index with the corpus sharded over ``mesh``.

    ``x: [N, M]`` is placed row-sharded; everything else follows from GSPMD
    propagation — no manual collectives. This is the multi-chip path behind
    the <10 s target for the 100k×1536 build (BASELINE.md).
    """
    xs = jax.device_put(jnp.asarray(x, jnp.float32),
                        NamedSharding(mesh, P(AXIS, None)))
    return _build_step(xs, key, p=p, d=d, c=c)
