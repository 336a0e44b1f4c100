"""Encode vectors against an existing IVF-PQ index.

The "Update database" roadmap item (reference ``README.md:73``): new vectors
don't retrain anything — they are assigned to the nearest existing partition
centroid and their residuals are PQ-encoded with the existing codebooks,
exactly how a query would see them. One fused program: coarse argmin →
residual gather-subtract → per-division codebook argmin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .distance import assign_chunked


@functools.partial(jax.jit, static_argnames=())
def encode(x: jax.Array, centroids: jax.Array,
           codebooks: jax.Array,
           rotation: jax.Array | None = None,
           ) -> tuple[jax.Array, jax.Array]:
    """``x: [N, M]`` → ``(pidx [N], codes [N, D])``.

    Outputs use the narrowest dtype that holds the index range (``uint16``
    pidx when ``P <= 65536``, ``uint8`` codes when ``C <= 256``, else
    ``int32``) — the streamed out-of-core build fetches every chunk's
    outputs to the host, so the narrow dtypes quarter that transfer
    (same contract as ``..parallel.build.ShardedBuild``).

    With an OPQ ``rotation`` the residuals are rotated before codebook
    assignment (codes live in the rotated space).
    """
    n, m = x.shape
    p = centroids.shape[0]
    d, c, sub = codebooks.shape
    pidx, _ = assign_chunked(x[None], centroids[None], k=p)
    pidx = pidx[0]
    residues = x - jnp.take(centroids, pidx, axis=0)
    if rotation is not None:
        residues = jnp.matmul(residues, rotation,
                              preferred_element_type=jnp.float32)
    divided = residues.reshape(n, d, sub).transpose(1, 0, 2)
    codes, _ = assign_chunked(divided, codebooks, k=c)
    pdt = jnp.uint16 if p <= (1 << 16) else jnp.int32
    cdt = jnp.uint8 if c <= 256 else jnp.int32
    return pidx.astype(pdt), codes.T.astype(cdt)
