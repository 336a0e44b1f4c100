"""Synthetic corpora with descriptor-like statistics.

No-egress stand-ins for SIFT1M/GIST1M/Deep10M (BASELINE.json configs).
Round 1 used a single global low-rank subspace; VERDICT.md #4 flagged that
as much easier than real descriptor data. Real local-descriptor sets are
*clustered* (images share visual words) with low intrinsic dimensionality
inside each cluster — that structure is what both IVF (cluster axis) and PQ
(within-cluster manifold) exploit. This generator models it as a Gaussian
mixture on a shared low-rank manifold:

* ``n_clusters`` mixture components with Zipf-ish weights (natural corpora
  are imbalanced);
* component means drawn in a shared ``intrinsic``-dim latent space and
  pushed through one random linear map (descriptor dimensions are strongly
  correlated);
* per-component anisotropic noise at ``cluster_std`` scale plus a small
  full-dimensional noise floor so no direction is exactly degenerate.

Statistics tuned loosely to SIFT: for ``m=128, intrinsic=12,
n_clusters=256``, the nearest-neighbor distance contrast (d_far/d_near) and
per-dimension correlation spectrum land in the same regime as published
SIFT1M measurements — informative for PQ, non-trivial for IVF.
"""

from __future__ import annotations

import numpy as np


def gmm_corpus(rng: np.random.Generator, n: int, m: int, *,
               n_clusters: int = 256, intrinsic: int = 12,
               cluster_std: float = 0.35, noise: float = 0.05,
               chunk: int = 1 << 18) -> np.ndarray:
    """Clustered descriptor-like corpus ``[n, m]`` float32."""
    w = rng.standard_normal((intrinsic, m)).astype(np.float32)
    means_z = rng.standard_normal((n_clusters, intrinsic)).astype(np.float32)
    means = (means_z * 2.0) @ w                        # spread clusters out
    # Zipf-ish imbalance, normalized.
    weights = 1.0 / np.arange(1, n_clusters + 1) ** 0.7
    weights /= weights.sum()
    # Per-cluster anisotropic scales in latent space.
    scales = (cluster_std *
              rng.uniform(0.5, 1.5, (n_clusters, intrinsic))
              ).astype(np.float32)

    out = np.empty((n, m), np.float32)
    for i in range(0, n, chunk):
        nn = min(chunk, n - i)
        comp = rng.choice(n_clusters, size=nn, p=weights)
        z = rng.standard_normal((nn, intrinsic)).astype(np.float32)
        out[i:i + nn] = (means[comp] + (z * scales[comp]) @ w +
                         noise * rng.standard_normal((nn, m)
                                                     ).astype(np.float32))
    return out


def gmm_pair(rng: np.random.Generator, n: int, nq: int, m: int, **kw
             ) -> tuple[np.ndarray, np.ndarray]:
    """Corpus + held-out queries drawn from the SAME mixture (queries in
    real benchmarks come from the same distribution as the corpus)."""
    both = gmm_corpus(rng, n + nq, m, **kw)
    perm = rng.permutation(n + nq)
    return both[perm[:n]], both[perm[n:]]
