"""Pruned IVF-PQ query over partition-bucketed codes.

The masked full scan (:mod:`.adc`) touches all ``N`` code rows per query —
optimal when ``nprobe × avg_partition ≈ N``, wasteful when ``nprobe ≪ P``
(SIFT1M: P=1024, nprobe=10 ⇒ ~100× extra reads). This module is the pruned
layout: codes bucketize by partition into a padded ``[P, L, D]`` block array
(the device analogue of the reference's per-partition files,
``database.proto:47-63``), and a query gathers only its ``nprobe`` buckets:

1. coarse top-k picks ``probed [B, nprobe]``,
2. ADC tables ONLY for probed partitions: ``[B, nprobe, D, C]`` einsum,
3. bucket gather ``[B, nprobe, L, D]`` + flat table gather-sum,
4. mask pad rows, ``lax.top_k`` over ``[B, nprobe·L]``.

Static shapes throughout — ragged partition sizes become one padded length
``L`` (max partition size rounded up to the lane width), so there is no
retracing across queries or nprobe sets (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .adc import adc_tables  # noqa: F401  (re-exported pattern)
from .distance import sqdist

_PRECISION = jax.lax.Precision.HIGHEST


class Buckets(NamedTuple):
    """Partition-major padded code layout.

    ``codes: [P, D, L] int32`` (0 in pad slots); ``rows: [P, L] int32``
    original corpus row per slot, ``-1`` in pad slots; ``lengths: [P]``.

    The member axis ``L`` is minor: TPU tiled layouts pad the minor
    dimension to 128 lanes, so a ``[.., L, D]`` layout would inflate the
    small code axis ``D`` by up to 16× in HBM (observed: a 3 GB gather
    becoming a 49 GB allocation at nprobe=50).
    """
    codes: jax.Array
    rows: jax.Array
    lengths: jax.Array


def bucketize(codes: np.ndarray, pidx: np.ndarray, p: int,
              lane: int = 128) -> Buckets:
    """Host-side bucketization of ``codes [N, D]`` by partition.

    ``L`` = max partition size rounded up to ``lane`` so the scan axis tiles
    cleanly onto the VPU/MXU.
    """
    codes = np.asarray(codes)
    pidx = np.asarray(pidx)
    n, d = codes.shape
    counts = np.bincount(pidx, minlength=p)
    l = int(max(counts.max() if n else 1, 1))
    l = -(-l // lane) * lane
    bcodes = np.zeros((p, d, l), np.int32)
    brows = np.full((p, l), -1, np.int32)
    order = np.argsort(pidx, kind="stable")
    starts = np.zeros(p + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for pi in range(p):
        members = order[starts[pi]:starts[pi + 1]]
        bcodes[pi, :, :len(members)] = codes[members].T
        brows[pi, :len(members)] = members
    return Buckets(jnp.asarray(bcodes), jnp.asarray(brows),
                   jnp.asarray(counts.astype(np.int32)))


def _platform() -> str:
    """Effective platform: honours ``jax_default_device`` (tests pin it to
    CPU while a TPU plugin still owns the default backend)."""
    dev = jax.config.jax_default_device
    return dev.platform if dev is not None else jax.default_backend()


def _default_impl() -> str:
    return "pallas" if _platform() == "tpu" else "gather"


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "impl"))
def query_bucketed(
    q: jax.Array,
    centroids: jax.Array,
    codebooks: jax.Array,
    buckets: Buckets,
    rotation: jax.Array | None = None,
    row_mask: jax.Array | None = None,
    *,
    k: int,
    nprobe: int,
    impl: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched pruned IVF-PQ k-NN.

    Same contract as :func:`.adc.query_masked_scan`: returns
    ``(sq_distances [B, k], rows [B, k] int32, probed [B, nprobe] int32)``
    with ``+inf`` beyond the number of reachable vectors.

    ``row_mask [N] bool`` (optional): corpus rows whose mask is False are
    excluded (attribute filtering, :mod:`..filters`) — one gather + select
    after the ADC scan, before top-k.

    ``impl``: ``"pallas"`` (VMEM compare-select kernel, default on TPU),
    ``"gather"`` (XLA ``take_along_axis``, default elsewhere).
    """
    b, m = q.shape
    p = centroids.shape[0]
    d, c, sub = codebooks.shape
    l = buckets.codes.shape[2]

    coarse = sqdist(q, centroids)                       # [B, P]
    _, probed = jax.lax.top_k(-coarse, nprobe)          # [B, nprobe]

    # ADC tables only for the probed partitions.
    pc = jnp.take(centroids, probed, axis=0)            # [B, nprobe, M]
    resid = q[:, None, :] - pc
    if rotation is not None:  # OPQ: codes live in the rotated space
        resid = jnp.matmul(resid, rotation, precision=_PRECISION,
                           preferred_element_type=jnp.float32)
    resid = resid.reshape(b, nprobe, d, sub)
    rr = jnp.sum(resid * resid, axis=-1)                # [B, nprobe, D]
    cc = jnp.sum(codebooks * codebooks, axis=-1)        # [D, C]
    rc = jnp.einsum("bjds,dcs->bjdc", resid, codebooks,
                    precision=_PRECISION,
                    preferred_element_type=jnp.float32)
    tables = jnp.maximum(rr[..., None] + cc[None, None] - 2.0 * rc, 0.0)

    # Bucket gather + table lookup-sum.
    bcodes = jnp.take(buckets.codes, probed, axis=0)    # [B, nprobe, D, L]
    brows = jnp.take(buckets.rows, probed, axis=0)      # [B, nprobe, L]
    ftab = tables.reshape(b, nprobe, d * c)
    if impl is None:
        impl = _default_impl()
    if impl == "pallas":
        from .pallas_scan import adc_lookup
        vdist = adc_lookup(
            bcodes.reshape(b * nprobe, d, l),
            ftab.reshape(b * nprobe, d * c),
        ).reshape(b, nprobe, l)
    elif impl == "gather":
        gidx = (bcodes
                + jnp.arange(d, dtype=jnp.int32)[None, None, :, None] * c)
        vdist = jnp.take_along_axis(
            ftab, gidx.reshape(b, nprobe, d * l), axis=-1)
        vdist = vdist.reshape(b, nprobe, d, l).sum(2)   # [B, nprobe, L]
    else:
        raise ValueError(f"unknown impl: {impl!r}")
    keep = brows >= 0
    if row_mask is not None:
        keep &= jnp.take(row_mask, jnp.maximum(brows, 0), axis=0)
    vdist = jnp.where(keep, vdist, jnp.inf)

    # k may exceed the candidate count (reference returns fewer results
    # then); pad the tail with +inf instead of failing top_k.
    kk = min(k, nprobe * l)
    neg, flat_idx = jax.lax.top_k(-vdist.reshape(b, nprobe * l), kk)
    rows = jnp.take_along_axis(brows.reshape(b, nprobe * l), flat_idx,
                               axis=-1)
    if kk < k:
        neg = jnp.pad(neg, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        rows = jnp.pad(rows, ((0, 0), (0, k - kk)))
    return -neg, rows.astype(jnp.int32), probed.astype(jnp.int32)
