"""Sharded database build — the distributed "training step".

The reference's 906-second hot path is two k-means phases over the corpus
(``db/build.rs:78-129``; SURVEY.md §3.1). On a mesh, the corpus axis ``N``
shards across devices and the whole build compiles as ONE ``jit`` program:

* coarse k-means++ / Lloyd over ``[N, M]`` — each Lloyd round runs the
  fused Pallas kernel per device under ``shard_map`` and ``psum``s the
  ``[K, M]`` cluster sums + ``[K]`` counts over ICI (:mod:`.kmeans`;
  GSPMD cannot split a ``pallas_call``, manual SPMD never asks it to);
* residual subtraction — local, no communication;
* batched PQ training over ``[D, N, M/D]`` — same sharded rounds per
  division, all divisions in flight at once;
* PQ encoding — local per device (:func:`_encode_sharded`).

Centroids and codebooks come back replicated; assignments and codes come back
sharded, ready for :func:`..parallel.query.query_sharded`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kmeans
from .mesh import AXIS


#: Max rows used to TRAIN the PQ codebooks. Codebook quality saturates at a
#: few thousand samples per code (C=256 → 1M rows is plenty; FAISS trains
#: IVF-PQ on a sample for the same reason), while training cost and the
#: ``[D, N, M/D]`` division intermediate scale with N — at Deep10M
#: (10M × 96) that intermediate alone exceeded single-chip HBM alongside
#: the corpus and residuals. Above the cap, codebooks train on a uniform
#: subsample and full-corpus codes are assigned in a chunked pass.
PQ_TRAIN_CAP = 1 << 20

#: Max rows used to TRAIN the coarse (partition) centroids. Same rationale
#: as :data:`PQ_TRAIN_CAP` one level up: centroid quality saturates at a
#: few hundred rows per centroid (2M rows = 512/centroid at P=4096 —
#: FAISS's coarse quantizer trains on a comparable sample), while every
#: Lloyd round is a full corpus pass — at Deep10M the ~100 coarse rounds
#: over 10M × 96 were ~60% of the 63 s staged build. Above the cap the
#: rounds run on a uniform subsample and the full corpus gets one final
#: assignment pass (:func:`..ops.kmeans.fit` ``train_cap``).
COARSE_TRAIN_CAP = 2 << 20


class ShardedBuild(NamedTuple):
    """Device-resident build output.

    ``partition_centroids: [P, M]`` replicated; ``partition_indices: [N]``
    sharded (``uint16`` when ``P <= 65536``, else ``int32``); ``codebooks: [D, C, M/D]`` replicated; ``codes: [N, D]``
    sharded (``uint8`` when ``C <= 256`` — code values always fit, and the
    narrow dtype quarters both the device→host fetch (320 → 80 MB at
    Deep10M, 14–62 s of tunnel wall measured for the int32 fetch) and the
    lane-padded HBM residency; else ``int32``). Host consumers widen on
    arrival (`build.py` → uint32, `..parallel.mesh.shard_corpus` → int32
    for the serving kernels).
    """
    partition_centroids: jax.Array
    partition_indices: jax.Array
    codebooks: jax.Array
    codes: jax.Array


def _code_dtype(c: int):
    """Narrowest dtype that holds PQ code values ``0..c-1``."""
    return jnp.uint8 if c <= 256 else jnp.int32


def _pidx_dtype(p: int):
    """Narrowest dtype that holds partition indices ``0..p-1`` (same
    fetch-width rationale as :func:`_code_dtype`: 40 → 20 MB at Deep10M)."""
    return jnp.uint16 if p <= (1 << 16) else jnp.int32


def _encode_chunked(x: jax.Array, cents: jax.Array, idx: jax.Array,
                    codebooks: jax.Array, *,
                    chunk: int = 1 << 16) -> jax.Array:
    """PQ-encodes corpus residuals against ``codebooks [D, C, M/D]``.

    ``codes[n, d] = argmin_c ||(x[n] - cents[idx[n]])_d - codebook[d, c]||²``
    streamed over row chunks. Residuals are computed PER CHUNK — neither a
    full-size residual array nor a divided ``[D, N, M/D]`` copy ever
    materializes (at Deep10M each is ~4-5 GB of HBM next to the corpus;
    both together crashed the chip). Transient: ``[chunk, D, C]``.
    """
    n, m = x.shape
    d, c, sub = codebooks.shape
    chunk = min(chunk, n)
    steps = -(-n // chunk)
    cc = jnp.sum(codebooks * codebooks, axis=-1)          # [D, C]

    def body(i, codes):
        # Last chunk shifts back; overlapping rows recompute identically.
        start = jnp.minimum(i * chunk, n - chunk)
        xi = jax.lax.dynamic_slice_in_dim(x, start, chunk, axis=0)
        ii = jax.lax.dynamic_slice_in_dim(idx, start, chunk, axis=0)
        r = (xi - jnp.take(cents, ii, axis=0)).reshape(chunk, d, sub)
        rc = jnp.einsum("nds,dcs->ndc", r, codebooks,
                        precision=kmeans._PRECISION,
                        preferred_element_type=jnp.float32)
        ci = jnp.argmin(cc[None] - 2.0 * rc, axis=-1).astype(_code_dtype(c))
        return jax.lax.dynamic_update_slice_in_dim(codes, ci, start,
                                                   axis=0)

    codes0 = jnp.zeros((n, d), _code_dtype(c))
    return jax.lax.fori_loop(0, steps, body, codes0)


def _pq_impl(impl: "str | None", sub: int) -> "str | None":
    """Per-phase kernel re-resolution for a forced ``impl`` override.

    A coarse-phase ``impl="pallas"`` must not carry into PQ training when
    the subvector width is sub-lane: the plain pallas kernel pins a layout
    that lane-pads the minor dim to 128 IN HBM (``[60, 1M, 16]`` → 30 GB,
    ``ops.kmeans._auto_impl``). Re-resolve (None → auto) for that case;
    explicit "xla"/"pallas_grouped" pass through unchanged. A ``_fast``
    numerics suffix (``ops.kmeans._impl_parts``) survives re-resolution.
    """
    base, fast = kmeans._impl_parts(impl)
    base = None if (base == "pallas" and sub < 128) else base
    return (base or "") + "_fast" if fast else base


def _build_fn(x: jax.Array, key: jax.Array, *, p: int, d: int, c: int,
              pq_cap: int = PQ_TRAIN_CAP,
              coarse_cap: int = COARSE_TRAIN_CAP,
              impl: str | None = None) -> ShardedBuild:
    """Single-device build body (``impl`` selects the Lloyd-round kernel,
    ``ops.kmeans._fused_round``). Never run this under GSPMD sharding —
    a ``pallas_call`` is a custom call the SPMD partitioner cannot split;
    the mesh path is :func:`_build_sharded_fn` (shard_map)."""
    n, m = x.shape
    k_coarse, k_pq, k_sub = jax.random.split(key, 3)

    coarse = kmeans.fit(x[None], p, k_coarse, impl=impl,
                        train_cap=coarse_cap)
    cents, idx = coarse.centroids[0], coarse.indices[0]
    if n > pq_cap:
        # Train codebooks on a uniform residual subsample
        # (with-replacement draws; duplicates only reweight the objective
        # negligibly at this cap), then assign full-corpus codes chunked
        # with per-chunk residuals — the corpus itself stays the only
        # full-size array in HBM.
        rows = jax.random.randint(k_sub, (pq_cap,), 0, n)
        sample = (jnp.take(x, rows, axis=0)
                  - jnp.take(cents, jnp.take(idx, rows), axis=0))
        divided = sample.reshape(pq_cap, d, m // d).transpose(1, 0, 2)
        pq = kmeans.fit(divided, c, k_pq, impl=_pq_impl(impl, m // d))
        codes = _encode_chunked(x, cents, idx, pq.centroids)
    else:
        residues = x - jnp.take(cents, idx, axis=0)
        divided = residues.reshape(n, d, m // d).transpose(1, 0, 2)
        pq = kmeans.fit(divided, c, k_pq, impl=_pq_impl(impl, m // d))
        codes = pq.indices.T.astype(_code_dtype(c))      # [N, D]
    return ShardedBuild(cents, idx.astype(_pidx_dtype(p)),
                        pq.centroids, codes)


_build_step = jax.jit(_build_fn,
                      static_argnames=("p", "d", "c", "pq_cap",
                                       "coarse_cap", "impl"))

#: Donating variant: the input buffer is released to XLA so the residual
#: array can alias it — needed for corpora within ~2× of HBM (GIST1M-scale
#: 1M×960 peaks at ~11.5 GB without donation and crashes a 16 GB chip).
#: The caller's device array is invalidated; re-``device_put`` to rebuild.
build_step_donating = jax.jit(_build_fn,
                              static_argnames=("p", "d", "c", "pq_cap",
                                               "coarse_cap", "impl"),
                              donate_argnums=(0,))


def build_staged(x: jax.Array, p: int, d: int, c: int, key: jax.Array,
                 events=None, *,
                 pq_cap: int = PQ_TRAIN_CAP,
                 coarse_cap: int = COARSE_TRAIN_CAP,
                 rounds_per_step: int = 8,
                 rounds_per_step_max: int = 32,
                 impl: str | None = None) -> ShardedBuild:
    """Host-stepped build for very large corpora (Deep10M-class).

    Identical math to :func:`_build_fn`, but each Lloyd round / stage runs
    as its OWN device program instead of one monolithic ``while_loop`` jit:
    the coarse phase host-steps via :func:`..ops.kmeans.fit_with_events`.
    Two reasons to prefer this at 10M+ rows on the tunnel-attached chip:

    * a single program covering 100 rounds x ~10^3 update chunks runs for
      minutes; remote execution paths enforce per-program deadlines, and a
      deadline strike surfaces as a worker crash (observed at 10M x 96,
      P=4096, while the same total HBM footprint at GIST shape ran fine);
    * per-round host control gives progress events and a natural
      checkpoint seam for builds that outlive a serverless budget.

    ``rounds_per_step`` Lloyd rounds fuse into each program (``lax.scan``)
    so the per-program host round-trip — which rivals the compute itself
    on a tunnel-attached chip — amortizes, while each program stays well
    under the remote-execution deadline (~8 rounds ≈ a few seconds at
    Deep10M scale vs minutes for the monolithic 100-round program). The
    per-program round count then DOUBLES up to ``rounds_per_step_max``
    (``ops.kmeans.fit_with_events``): a 100-round coarse fit dispatches
    4 programs (8+16+32+32+...) instead of 13, and rounds dispatched past
    convergence skip their corpus pass on device — at Deep10M the ~26
    per-fit round-trips were ~2/3 of the 63 s round-3 build wall
    (VERDICT round-3 #3; the 906 s path this replaces:
    ``db/build.rs:78-129``).

    ``impl`` as in :func:`..ops.kmeans.fit` (kernel / numerics override;
    ``"_fast"`` = auto kernel + fast_math, re-resolved per phase for the
    PQ sub-shape like the one-program builds).
    """
    from .. import events as ev

    handler = events if events is not None else (lambda e: None)
    x = jnp.asarray(x, jnp.float32)
    n, m = x.shape
    k_coarse, k_pq, k_sub = jax.random.split(key, 3)

    coarse = kmeans.fit_with_events(x[None], p, k_coarse, handler,
                                    rounds_per_step=rounds_per_step,
                                    rounds_per_step_max=rounds_per_step_max,
                                    impl=impl,
                                    train_cap=coarse_cap)
    cents, idx = coarse.centroids[0], coarse.indices[0]

    handler(ev.StartingSubvectorDivision())
    if n > pq_cap:
        rows = jax.random.randint(k_sub, (pq_cap,), 0, n)
        sample = _sample_residuals(x, cents, idx, rows)
        divided = sample.reshape(pq_cap, d, m // d).transpose(1, 0, 2)
    else:
        divided = _all_residuals(x, cents, idx).reshape(
            n, d, m // d).transpose(1, 0, 2)
    handler(ev.FinishedSubvectorDivision())

    pq = kmeans.fit_with_events(divided, c, k_pq, handler,
                                rounds_per_step=rounds_per_step,
                                rounds_per_step_max=rounds_per_step_max,
                                impl=_pq_impl(impl, m // d))
    if n > pq_cap:
        codes = _encode_jit(x, cents, idx, pq.centroids)
    else:
        # divided held ALL residuals, so the fit's own assignments ARE the
        # codes (exactly _build_fn's small branch) — re-encoding would
        # waste a full-corpus pass and could flip float ties.
        codes = pq.indices.T.astype(_code_dtype(c))
    return ShardedBuild(cents, idx.astype(_pidx_dtype(p)),
                        pq.centroids, codes)


@jax.jit
def _sample_residuals(x, cents, idx, rows):
    return (jnp.take(x, rows, axis=0)
            - jnp.take(cents, jnp.take(idx, rows), axis=0))


@jax.jit
def _all_residuals(x, cents, idx):
    return x - jnp.take(cents, idx, axis=0)


_encode_jit = jax.jit(_encode_chunked)


def _encode_sharded(x: jax.Array, cents: jax.Array, idx: jax.Array,
                    codebooks: jax.Array, mesh: Mesh) -> jax.Array:
    """Per-device chunked PQ encode (no collectives; codes stay sharded)."""
    return jax.shard_map(
        _encode_chunked, mesh=mesh,
        in_specs=(P(AXIS, None), P(), P(AXIS), P()),
        out_specs=P(AXIS, None),
        check_vma=False,
    )(x, cents, idx, codebooks)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "n", "p", "d", "c", "pq_cap",
                                    "coarse_cap", "impl"))
def _build_sharded_fn(x: jax.Array, key: jax.Array, *, mesh: Mesh, n: int,
                      p: int, d: int, c: int, pq_cap: int, coarse_cap: int,
                      impl: str | None) -> ShardedBuild:
    """One-program sharded build: the Lloyd rounds run the per-device fused
    kernel under ``shard_map`` (:mod:`.kmeans`); everything between them —
    seeding, residuals, reshapes — is GSPMD-propagated XLA. Mirrors
    :func:`_build_fn` key-for-key so sharded and single-chip builds agree.

    ``x: [N', M]`` with rows ``>= n`` zero pads (``N'`` may already be
    shard-aligned by the caller; any remainder is padded here).
    """
    from .kmeans import fit_sharded

    m = x.shape[1]
    n_dev = mesh.devices.size
    xp = jnp.pad(x, ((0, (-x.shape[0]) % n_dev), (0, 0)))
    np_total = xp.shape[0]
    xp = jax.lax.with_sharding_constraint(
        xp, NamedSharding(mesh, P(AXIS, None)))
    rows_valid = jnp.arange(np_total) < n
    k_coarse, k_pq, k_sub = jax.random.split(key, 3)

    coarse = fit_sharded(xp[None], p, k_coarse, mesh=mesh, n_valid=n,
                         impl=impl, train_cap=coarse_cap)
    cents, idx = coarse.centroids[0], coarse.indices[0]    # idx [Np] sharded
    dspec = NamedSharding(mesh, P(None, AXIS, None))
    if n > pq_cap:
        rows = jax.random.randint(k_sub, (pq_cap,), 0, n)
        sample = (jnp.take(xp, rows, axis=0)
                  - jnp.take(cents, jnp.take(idx, rows), axis=0))
        spad = (-pq_cap) % n_dev
        sp = jnp.pad(sample, ((0, spad), (0, 0)))
        divided = jax.lax.with_sharding_constraint(
            sp.reshape(pq_cap + spad, d, m // d).transpose(1, 0, 2), dspec)
        pq = fit_sharded(divided, c, k_pq, mesh=mesh, n_valid=pq_cap,
                         impl=_pq_impl(impl, m // d))
        codes = _encode_sharded(xp, cents, idx, pq.centroids, mesh)
    else:
        # Pad rows must stay zero: 0 - cents[garbage] would poison the
        # sharded PQ cluster sums (see .kmeans padding convention).
        residues = jnp.where(rows_valid[:, None],
                             xp - jnp.take(cents, idx, axis=0), 0.0)
        divided = jax.lax.with_sharding_constraint(
            residues.reshape(np_total, d, m // d).transpose(1, 0, 2), dspec)
        pq = fit_sharded(divided, c, k_pq, mesh=mesh, n_valid=n,
                         impl=_pq_impl(impl, m // d))
        codes = pq.indices.T.astype(_code_dtype(c))
    return ShardedBuild(cents, idx[:n].astype(_pidx_dtype(p)),
                        pq.centroids, codes[:n])


def build_sharded(x, p: int, d: int, c: int, key: jax.Array, *,
                  mesh: Mesh, pq_cap: int = PQ_TRAIN_CAP,
                  coarse_cap: int = COARSE_TRAIN_CAP,
                  impl: str | None = None) -> ShardedBuild:
    """Builds the full IVF-PQ index with the corpus sharded over ``mesh``.

    ``x: [N, M]`` is placed row-sharded (zero-padded to the mesh size).
    The Lloyd rounds — the 906-second reference hot path — run the fused
    Pallas kernel per device under ``shard_map`` with one ``psum`` of the
    ``[K, M]`` sums + ``[K]`` counts per round over ICI (round 2 pinned
    the 15×-slower XLA formulation here because GSPMD cannot split a
    ``pallas_call``; manual SPMD never asks it to). ``impl`` as in
    :func:`..ops.kmeans._fused_round`: default auto-selects Pallas on TPU
    per device, XLA elsewhere.
    """
    from .mesh import pad_rows, put_global

    if not isinstance(x, jax.Array):
        arr = np.asarray(x, np.float32)
        n = arr.shape[0]
        x = put_global(pad_rows(arr, mesh.devices.size, 0.0),
                       NamedSharding(mesh, P(AXIS, None)))
    else:
        n = x.shape[0]
        x = jnp.asarray(x, jnp.float32)
    return _build_sharded_fn(x, key, mesh=mesh, n=n, p=p, d=d, c=c,
                             pq_cap=pq_cap, coarse_cap=coarse_cap,
                             impl=impl)
