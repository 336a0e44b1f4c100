"""Sharded k-means: the fused Pallas Lloyd round per device + ``psum``.

GSPMD cannot partition a ``pallas_call`` (a custom call is opaque to the
SPMD partitioner), which is why the round-2 sharded build pinned the
15×-slower two-pass XLA formulation. ``shard_map`` sidesteps the
partitioner entirely: each device runs
:func:`..ops.pallas_kmeans.lloyd_round` on its local corpus shard and the
``[K, M]`` cluster sums + ``[K]`` counts — kilobytes per round — cross the
ICI as one ``psum``. Seeding, centroid means, and the convergence rule are
O(K·M) and stay replicated XLA, bit-identical to the single-chip
:func:`..ops.kmeans.fit`.

Reference hot path being scaled: ``kmeans.rs:232-306`` (the two O(N·K·M)
phases of one Lloyd round, SURVEY.md §3.1).

Padding convention: shard_map needs the sharded axis evenly divisible, so
corpora are zero-padded. A zero row contributes nothing to the cluster
sums (its one-hot row multiplies a zero vector) but would inflate one
cluster's count — every zero row assigns to the first-minimum cluster of
``argmin_k ‖c_k‖²`` — so that count is corrected after the ``psum``.
Assignments in pad slots are garbage and must be sliced off by the caller.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kmeans
from .mesh import AXIS


def _replicated(mesh: Mesh, x: jax.Array) -> jax.Array:
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def _gather_rows(mesh: Mesh, x: jax.Array, rows: jax.Array) -> jax.Array:
    """``x [B, Np, M]`` (row-sharded) → replicated ``[B, len(rows), M]``."""
    return _replicated(mesh, jnp.take(x, rows, axis=1))


def fused_round_sharded(x: jax.Array, centroids: jax.Array, k: int,
                        impl: str | None, mesh: Mesh, n_pad: int,
                        xg: jax.Array | None = None,
                        ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One Lloyd round over the mesh: per-device fused pass + ``psum``.

    ``x: [B, Np, M]`` sharded ``P(None, AXIS, None)`` with ``n_pad``
    trailing zero rows; ``centroids: [B, K, M]`` replicated. ``xg`` is the
    optional pre-grouped ``[G, Np, 128]`` layout (also row-sharded) for
    the grouped kernel — :func:`fit_sharded` computes it ONCE so the
    per-round regroup (a full corpus-shard copy) stays out of the Lloyd
    loop, exactly as :func:`..ops.kmeans.fit` hoists it. Returns
    ``(indices [B, Np] sharded, sums [B, K, M], counts [B, K])`` with the
    pad rows' count contribution removed.
    """

    def local(xl, c, *xgl):
        idx, sums, counts = kmeans._fused_round(
            xl, c, k, impl, xgl[0] if xgl else None)
        return (idx, jax.lax.psum(sums, AXIS), jax.lax.psum(counts, AXIS))

    args = (x, centroids) if xg is None else (x, centroids, xg)
    in_specs = ((P(None, AXIS, None), P()) if xg is None else
                (P(None, AXIS, None), P(), P(None, AXIS, None)))
    idx, sums, counts = jax.shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(None, AXIS), P(), P()),
        check_vma=False,
    )(*args)
    if n_pad:
        # Zero pad rows all landed on the first-minimum of ‖c_k‖² (their
        # distance column is exactly cc); remove them from that count.
        cc = jnp.sum(centroids * centroids, axis=-1)       # [B, K]
        k0 = jnp.argmin(cc, axis=-1)                       # [B]
        counts = counts - n_pad * jax.nn.one_hot(k0, k, dtype=counts.dtype)
    return idx, sums, counts


def _assign_sharded(x: jax.Array, centroids: jax.Array, k: int,
                    impl: str | None, mesh: Mesh,
                    xg: jax.Array | None = None) -> jax.Array:
    """Sharded assignment-only pass (no collective needed)."""

    def local(xl, c, *xgl):
        return kmeans._assign_only(xl, c, k, impl,
                                   xgl[0] if xgl else None)

    args = (x, centroids) if xg is None else (x, centroids, xg)
    in_specs = ((P(None, AXIS, None), P()) if xg is None else
                (P(None, AXIS, None), P(), P(None, AXIS, None)))
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=in_specs,
        out_specs=P(None, AXIS),
        check_vma=False,
    )(*args)


def fit_sharded(x: jax.Array, k: int, key: jax.Array, *, mesh: Mesh,
                n_valid: int,
                epsilon: float = kmeans.DEFAULT_EPSILON,
                max_rounds: int = kmeans.MAX_ROUNDS,
                impl: str | None = None,
                train_cap: int | None = None) -> kmeans.KMeansResult:
    """Sharded analogue of :func:`..ops.kmeans.fit` — same key stream, same
    convergence rule, same tie-breaking; cluster sums cross the mesh as
    ``psum`` instead of living on one chip.

    ``x: [B, Np, M]`` row-sharded over ``mesh`` with rows ``>= n_valid``
    zero-padded. ``indices`` comes back sharded with garbage in pad slots.
    Seeding draws the SAME subsample rows as the single-chip path (the
    k-means++ chain is serial and tiny, so it runs replicated on the
    gathered sample — identical arithmetic, identical draws).

    ``train_cap`` as in :func:`..ops.kmeans.fit` (same key split, same
    rows): the Lloyd rounds run on a re-sharded ``train_cap``-row
    subsample, then one sharded full-corpus assignment pass.
    """
    b, np_, m = x.shape
    n = n_valid
    n_pad = np_ - n
    if n < k:
        raise ValueError(f"vs has fewer vectors than k: {n} < {k}")
    if max_rounds < 1:
        raise ValueError(
            f"fit_sharded needs max_rounds >= 1: {max_rounds}")
    if n == k:                    # before the cap check, as fit() orders it
        cents = _gather_rows(mesh, x, jnp.arange(n))
        idx = jnp.broadcast_to(jnp.arange(np_, dtype=jnp.int32), (b, np_))
        return kmeans.KMeansResult(cents, idx, jnp.zeros((b,), jnp.int32),
                                   jnp.zeros((b,), jnp.float32))
    # Resolve the kernel once against the LOCAL shard shape (auto picks by
    # per-device bytes), so the grouped kernel's lane-fold layout can be
    # computed one time outside the Lloyd loop — regroup_divisions is a
    # full corpus-shard copy that must not run per round (it is N-axis-
    # preserving plain XLA, so GSPMD shards it like the corpus itself).
    # Resolved BEFORE the train_cap branch: its full-corpus assignment
    # pass also runs inside shard_map, where an unresolved None would fall
    # back to the DEFAULT device's platform — on a CPU mesh in a process
    # whose default backend is the TPU plugin that picks a kernel that
    # cannot lower (same hazard _auto_impl documents).
    base, fast = kmeans._impl_parts(impl)
    if base is None:
        local_shape = jax.ShapeDtypeStruct(
            (b, -(-np_ // mesh.devices.size), m), x.dtype)
        base = kmeans._auto_impl(local_shape,
                                 platform=mesh.devices.flat[0].platform)
    impl = base + "_fast" if fast else base
    if train_cap is not None and train_cap > 0 and n > train_cap:
        if train_cap < k:
            raise ValueError(
                f"train_cap is smaller than k: {train_cap} < {k}")
        k_rows, k_sub = jax.random.split(key)   # fit's cap key stream
        rows = jax.random.randint(k_rows, (train_cap,), 0, n)
        n_dev = mesh.devices.size
        spad = (-train_cap) % n_dev
        sp = jnp.pad(jnp.take(x, rows, axis=1), ((0, 0), (0, spad), (0, 0)))
        sp = jax.lax.with_sharding_constraint(
            sp, NamedSharding(mesh, P(None, AXIS, None)))
        sub = fit_sharded(sp, k, k_sub, mesh=mesh, n_valid=train_cap,
                          epsilon=epsilon, max_rounds=max_rounds, impl=impl)
        idx = _assign_sharded(x, sub.centroids, k, impl, mesh)
        return kmeans.KMeansResult(sub.centroids, idx, sub.rounds,
                                   sub.gradient)
    xg = None
    if impl.startswith("pallas_grouped"):
        from ..ops.pallas_kmeans import regroup_divisions
        xg = jax.lax.with_sharding_constraint(
            regroup_divisions(x),
            NamedSharding(mesh, P(None, AXIS, None)))

    # Seeding — mirrors kmeans._subsampled_init exactly (same key splits,
    # same rows) on a replicated gather of the (sub)sample.
    cap = kmeans._seed_cap(k)
    if n <= cap:
        sample = _gather_rows(mesh, x, jnp.arange(n))
        centroids, _ = kmeans.plusplus_init(sample, k, key)
    else:
        k_pick, k_seed = jax.random.split(key)
        rows = jax.random.randint(k_pick, (cap,), 0, n)
        sample = _gather_rows(mesh, x, rows)
        centroids, _ = kmeans.plusplus_init(sample, k, k_seed)
    centroids = _replicated(mesh, centroids)
    indices = jnp.zeros((b, np_), jnp.int32)

    # The convergence/freeze semantics live in ONE place —
    # kmeans.lloyd_loop; only the round kernel (psum-reduced, pad-count
    # corrected), the epilogue assignment, and the replication re-pin
    # differ from the single-chip fit.
    return kmeans.lloyd_loop(
        centroids, indices, x.dtype, epsilon=epsilon, max_rounds=max_rounds,
        round_fn=lambda c: fused_round_sharded(x, c, k, impl, mesh,
                                               n_pad, xg),
        assign_fn=lambda c: _assign_sharded(x, c, k, impl, mesh, xg),
        post_update=lambda c: _replicated(mesh, c))
