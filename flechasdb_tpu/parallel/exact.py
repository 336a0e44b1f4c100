"""SPMD sharded exact (flat) k-NN.

Same shape as :mod:`.query`: the raw corpus rows shard over the ``"shard"``
axis, each device runs the chunked exact scan (:mod:`..ops.exact`) on its
local rows, and only ``k`` candidates per device cross ICI in the
``all_gather`` merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.exact import exact_topk
from .mesh import AXIS, merge_topk, pad_rows


def shard_flat(mesh: Mesh, x: np.ndarray) -> tuple[jax.Array, int]:
    """Row-shards the corpus; returns ``(sharded [N_pad, M], true_n)``."""
    n = len(x)
    xp = pad_rows(np.asarray(x, np.float32), mesh.devices.size, 0.0)
    xs = jax.device_put(xp, NamedSharding(mesh, P(AXIS, None)))
    return xs, n


def _local(q, x, *, k, kk, n, metric):
    nloc = x.shape[0]
    base = jax.lax.axis_index(AXIS) * nloc
    # Select kk = min(k + n_pad, nloc) candidates so that even if every pad
    # row (zero vector, global id >= n) wins a slot, k true neighbours still
    # survive the mask below — pad rows must never displace real rows.
    d, rows = exact_topk(q, x, k=kk, metric=metric)
    rows = rows + base
    d = jnp.where(rows < n, d, jnp.inf)                 # mask pad rows
    if d.shape[1] < k:
        d = jnp.pad(d, ((0, 0), (0, k - d.shape[1])),
                    constant_values=jnp.inf)
        rows = jnp.pad(rows, ((0, 0), (0, k - rows.shape[1])))
    return merge_topk(-d, rows, k)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "n", "metric"))
def exact_sharded(q: jax.Array, x: jax.Array, *, mesh: Mesh, k: int,
                  n: int, metric: str = "l2") -> tuple[jax.Array, jax.Array]:
    """Exact k-NN with the corpus sharded across ``mesh``.

    ``x`` must be row-sharded (see :func:`shard_flat`); ``n`` is the true
    (unpadded) corpus size. Returns ``(sq_distances [B, k], rows [B, k])``.
    ``metric`` as in :mod:`..metrics` ("dot" keys are negated inner
    products — pad rows are zero vectors whose inner product is 0, which
    could outrank real negative-IP rows, hence the same ``rows < n`` mask).
    """
    nloc = x.shape[0] // mesh.devices.size
    n_pad = x.shape[0] - n
    kk = min(k + n_pad, nloc)
    fn = jax.shard_map(
        functools.partial(_local, k=k, kk=kk, n=n, metric=metric),
        mesh=mesh,
        in_specs=(P(), P(AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(q, x)
