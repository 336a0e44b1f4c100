"""Pallas TPU kernel for a fused Lloyd round (assign + cluster sums).

One k-means round needs two full passes over the corpus the way XLA runs
it: nearest-centroid assignment materializes a ``[chunk, K]`` distance
tile per chunk and the centroid update materializes a ``[chunk, K+1]``
one-hot tile per chunk — at Deep10M coarse shape (N=10M, K=4096) that is
~164 GB of HBM written+read per pass, ~40x the corpus bytes, and the
round is pure HBM bandwidth. The reference pays the same two passes in
scalar form (``kmeans.rs:232-306``).

This kernel fuses both stages into ONE pass in which neither tile ever
leaves VMEM: for each row tile

1. ``d = cc - 2 x·cᵀ`` on the MXU (the ``‖x‖²`` term is constant per row
   and cannot change the argmin, so it is skipped),
2. ``idx = argmin d`` on the VPU,
3. ``onehot(idx)ᵀ @ x`` on the MXU accumulates cluster sums and counts
   into a VMEM-resident accumulator (revisited output block).

HBM traffic per round drops to ~corpus bytes (plus K·M outputs); the
round becomes MXU-bound at ``4·N·K·M`` FLOPs. Centroid means, the
convergence gradient, and empty-cluster handling stay in XLA
(:mod:`.kmeans`) — they are O(K·M).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_kernel(x_ref, chi_ref, clo_ref, cc_ref, idx_ref, sums_ref,
                  counts_ref, *, n: int, t: int, kc: int, fast_math: bool):
    """One ``[T, M]`` row tile against all ``[K, M]`` centroids.

    Two round-3 structure changes over the original kernel (measured
    ~8 µs of fixed cost per grid step; at the auto tile the step count
    dominated the round):

    * Centroids arrive PRE-SPLIT as bf16 hi/lo operands, computed once
      in XLA outside the grid — the old kernel re-derived the split from
      f32 centroids every step (K·M conversions × thousands of steps).
    * The distance/argmin runs over K in chunks of ``kc`` with a running
      ``(min, argmin)`` carry, so the ``[T, kc]`` distance + iota-select
      tiles bound VMEM independently of K and the row tile ``T`` can
      grow (fewer, fatter grid steps). Ties break to the globally FIRST
      minimum: within a chunk via the iota-min trick, across chunks
      because the carry update is strict ``<`` (an equal later chunk
      never displaces an earlier winner).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        sums_ref[...] = jnp.zeros(sums_ref.shape, sums_ref.dtype)
        counts_ref[...] = jnp.zeros(counts_ref.shape, counts_ref.dtype)

    xi = x_ref[0]                                    # [T, M] f32
    k = chi_ref.shape[1]

    # Edge tile: rows past N are garbage from the padded block — zero them
    # so 0·NaN cannot poison the sum matmul, and mask them out of the
    # one-hot.  n is static, so full tiles compile with no mask at all.
    # (Two iotas, not one transpose: Mosaic cannot transpose bool vectors.)
    valid_col = None
    if n % t:
        rows = j * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        xi = jnp.where(rows < n, xi, 0.0)
        cols = j * t + jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        valid_col = cols < n                         # [1, T]

    def dot_nt(a, b):                                # a @ bᵀ, f32 accum
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    xhi = xi.astype(jnp.bfloat16)
    if not fast_math:
        # Manual bf16x3 (hi/lo split): the same error-compensated product
        # XLA's Precision.HIGH runs — the XLA training path's setting —
        # at 3 MXU passes instead of HIGHEST's 6. Mosaic itself lowers
        # only DEFAULT (1 bf16 pass) and HIGHEST.
        xlo = (xi - xhi.astype(jnp.float32)).astype(jnp.bfloat16)

    dmin = None
    idx = None
    for ci, c0 in enumerate(range(0, k, kc)):
        chi = chi_ref[0][c0:c0 + kc]                 # [kc, M] bf16
        if fast_math:
            # ‖x‖² is constant per row: argmin_k (‖c_k‖² - 2 x·c_k)
            # suffices.
            xc = dot_nt(xhi, chi)
        else:
            clo = clo_ref[0][c0:c0 + kc]
            xc = dot_nt(xhi, chi) + dot_nt(xhi, clo) + dot_nt(xlo, chi)
        # cc arrives chunk-major ([nchunks, kc] per batch row) so each
        # chunk is a SUBLANE row starting at lane 0 — Mosaic cannot
        # broadcast a lane-offset slice over rows ("Invalid input
        # layout" on vector.broadcast of cc[:, c0:c0+kc]).
        d = cc_ref[0][ci:ci + 1, :] - 2.0 * xc       # [T, kc]
        # argmin via min + iota-select (Mosaic has no argmin lowering);
        # the inner min over matching positions keeps the FIRST minimum,
        # matching jnp.argmin / assign_chunked tie-breaking.
        cmin = jnp.min(d, axis=1, keepdims=True)     # [T, 1]
        cand = jnp.where(
            d == cmin,
            jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + c0, k)
        cidx = jnp.min(cand, axis=1)                 # [T]
        if dmin is None:
            dmin, idx = cmin, cidx
        else:
            upd = cmin < dmin                        # strict: first chunk
            dmin = jnp.where(upd, cmin, dmin)        # wins ties
            idx = jnp.where(upd[:, 0], cidx, idx)
    idx_ref[0, 0] = idx

    def dot_nn(a, b):                                # [kc,T] @ [T,M]
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for c0 in range(0, k, kc):
        oh = (jax.lax.broadcasted_iota(jnp.int32, (kc, t), 0) + c0
              == idx[None, :])                       # [kc, T]
        if valid_col is not None:
            oh &= valid_col
        # One-hot entries are exactly 0/1 in bf16, so the error in each
        # pass comes only from x's rounding: hi alone for fast_math,
        # hi+lo (the full f32 mantissa, split exactly) otherwise.
        ohf = oh.astype(jnp.bfloat16)
        s = dot_nn(ohf, xhi)
        if not fast_math:
            s += dot_nn(ohf, xlo)
        sums_ref[0, c0:c0 + kc] += s                 # [kc, M]
        counts_ref[0, c0:c0 + kc] += jnp.sum(
            oh.astype(jnp.float32), axis=1, keepdims=True)  # [kc, 1]


def _grouped_round_kernel(xg_ref, chi_ref, clo_ref, cc_ref, idx_ref,
                          sums_ref, counts_ref, *, n: int, t: int, g: int,
                          k: int, fast_math: bool):
    """One ``[T, 128]`` grouped row tile against block-diagonal centroids.

    Lanes hold ``g`` divisions' subvectors side by side; the centroid
    operand is block-diagonal ``[g·K, 128]`` (division ``i``'s centroids
    live in lanes ``[i·m, (i+1)·m)``, zeros elsewhere), so ONE MXU matmul
    computes all ``g`` divisions' cross terms exactly — off-block lanes
    multiply zeros.

    The distance tile is computed TRANSPOSED — ``[g·K, T]``, centroids on
    sublanes — so the per-division argmin is a SUBLANE reduction (cheap
    vertical vreg ops) and the one-hot is built directly in the ``[g·K,
    T]`` orientation the cluster-sum matmul consumes. The row-major
    orientation (argmin over lanes) measured 237 ms/round at GIST PQ
    shape with the MXU floor at ~53 ms — the lane-axis reduce/select
    chains dominated.

    As in :func:`_round_kernel` (round 3), the block-diagonal centroids
    arrive PRE-SPLIT as bf16 hi/lo operands computed once in XLA — the
    in-kernel split cost ``2·gK·128`` conversions per grid step.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        sums_ref[...] = jnp.zeros(sums_ref.shape, sums_ref.dtype)
        counts_ref[...] = jnp.zeros(counts_ref.shape, counts_ref.dtype)

    xi = xg_ref[0]                                   # [T, 128] f32
    chi = chi_ref[0]                                 # [g·K, 128] bf16

    valid_col = None
    if n % t:
        rows = j * t + jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
        xi = jnp.where(rows < n, xi, 0.0)
        cols = j * t + jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        valid_col = cols < n                         # [1, T]

    def dot_ct(a, b):                                # a @ bᵀ → [rows_a, T]
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    xhi = xi.astype(jnp.bfloat16)
    if fast_math:
        xc = dot_ct(chi, xhi)
    else:
        xlo = (xi - xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        clo = clo_ref[0]
        xc = dot_ct(chi, xhi) + dot_ct(clo, xhi) + dot_ct(chi, xlo)
    d = cc_ref[0] - 2.0 * xc                         # [g·K, T]

    # Per-division argmin over SUBLANES: group i owns rows
    # [i·K, (i+1)·K); first-minimum tie-break via the iota-min trick.
    row = jax.lax.broadcasted_iota(jnp.int32, (k, t), 0)     # [K, T]
    ohs = []
    idxs = []
    for i in range(g):
        di = d[i * k:(i + 1) * k, :]                         # [K, T]
        dmin = jnp.min(di, axis=0, keepdims=True)            # [1, T]
        cand = jnp.where(di == dmin, row, k)
        idx_i = jnp.min(cand, axis=0)                        # [T] in [0, K)
        idxs.append(idx_i[None, :])                          # [1, T]
        ohs.append(row == idx_i[None, :])                    # [K, T]
    idx_ref[0] = jnp.concatenate(idxs, axis=0)               # [g, T]
    oh = jnp.concatenate(ohs, axis=0)                        # [g·K, T]
    if valid_col is not None:
        oh &= valid_col
    ohf = oh.astype(jnp.bfloat16)

    def dot_nn(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    s = dot_nn(ohf, xhi)                                     # [g·K, 128]
    if not fast_math:
        s += dot_nn(ohf, xlo)
    sums_ref[0] += s
    counts_ref[0, 0] += jnp.sum(oh.astype(jnp.float32), axis=1)


def regroup_divisions(x: jax.Array) -> jax.Array:
    """``[B, N, m]`` divided data (m < 128, m | 128) → ``[G, N, 128]``
    with ``g = 128//m`` consecutive divisions' subvectors concatenated on
    lanes (zero pad divisions when ``g ∤ B``). This is the HBM layout the
    grouped kernel pins — full 128 lanes, so nothing lane-pads (the trap
    that made ``[60, 1M, 16]`` materialize at 30 GB under the plain
    kernel's layout, ``kmeans._auto_impl`` round 2)."""
    b, n, m = x.shape
    g = 128 // m
    gg = -(-b // g)
    xt = jnp.swapaxes(x, 0, 1)                       # [N, B, m]
    xt = jnp.pad(xt, ((0, 0), (0, gg * g - b), (0, 0)))
    return jnp.swapaxes(xt.reshape(n, gg, 128), 0, 1)  # [G, N, 128]


@functools.partial(jax.jit,
                   static_argnames=("tile", "fast_math", "interpret"))
def lloyd_round_grouped(xg: jax.Array, centroids: jax.Array, *,
                        tile: int | None = None, fast_math: bool = False,
                        interpret: bool | None = None,
                        ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused Lloyd round over division-grouped data.

    ``xg: [G, N, 128]`` from :func:`regroup_divisions`; ``centroids:
    [B, K, m]`` per ORIGINAL division. Returns ``(indices [B, N] int32,
    sums [B, K, m] f32, counts [B, K] f32)`` — same contract and numerics
    (bf16x3 / bf16x2 hi-lo) as :func:`lloyd_round`, at none of the
    lane-pad cost for m < 128: GIST-shape PQ training (D=60, m=16,
    C=256) runs 8 divisions per MXU pass instead of falling back to the
    two-pass XLA round (VERDICT.md round-2 weak #3).
    """
    b, k, m = centroids.shape
    gg, n, lanes = xg.shape
    assert lanes == 128 and 128 % m == 0
    g = 128 // m
    assert gg == -(-b // g), (gg, b, g)
    # K pads to a sublane multiple so the kernel's per-group row slices
    # are 8-aligned; pad centroid rows carry +inf norm so they never win
    # an argmin (their sums/counts rows are sliced off below).
    kp = -(-k // 8) * 8

    # Block-diagonal centroid operand + per-row squared norms ([g·K, 1] —
    # the transposed kernel broadcasts them over the T lanes).
    cpad = jnp.pad(centroids, ((0, gg * g - b), (0, kp - k), (0, 0)))
    cpad = cpad.reshape(gg, g, kp, m)
    eye = jnp.eye(g, dtype=centroids.dtype)
    bd = jnp.einsum("jikm,ih->jikhm", cpad, eye).reshape(gg, g * kp, 128)
    # Pre-split hi/lo (off-block zeros split to exact zeros).
    bdhi = bd.astype(jnp.bfloat16)
    bdlo = (bd - bdhi.astype(jnp.float32)).astype(jnp.bfloat16)
    cc = jnp.sum(cpad * cpad, axis=-1)               # [G, g, Kp]
    if kp != k:
        pad_row = jnp.arange(kp) >= k
        cc = jnp.where(pad_row[None, None, :], jnp.inf, cc)
    cc = cc.reshape(gg, g * kp, 1)

    if tile is None:
        # Same VMEM model as lloyd_round with K_pad = g·K, M_pad = 128.
        kpl = -(-(g * kp) // 128) * 128
        avail = max((14 << 20) - 12 * kpl * 128, 1 << 20)
        tile = max(128, min(1024,
                            avail // (7 * kpl + 12 * 128) // 128 * 128))
    t = min(tile, max(128, -(-n // 128) * 128))
    steps = -(-n // t)
    if interpret is None:
        from .bucketed import _platform
        interpret = _platform() != "tpu"

    kernel = functools.partial(_grouped_round_kernel, n=n, t=t, g=g, k=kp,
                               fast_math=fast_math)
    idx, sums, counts = pl.pallas_call(
        kernel,
        grid=(gg, steps),
        in_specs=[
            pl.BlockSpec((1, t, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * kp, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * kp, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * kp, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g, t), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * kp, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, g * kp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gg, g, steps * t), jnp.int32),
            jax.ShapeDtypeStruct((gg, g * kp, 128), jnp.float32),
            jax.ShapeDtypeStruct((gg, 1, g * kp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * gg * n * g * kp * 128,
            bytes_accessed=(xg.size + bd.size * steps) * 4
            + gg * g * n * 4 + gg * g * kp * 129 * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xg, bdhi, bdlo, cc)

    indices = idx[:, :, :n].reshape(gg * g, n)[:b]
    # sums rows are [g·Kp, 128]; division (j·g+i) lives in rows
    # [i·Kp, (i+1)·Kp) lanes [i·m, (i+1)·m) — take the block diagonal.
    sums = sums.reshape(gg, g, kp, g, m)
    sums = jnp.diagonal(sums, axis1=1, axis2=3)      # [G, Kp, m, g]
    sums = jnp.moveaxis(sums, -1, 1).reshape(gg * g, kp, m)[:b, :k]
    counts = counts.reshape(gg * g, kp)[:b, :k]
    return indices, sums, counts


@functools.partial(jax.jit,
                   static_argnames=("tile", "fast_math", "interpret"))
def lloyd_round(x: jax.Array, centroids: jax.Array, *,
                tile: int | None = None, fast_math: bool = False,
                interpret: bool | None = None,
                ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused assignment + cluster-sum pass.

    ``x: [B, N, M]`` f32, ``centroids: [B, K, M]`` f32 →
    ``(indices [B, N] int32, sums [B, K, M] f32, counts [B, K] f32)``
    where ``indices[b, i] = argmin_k ‖x[b,i] - c[b,k]‖²`` (first minimum,
    matching :func:`.distance.assign_chunked`) and ``sums/counts`` are the
    per-cluster member sums/sizes under that fresh assignment.

    Default numerics: distances via a manual bf16x3 (hi/lo) product —
    the same error-compensated scheme as ``Precision.HIGH``, which the
    XLA training path uses — and sums via bf16x2 (exact one-hot factor,
    f32 accumulation), measured ≈0.9999 assignment agreement with the
    XLA path. ``fast_math`` drops both to single bf16 passes (~0.995
    agreement — ties flip where bf16 rounding collapses near-equal
    distances).
    """
    b, n, m = x.shape
    k = centroids.shape[1]
    # K-chunk size for the running-argmin loop: the largest 128-multiple
    # divisor of k up to 512 (VMEM for the [T, kc] tiles), or all of k
    # when k is not 128-divisible (single chunk ≡ the original whole-K
    # formulation). Chunking engages only for LARGE K: it bounds the
    # [T, kc] distance tiles so K=4096 coarse rounds fit VMEM (the round-3
    # 109 → 76 ms win), but its 256-row tile cap multiplies grid steps —
    # at the headline PQ shape (K=256, M=128) the chunked path ran
    # ~6 ms/round vs ~4.4 unchunked, the whole of the round-3 headline
    # build regression (0.63 → 0.77 s, VERDICT round-3 #2). K ≤ 1024
    # distance tiles fit VMEM whole under the tile model below.
    kc = k
    if k > 1024:
        for cand_kc in (512, 384, 256, 128):
            if k % cand_kc == 0:
                kc = cand_kc
                break
    if tile is None:
        # Row-tile auto-sizing against the 16 MB scoped-VMEM limit.
        # Model (round 3, chunked kernel with pre-split centroids),
        # calibrated against two MEASURED scoped sizes (Mosaic keeps
        # ~two chunks' distance/iota-select tiles live across the
        # unrolled chunk loop): K=100/M=1536/T=640 → 16.21M and
        # K=4096/kc=512/M=96/T=1280 → 21.11M:
        #   scoped ≈ (19·kc_pad + 12·M_pad)·T   (2× d f32 + cand i32,
        #            one-hot bool/bf16; x f32 double-buffered + hi/lo)
        #          + 8·K_pad·M_pad + 4·kc_pad·M_pad (sums f32 + chi/clo
        #            inputs + per-chunk sum tile) + ~2M misc.
        # Bigger tiles amortize the ~6.4 µs fixed cost per grid step
        # (measured: K=4096, 159 ms @T=128 → 109 ms @T=256 per 2M rows),
        # so take the largest T that keeps the model under ~15.5 MB.
        kp = -(-k // 128) * 128
        kcp = -(-kc // 128) * 128
        mp = -(-m // 128) * 128
        avail = max(
            (27 << 19) - 8 * kp * mp - 4 * kcp * mp, 1 << 20)
        tile = max(128, min(2048, avail // (19 * kcp + 12 * mp) // 128 * 128))
        if kc < k:
            # Chunked-K regime: measured T-INSENSITIVE (2M×96, K=4096:
            # 96.0/96.4/98.4/101.6 ms per fenced round at T=512/256/384/
            # 768 — the running-argmin carry already amortizes the grid
            # step), while the scoped-VMEM fit at the same shape ran
            # 17.77M at T=768 in one compile-helper session and passed in
            # another (transient AOT OOM, Deep10M assign, round 3). Large
            # tiles buy nothing here and sit in the OOM-risk zone — cap
            # at 256 (≈14.4M by the measured line 12.8M + 6.5KB·T).
            tile = min(tile, 256)
    t = min(tile, max(128, -(-n // 128) * 128))
    steps = -(-n // t)
    if interpret is None:  # Mosaic needs a real TPU; interpret elsewhere
        from .bucketed import _platform
        interpret = _platform() != "tpu"

    nch = k // kc
    # Chunk-major centroid norms: [B, nchunks, kc] so the kernel reads
    # each chunk as one sublane row (lane offset 0; see _round_kernel).
    cc = jnp.sum(centroids * centroids, axis=-1).reshape(b, nch, kc)
    chi = centroids.astype(jnp.bfloat16)
    clo = (centroids - chi.astype(jnp.float32)).astype(jnp.bfloat16)

    kernel = functools.partial(_round_kernel, n=n, t=t, kc=kc,
                               fast_math=fast_math)
    idx, sums, counts = pl.pallas_call(
        kernel,
        grid=(b, steps),
        in_specs=[
            pl.BlockSpec((1, t, m), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nch, kc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # Mosaic needs the last two block dims (8, 128)-divisible or
            # equal to the array dims — hence the singleton axes.
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, steps * t), jnp.int32),
            jax.ShapeDtypeStruct((b, k, m), jnp.float32),
            jax.ShapeDtypeStruct((b, k, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * k * m,
            bytes_accessed=(x.size + centroids.size * steps) * 4
            + b * n * 4 + (b * k * (m + 1)) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, chi, clo, cc)
    return idx[:, 0, :n], sums, counts[:, :, 0]
