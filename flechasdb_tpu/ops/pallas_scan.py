"""Pallas TPU kernel for the ADC table-lookup scan.

The pruned query's hot op is ``vdist[g, l] = Σ_d table[g, d, codes[g, l, d]]``
— a tiny-table gather XLA lowers to a slow scalar gather on TPU (measured:
76 ms of a 79 ms nprobe=10 SIFT1M-scale batch; the other three stages sum to
~4 ms). The table is only ``D×C`` floats (8 KB) — it fits in VMEM many times
over — so the kernel keeps it resident and gathers with the VPU's in-register
``tpu.dynamic_gather`` (exposed as ``take_along_axis`` with operand-shaped
indices): codes are processed in 128-lane chunks, each gathered against the
128-wide slices of the table and merged with compare-selects (the gather
dimension must fit one vreg). This replaces the reference's per-member scalar
loop ``Σ_d table[d, code[d]]`` (``db/stored.rs:549-598``).

Measured at SIFT1M batch shape (10k gathers × L=1280, D=8, C=256, v5e):
~9 ms — ~2.6× the previous compare-select reduction (Σ_c (code==c)·tab[c],
~24 ms, O(C) VPU ops per code) and ~40× the XLA gather (~76 ms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Lane width of one vreg — the unit the dynamic gather operates on.
_LANE = 128

#: L-axis tile per grid step. Bounds the VMEM block (codes tile + table +
#: out ≲ 100 KB at D=8) and the Python-unrolled chunk loop (16 gather
#: chunks) no matter how large a bucket is — an unbounded-L block both
#: exceeds the ~14 MB scoped-VMEM budget (CLAUDE.md) and inflates Mosaic
#: compile time, and a compile-time OOM can wedge the TPU tunnel for
#: minutes. Buckets at/below one tile (SIFT1M L=1280) still compile to a
#: single block per gather, so the measured fast path is unchanged.
_L_TILE = 2048


def _gather_sum(codes, tab, nsub):
    """``Σ_rows tab[row, codes[row, :]]`` for one 128-lane chunk.

    ``codes: [R, 128]`` int32 in ``[0, nsub·128)``, ``tab: [R, nsub·128]``
    f32 → ``[128]``. The dynamic gather operates within one vreg of
    lanes, so wider tables select across their 128-wide slices.
    """
    vals = None
    for s in range(nsub):
        sub = tab[:, s * _LANE:(s + 1) * _LANE]           # [R, 128]
        idx = jnp.clip(codes - s * _LANE, 0, _LANE - 1)
        v = jnp.take_along_axis(sub, idx, axis=1)         # dynamic_gather
        vals = v if vals is None else jnp.where(
            codes >= s * _LANE, v, vals)
    return jnp.sum(vals, axis=0)


def _lookup_kernel(codes_ref, tab_ref, out_ref, *, t: int, cp: int):
    """One ``[D, T]`` code tile against one ``[D, Cp]`` table.

    Rows live on the lane axis (minor), codewords on sublanes — both the
    codes array and the accumulator tile without padding waste. ``T`` is
    one L-tile (:data:`_L_TILE`), not the whole bucket: tiling L bounds
    the VMEM block and the unrolled chunk loop regardless of bucket size.
    """
    codes = codes_ref[0]                          # [D, T] int32
    tab = tab_ref[0]                              # [D, Cp] f32
    for j in range(t // _LANE):
        out_ref[0, 0, j * _LANE:(j + 1) * _LANE] = _gather_sum(
            codes[:, j * _LANE:(j + 1) * _LANE], tab, cp // _LANE)


def _lookup_kernel_packed(codes_ref, tab_ref, out_ref, *, t: int, cp: int):
    """Packed variant: ``[DP, T]`` words, four byte codes each.

    Unpacking stays vreg-shaped: four shift/mask byte planes ``[DP, 128]``
    concatenated along sublanes give ``[4·DP, 128]`` codes whose row
    ``b·DP + w`` is division ``4w + b`` — the caller hands the table with
    its rows permuted to that order (pad rows zeroed, so the pad bytes'
    code 0 contributes nothing).
    """
    words = codes_ref[0]                          # [DP, T] int32
    tab = tab_ref[0]                              # [4·DP, Cp] f32, permuted
    for j in range(t // _LANE):
        wc = words[:, j * _LANE:(j + 1) * _LANE]          # [DP, 128]
        codes = jnp.concatenate(
            [(wc >> (8 * bb)) & 0xFF for bb in range(4)], axis=0)
        out_ref[0, 0, j * _LANE:(j + 1) * _LANE] = _gather_sum(
            codes, tab, cp // _LANE)


def _prep_table(ftab: jax.Array, d: int, rows: int, packed: bool,
                ) -> tuple[jax.Array, int, int]:
    """Lane-pads ``ftab [G, D*C]`` to ``[G, tab_rows, Cp]`` and, for packed
    codes, permutes rows to the byte-plane-concat order the packed kernel
    expects (zeroing pad rows). Returns ``(tab, tab_rows, cp)``."""
    g = ftab.shape[0]
    c = ftab.shape[1] // d
    tab = ftab.reshape(g, d, c)
    cp = -(-c // _LANE) * _LANE
    if cp != c:
        # Lane-pad the table so every 128-wide slice exists; codes stay
        # < C so the padding is never selected.
        tab = jnp.pad(tab, ((0, 0), (0, 0), (0, cp - c)))
    if not packed:
        return tab, d, cp
    import numpy as np
    perm = np.array([4 * w + bb for bb in range(4) for w in range(rows)])
    tab = jnp.where(
        (perm < d)[None, :, None],
        jnp.take(tab, jnp.minimum(perm, d - 1), axis=1), 0.0)
    return tab, 4 * rows, cp


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def adc_lookup(codes: jax.Array, ftab: jax.Array, *,
               d: int | None = None,
               interpret: bool | None = None) -> jax.Array:
    """Batched ADC lookup-sum.

    ``codes: [G, D, L] int32`` (values in ``[0, C)``) — or packed
    ``[G, ceil(D/4), L]`` words (:func:`.bucketed.bucketize` with
    ``pack``), in which case ``d`` must be given — and ``ftab: [G, D*C]``
    f32 → ``[G, L]`` f32. ``L`` must be a multiple of 128 (the bucketed
    layout guarantees it).
    """
    g, rows, l = codes.shape
    if d is None:
        d = rows
    packed = rows != d
    dc = ftab.shape[1]
    c = dc // d
    if l % _LANE:
        raise ValueError(f"L ({l}) must be a multiple of {_LANE}")
    if packed and rows != -(-d // 4):
        raise ValueError(f"codes rows {rows} match neither D={d} nor "
                         f"ceil(D/4)={-(-d // 4)}")
    if interpret is None:  # Mosaic needs real TPU; interpret elsewhere
        from .bucketed import _platform
        interpret = _platform() != "tpu"

    tab, tab_rows, cp = _prep_table(ftab, d, rows, packed)

    # Grid tiles L: the table block index is constant across the (fast)
    # L dimension, so it stays VMEM-resident while code tiles stream.
    # Final-tile overhang reads garbage codes whose clipped gathers land
    # in discarded output lanes — harmless by construction.
    lt = min(l, _L_TILE)
    l_steps = -(-l // lt)
    kern = _lookup_kernel_packed if packed else _lookup_kernel
    kernel = functools.partial(kern, t=lt, cp=cp)

    out = pl.pallas_call(
        kernel,
        grid=(g, l_steps),
        in_specs=[
            pl.BlockSpec((1, rows, lt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tab_rows, cp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, lt), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, l), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * l * d * (cp // _LANE),
            bytes_accessed=codes.size * 4 + ftab.size * 4 + g * l * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(codes, tab)
    return out.reshape(g, l)


def _indexed_kernel(bidx_ref, codes_ref, tab_ref, out_ref, *,
                    t: int, cp: int, packed: bool):
    """Same math as the plain kernels; the codes block was selected by the
    scalar-prefetched bucket index (see :func:`adc_lookup_indexed`)."""
    if packed:
        _lookup_kernel_packed(codes_ref, tab_ref, out_ref, t=t, cp=cp)
    else:
        _lookup_kernel(codes_ref, tab_ref, out_ref, t=t, cp=cp)


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def adc_lookup_indexed(bcodes: jax.Array, ftab: jax.Array,
                       bidx: jax.Array, *,
                       d: int | None = None,
                       interpret: bool | None = None) -> jax.Array:
    """ADC lookup-sum reading buckets IN PLACE from the resident layout.

    ``bcodes: [P, D, L] int32`` (or packed ``[P, ceil(D/4), L]``, then
    ``d`` required) is the full :class:`.bucketed.Buckets` code array;
    ``ftab: [G, D*C] f32`` one ADC table per gather cell; ``bidx: [G]
    int32`` in ``[0, P)`` selects the bucket each cell scans. Returns
    ``[G, L]`` with ``out[g, l] = Σ_d ftab[g, d, bcodes[bidx[g], d, l]]``.

    The bucket index rides Pallas **scalar prefetch**: the grid's block
    index map reads ``bidx`` and DMA-streams each selected bucket block
    HBM→VMEM directly — the ``[G, D, L]`` gathered copy the plain
    :func:`adc_lookup` path materializes in HBM (written once, read once)
    never exists, halving hot-path HBM traffic for the scan. Duplicate
    consecutive indices (e.g. a sharded device's unowned probe slots
    clamped to one bucket) skip the re-fetch entirely.
    """
    p, rows, l = bcodes.shape
    g = ftab.shape[0]
    if d is None:
        d = rows
    packed = rows != d
    if l % _LANE:
        raise ValueError(f"L ({l}) must be a multiple of {_LANE}")
    if packed and rows != -(-d // 4):
        raise ValueError(f"codes rows {rows} match neither D={d} nor "
                         f"ceil(D/4)={-(-d // 4)}")
    if bidx.shape != (g,):
        raise ValueError(
            f"bidx shape {bidx.shape} != (G,) = ({g},)")
    if interpret is None:  # Mosaic needs real TPU; interpret elsewhere
        from .bucketed import _platform
        interpret = _platform() != "tpu"
    if interpret:
        # Interpret-mode pallas hangs at compile under scalar prefetch in
        # this jax version (measured: a minimal PrefetchScalarGridSpec
        # case never finishes lowering->compile on CPU). Off-TPU the
        # point of the kernel — skipping the HBM gather copy — is moot
        # anyway, so compute the identical result in XLA.
        c = ftab.shape[1] // d
        codes = jnp.take(bcodes, bidx, axis=0)              # [G, rows, L]
        if packed:
            from .bucketed import unpack_codes
            codes = unpack_codes(codes, d)                  # [G, D, L]
        gidx = codes + jnp.arange(d, dtype=jnp.int32)[None, :, None] * c
        vals = jnp.take_along_axis(ftab, gidx.reshape(g, d * l), axis=-1)
        return vals.reshape(g, d, l).sum(axis=1)

    tab, tab_rows, cp = _prep_table(ftab, d, rows, packed)

    lt = min(l, _L_TILE)
    l_steps = -(-l // lt)
    kernel = functools.partial(_indexed_kernel, t=lt, cp=cp, packed=packed)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g, l_steps),
            in_specs=[
                pl.BlockSpec((1, rows, lt),
                             lambda i, j, bref: (bref[i], 0, j)),
                pl.BlockSpec((1, tab_rows, cp),
                             lambda i, j, bref: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, lt),
                                   lambda i, j, bref: (i, 0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((g, 1, l), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * l * d * (cp // _LANE),
            bytes_accessed=g * rows * l * 4 + ftab.size * 4 + g * l * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(bidx, jnp.int32), bcodes, tab)
    return out.reshape(g, l)
