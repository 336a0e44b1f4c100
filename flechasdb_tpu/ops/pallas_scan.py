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

#: Gather cells processed per grid step (round 4). One cell per step
#: left the kernels LATENCY-bound, not bandwidth-bound: the roofline
#: measured ~0.8–1.4 µs per grid step moving only 16–54 KB of blocks
#: (≈38 GB/s, 4.6 % of v5e HBM peak, `benchmarks/roofline.py`). Packing
#: 8 cells into each step cuts the step count 8× so the per-step DMAs
#: overlap inside the step instead of serializing across the double
#: buffer. Measured win (canary-gated interleaved A/B, min-of-3, v5e):
#: SIFT indexed 0.766 → 0.627 ms, Deep10M packed 8.28 → 6.84 ms,
#: pre-gathered 0.72 → 0.665 ms — ~15–18 %. Round 5 superseded the
#: per-bucket-DMA floor this left with the manual pipeline
#: (:func:`_pipe_kernel`); the constant now also sizes that pipeline's
#: cell groups.
_CELLS_PER_STEP = 8


def _gather_sum(codes, tab, nsub):
    """``Σ_rows tab[row, codes[row, :]]`` for one 128-lane chunk.

    ``codes: [R, 128]`` int32 in ``[0, nsub·128)``, ``tab: [R, nsub·128]``
    f32 → ``[128]``. The dynamic gather operates within one vreg of
    lanes, so wider tables select across their 128-wide slices. The
    in-slice index is the low 7 bits and the slice id the remaining
    high bits (round 5: one AND + one shift replace the per-slice
    ``clip``s — the scans are VPU-issue-bound, measured ~37 cycles per
    chunk against ~24 of algorithmic ops, so every glue op counts).
    Garbage lanes (pad overhang) stay in-bounds by construction of the
    mask; their selects may all miss, leaving slice-0 values — callers
    discard those lanes.
    """
    lo = codes & (_LANE - 1)
    v0 = jnp.take_along_axis(tab[:, :_LANE], lo, axis=1)  # dynamic_gather
    if nsub == 1:
        return jnp.sum(v0, axis=0)
    hi = codes >> 7
    vals = v0
    for s in range(1, nsub):
        sub = tab[:, s * _LANE:(s + 1) * _LANE]           # [R, 128]
        v = jnp.take_along_axis(sub, lo, axis=1)
        vals = jnp.where(hi == s, v, vals)
    return jnp.sum(vals, axis=0)


def _cell_chunks(codes, tab, *, t: int, cp: int, packed: bool):
    """Yields ``(lane_slice, values[128])`` for one cell's ``[rows, T]``
    codes against its ``[tab_rows, Cp]`` table.

    Rows live on the lane axis (minor), codewords on sublanes — both the
    codes array and the accumulator tile without padding waste. ``T`` is
    one L-tile (:data:`_L_TILE`), not the whole bucket: tiling L bounds
    the VMEM block and the unrolled chunk loop regardless of bucket size.

    Packed codes (``rows = ceil(D/4)`` words of four byte codes) unpack
    vreg-shaped: four shifted byte planes ``[DP, 128]`` concatenated
    along sublanes give ``[4·DP, 128]`` codes whose row ``b·DP + w`` is
    division ``4w + b`` — the caller hands the table with its rows
    permuted to that order (pad rows zeroed, so the pad bytes' code 0
    contributes nothing). The byte isolation (``& 0xFF``) is deferred:
    :func:`_gather_sum`'s ``& 0x7F`` masks the low bits anyway, and its
    slice id needs only ``(code >> 7) & 1`` for C ≤ 256 — one AND on
    the concatenated planes replaces four per-plane ANDs.
    """
    nsub = cp // _LANE
    for j in range(t // _LANE):
        sl = slice(j * _LANE, (j + 1) * _LANE)
        wc = codes[:, sl]
        if packed:
            planes = jnp.concatenate(
                [wc >> (8 * bb) for bb in range(4)], axis=0)
            if planes.shape[0] < tab.shape[0]:
                # match the table's sublane-padded rows (zero codes hit
                # the table's zero pad rows — contribute nothing)
                planes = jnp.concatenate(
                    [planes, jnp.zeros((tab.shape[0] - planes.shape[0],
                                        planes.shape[1]), planes.dtype)],
                    axis=0)
            if nsub <= 2:
                # byte isolation deferred: & 0x7F in the gather, slice
                # id = bit 7 only
                lo = planes & (_LANE - 1)
                tab0 = tab[:, :_LANE]
                v0 = jnp.take_along_axis(tab0, lo, axis=1)
                if nsub == 1:
                    yield sl, jnp.sum(v0, axis=0)
                    continue
                v1 = jnp.take_along_axis(tab[:, _LANE:2 * _LANE], lo,
                                         axis=1)
                vals = jnp.where((planes & _LANE) != 0, v1, v0)
                yield sl, jnp.sum(vals, axis=0)
                continue
            wc = planes & 0xFF
        yield sl, _gather_sum(wc, tab, nsub)


def _lookup_kernel(codes_ref, tab_ref, out_ref, *, t: int, cp: int,
                   gb: int, packed: bool):
    """``gb`` pre-gathered cells per grid step: ``codes_ref [gb, rows,
    T]``, ``tab_ref [gb, tab_rows, Cp]`` → ``out_ref [gb, 1, T]``.
    Multi-cell steps exist because single-cell steps were latency-bound
    (see :data:`_CELLS_PER_STEP`)."""
    for tt in range(gb):
        for sl, vals in _cell_chunks(codes_ref[tt], tab_ref[tt],
                                     t=t, cp=cp, packed=packed):
            out_ref[tt, 0, sl] = vals


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
    # Sublane-pad the byte-plane rows to a multiple of 8 (zero rows, so
    # the pad planes' code 0 contributes nothing): 4·words can be
    # unaligned (D=12 → 12 rows), and the DMA pipeline can only slice
    # tiled operands whose second-minor extent is <= 8 or 8-aligned.
    rp = -(-4 * rows // 8) * 8
    perm = np.full(rp, d, dtype=np.int64)
    perm[:4 * rows] = [4 * w + bb for bb in range(4) for w in range(rows)]
    tab = jnp.where(
        (perm < d)[None, :, None],
        jnp.take(tab, jnp.minimum(perm, d - 1), axis=1), 0.0)
    return tab, rp, cp


def _pick_gb(g: int, rows: int, tab_rows: int, cp: int, lt: int,
             cells: int | None) -> int:
    """Cells per step: ``cells`` (or :data:`_CELLS_PER_STEP`)
    decremented until the step's blocks (gb buckets + gb tables + gb out
    tiles) fit ~6 MB of VMEM (decrement, not halve: an odd user-passed
    cells_per_step should degrade to the next size down, not skip
    straight past it)."""
    gb = min(cells if cells is not None else _CELLS_PER_STEP, max(g, 1))
    while gb > 1 and gb * (rows * lt + tab_rows * cp + lt) * 4 > 6 << 20:
        gb -= 1
    return gb


@functools.partial(jax.jit,
                   static_argnames=("d", "interpret", "cells_per_step",
                                    "pipeline", "pipe_bufs"))
def adc_lookup(codes: jax.Array, ftab: jax.Array, *,
               d: int | None = None,
               interpret: bool | None = None,
               cells_per_step: int | None = None,
               pipeline: str | None = None,
               pipe_bufs: int | None = None) -> jax.Array:
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

    if pipeline not in (None, "dma", "blocked"):
        raise ValueError(f"unknown pipeline: {pipeline!r}")
    if pipeline == "dma" or (pipeline is None and not interpret):
        # On TPU the pre-gathered scan is just the indexed scan with an
        # identity bucket index — route it through the manual DMA
        # pipeline (round 5), which replaced the auto-pipeline's
        # serialized per-operand copies (see adc_lookup_indexed). An
        # explicit "dma" is honored under the interpreter too (test
        # coverage) and raises when the shape cannot take it — same
        # contract as adc_lookup_indexed.
        res = _pipe_call(codes, tab, jnp.arange(g, dtype=jnp.int32),
                         rows=rows, tab_rows=tab_rows, cp=cp,
                         packed=packed, l=l, cells=cells_per_step,
                         nbuf=pipe_bufs, interpret=interpret)
        if res is not None:
            return res
        if pipeline == "dma":
            raise ValueError(
                "pipeline='dma' but the shape has no DMA-pipeline-"
                f"compatible tiling (L={l} exact tiles / sublane-"
                "sliceable code+table rows)")

    # Grid tiles (cell-groups, L): gb cells per step (see
    # _CELLS_PER_STEP); the table block index is constant across the
    # (fast) L dimension, so it stays VMEM-resident while code tiles
    # stream. Final-tile overhang reads garbage codes whose clipped
    # gathers land in discarded output lanes — harmless by construction.
    lt = min(l, _L_TILE)
    l_steps = -(-l // lt)
    gb = _pick_gb(g, rows, tab_rows, cp, lt, cells_per_step)
    gp = -(-g // gb)
    if gp * gb != g:
        pad = gp * gb - g
        codes = jnp.pad(codes, ((0, pad), (0, 0), (0, 0)))
        tab = jnp.pad(tab, ((0, pad), (0, 0), (0, 0)))
    kernel = functools.partial(_lookup_kernel, t=lt, cp=cp, gb=gb,
                               packed=packed)

    out = pl.pallas_call(
        kernel,
        grid=(gp, l_steps),
        in_specs=[
            pl.BlockSpec((gb, rows, lt), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, tab_rows, cp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, 1, lt), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gp * gb, 1, l), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * l * d * (cp // _LANE),
            bytes_accessed=codes.size * 4 + ftab.size * 4 + g * l * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(codes, tab)
    return out.reshape(gp * gb, l)[:g]


#: In-flight depth of the manual DMA pipeline (round 5): bucket blocks
#: for the next ``_PIPE_BUFS - 1`` grid steps are prefetched with
#: explicit ``make_async_copy`` while the current step computes. The
#: round-4 scalar-prefetch auto-pipeline was measured at ~1 µs PER
#: OPERAND DMA per step (0.92 ms / 80 steps / 10 copies at the SIFT
#: shape ≈ serialized issue+wait) — 4 % of HBM peak; deep manual
#: lookahead removes the serialization, leaving issue cost + bandwidth.
_PIPE_BUFS = 4

#: Compile-time unroll budget for one kernel body: ``gb · (lt/128)``
#: gather chunks. Bounds Mosaic compile time (a compile-time blowup can
#: wedge the TPU tunnel, CLAUDE.md) while letting the L-tile grow to the
#: whole bucket for the headline shapes — fewer, larger DMAs.
_UNROLL_CAP = 144


def _pick_pipe_lt(l: int, rows: int, gb: int, nbuf: int,
                  scratch_cap: int = 4 << 20) -> int | None:
    """Largest L-tile that (a) divides ``l`` exactly (manual DMAs cannot
    read past the bucket's end, so overhang tiles are not allowed),
    (b) keeps the body unroll within :data:`_UNROLL_CAP`, and (c) fits
    the ``nbuf``-deep code scratch in ``scratch_cap`` bytes. ``None`` if
    no multiple of 128 qualifies (caller falls back to the blocked
    kernel)."""
    k = l // _LANE
    floor = min(l, 4 * _LANE)   # tiles under 512 lanes mean tiny DMAs —
    best = None                 # worse than the blocked fallback
    for q in range(1, k + 1):
        if k % q:
            continue
        if gb * q > _UNROLL_CAP:
            break
        if nbuf * gb * rows * q * _LANE * 4 > scratch_cap:
            break
        if q * _LANE >= floor:
            best = q * _LANE
    return best


def _pipe_kernel(bidx_ref, lens_ref, bcodes_ref, tab_ref, out_ref, cscr,
                 tscr, csem, tsem, *, t: int, cp: int, gb: int,
                 packed: bool, nbuf: int, nj: int, nsteps: int,
                 masked: bool = False, debug: str | None = None):
    """Manually DMA-pipelined variant of :func:`_indexed_kernel`.

    ``bcodes_ref [P, rows, L]`` and ``tab_ref [gp, gb, tab_rows, Cp]``
    stay in HBM (``pl.ANY``); ``bidx_ref [gp·gb]`` lives in SMEM. Each
    grid step ``s = i·nj + j`` computes cells ``i·gb..i·gb+gb-1`` on
    L-tile ``j`` from VMEM scratch rings: bucket tiles are prefetched
    ``nbuf - 1`` steps ahead (one sliced ``make_async_copy`` per cell
    into ``cscr[s % nbuf, tt]``), tables once per ``i`` (one contiguous
    copy of all ``gb`` cells' tables into ``tscr[i % nbuf]``, issued at
    that ``i``'s first tile). Slot reuse is safe because the lookahead
    (``nbuf - 1`` steps) never wraps past the slot the current step
    reads, and a table slot is next overwritten ``(nbuf-1)(nj-1) ≥ 0``
    steps after its last use. Only the output rides the auto-pipeline
    (write-back DMAs double-buffer without stalling the body)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = i * nj + j

    def code_dma(s, tt, static: bool):
        si, sj = (s // nj, s % nj) if not static else divmod(s, nj)
        b = bidx_ref[si * gb + tt]
        src = (bcodes_ref.at[b] if nj == 1
               else bcodes_ref.at[b, :, pl.ds(sj * t, t)])
        return pltpu.make_async_copy(src, cscr.at[s % nbuf, tt],
                                     csem.at[s % nbuf, tt])

    def tab_dma(si):
        return pltpu.make_async_copy(tab_ref.at[si], tscr.at[si % nbuf],
                                     tsem.at[si % nbuf])

    def live(s_i, s_j, tt):
        """This (cell, L-tile) holds at least one live slot. bucketize
        fills slots [0, count) contiguously, so everything at/after the
        fill count is pad — whole dead tiles skip their bucket DMA and
        their gather compute (Deep10M buckets average ~23 % fill of the
        padded L: the skip converts ~4× of wasted scan work into
        ~1.5×, the boundary-tile roundup)."""
        return s_j * t < lens_ref[s_i * gb + tt]

    def issue(s, static: bool):
        si, sj = (s // nj, s % nj) if not static else divmod(s, nj)
        for tt in range(gb):
            dma = code_dma(s, tt, static)
            if masked:
                @pl.when(live(si, sj, tt))
                def _(dma=dma):
                    dma.start()
            else:
                dma.start()
        if static:
            if s % nj == 0:
                tab_dma(s // nj).start()
        else:
            @pl.when(s % nj == 0)
            def _():
                tab_dma(s // nj).start()

    if debug != "nodma":   # "nodma": perf diagnostic, compute-only
        @pl.when(step == 0)
        def _():
            for k in range(min(nbuf - 1, nsteps)):
                issue(k, static=True)

        @pl.when(step + (nbuf - 1) < nsteps)
        def _():
            issue(step + (nbuf - 1), static=False)

        for tt in range(gb):
            dma = code_dma(step, tt, static=False)
            if masked:
                @pl.when(live(i, j, tt))   # wait iff started
                def _(dma=dma):
                    dma.wait()
            else:
                dma.wait()

        @pl.when(j == 0)
        def _():
            tab_dma(i).wait()

    if debug == "nocompute":   # perf diagnostic, DMA-only
        out_ref[0, :, :] = jnp.zeros((gb, t), jnp.float32)
        return

    slot = step % nbuf
    tslot = i % nbuf

    def emit(tt):
        """Gather-sum one cell's tile; fused pad-slot masking (round 5):
        slots >= the bucket's fill count get +inf HERE instead of in a
        separate [B, nprobe, L] where-pass — that pass re-read and
        re-wrote the whole vdist array in HBM (measured 1.5 ms of the
        11.5 ms Deep10M fused query); in-register it is 3 VPU ops per
        128-lane chunk."""
        if masked:
            len_t = lens_ref[i * gb + tt]
        for sl, vals in _cell_chunks(cscr[slot, tt], tscr[tslot, tt],
                                     t=t, cp=cp, packed=packed):
            if masked:
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
                good = (lane + (j * t + sl.start)) < len_t
                vals = jnp.where(good[0], vals, jnp.float32(jnp.inf))
            out_ref[0, tt, sl] = vals

    for tt in range(gb):
        if not masked:
            emit(tt)
            continue

        @pl.when(live(i, j, tt))
        def _(tt=tt):
            emit(tt)

        @pl.when(jnp.logical_not(live(i, j, tt)))
        def _(tt=tt):
            out_ref[0, tt, :] = jnp.full((t,), jnp.inf, jnp.float32)


def _pipe_call(bcodes, tab, bidx, *, rows: int, tab_rows: int, cp: int,
               packed: bool, l: int, cells: int | None,
               nbuf: int | None, interpret: bool,
               lens=None, debug: str | None = None):
    """Invokes :func:`_pipe_kernel`; ``None`` if no exact L-tile exists
    (ragged ``L`` whose only divisors blow the unroll/scratch budget —
    the caller falls back to the blocked kernel)."""
    def _sublane_ok(r: int) -> bool:
        # Mosaic can DMA-slice a tiled operand at a dynamic leading
        # index only when the second-minor extent is aligned to the
        # memref's sublane tile — which for extents < 8 is the NEXT
        # POWER OF TWO: rows=12 fails with "Slice shape along dimension
        # 1 must be aligned to tiling (8)" (bench.py's D=12 headline
        # shape) and rows=3 with "... tiling (4), but is 3" (packed
        # D=12), while 1/2/4/8 and multiples of 8 are the
        # proven-on-hardware envelope.
        return r in (1, 2, 4, 8) or r % 8 == 0

    if not (_sublane_ok(rows) and _sublane_ok(tab_rows)):
        return None
    g = tab.shape[0]
    gb = min(cells if cells is not None else _CELLS_PER_STEP, max(g, 1))
    nbuf = max(2, nbuf if nbuf is not None else _PIPE_BUFS)

    def _fits(gb_, lt_):
        # FULL VMEM budget: code ring + TABLE ring + double-buffered out
        # blocks. The table ring was unbudgeted until round 5's review —
        # a wide table (e.g. C=2048: tab_rows·cp·4 = 64 KB/cell ×
        # nbuf·gb slots) can blow the ~9 MB in-program scoped-VMEM
        # envelope on its own, and a VMEM blowup is a COMPILE-time OOM
        # that can wedge the tunnel (CLAUDE.md).
        scratch = nbuf * gb_ * (rows * lt_ + tab_rows * cp) * 4
        return scratch + 2 * gb_ * lt_ * 4 <= 7 << 20

    lt = _pick_pipe_lt(l, rows, gb, nbuf)
    while gb > 1 and (lt is None or not _fits(gb, lt)):
        gb //= 2
        lt = _pick_pipe_lt(l, rows, gb, nbuf)
    if lt is None or not _fits(gb, lt):
        return None
    nj = l // lt
    gp = -(-g // gb)
    masked = lens is not None
    if not masked:
        lens = jnp.zeros((g,), jnp.int32)   # dummy SMEM operand
    if gp * gb != g:
        pad = gp * gb - g
        # Pad cells re-scan the last cell's bucket against zero tables;
        # their out rows are sliced off below.
        bidx = jnp.concatenate([bidx, jnp.broadcast_to(bidx[-1:], (pad,))])
        tab = jnp.pad(tab, ((0, pad), (0, 0), (0, 0)))
        lens = jnp.pad(lens, (0, pad))
    tab4 = tab.reshape(gp, gb, tab_rows, cp)
    d_eff = 4 * rows if packed else rows
    kernel = functools.partial(_pipe_kernel, t=lt, cp=cp, gb=gb,
                               packed=packed, nbuf=nbuf, nj=nj,
                               nsteps=gp * nj, masked=masked, debug=debug)
    out = pl.pallas_call(
        kernel,
        grid=(gp, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, gb, lt), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((gp, gb, l), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, gb, rows, lt), jnp.int32),
            pltpu.VMEM((nbuf, gb, tab_rows, cp), jnp.float32),
            pltpu.SemaphoreType.DMA((nbuf, gb)),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * g * l * d_eff * (cp // _LANE),
            bytes_accessed=g * rows * l * 4 + g * tab_rows * cp * 4
            + g * l * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray(bidx, jnp.int32), jnp.asarray(lens, jnp.int32),
      bcodes, tab4)
    return out.reshape(gp * gb, l)[:g]


def _indexed_kernel(bidx_ref, *refs, t: int, cp: int, gb: int,
                    packed: bool):
    """Same math as :func:`_lookup_kernel`, but each of the ``gb`` cells'
    code blocks was DMA-selected by the scalar-prefetched bucket index
    through its OWN operand (one ``BlockSpec`` per cell — a single block
    index map cannot select ``gb`` non-contiguous buckets, so the array
    is passed ``gb`` times with maps ``bref[i·gb + t]``; see
    :func:`adc_lookup_indexed`)."""
    code_refs, tab_ref, out_ref = refs[:gb], refs[gb], refs[gb + 1]
    for tt in range(gb):
        for sl, vals in _cell_chunks(code_refs[tt][0], tab_ref[0, tt],
                                     t=t, cp=cp, packed=packed):
            out_ref[0, tt, sl] = vals


@functools.partial(jax.jit,
                   static_argnames=("d", "interpret", "cells_per_step",
                                    "pipeline", "pipe_bufs"))
def adc_lookup_indexed(bcodes: jax.Array, ftab: jax.Array,
                       bidx: jax.Array,
                       lengths: jax.Array | None = None, *,
                       d: int | None = None,
                       interpret: bool | None = None,
                       cells_per_step: int | None = None,
                       pipeline: str | None = None,
                       pipe_bufs: int | None = None) -> jax.Array:
    """ADC lookup-sum reading buckets IN PLACE from the resident layout.

    ``bcodes: [P, D, L] int32`` (or packed ``[P, ceil(D/4), L]``, then
    ``d`` required) is the full :class:`.bucketed.Buckets` code array;
    ``ftab: [G, D*C] f32`` one ADC table per gather cell; ``bidx: [G]
    int32`` in ``[0, P)`` selects the bucket each cell scans. Returns
    ``[G, L]`` with ``out[g, l] = Σ_d ftab[g, d, bcodes[bidx[g], d, l]]``.

    The bucket index rides Pallas **scalar prefetch**: the grid's block
    index maps read ``bidx`` and DMA-stream each selected bucket block
    HBM→VMEM directly — the ``[G, D, L]`` gathered copy the plain
    :func:`adc_lookup` path materializes in HBM (written once, read once)
    never exists, halving hot-path HBM traffic for the scan. Since round
    4 each grid step scans :data:`_CELLS_PER_STEP` cells (one code
    operand per cell, maps ``bref[i·gb + t]``): single-cell steps moved
    only ~50 KB each and were latency-bound at ~38 GB/s (4.6 % of HBM
    peak, `benchmarks/roofline.py`). A bucket repeated at the SAME cell
    position ``t`` in consecutive steps still skips its re-fetch (e.g. a
    sharded device's unowned probe slots clamped to one bucket).

    Since round 5 the default on-TPU path is the MANUAL pipeline
    (:func:`_pipe_kernel`): the round-4 auto-pipeline serialized to
    ~1 µs per operand DMA per step, capping the scan at ~4 % of HBM
    peak; explicit ``make_async_copy`` with :data:`_PIPE_BUFS`-deep
    lookahead removes that. ``pipeline`` forces a path ("dma" |
    "blocked"); ``pipe_bufs`` overrides the lookahead depth. The blocked
    kernel remains for L shapes with no exact tile divisor or
    sublane-unsliceable row counts.

    ``lengths [G] int32`` (optional): per-CELL bucket fill counts; slots
    ``>= lengths[g]`` come back ``+inf``. On the pipeline path the mask
    fuses into the kernel (in-register, saving the caller's separate
    full-array where-pass over ``[B·nprobe, L]`` in HBM); fallback paths
    apply the identical mask on the result.
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
    if interpret and pipeline != "dma":
        # Interpret-mode pallas hangs at compile under scalar prefetch in
        # this jax version (measured: a minimal PrefetchScalarGridSpec
        # case never finishes lowering->compile on CPU). Off-TPU the
        # point of the kernel — skipping the HBM gather copy — is moot
        # anyway, so compute the identical result in XLA. (An explicit
        # ``pipeline="dma"`` still runs the manual-DMA kernel under the
        # interpreter — it uses no scalar prefetch, and the tests use
        # this to cover the pipeline logic off-TPU.)
        c = ftab.shape[1] // d
        codes = jnp.take(bcodes, bidx, axis=0)              # [G, rows, L]
        if packed:
            from .bucketed import unpack_codes
            codes = unpack_codes(codes, d)                  # [G, D, L]
        gidx = codes + jnp.arange(d, dtype=jnp.int32)[None, :, None] * c
        vals = jnp.take_along_axis(ftab, gidx.reshape(g, d * l), axis=-1)
        return _mask_lengths(vals.reshape(g, d, l).sum(axis=1), lengths)

    tab, tab_rows, cp = _prep_table(ftab, d, rows, packed)

    if pipeline in (None, "dma"):
        res = _pipe_call(bcodes, tab, jnp.asarray(bidx, jnp.int32),
                         rows=rows, tab_rows=tab_rows, cp=cp,
                         packed=packed, l=l, cells=cells_per_step,
                         nbuf=pipe_bufs, interpret=interpret,
                         lens=lengths)
        if res is not None:
            return res
        if pipeline == "dma":
            raise ValueError(
                "pipeline='dma' but the shape has no DMA-pipeline-"
                f"compatible tiling (L={l} exact tiles / sublane-"
                "sliceable code+table rows)")
    elif pipeline != "blocked":
        raise ValueError(f"unknown pipeline: {pipeline!r}")

    lt = min(l, _L_TILE)
    l_steps = -(-l // lt)
    gb = _pick_gb(g, rows, tab_rows, cp, lt, cells_per_step)
    gp = -(-g // gb)
    bidx = jnp.asarray(bidx, jnp.int32)
    if gp * gb != g:
        pad = gp * gb - g
        # Pad cells re-scan the last cell's bucket (consecutive duplicate
        # indices skip the re-fetch) against zero tables; their out rows
        # are sliced off below.
        bidx = jnp.concatenate([bidx, jnp.broadcast_to(bidx[-1:], (pad,))])
        tab = jnp.pad(tab, ((0, pad), (0, 0), (0, 0)))
    tab4 = tab.reshape(gp, gb, tab_rows, cp)
    kernel = functools.partial(_indexed_kernel, t=lt, cp=cp, gb=gb,
                               packed=packed)

    def _code_spec(tt):
        return pl.BlockSpec((1, rows, lt),
                            lambda i, j, bref: (bref[i * gb + tt], 0, j))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gp, l_steps),
            in_specs=[
                *[_code_spec(tt) for tt in range(gb)],
                pl.BlockSpec((1, gb, tab_rows, cp),
                             lambda i, j, bref: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, gb, lt),
                                   lambda i, j, bref: (i, 0, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((gp, gb, l), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * l * d * (cp // _LANE),
            bytes_accessed=g * rows * l * 4 + ftab.size * 4 + g * l * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bidx, *([bcodes] * gb), tab4)
    return _mask_lengths(out.reshape(gp * gb, l)[:g], lengths)


def _mask_lengths(vdist: jax.Array, lengths: jax.Array | None,
                  ) -> jax.Array:
    """External pad-slot mask for the paths that cannot fuse it:
    ``vdist[g, l] = +inf`` for ``l >= lengths[g]`` (identical condition
    to the pipeline kernel's in-register mask)."""
    if lengths is None:
        return vdist
    lane = jnp.arange(vdist.shape[1], dtype=jnp.int32)
    return jnp.where(lane[None, :] < lengths[:, None], vdist, jnp.inf)
