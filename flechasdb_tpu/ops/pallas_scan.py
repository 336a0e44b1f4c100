"""Pallas TPU kernel for the ADC table-lookup scan.

The pruned query's hot op is ``vdist[g, l] = Σ_d table[g, d, codes[g, l, d]]``
— a tiny-table gather XLA lowers to a slow scalar gather on TPU (measured:
76 ms of a 79 ms nprobe=10 SIFT1M-scale batch; the other three stages sum to
~4 ms). TPUs have no fast arbitrary gather, but the table is only ``D×C``
floats (8 KB) — it fits in VMEM many times over. So the kernel re-expresses
the lookup as a compare-select reduction on the VPU:

    vdist[l] = Σ_d Σ_c (codes[l, d] == c) · table[d, c]

For each grid cell, one ``[T, D]`` tile of codes and one ``[D·C]`` table live
in VMEM; the ``[T, C]`` compare/select temps never touch HBM. Total work is
``rows × D × C`` VPU FMAs — ~3 GFLOP for the SIFT1M batch, ~2 ms, ~40×
faster than the XLA gather. This replaces the reference's per-member scalar
loop ``Σ_d table[d, code[d]]`` (``db/stored.rs:549-598``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(codes_ref, tab_ref, out_ref):
    """One ``[D, T]`` code tile against one ``[D, C]`` table.

    Rows live on the lane axis (minor), codewords on sublanes — both the
    codes array and the accumulator tile without padding waste.
    """
    codes = codes_ref[0]                      # [D, T] int32
    d, t = codes.shape
    c = tab_ref.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (c, t), 0)
    acc = jnp.zeros((1, t), jnp.float32)
    for di in range(d):                       # D is small (8-16): unrolled
        tab = tab_ref[0, di][:, None]                         # [C, 1]
        mask = codes[di][None, :] == iota                     # [C, T]
        acc += jnp.sum(jnp.where(mask, tab, 0.0), axis=0, keepdims=True)
    out_ref[0, 0, :] = acc[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def adc_lookup(codes: jax.Array, ftab: jax.Array, *,
               interpret: bool | None = None) -> jax.Array:
    """Batched ADC lookup-sum.

    ``codes: [G, D, L] int32`` (values in ``[0, C)``), ``ftab: [G, D*C]``
    f32 → ``[G, L]`` f32. ``L`` must be a multiple of 128 (the bucketed
    layout guarantees it, :func:`.bucketed.bucketize`).
    """
    g, d, l = codes.shape
    dc = ftab.shape[1]
    c = dc // d
    # Row-tile size: prefer one program per table row (grid overhead and
    # table re-reads both scale with L/T); the [C, T] compare temp stays
    # within a few MB of VMEM.
    if l * (c + 8) * 4 <= 4 * 1024 * 1024:
        t = l
    elif l % 512 == 0:
        t = 512
    else:
        t = 128
    if l % t or l % 128:
        raise ValueError(f"L ({l}) must be a multiple of 128")
    if interpret is None:  # Mosaic needs real TPU; interpret elsewhere
        from .bucketed import _platform
        interpret = _platform() != "tpu"

    out = pl.pallas_call(
        _lookup_kernel,
        grid=(g, l // t),
        in_specs=[
            pl.BlockSpec((1, d, t), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, l), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * g * l * dc,
            bytes_accessed=codes.size * 4 + ftab.size * 4 + g * l * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(codes, ftab.reshape(g, d, c))
    return out.reshape(g, l)
