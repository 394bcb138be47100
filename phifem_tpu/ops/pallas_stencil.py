"""Pallas TPU kernel: fused masked P1 stencil matvec on the vertex lattice.

The XLA lowering of :class:`~phifem_tpu.ops.stencil.StencilCellBatch` emits
nloc^2 separate shifted-add updates (each re-touching the lattice).  This
kernel fuses the whole uniform-term matvec into ONE pass: each program holds
a (TY+2)-row slab of the padded lattice in VMEM and accumulates all
norient * nloc^2 masked shifted products on the VPU before writing its TY
output rows — one read of x and the masks, one write of y.

Math: for output vertex (r, c),
  y[r,c] = sum_o sum_{i,j} A_o[i,j] * M_o[r-dy_i, c-dx_i]
                                    * x[r-dy_i+dy_j, c-dx_i+dx_j]
with (dx_k, dy_k) the lattice offsets of the cell's local nodes (quads: 4,
triangles: 3 per orientation).  One ghost ring of zero-padded lattice/masks
removes all boundary conditionals; columns are padded to the 128-lane
boundary.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import Grid
from .stencil import _QUAD_OFFS, _TRI_OFFS

Array = jnp.ndarray

__all__ = ["stencil_matvec_pallas"]


def _i32(v):
    """Index-map literals must be i32: under jax_enable_x64 a bare Python
    int lowers to i64, which Mosaic's scalar core cannot legalize."""
    return jnp.int32(v)


def _offsets(grid: Grid):
    return _TRI_OFFS if grid.is_simplex else (_QUAD_OFFS,)


def _col_shift(a: Array, s: int) -> Array:
    """a[:, col + s] — implemented as a circular roll, which is exact here
    because the lattice/mask slabs carry >= 2 zero ghost columns on both
    sides (Mosaic has no unaligned concatenate; rolls lower natively)."""
    if s == 0:
        return a
    # pltpu.roll requires a non-negative shift; roll(-s) == roll(C - s).
    # Force an i32 shift: under jax_enable_x64 a Python int lowers to i64,
    # which tpu.dynamic_rotate rejects.
    shift = (-s) % a.shape[1]
    return pltpu.roll(a, jnp.int32(shift), axis=1)


def _make_kernel_full(offs, TY: int, ny: int, nx: int):
    """Maskless variant for terms covering EVERY cell (masks == all-ones):
    instead of streaming (norient, R, C) mask slabs from HBM, cell validity
    (is this lattice position a real cell, not padding?) is rebuilt on the
    VPU from broadcasted iotas — zero extra HBM traffic, which halves the
    kernel's bandwidth on the pure-Poisson path."""
    from jax import lax

    def kernel(xs_ref, mats_ref, ys_ref):
        # xs_ref: (1, TY+2, C); mats_ref: (no, nloc, nloc); ys_ref: (1, TY, C)
        C = xs_ref.shape[-1]
        acc = jnp.zeros((TY, C), xs_ref.dtype)
        rbase = pl.program_id(0) * TY
        valid_cache = {}

        def valid(dxi, dyi):
            key = (dxi, dyi)
            if key not in valid_cache:
                # padded cell coords of the (o, i) contribution at output
                # (r, c): row = rbase + 1 - dyi + r, col = c - dxi; real
                # cells occupy padded rows/cols 1..ny / 1..nx
                rows = (
                    lax.broadcasted_iota(jnp.int32, (TY, C), 0)
                    + rbase
                    + (1 - dyi)
                )
                cols = lax.broadcasted_iota(jnp.int32, (TY, C), 1) - dxi
                valid_cache[key] = (
                    (rows >= 1) & (rows <= ny) & (cols >= 1) & (cols <= nx)
                )
            return valid_cache[key]

        for o, offs_o in enumerate(offs):
            for i, (dxi, dyi) in enumerate(offs_o):
                s = jnp.zeros((TY, C), xs_ref.dtype)
                for j, (dxj, dyj) in enumerate(offs_o):
                    xrow = xs_ref[0, 1 - dyi + dyj : 1 - dyi + dyj + TY, :]
                    s = s + mats_ref[o, i, j] * _col_shift(xrow, dxj - dxi)
                acc = acc + jnp.where(valid(dxi, dyi), s, 0.0)
        ys_ref[0, :, :] = acc

    return kernel


def _make_kernel(offs, TY: int):
    def kernel(xs_ref, ms_ref, mats_ref, ys_ref):
        # xs_ref: (1, TY+2, C); ms_ref: (1, no, TY+1, C);
        # mats_ref: (no, nloc, nloc); ys_ref: (1, TY, C)
        C = xs_ref.shape[-1]
        acc = jnp.zeros((TY, C), xs_ref.dtype)
        for o, offs_o in enumerate(offs):
            for i, (dxi, dyi) in enumerate(offs_o):
                m = ms_ref[0, o, 1 - dyi : 1 - dyi + TY, :]
                m = _col_shift(m, -dxi)
                for j, (dxj, dyj) in enumerate(offs_o):
                    xrow = xs_ref[0, 1 - dyi + dyj : 1 - dyi + dyj + TY, :]
                    xs = _col_shift(xrow, dxj - dxi)
                    acc = acc + mats_ref[o, i, j] * (m * xs)
        ys_ref[0, :, :] = acc

    return kernel


def stencil_matvec_pallas(
    grid: Grid,
    x: Array,
    masks: Array,
    mats: Array,
    TY: int = 256,
    interpret: bool = False,
) -> Array:
    """y = A_stencil @ x for a uniform single-scalar-P1 term.

    x: (num_vertices,); masks: (norient, ny, nx) or ``None`` for a term
    covering every cell (validity is then rebuilt in-kernel from iotas and
    no mask data is streamed at all); mats: (norient, nloc, nloc).
    Overlapping row slabs (halo 1) are materialized by a strided gather
    (2 extra rows per TY, <2% overhead); each slab is one program.
    """
    ny, nx = grid.ny, grid.nx
    R, C0 = ny + 1, nx + 1
    dt = x.dtype
    offs = _offsets(grid)
    no = len(offs)

    # VMEM budget: double-buffered x slab + mask slab + out block must fit
    # (~ TY * (4 + 4*no) rows of width CP); keep under ~10 MB of 16 MB
    CPq = -(-(C0 + 2) // 128) * 128
    row_bytes = CPq * jnp.dtype(dt).itemsize
    # VMEM budget: Mosaic double-buffers every pipelined operand AND the
    # output slab, so a TY-row program holds ~2*(TY+2) x-rows + 2*TY
    # y-rows (+ mask slabs); 16 MB VMEM with headroom -> 3.5 MB of x-rows
    # (measured: the old 10 MB budget OOMed scoped vmem at 3200^2)
    budget = int(3.5 * 2**20)
    mask_rows = 0 if masks is None else 4 * no
    ty_cap = max(8, int(budget / (row_bytes * (4 + mask_rows))))
    TY = min(TY, ty_cap, R)
    nt = -(-R // TY)
    RP = 1 + nt * TY + 1
    CP = -(-(C0 + 2) // 128) * 128  # pad to the 128-lane boundary
    xp = jnp.zeros((RP, CP), dt).at[1 : 1 + R, 1 : 1 + C0].set(x.reshape(R, C0))

    starts = jnp.arange(nt) * TY
    xslabs = jax.vmap(
        lambda s: jax.lax.dynamic_slice(xp, (s, 0), (TY + 2, CP))
    )(starts)

    x_spec = pl.BlockSpec(
        (1, TY + 2, CP), lambda t: (t, _i32(0), _i32(0)), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, TY, CP), lambda t: (t, _i32(0), _i32(0)), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((nt, TY, CP), dt)

    mats = jnp.asarray(mats, dt)
    # explicit full-shape spec with i32 index map: the default (shapeless)
    # BlockSpec generates i64 index-map literals under jax_enable_x64,
    # which Mosaic's scalar core fails to legalize (func.return i64)
    mats_spec = pl.BlockSpec(
        mats.shape,
        lambda t: (_i32(0), _i32(0), _i32(0)),
        memory_space=pltpu.VMEM,
    )

    if masks is None:
        yslabs = pl.pallas_call(
            _make_kernel_full(offs, TY, ny, nx),
            grid=(nt,),
            in_specs=[x_spec, mats_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(xslabs, mats)
    else:
        mp = jnp.zeros((no, RP, CP), dt).at[:, 1 : 1 + ny, 1 : 1 + nx].set(
            masks.astype(dt)
        )
        mslabs = jax.vmap(
            lambda s: jax.lax.dynamic_slice(mp, (0, s, 0), (no, TY + 1, CP))
        )(starts)
        yslabs = pl.pallas_call(
            _make_kernel(offs, TY),
            grid=(nt,),
            in_specs=[
                x_spec,
                pl.BlockSpec(
                    (1, no, TY + 1, CP),
                    lambda t: (t, _i32(0), _i32(0), _i32(0)),
                    memory_space=pltpu.VMEM,
                ),
                mats_spec,
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(xslabs, mslabs, mats)

    yp = yslabs.reshape(nt * TY, CP)[:R, 1 : 1 + C0]
    return yp.reshape(-1)
