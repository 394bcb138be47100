"""Structured Cartesian background grids for phi-FEM on TPU.

phi-FEM solves PDEs on a simple *background* mesh that does not fit the
physical boundary; every demo of the reference builds that mesh with
``dolfinx.mesh.create_rectangle`` (e.g. reference
``demo/weak-dirichlet/flower/main.py:46``).  This module replaces the whole
dolfinx mesh + topology stack the reference consumes (connectivity queries at
``src/phifem/mesh_scripts.py:149-159, 244-251, 306-315, 418-422``) with a
*structured* Cartesian grid on which every connectivity query is closed-form
index arithmetic.  Nothing ragged, nothing dynamic: all entity counts are
static functions of ``(nx, ny, cell_type)``, which is exactly what XLA wants.

Entity numbering (fixed, documented convention — this framework defines its
own canonical numbering, it does not reproduce dolfinx's):

* cells: a block ``(ix, iy)`` (``ix`` fastest) is one quadrilateral cell, or
  two triangles (``lower`` = 2*block, ``upper`` = 2*block+1).  The lower
  triangle is ``(v00, v10, v11)`` and the upper ``(v00, v11, v01)`` — i.e.
  the square is split along the "right" diagonal from the bottom-left to the
  top-right corner, matching dolfinx's default ``DiagonalType.right``.
* vertices: ``v(ix, iy) = iy*(nx+1) + ix`` with ``ix in [0, nx]``.
* facets: vertical facets first (``(nx+1)*ny``), then horizontal
  (``nx*(ny+1)``), then (triangles only) diagonal (``nx*ny``).

Facet orientation convention: each facet stores the two adjacent cells as
``(cell_minus, cell_plus)`` and a *base* unit normal pointing from
``cell_minus`` to ``cell_plus``: ``+x`` for vertical facets, ``+y`` for
horizontal, ``(-hy, hx)/l`` for diagonals (pointing from the lower into the
upper triangle).  A missing neighbour (domain boundary) is ``-1``.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from functools import cached_property
from typing import Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

__all__ = ["CellType", "Grid"]


class CellType(str, enum.Enum):
    """Cell type of the background grid (reference supports the same two:
    ``mesh_scripts.py:320-329``)."""

    triangle = "triangle"
    quadrilateral = "quadrilateral"


def _as_cell_type(cell_type) -> CellType:
    if isinstance(cell_type, CellType):
        return cell_type
    return CellType(str(cell_type))


@dataclasses.dataclass(frozen=True)
class Grid:
    """A uniform rectangular background grid on ``bbox`` with ``nx * ny``
    blocks.

    Hashable static metadata: instances can be closed over by ``jax.jit``
    functions; all array producers below are pure functions of the static
    fields with static shapes.
    """

    nx: int
    ny: int
    bbox: Tuple[Tuple[float, float], Tuple[float, float]] = ((0.0, 0.0), (1.0, 1.0))
    cell_type: CellType = CellType.triangle

    def __post_init__(self):
        object.__setattr__(self, "cell_type", _as_cell_type(self.cell_type))
        if self.nx < 1 or self.ny < 1:
            raise ValueError("Grid needs nx >= 1 and ny >= 1.")
        (x0, y0), (x1, y1) = self.bbox
        if not (x1 > x0 and y1 > y0):
            raise ValueError("bbox must be ((x0, y0), (x1, y1)) with x1 > x0, y1 > y0.")

    # ------------------------------------------------------------------ sizes
    @property
    def is_simplex(self) -> bool:
        return self.cell_type == CellType.triangle

    @property
    def cells_per_block(self) -> int:
        return 2 if self.is_simplex else 1

    @property
    def num_blocks(self) -> int:
        return self.nx * self.ny

    @property
    def num_cells(self) -> int:
        return self.cells_per_block * self.num_blocks

    @property
    def num_vertices(self) -> int:
        return (self.nx + 1) * (self.ny + 1)

    @property
    def num_vfacets(self) -> int:
        return (self.nx + 1) * self.ny

    @property
    def num_hfacets(self) -> int:
        return self.nx * (self.ny + 1)

    @property
    def num_dfacets(self) -> int:
        return self.nx * self.ny if self.is_simplex else 0

    @property
    def num_facets(self) -> int:
        return self.num_vfacets + self.num_hfacets + self.num_dfacets

    @property
    def num_vertices_per_cell(self) -> int:
        return 3 if self.is_simplex else 4

    @property
    def num_facets_per_cell(self) -> int:
        return 3 if self.is_simplex else 4

    # --------------------------------------------------------------- geometry
    @property
    def x0(self) -> float:
        return float(self.bbox[0][0])

    @property
    def y0(self) -> float:
        return float(self.bbox[0][1])

    @property
    def hx(self) -> float:
        return (float(self.bbox[1][0]) - float(self.bbox[0][0])) / self.nx

    @property
    def hy(self) -> float:
        return (float(self.bbox[1][1]) - float(self.bbox[0][1])) / self.ny

    @property
    def cell_volume(self) -> float:
        """Area of one cell (uniform across the grid)."""
        a = self.hx * self.hy
        return a / 2.0 if self.is_simplex else a

    @property
    def cell_diameter(self) -> float:
        """UFL ``CellDiameter`` analogue (largest vertex distance), uniform.

        Replaces ``ufl.CellDiameter(mesh)`` used by every reference scheme
        (e.g. ``demo/weak-dirichlet/flower/main.py:108``); on a right triangle
        or a rectangle this is the diagonal length.
        """
        return math.hypot(self.hx, self.hy)

    @property
    def diag_length(self) -> float:
        return math.hypot(self.hx, self.hy)

    def refine(self) -> "Grid":
        """Uniform refinement: halve h (replaces ``dfx.mesh.refine`` used by
        the interface-elasticity convergence loop,
        ``demo/interface-elasticity/main.py:389-390``)."""
        return Grid(self.nx * 2, self.ny * 2, self.bbox, self.cell_type)

    # ------------------------------------------------------- index arithmetic
    def _block_ij(self, cells: Array) -> Tuple[Array, Array, Array]:
        """cell ids -> (ix, iy, which) with which=0 lower / 1 upper (tri)."""
        if self.is_simplex:
            block, which = cells // 2, cells % 2
        else:
            block, which = cells, jnp.zeros_like(cells)
        return block % self.nx, block // self.nx, which

    def _vid(self, ix: Array, iy: Array) -> Array:
        return iy * (self.nx + 1) + ix

    def _vf(self, ix: Array, iy: Array) -> Array:
        return iy * (self.nx + 1) + ix

    def _hf(self, ix: Array, iy: Array) -> Array:
        return self.num_vfacets + iy * self.nx + ix

    def _df(self, ix: Array, iy: Array) -> Array:
        return self.num_vfacets + self.num_hfacets + iy * self.nx + ix

    # ------------------------------------------------------------ cell tables
    @cached_property
    def vertex_coords(self) -> Array:
        """(num_vertices, 2) float coordinates."""
        ii = jnp.arange(self.num_vertices, dtype=jnp.int32)
        ix, iy = ii % (self.nx + 1), ii // (self.nx + 1)
        x = self.x0 + ix.astype(jnp.float64 if _x64() else jnp.float32) * self.hx
        y = self.y0 + iy.astype(jnp.float64 if _x64() else jnp.float32) * self.hy
        return jnp.stack([x, y], axis=-1)

    @cached_property
    def cell_vertices(self) -> Array:
        """(num_cells, nvpc) int32 vertex ids, in the documented local order."""
        cells = jnp.arange(self.num_cells, dtype=jnp.int32)
        ix, iy, which = self._block_ij(cells)
        v00 = self._vid(ix, iy)
        v10 = self._vid(ix + 1, iy)
        v01 = self._vid(ix, iy + 1)
        v11 = self._vid(ix + 1, iy + 1)
        if self.is_simplex:
            lower = jnp.stack([v00, v10, v11], axis=-1)
            upper = jnp.stack([v00, v11, v01], axis=-1)
            return jnp.where(which[:, None] == 0, lower, upper)
        return jnp.stack([v00, v10, v01, v11], axis=-1)

    @cached_property
    def cell_orientations(self) -> Array:
        """(num_cells,) int32: 0 for quads / lower triangles, 1 for upper."""
        cells = jnp.arange(self.num_cells, dtype=jnp.int32)
        return (cells % 2).astype(jnp.int32) if self.is_simplex else jnp.zeros_like(cells)

    @cached_property
    def cell_origins(self) -> Array:
        """(num_cells, 2) coordinates of the block origin v00 of each cell."""
        cells = jnp.arange(self.num_cells, dtype=jnp.int32)
        ix, iy, _ = self._block_ij(cells)
        ft = jnp.float64 if _x64() else jnp.float32
        return jnp.stack(
            [self.x0 + ix.astype(ft) * self.hx, self.y0 + iy.astype(ft) * self.hy],
            axis=-1,
        )

    @cached_property
    def cell_vertex_coords(self) -> Array:
        """(num_cells, nvpc, 2) physical vertex coordinates."""
        return self.vertex_coords[self.cell_vertices]

    @cached_property
    def cell_midpoints(self) -> Array:
        return jnp.mean(self.cell_vertex_coords, axis=1)

    # --------------------------------------------------------- connectivity
    @cached_property
    def c2f(self) -> Array:
        """(num_cells, nfpc) int32 facet ids — cell-to-facet connectivity.

        Replaces ``topology.connectivity(cdim, fdim)`` (reference
        ``mesh_scripts.py:418-422``).  Local order:
        quad: [left, right, bottom, top];
        lower tri: [bottom, right, diagonal]; upper tri: [diagonal, top, left].
        """
        cells = jnp.arange(self.num_cells, dtype=jnp.int32)
        ix, iy, which = self._block_ij(cells)
        if self.is_simplex:
            lower = jnp.stack(
                [self._hf(ix, iy), self._vf(ix + 1, iy), self._df(ix, iy)], axis=-1
            )
            upper = jnp.stack(
                [self._df(ix, iy), self._hf(ix, iy + 1), self._vf(ix, iy)], axis=-1
            )
            return jnp.where(which[:, None] == 0, lower, upper)
        return jnp.stack(
            [self._vf(ix, iy), self._vf(ix + 1, iy), self._hf(ix, iy), self._hf(ix, iy + 1)],
            axis=-1,
        )

    @cached_property
    def f2c(self) -> Array:
        """(num_facets, 2) int32 ``(cell_minus, cell_plus)``; -1 = no cell.

        Replaces the f2c adjacency reshaped by ``_reshape_map`` (reference
        ``mesh_scripts.py:151-154, 195-214``).  The base normal points from
        slot 0 to slot 1.
        """
        nvf, nhf = self.num_vfacets, self.num_hfacets

        # vertical facets: (ix in [0, nx], iy in [0, ny-1]); minus = left cell.
        f = jnp.arange(nvf, dtype=jnp.int32)
        ix, iy = f % (self.nx + 1), f // (self.nx + 1)
        if self.is_simplex:
            left = 2 * (iy * self.nx + (ix - 1))  # lower tri owns the right edge
            right = 2 * (iy * self.nx + ix) + 1  # upper tri owns the left edge
        else:
            left = iy * self.nx + (ix - 1)
            right = iy * self.nx + ix
        vmin = jnp.where(ix > 0, left, -1)
        vplus = jnp.where(ix < self.nx, right, -1)
        vpairs = jnp.stack([vmin, vplus], axis=-1)

        # horizontal facets: (ix in [0, nx-1], iy in [0, ny]); minus = below.
        f = jnp.arange(nhf, dtype=jnp.int32)
        ix, iy = f % self.nx, f // self.nx
        if self.is_simplex:
            below = 2 * ((iy - 1) * self.nx + ix) + 1  # upper tri owns the top edge
            above = 2 * (iy * self.nx + ix)  # lower tri owns the bottom edge
        else:
            below = (iy - 1) * self.nx + ix
            above = iy * self.nx + ix
        hmin = jnp.where(iy > 0, below, -1)
        hplus = jnp.where(iy < self.ny, above, -1)
        hpairs = jnp.stack([hmin, hplus], axis=-1)

        pairs = [vpairs, hpairs]
        if self.is_simplex:
            f = jnp.arange(self.num_dfacets, dtype=jnp.int32)
            block = f
            dpairs = jnp.stack([2 * block, 2 * block + 1], axis=-1).astype(jnp.int32)
            pairs.append(dpairs)
        return jnp.concatenate(pairs, axis=0).astype(jnp.int32)

    @cached_property
    def facet_kind(self) -> Array:
        """(num_facets,) int32: 0=vertical, 1=horizontal, 2=diagonal."""
        kinds = [
            jnp.zeros(self.num_vfacets, jnp.int32),
            jnp.ones(self.num_hfacets, jnp.int32),
        ]
        if self.is_simplex:
            kinds.append(jnp.full(self.num_dfacets, 2, jnp.int32))
        return jnp.concatenate(kinds)

    @cached_property
    def facet_base_normals(self) -> Array:
        """(num_facets, 2) unit normal pointing from cell_minus to cell_plus."""
        ft = jnp.float64 if _x64() else jnp.float32
        ex = jnp.array([1.0, 0.0], ft)
        ey = jnp.array([0.0, 1.0], ft)
        normals = [
            jnp.tile(ex, (self.num_vfacets, 1)),
            jnp.tile(ey, (self.num_hfacets, 1)),
        ]
        if self.is_simplex:
            l = self.diag_length
            nd = jnp.array([-self.hy / l, self.hx / l], ft)
            normals.append(jnp.tile(nd, (self.num_dfacets, 1)))
        return jnp.concatenate(normals, axis=0)

    @cached_property
    def facet_lengths(self) -> Array:
        ft = jnp.float64 if _x64() else jnp.float32
        lens = [
            jnp.full(self.num_vfacets, self.hy, ft),
            jnp.full(self.num_hfacets, self.hx, ft),
        ]
        if self.is_simplex:
            lens.append(jnp.full(self.num_dfacets, self.diag_length, ft))
        return jnp.concatenate(lens)

    @cached_property
    def facet_endpoints(self) -> Array:
        """(num_facets, 2, 2): start/end coordinates.  Parametrization t in
        [0,1]: vertical bottom->top, horizontal left->right, diagonal
        v00->v11."""
        ft = jnp.float64 if _x64() else jnp.float32

        f = jnp.arange(self.num_vfacets, dtype=jnp.int32)
        ix, iy = f % (self.nx + 1), f // (self.nx + 1)
        x = self.x0 + ix.astype(ft) * self.hx
        y = self.y0 + iy.astype(ft) * self.hy
        vstart = jnp.stack([x, y], -1)
        vend = jnp.stack([x, y + self.hy], -1)
        segs = [jnp.stack([vstart, vend], axis=1)]

        f = jnp.arange(self.num_hfacets, dtype=jnp.int32)
        ix, iy = f % self.nx, f // self.nx
        x = self.x0 + ix.astype(ft) * self.hx
        y = self.y0 + iy.astype(ft) * self.hy
        hstart = jnp.stack([x, y], -1)
        hend = jnp.stack([x + self.hx, y], -1)
        segs.append(jnp.stack([hstart, hend], axis=1))

        if self.is_simplex:
            f = jnp.arange(self.num_dfacets, dtype=jnp.int32)
            ix, iy = f % self.nx, f // self.nx
            x = self.x0 + ix.astype(ft) * self.hx
            y = self.y0 + iy.astype(ft) * self.hy
            dstart = jnp.stack([x, y], -1)
            dend = jnp.stack([x + self.hx, y + self.hy], -1)
            segs.append(jnp.stack([dstart, dend], axis=1))
        return jnp.concatenate(segs, axis=0)

    @cached_property
    def boundary_facet_mask(self) -> Array:
        """(num_facets,) bool — facets on the boundary of the background box.

        Replaces ``dfx.mesh.locate_entities_boundary(mesh, fdim, all-true)``
        (reference ``mesh_scripts.py:430-432``)."""
        return jnp.any(self.f2c < 0, axis=1)

    @cached_property
    def facet_midpoints(self) -> Array:
        return jnp.mean(self.facet_endpoints, axis=1)

    def local_facet_index(self, cells: Array, facets: Array) -> Array:
        """For pairs (cell, facet) return the local index k with
        ``c2f[cell, k] == facet`` (used to emit dolfinx-style one-sided
        integration entity pairs, reference ``mesh_scripts.py:137-192``)."""
        rows = self.c2f[cells]
        return jnp.argmax(rows == facets[:, None], axis=1).astype(jnp.int32)

    # ------------------------------------------------------ reference mapping
    def map_to_physical(self, cells: Array, ref_pts: Array) -> Array:
        """Map reference-cell points to physical space, batched over cells.

        ``ref_pts``: (npts, 2) on the reference square [0,1]^2 (quads) or the
        reference triangle conv{(0,0),(1,0),(0,1)} (triangles).  Returns
        (len(cells), npts, 2).
        """
        ft = jnp.float64 if _x64() else jnp.float32
        ref_pts = jnp.asarray(ref_pts, ft)
        origins = self.cell_origins[cells]  # (nc, 2)
        if not self.is_simplex:
            scale = jnp.array([self.hx, self.hy], ft)
            return origins[:, None, :] + ref_pts[None, :, :] * scale
        # triangle: x = p0 + r*(p1-p0) + s*(p2-p0); p depends on orientation
        verts = self.cell_vertex_coords[cells]  # (nc, 3, 2)
        p0, e1, e2 = (
            verts[:, 0, :],
            verts[:, 1, :] - verts[:, 0, :],
            verts[:, 2, :] - verts[:, 0, :],
        )
        return (
            p0[:, None, :]
            + ref_pts[None, :, 0:1] * e1[:, None, :]
            + ref_pts[None, :, 1:2] * e2[:, None, :]
        )

    def cell_jacobians(self) -> Tuple[Array, Array]:
        """Per-orientation affine Jacobian J (2,2) and |det J|.

        Returns (J, detJ) with J of shape (num_orientations, 2, 2).  For this
        uniform grid the Jacobian only depends on the orientation, never on
        the cell — the hook XLA needs to turn assembly into batched matmuls.
        """
        ft = jnp.float64 if _x64() else jnp.float32
        hx, hy = self.hx, self.hy
        if not self.is_simplex:
            J = jnp.array([[[hx, 0.0], [0.0, hy]]], ft)
            return J, jnp.array([hx * hy], ft)
        # lower (v00,v10,v11): e1=(hx,0), e2=(hx,hy); upper (v00,v11,v01):
        # e1=(hx,hy), e2=(0,hy).  Columns of J are e1, e2.
        J = jnp.array(
            [[[hx, hx], [0.0, hy]], [[hx, 0.0], [hy, hy]]],
            ft,
        )
        det = jnp.abs(jnp.linalg.det(J))
        return J, det


def _x64() -> bool:
    from jax import config

    return bool(config.jax_enable_x64)
