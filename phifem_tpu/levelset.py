"""Level-set detection: quadrature lattices and sign classification.

Reimplements the reference's detection machinery in vectorized form:

* ``_reference_segment_points`` / ``_reference_triangle_boundary_points`` /
  ``_reference_square_boundary_points`` (reference
  ``src/phifem/mesh_scripts.py:28-92``): N+1 evenly spaced points per edge of
  the reference cell (N=0 -> single midpoint/centroid).
* ``_compute_detection_vector`` (``mesh_scripts.py:95-134``): the reference
  assembles d = (sum_q phi(x_q)) / (sum_q |phi(x_q)|) per cell with a DG0
  test function and classifies d == -1 / in (-1,1) / == +1.  With exact
  sign bookkeeping this is equivalent to testing which signs appear among
  the phi samples: d == +1 iff no sample is negative (and not all are zero),
  d == -1 iff no sample is positive, otherwise "cut" — including the
  all-zero degenerate case the reference forces to 0.5 (cut) with a warning
  (``mesh_scripts.py:121-133``).  We classify signs directly: it is the same
  predicate without the float division, and it vectorizes to three
  reductions per cell on the VPU.

The level set may be a callable ``phi(x: (n,2)) -> (n,)`` (the reference's
"UFL expression" path, ``tests/test_compute_meshtags.py:160-161``) or a
discrete :class:`~phifem_tpu.spaces.Function` (the "discretize" path,
``demo/weak-dirichlet/flower/main.py:52-53``), in which case the interpolant
is evaluated per cell through its basis — matching the reference, which
samples the discrete level set cell-locally during assembly.
"""

from __future__ import annotations

from typing import Callable, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .grid import CellType, Grid
from .spaces import Function

Array = jnp.ndarray
LevelSet = Union[Callable, Function]

__all__ = [
    "reference_segment_points",
    "reference_triangle_boundary_points",
    "reference_square_boundary_points",
    "detection_points",
    "evaluate_on_cells",
    "sign_flags",
    "sign_flags_on_cells",
]


def reference_segment_points(N: int) -> np.ndarray:
    """(npts, 1) evenly spaced points on [0,1] (reference
    ``mesh_scripts.py:28-40``)."""
    if N > 0:
        pts = np.linspace(0.0, 1.0, N + 1)
    else:
        pts = np.array([0.5])
    return np.atleast_2d(pts.astype(np.float64)).T


def reference_triangle_boundary_points(N: int) -> np.ndarray:
    """(3N or 1, 2) boundary lattice of the reference triangle (reference
    ``mesh_scripts.py:43-65``): all 3 vertices plus N-1 interior points per
    edge; N=0 -> centroid."""
    if N == 0:
        return np.array([[1.0 / 3.0, 1.0 / 3.0]])
    t = np.linspace(0.0, 1.0, N + 1)
    edge1 = np.stack([t, np.zeros_like(t)], -1)  # p0 -> p1, incl. both ends
    t2 = t[1:]
    edge2 = np.stack([1.0 - t2, t2], -1)  # p1 -> p2, excl. p1
    t3 = t[1:-1]
    edge3 = np.stack([np.zeros_like(t3), 1.0 - t3], -1)  # p2 -> p0, open
    return np.concatenate([edge1, edge2, edge3], axis=0)


def reference_square_boundary_points(N: int) -> np.ndarray:
    """(4N or 1, 2) boundary lattice of the reference square (reference
    ``mesh_scripts.py:68-92``)."""
    if N == 0:
        return np.array([[0.5, 0.5]])
    t = np.linspace(0.0, 1.0, N + 1)
    edge1 = np.stack([t, np.zeros_like(t)], -1)
    t2 = t[1:]
    edge2 = np.stack([np.ones_like(t2), t2], -1)
    t3 = t[1:]
    edge3 = np.stack([1.0 - t3, np.ones_like(t3)], -1)
    t4 = t[1:-1]
    edge4 = np.stack([np.zeros_like(t4), 1.0 - t4], -1)
    return np.concatenate([edge1, edge2, edge3, edge4], axis=0)


def detection_points(cell_type: CellType, N: int) -> np.ndarray:
    if cell_type == CellType.triangle:
        return reference_triangle_boundary_points(N)
    return reference_square_boundary_points(N)


# Reference coordinates of segment points on each local facet of a cell
# (orientation-independent: local facets are the reference edges r0r1, r1r2,
# r0r2 for triangles and left/right/bottom/top for quads).
def facet_ref_points(cell_type: CellType, N: int) -> np.ndarray:
    """(nfpc, npts, 2) reference coordinates of the segment detection points
    on each local facet."""
    t = reference_segment_points(N)[:, 0]
    z = np.zeros_like(t)
    o = np.ones_like(t)
    if cell_type == CellType.triangle:
        return np.stack(
            [
                np.stack([t, z], -1),  # local facet 0: p0->p1
                np.stack([1.0 - t, t], -1),  # local facet 1: p1->p2
                np.stack([z, t], -1),  # local facet 2: p0->p2
            ]
        )
    return np.stack(
        [
            np.stack([z, t], -1),  # left
            np.stack([o, t], -1),  # right
            np.stack([t, z], -1),  # bottom
            np.stack([t, o], -1),  # top
        ]
    )


def evaluate_on_cells(
    grid: Grid, levelset: LevelSet, ref_pts: np.ndarray, cells: Array | None = None
) -> Array:
    """Evaluate the level set at the same reference points of every cell.

    Returns (ncells, npts).  Discrete fields are evaluated through their own
    basis (per-cell interpolant, like reference assembly); callables are
    evaluated at the physical point coordinates (exact/UFL path).
    """
    if cells is None:
        cells = jnp.arange(grid.num_cells, dtype=jnp.int32)
    if isinstance(levelset, Function):
        tab = jnp.asarray(levelset.space.element.tabulate(ref_pts))  # (npts, nloc)
        nodal = levelset.data[levelset.space.cell_dofs[cells]]  # (nc, nloc)
        return nodal @ tab.T
    phys = grid.map_to_physical(cells, jnp.asarray(ref_pts))  # (nc, npts, 2)
    vals = levelset(phys.reshape(-1, 2))
    return jnp.reshape(vals, phys.shape[:2])


def evaluate_at_cell_points(
    grid: Grid, levelset: LevelSet, cells: Array, ref_pts: Array
) -> Array:
    """Like :func:`evaluate_on_cells` but with per-cell reference points
    ``ref_pts`` of shape (ncells, npts, 2) (used for facet traces)."""
    if isinstance(levelset, Function):
        tab = levelset.space._basis_jnp(ref_pts)  # (nc, npts, nloc)
        nodal = levelset.data[levelset.space.cell_dofs[cells]]  # (nc, nloc)
        return jnp.einsum("cpl,cl->cp", tab, nodal)
    verts = grid.cell_vertex_coords_of(cells)
    r, s = ref_pts[..., 0:1], ref_pts[..., 1:2]
    # same barycentric/bilinear push-forward as Grid.map_to_physical
    if not grid.is_simplex:
        phys = (
            (1 - r) * (1 - s) * verts[:, None, 0, :]
            + r * (1 - s) * verts[:, None, 1, :]
            + (1 - r) * s * verts[:, None, 2, :]
            + r * s * verts[:, None, 3, :]
        )
    else:
        phys = (
            (1 - r - s) * verts[:, None, 0, :]
            + r * verts[:, None, 1, :]
            + s * verts[:, None, 2, :]
        )
    vals = levelset(phys.reshape(-1, 2))
    return jnp.reshape(vals, phys.shape[:2])


def detection_vector(
    grid: Grid, levelset: LevelSet, detection_degree: int
) -> Array:
    """Per-cell detection ratio d = sum_q phi(x_q) / sum_q |phi(x_q)| over
    the boundary detection lattice — the reference's
    ``_compute_detection_vector`` (``mesh_scripts.py:95-134``) without the
    DG0 assembly detour.  Zero-denominator cells are forced to 0.5 (cut),
    matching the reference's degenerate-cell convention (:121-133).

    The tagging pipeline itself classifies signs directly (see
    :func:`classify`), which is equivalent and division-free; this function
    exists for API/diagnostic parity.
    """
    pts = detection_points(grid.cell_type, detection_degree)
    vals = evaluate_on_cells(grid, levelset, pts)
    num = jnp.sum(vals, axis=1)
    den = jnp.sum(jnp.abs(vals), axis=1)
    return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.5)


def sign_flags(values: Array) -> Tuple[Array, Array]:
    """(has_pos, has_neg) along the last axis."""
    return jnp.any(values > 0.0, axis=-1), jnp.any(values < 0.0, axis=-1)


# (ncells, npts) detection layouts pad the npts minor dim 128x on TPU;
# below this cell count the padded pair stays ~2 GB and the historical
# batched arithmetic (bit-pinned by parity tests) is kept
_BATCHED_CELL_LIMIT = 2**21


def sign_flags_on_cells(
    grid: Grid, levelset: LevelSet, ref_pts: np.ndarray, cells: Array | None = None
) -> Tuple[Array, Array]:
    """OR-reduced detection sign flags, accumulated POINT BY POINT.

    Below ``_BATCHED_CELL_LIMIT`` cells this IS
    ``sign_flags(evaluate_on_cells(...))`` — the layout every parity test
    and golden CSV was pinned against (XLA's FMA contraction differs
    between program shapes, and knife-edge detection points — phi
    mathematically 0 — flip with it, so the small-grid arithmetic must
    stay byte-identical).  Above the limit the flags are accumulated ONE
    DETECTION POINT AT A TIME with 1-D buffers: TPU tiles the minor
    dimension to 128, so the has_pos/has_neg pair fused at ``(ncells,
    npts~3)`` pads 42x — at n=3200 (20.48M cells) that is a 21 GB
    ``f32[2,20480000,3]`` HBM allocation and the tag-kernel compile OOMs
    (seen in BENCH round 3).  Large grids have no bit-parity oracle
    (the reference cannot run at that scale), so the contraction
    difference is immaterial there."""
    if cells is None:
        cells = jnp.arange(grid.num_cells, dtype=jnp.int32)
    ref_pts = np.asarray(ref_pts)
    npts = ref_pts.shape[0]
    if grid.num_cells <= _BATCHED_CELL_LIMIT:
        return sign_flags(evaluate_on_cells(grid, levelset, ref_pts, cells))
    discrete = isinstance(levelset, Function)
    if discrete:
        tab = np.asarray(levelset.space.element.tabulate(ref_pts))  # (npts, nloc)
        nodal = levelset.data[levelset.space.cell_dofs[cells]]  # (nc, nloc)
    has_pos = has_neg = None
    for k in range(npts):
        if discrete:
            vk = nodal @ jnp.asarray(tab[k])
        else:
            phys = grid.map_to_physical(cells, jnp.asarray(ref_pts[k : k + 1]))
            vk = levelset(phys.reshape(-1, 2))
        pk, nk = vk > 0.0, vk < 0.0
        has_pos = pk if has_pos is None else jnp.logical_or(has_pos, pk)
        has_neg = nk if has_neg is None else jnp.logical_or(has_neg, nk)
    return has_pos, has_neg


def classify(has_pos: Array, has_neg: Array) -> Array:
    """Sign flags -> tags: 1 inside, 2 cut, 3 outside (reference semantics
    ``mesh_scripts.py:343-347``; all-zero forced to cut per :121-133)."""
    inside = jnp.logical_and(has_neg, jnp.logical_not(has_pos))
    outside = jnp.logical_and(has_pos, jnp.logical_not(has_neg))
    return jnp.where(inside, 1, jnp.where(outside, 3, 2)).astype(jnp.int8)
