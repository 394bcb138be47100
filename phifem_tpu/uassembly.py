"""Unstructured (imported-mesh) assembly: the solve path for ``UMesh``.

The reference runs its schemes on arbitrary dolfinx meshes (its golden
meshes include the unstructured ``disk.xdmf``, ``tests/test_compute_meshtags.py:136-137``,
and every demo assembles with UFL forms + PETSc on whatever mesh it is
given).  This module closes the same capability gap for imported meshes:
it assembles the SAME term DSL (:class:`~phifem_tpu.assembly.CellTerm` /
``FacetTerm`` / ``BoundaryTerm``, identical integrand signatures) on a
:class:`~phifem_tpu.umesh.UMesh` and produces a standard
:class:`~phifem_tpu.assembly.Operator` (entity batches of element
matrices), so the whole downstream stack — equilibrated Krylov
(:func:`phifem_tpu.solvers.solve`), reassembly, restricted dense/CSR
extraction — works unchanged.

Design: imported meshes are irregular, so there is no per-orientation
uniformity to exploit; instead the geometry (affine Jacobian, |detJ|,
cell diameter) is per-cell data carried through the same
``jacfwd(grad(local_energy))`` element-matrix autodiff as the structured
path.  Reference-domain basis tabulations are shared constants; physical
gradients/Hessians are formed per cell inside the vmapped local energy
(``g_phys = g_ref @ Jinv``) — O(nq*nloc) flops per cell, no
per-cell tabulation tables in memory.  Simplex (triangle) meshes only:
affine geometry keeps quadrature exact; the structured path covers
quads.  ``ctx.h`` is the PER-CELL diameter (UFL ``CellDiameter`` on an
irregular mesh; the structured path's scalar ``h`` is its uniform
special case).

Interior-facet terms locate quadrature points in each side's reference
cell by inverting the affine map (``ref = Jinv @ (x - p0)``) — no
local-facet orientation bookkeeping at all, which is what makes the
facet machinery mesh-agnostic.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import (
    Batch,
    BoundaryTerm,
    CellTerm,
    Ctx,
    FacetTerm,
    FieldEval,
    Operator,
    System,
    _eval_field,
    _float_dtype,
    _layout,
    _normalize_data,
    _prune_batch,
    _unpack,
)
from .elements import Element, classify_nodes, lagrange_element
from .quadrature import cell_rule, segment_rule
from .umesh import UMesh, USideList

Array = jnp.ndarray

__all__ = [
    "USpace",
    "UFunction",
    "interpolate",
    "assemble_operator",
    "assemble_vector",
    "assemble_scalar",
]

# classify_nodes local-facet ids (0: p0-p1, 1: p1-p2, 2: p0-p2) -> UMesh
# local-edge rows (dolfinx order [[1,2],[0,2],[0,1]]); directions agree.
_CLS2MESH_TRI = np.array([2, 0, 1])
# quad element-local TENSOR vertex order (v00, v10, v01, v11) -> the VTK
# ring position in UMesh quad cells; the mesh's reference square puts
# ring (v0, v1, v2, v3) at (0,0), (1,0), (1,1), (0,1)
# (UMesh.map_to_physical)
_QUADV2RING = np.array([0, 1, 3, 2])
# classify_nodes quad facet ids (0 left, 1 right, 2 bottom, 3 top) ->
# (UMesh c2f column of the VTK ring edge, param-START ring vertex,
#  param-END ring vertex); param runs bottom->top / left->right
_QUAD_CLS_EDGE = np.array(
    [[3, 0, 3], [1, 1, 2], [0, 0, 1], [2, 3, 2]]
)


# ------------------------------------------------------------------ spaces
@dataclasses.dataclass(frozen=True)
class USpace:
    """Lagrange space on an unstructured simplicial mesh — duck-types the
    :class:`~phifem_tpu.spaces.Space` contract used by :class:`System`,
    :class:`Batch` and :func:`phifem_tpu.solvers.solve` (``nloc`` /
    ``value_shape`` / ``num_dofs`` / ``dof_shape`` / ``cell_dofs``)."""

    mesh: UMesh
    element: Element
    value_shape: Tuple[int, ...] = ()

    @staticmethod
    def lagrange(
        mesh: UMesh, degree: int, value_shape: Tuple[int, ...] = ()
    ) -> "USpace":
        return USpace(mesh, lagrange_element(mesh.cell_name, degree), value_shape)

    @staticmethod
    def dg0(mesh: UMesh, value_shape: Tuple[int, ...] = ()) -> "USpace":
        from .elements import dg0_element

        return USpace(mesh, dg0_element(mesh.cell_name), value_shape)

    @property
    def degree(self) -> int:
        return self.element.degree

    @property
    def nloc(self) -> int:
        return self.element.nloc

    @property
    def value_size(self) -> int:
        return int(np.prod(self.value_shape)) if self.value_shape else 1

    @property
    def _is_tet(self) -> bool:
        return self.element.cell == "tetrahedron"

    @property
    def num_scalar_dofs(self) -> int:
        m, k = self.mesh, self.degree
        if self.element.family == "DG":
            return m.num_cells
        n = m.num_vertices
        if k > 1 and self._is_tet:
            from .elements import classify_nodes_tet

            kind, _, _ = classify_nodes_tet(self.element)
            n += m.edges.shape[0] * (k - 1)
            n += m.num_facets * (int(np.sum(kind == 2)) // 4)  # per-face nodes
            n += m.num_cells * int(np.sum(kind == 3))
        elif k > 1:
            n += m.num_facets * (k - 1)
            kind, _, _ = classify_nodes(self.element)
            n += m.num_cells * int(np.sum(kind == 2))
        return n

    @property
    def num_dofs(self) -> int:
        return self.num_scalar_dofs * self.value_size

    @property
    def dof_shape(self) -> Tuple[int, ...]:
        return (self.num_scalar_dofs,) + tuple(self.value_shape)

    @cached_property
    def cell_dofs_np(self) -> np.ndarray:
        """(num_cells, nloc) int32 global scalar-DoF ids.  Edge nodes are
        numbered along the GLOBAL facet direction (ascending vertex id —
        the ``UMesh.facets`` sort), so neighbouring cells agree."""
        m, k = self.mesh, self.degree
        if self.element.family == "DG":
            return np.arange(m.num_cells, dtype=np.int32)[:, None]
        if self._is_tet:
            return self._cell_dofs_tet()
        kind, entity, param = classify_nodes(self.element)
        nV = m.num_vertices
        edge_base = nV
        cell_base = nV + m.num_facets * (k - 1)
        n_int = int(np.sum(kind == 2))
        cells = np.arange(m.num_cells, dtype=np.int64)
        le = m._local_edges  # (3, 2) local vertex pairs, dolfinx order

        cols = []
        for loc in range(self.nloc):
            if kind[loc] == 0:
                lv = int(entity[loc])
                if not m.is_simplex:
                    lv = int(_QUADV2RING[lv])
                col = m.cells[:, lv].astype(np.int64)
            elif kind[loc] == 1:
                if m.is_simplex:
                    lf = _CLS2MESH_TRI[int(entity[loc])]
                    va = m.cells[:, le[lf, 0]]
                    vb = m.cells[:, le[lf, 1]]
                else:
                    lf, a_r, b_r = _QUAD_CLS_EDGE[int(entity[loc])]
                    va = m.cells[:, a_r]
                    vb = m.cells[:, b_r]
                facet = m.c2f[:, lf].astype(np.int64)
                idx_local = int(round(float(param[loc]) * k)) - 1
                idx_rev = (k - 1) - 1 - idx_local
                # flip where the local edge direction runs against the
                # global (ascending-vertex-id) direction
                idx = np.where(va <= vb, idx_local, idx_rev)
                col = edge_base + facet * (k - 1) + idx
            else:
                col = cell_base + cells * n_int + int(entity[loc])
            cols.append(col.astype(np.int32))
        return np.stack(cols, axis=-1)

    def _cell_dofs_tet(self) -> np.ndarray:
        """Tet DoF map: vertices, then per-global-edge nodes (numbered
        along ascending vertex id, as in 2D), then per-face nodes (degree
        <= 3: at most one per face), then cell-interior."""
        from .elements import TET_EDGES, classify_nodes_tet

        m, k = self.mesh, self.degree
        kind, entity, param = classify_nodes_tet(self.element)
        nV = m.num_vertices
        nE = m.edges.shape[0]
        n_face = int(np.sum(kind == 2)) // 4
        edge_base = nV
        face_base = nV + nE * (k - 1)
        cell_base = face_base + m.num_facets * n_face
        n_int = int(np.sum(kind == 3))
        cells = np.arange(m.num_cells, dtype=np.int64)

        cols = []
        for loc in range(self.nloc):
            if kind[loc] == 0:
                col = m.cells[:, int(entity[loc])].astype(np.int64)
            elif kind[loc] == 1:
                le = TET_EDGES[int(entity[loc])]
                edge = m.c2e[:, int(entity[loc])].astype(np.int64)
                va = m.cells[:, le[0]]
                vb = m.cells[:, le[1]]
                idx_local = int(round(float(param[loc]) * k)) - 1
                idx_rev = (k - 1) - 1 - idx_local
                idx = np.where(va <= vb, idx_local, idx_rev)
                col = edge_base + edge * (k - 1) + idx
            elif kind[loc] == 2:
                face = m.c2f[:, int(entity[loc])].astype(np.int64)
                col = face_base + face * n_face  # n_face == 1 for k <= 3
            else:
                col = cell_base + cells * n_int + int(entity[loc])
            cols.append(col.astype(np.int32))
        return np.stack(cols, axis=-1)

    @cached_property
    def cell_dofs(self) -> Array:
        return jnp.asarray(self.cell_dofs_np)

    @cached_property
    def dof_coords_np(self) -> np.ndarray:
        """(num_scalar_dofs, dim) physical DoF coordinates (vertices, then
        per-entity nodes in global direction, then cell-interior)."""
        m, k = self.mesh, self.degree
        if self.element.family == "DG":
            return m.cell_centroids
        if self._is_tet:
            return self._dof_coords_tet()
        coords = [m.verts]
        if k > 1:
            ends = m.facet_endpoints  # (nf, 2, 2), ascending vertex id
            ts = np.asarray([(j + 1) / k for j in range(k - 1)])
            fac = (
                ends[:, None, 0, :] * (1 - ts)[None, :, None]
                + ends[:, None, 1, :] * ts[None, :, None]
            )
            coords.append(fac.reshape(-1, 2))
            kind, _, _ = classify_nodes(self.element)
            int_nodes = self.element.nodes[kind == 2]
            if len(int_nodes):
                # map_to_physical is affine on triangles, bilinear on
                # quads — both in the mesh's reference convention
                coords.append(
                    m.map_to_physical(int_nodes).reshape(-1, 2)
                )
        return np.concatenate(coords, axis=0)

    def _dof_coords_tet(self) -> np.ndarray:
        from .elements import classify_nodes_tet

        m, k = self.mesh, self.degree
        coords = [m.verts]
        if k > 1:
            kind, _, _ = classify_nodes_tet(self.element)
            ends = m.verts[m.edges]  # (ne, 2, 3), ascending vertex id
            ts = np.asarray([(j + 1) / k for j in range(k - 1)])
            coords.append(
                (
                    ends[:, None, 0, :] * (1 - ts)[None, :, None]
                    + ends[:, None, 1, :] * ts[None, :, None]
                ).reshape(-1, 3)
            )
            if int(np.sum(kind == 2)):  # one centroid node per face (k == 3)
                coords.append(m.facet_endpoints.mean(axis=1))
            int_nodes = self.element.nodes[kind == 3]
            if len(int_nodes):
                coords.append(
                    m.map_to_physical(int_nodes).reshape(-1, 3)
                )
        return np.concatenate(coords, axis=0)


@dataclasses.dataclass
class UFunction:
    """Discrete field on a :class:`USpace` (coefficients of shape
    ``space.dof_shape``) — the assembly-facing subset of
    :class:`~phifem_tpu.spaces.Function`."""

    space: USpace
    data: Array

    @staticmethod
    def zeros(space: USpace) -> "UFunction":
        return UFunction(space, jnp.zeros(space.dof_shape, _float_dtype()))


def interpolate(f: Callable, space: USpace) -> UFunction:
    """Nodal interpolation of a callable ``f((n, 2)) -> (n, *vs)``."""
    if isinstance(f, UFunction) and f.space is space:
        return f
    pts = jnp.asarray(space.dof_coords_np)
    vals = jnp.asarray(f(pts), _float_dtype())
    want = (pts.shape[0],) + tuple(space.value_shape)
    return UFunction(space, jnp.reshape(vals, want))


def boundary_dof_mask(space: USpace) -> Array:
    """Mask of scalar DoFs on the mesh's exterior boundary — the
    unstructured twin of :func:`phifem_tpu.spaces.boundary_dof_mask`
    (topological: vertices + edge nodes of facets with one adjacent
    cell, equivalent to ``locate_dofs_topological`` over
    ``exterior_facet_indices``)."""
    if space.element.family == "DG":
        raise ValueError("DG spaces have no boundary DoFs")
    m, k = space.mesh, space.degree
    bf = np.where(m.boundary_facet_mask)[0]
    mask = np.zeros(space.num_scalar_dofs, bool)
    mask[np.unique(m.facets[bf])] = True
    if k > 1 and space._is_tet:
        # edge nodes of the boundary faces' edges + the per-face nodes
        fv = m.facets[bf]  # (nb, 3) sorted vertex triples
        face_edges = np.sort(
            fv[:, [[0, 1], [0, 2], [1, 2]]].reshape(-1, 2), axis=1
        )
        keys = m.edges[:, 0].astype(np.int64) * (m.num_vertices + 1) + m.edges[:, 1]
        q = face_edges[:, 0].astype(np.int64) * (m.num_vertices + 1) + face_edges[:, 1]
        eids = np.searchsorted(keys, q)
        edge = m.num_vertices + eids[:, None] * (k - 1) + np.arange(k - 1)[None, :]
        mask[edge.reshape(-1)] = True
        from .elements import classify_nodes_tet

        kind, _, _ = classify_nodes_tet(space.element)
        n_face = int(np.sum(kind == 2)) // 4
        if n_face:
            face_base = m.num_vertices + m.edges.shape[0] * (k - 1)
            mask[face_base + bf * n_face] = True
    elif k > 1:
        edge = m.num_vertices + bf[:, None] * (k - 1) + np.arange(k - 1)[None, :]
        mask[edge.reshape(-1)] = True
    return jnp.asarray(mask)


def _is_fn(v) -> bool:
    from .spaces import Function as _F

    return isinstance(v, (UFunction, _F))


# --------------------------------------------------------------- geometry
def _cell_geometry(mesh: UMesh, cells: np.ndarray):
    """Per-cell affine geometry: returns host float64 arrays
    ``(p0 (ne,d), Jinv (ne,d,d), absdet (ne,), h (ne,))`` with
    ``Jinv[r, x] = d ref_r / d x`` (the gradient-transform convention of
    the structured tabulations).  ``h`` is the max edge length (UFL
    ``CellDiameter``).  Works for triangles and (via the duck-typed
    :class:`~phifem_tpu.umesh3.UMesh3`) tetrahedra."""
    if mesh.dim == 3:
        from .umesh3 import _cell_geometry3

        return _cell_geometry3(mesh, cells)
    V = mesh.verts[mesh.cells[cells]]  # (ne, 3, 2)
    p0 = V[:, 0]
    J = np.stack([V[:, 1] - p0, V[:, 2] - p0], axis=-1)  # J[i, r] = dx_i/dref_r
    det = J[:, 0, 0] * J[:, 1, 1] - J[:, 0, 1] * J[:, 1, 0]
    Jinv = (
        np.stack(
            [
                np.stack([J[:, 1, 1], -J[:, 0, 1]], axis=-1),
                np.stack([-J[:, 1, 0], J[:, 0, 0]], axis=-1),
            ],
            axis=1,
        )
        / det[:, None, None]
    )
    e01 = np.linalg.norm(V[:, 1] - V[:, 0], axis=1)
    e02 = np.linalg.norm(V[:, 2] - V[:, 0], axis=1)
    e12 = np.linalg.norm(V[:, 2] - V[:, 1], axis=1)
    h = np.maximum(np.maximum(e01, e02), e12)
    return p0, Jinv, np.abs(det), h


def _quad_geometry_at(mesh: UMesh, cells: np.ndarray, ref_pts: np.ndarray):
    """Per-POINT bilinear geometry of quad cells: returns host float64
    ``(x (ne,nq,2), Jinv (ne,nq,2,2), absdet (ne,nq), h (ne,))`` at the
    given reference points.  The mesh's reference square puts ring
    vertices (v0..v3) at (0,0),(1,0),(1,1),(0,1)
    (:meth:`UMesh.map_to_physical`); J varies over the cell, which is the
    whole reason the quad path needs per-point factors."""
    V = mesh.verts[mesh.cells[cells]]  # (ne, 4, 2) ring order
    r = ref_pts[None, :, 0, None]  # (1, nq, 1)
    s = ref_pts[None, :, 1, None]
    x = (
        (1 - r) * (1 - s) * V[:, None, 0]
        + r * (1 - s) * V[:, None, 1]
        + r * s * V[:, None, 2]
        + (1 - r) * s * V[:, None, 3]
    )
    ref = np.broadcast_to(
        ref_pts[None], (V.shape[0],) + ref_pts.shape
    )
    Jinv, absdet = _quad_jacobian(V, ref)
    return x, Jinv, absdet, _quad_h(V)


def _quad_h(V: np.ndarray) -> np.ndarray:
    """UFL ``CellDiameter`` of quads: LARGEST VERTEX DISTANCE — on a quad
    that is a diagonal, not an edge (the structured backend's
    ``Grid.cell_diameter``; on triangles max edge == max vertex distance,
    so the simplex path needs no change)."""
    edges = np.linalg.norm(V - np.roll(V, -1, axis=1), axis=-1)
    d02 = np.linalg.norm(V[:, 2] - V[:, 0], axis=-1)
    d13 = np.linalg.norm(V[:, 3] - V[:, 1], axis=-1)
    return np.maximum(edges.max(axis=1), np.maximum(d02, d13))


def _quad_jacobian(V: np.ndarray, ref: np.ndarray):
    """(Jinv (ne,nq,2,2), absdet (ne,nq)) of the ring bilinear map at
    per-cell reference points ``ref (ne,nq,2)``."""
    r = ref[..., 0, None]
    s = ref[..., 1, None]
    dxr = (
        -(1 - s) * V[:, None, 0]
        + (1 - s) * V[:, None, 1]
        + s * V[:, None, 2]
        - s * V[:, None, 3]
    )  # (ne, nq, 2)
    dxs = (
        -(1 - r) * V[:, None, 0]
        - r * V[:, None, 1]
        + r * V[:, None, 2]
        + (1 - r) * V[:, None, 3]
    )
    J = np.stack([dxr, dxs], axis=-1)  # J[..., i, c] = dx_i/dref_c
    det = J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]
    Jinv = (
        np.stack(
            [
                np.stack([J[..., 1, 1], -J[..., 0, 1]], axis=-1),
                np.stack([-J[..., 1, 0], J[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[..., None, None]
    )
    return Jinv, np.abs(det)


def _cell_geometry_at(mesh: UMesh, cells: np.ndarray, ref_pts: np.ndarray):
    """Per-point geometry factors at ``ref_pts`` for any 2D/3D cell type:
    ``(x (ne,nq,d), Jinv (ne,nq,d,d), absdet (ne,nq), h (ne,))``.
    Simplices broadcast their constant affine factors; quads evaluate the
    bilinear map pointwise (:func:`_quad_geometry_at`)."""
    nq = ref_pts.shape[0]
    if mesh.dim == 2 and not mesh.is_simplex:
        return _quad_geometry_at(mesh, cells, ref_pts)
    p0, Jinv, absdet, h = _cell_geometry(mesh, cells)
    V = mesh.verts[mesh.cells[cells]]
    lam = np.concatenate(
        [1.0 - ref_pts.sum(axis=1, keepdims=True), ref_pts], axis=1
    )
    x = np.einsum("qk,ckx->cqx", lam, V)
    ne = len(cells)
    return (
        x,
        np.broadcast_to(Jinv[:, None], (ne, nq) + Jinv.shape[1:]),
        np.broadcast_to(absdet[:, None], (ne, nq)),
        h,
    )


def _quad_invert_map(mesh: UMesh, cells: np.ndarray, x_np: np.ndarray):
    """Newton inversion of the ring bilinear map: reference coordinates of
    the physical points ``x_np (ne, nq, 2)`` within each quad cell
    (vectorized host numpy; 2-3 iterations reach machine precision on
    non-degenerate quads — the quad analogue of ``ref = Jinv (x - p0)``)."""
    V = mesh.verts[mesh.cells[cells]]  # (ne, 4, 2)
    ref = np.full(x_np.shape, 0.5)
    for _ in range(8):
        r = ref[..., 0, None]
        s = ref[..., 1, None]
        F = (
            (1 - r) * (1 - s) * V[:, None, 0]
            + r * (1 - s) * V[:, None, 1]
            + r * s * V[:, None, 2]
            + (1 - r) * s * V[:, None, 3]
            - x_np
        )
        dxr = (
            -(1 - s) * V[:, None, 0]
            + (1 - s) * V[:, None, 1]
            + s * V[:, None, 2]
            - s * V[:, None, 3]
        )
        dxs = (
            -(1 - r) * V[:, None, 0]
            - r * V[:, None, 1]
            + r * V[:, None, 2]
            + (1 - r) * V[:, None, 3]
        )
        det = dxr[..., 0] * dxs[..., 1] - dxr[..., 1] * dxs[..., 0]
        dr = (dxs[..., 1] * F[..., 0] - dxs[..., 0] * F[..., 1]) / det
        ds = (-dxr[..., 1] * F[..., 0] + dxr[..., 0] * F[..., 1]) / det
        ref = ref - np.stack([dr, ds], axis=-1)
    return ref


def _ref_tabs(element: Element, ref_pts: np.ndarray):
    ft = _float_dtype()
    return (
        jnp.asarray(element.tabulate(ref_pts), ft),
        jnp.asarray(element.tabulate_grad(ref_pts), ft),
        jnp.asarray(element.tabulate_hess(ref_pts), ft),
    )


def _phys_evals(u_loc, valq, grefq, hrefq, Jinv):
    """FieldEval at one point with on-the-fly gradient/Hessian transform
    (per-cell ``Jinv`` is traced; tabs are reference-domain constants)."""
    gphys = jnp.einsum("lr,rx->lx", grefq, Jinv)
    hphys = jnp.einsum("ry,lrs,sx->lyx", Jinv, hrefq, Jinv)
    return _eval_field(u_loc, valq, gphys, hphys)


def _region_cells_u(mesh: UMesh, cell_tags, region) -> np.ndarray:
    if region is None or cell_tags is None:
        return np.arange(mesh.num_cells, dtype=np.int32)
    return np.where(np.isin(np.asarray(cell_tags), np.asarray(region)))[0].astype(
        np.int32
    )


# -------------------------------------------------------------- cell terms
def _u_cell_local_fn(system: System, term: CellTerm, mesh: UMesh, data: Dict,
                     cells: np.ndarray):
    """(local, cell_data, ntot, layout, fn_data) — the unstructured twin of
    ``assembly._cell_local_fn``; geometry is per-cell data in ``cd``."""
    ref_pts, wq = cell_rule(mesh.cell_name, term.degree)
    layout = _layout(system)
    ntot = sum(l[-1] for l in layout)
    tabs = {n: _ref_tabs(s.element, ref_pts) for n, s in system.fields.items()}
    fn_data = {k: v for k, v in data.items() if _is_fn(v)}
    call_data = {k: v for k, v in data.items() if not _is_fn(v)}
    dtabs = {k: _ref_tabs(v.space.element, ref_pts) for k, v in fn_data.items()}

    # per-point geometry: constant (broadcast) for simplices, genuinely
    # pointwise for bilinear quads
    x_np, Jinv, absdet, h = _cell_geometry_at(mesh, cells, ref_pts)
    ft = _float_dtype()
    dim = mesh.dim

    geo = {
        "Jinv": jnp.asarray(Jinv, ft),  # (ne, nq, d, d)
        "wdet": jnp.asarray(wq[None, :] * absdet, ft),
        "x": jnp.asarray(x_np, ft),
        "h": jnp.asarray(h, ft),
    }
    dof_tables = {k: f.space.cell_dofs_np[cells] for k, f in fn_data.items()}

    def cell_data(arrays: Optional[Dict] = None) -> Dict:
        cd = dict(geo)
        for k, f in fn_data.items():
            dat = arrays[k] if arrays is not None else f.data
            cd["d_" + k] = dat[jnp.asarray(dof_tables[k])]
        for k, f in call_data.items():
            vals = f(cd["x"].reshape(-1, dim))
            cd["c_" + k] = jnp.reshape(vals, cd["x"].shape[:2] + vals.shape[1:])
        return cd

    nq = len(wq)

    def local(uflat, vflat, cd):
        ctx = Ctx(h=cd["h"])
        u_locs = _unpack(uflat, layout) if uflat is not None else None
        v_locs = _unpack(vflat, layout)
        contrib = 0.0
        for q in range(nq):
            Ji = cd["Jinv"][q]
            if u_locs is not None:
                u_ev = {
                    n: _phys_evals(u_locs[n], t[0][q], t[1][q], t[2][q], Ji)
                    for n, t in tabs.items()
                }
            v_ev = {
                n: _phys_evals(v_locs[n], t[0][q], t[1][q], t[2][q], Ji)
                for n, t in tabs.items()
            }
            d_ev = {
                k: _phys_evals(cd["d_" + k], t[0][q], t[1][q], t[2][q], Ji)
                for k, t in dtabs.items()
            }
            for k in call_data:
                d_ev[k] = FieldEval(cd["c_" + k][q], None, None)
            xpt, w = cd["x"][q], cd["wdet"][q]
            if u_locs is not None:
                contrib = contrib + w * term.integrand(u_ev, v_ev, d_ev, xpt, ctx)
            else:
                contrib = contrib + w * term.integrand(v_ev, d_ev, xpt, ctx)
        return contrib

    return local, cell_data, ntot, layout, fn_data


# ------------------------------------------------------------- facet terms
def _facet_side_tabs(element: Element, mesh: UMesh, cells: np.ndarray,
                     x_np: np.ndarray):
    """Reference tabulations of one side's basis at per-facet physical
    points: maps ``x`` back into the side cell (affine inverse for
    simplices, Newton-inverted bilinear map for quads), then tabulates
    (host, static geometry).  Returns (val (nf,nq,nloc),
    gref (nf,nq,nloc,d), href (nf,nq,nloc,d,d), Jinv (nf,nq,d,d) —
    per-POINT, constant-broadcast on simplices — and h (nf,))."""
    d = mesh.dim
    nf, nq = x_np.shape[:2]
    if d == 2 and not mesh.is_simplex:
        V = mesh.verts[mesh.cells[cells]]
        ref = _quad_invert_map(mesh, cells, x_np)
        Jinv, _ = _quad_jacobian(V, ref)
        h = _quad_h(V)
    else:
        p0, Jinv_c, _, h = _cell_geometry(mesh, cells)
        ref = np.einsum("frx,fqx->fqr", Jinv_c, x_np - p0[:, None, :])
        Jinv = np.broadcast_to(Jinv_c[:, None], (nf, nq, d, d))
    flat = ref.reshape(-1, d)
    ft = _float_dtype()
    val = jnp.asarray(element.tabulate(flat).reshape(nf, nq, -1), ft)
    gref = jnp.asarray(element.tabulate_grad(flat).reshape(nf, nq, -1, d), ft)
    href = jnp.asarray(
        element.tabulate_hess(flat).reshape(nf, nq, -1, d, d), ft
    )
    return val, gref, href, jnp.asarray(Jinv, ft), h


def _u_facet_local_fn(system: System, term, mesh: UMesh, data: Dict,
                      facets: np.ndarray, sides: Sequence[np.ndarray],
                      normals: np.ndarray):
    """Twin of ``assembly._facet_local_fn``: ``sides`` is (c0,) for
    one-sided ds terms and (c0, c1) for interior dS terms.  ``normals``
    must already carry the term's orientation (outward / side0->side1).

    Facet quadrature: Gauss-Legendre on edges (2D) / a symmetric triangle
    rule of matching exactness on faces (3D) — ``term.npts`` keeps its 2D
    meaning (degree 2*npts-1 exact)."""
    nsides = len(sides)
    layout = _layout(system)
    ntot1 = sum(l[-1] for l in layout)
    ntot = nsides * ntot1

    ends = mesh.facet_endpoints[facets]  # (nf, dim, dim) facet vertices
    if mesh.dim == 2:
        t1d, w1d = segment_rule(term.npts)
        x_np = (
            ends[:, None, 0, :] * (1 - t1d)[None, :, None]
            + ends[:, None, 1, :] * t1d[None, :, None]
        )
        # physical weights: w1d sums to 1, scale = edge length
        wscale = mesh.facet_lengths[facets]
    else:
        fq, w1d = cell_rule("triangle", 2 * term.npts - 1)
        lam = np.concatenate(
            [1.0 - fq.sum(axis=1, keepdims=True), fq], axis=1
        )  # (nq, 3) barycentric on the face
        x_np = np.einsum("qk,fkx->fqx", lam, ends)
        # ref-triangle weights sum to 1/2; affine scale factor = 2 * area
        wscale = 2.0 * mesh.facet_lengths[facets]
    ft = _float_dtype()

    fn_data = {k: v for k, v in data.items() if _is_fn(v)}
    call_data = {k: v for k, v in data.items() if not _is_fn(v)}

    tabs, dtabs, hs, jinvs, dof_tables = [], [], [], [], []
    for s_i, cells in enumerate(sides):
        st = {}
        Ji = hh = None
        for n, sp in system.fields.items():
            val, gref, href, Ji, hh = _facet_side_tabs(
                sp.element, mesh, cells, x_np
            )
            st[n] = (val, gref, href)
        tabs.append(st)
        dt = {}
        for k, f in fn_data.items():
            val, gref, href, Ji2, _ = _facet_side_tabs(
                f.space.element, mesh, cells, x_np
            )
            dt[k] = (val, gref, href)
            Ji = Ji2 if Ji is None else Ji
        dtabs.append(dt)
        if Ji is None:  # no fields at all (scalar functional of callables)
            _, Jinv_np, _, h_np = _cell_geometry(mesh, cells)
            nfq = x_np.shape[:2]
            Ji = jnp.asarray(
                np.broadcast_to(
                    Jinv_np[:, None], nfq + Jinv_np.shape[1:]
                ),
                ft,
            )
            hh = h_np
        jinvs.append(Ji)
        hs.append(hh)
        dof_tables.append(
            {k: f.space.cell_dofs_np[cells] for k, f in fn_data.items()}
        )

    h_ctx = np.mean(np.stack(hs), axis=0)  # avg(h) across sides
    geo = {
        "x": jnp.asarray(x_np, ft),
        "wlen": jnp.asarray(w1d[None, :] * wscale[:, None], ft),
        "n": jnp.asarray(normals, ft),
        "h": jnp.asarray(h_ctx, ft),
    }
    for s_i in range(nsides):
        geo[f"Jinv{s_i}"] = jinvs[s_i]
        for n, t in tabs[s_i].items():
            geo[f"t{s_i}_{n}_v"], geo[f"t{s_i}_{n}_g"], geo[f"t{s_i}_{n}_h"] = t
        for k, t in dtabs[s_i].items():
            geo[f"dt{s_i}_{k}_v"], geo[f"dt{s_i}_{k}_g"], geo[f"dt{s_i}_{k}_h"] = t

    def facet_data(arrays: Optional[Dict] = None) -> Dict:
        cd = dict(geo)
        for s_i in range(nsides):
            for k, f in fn_data.items():
                dat = arrays[k] if arrays is not None else f.data
                cd[f"d{s_i}_" + k] = dat[jnp.asarray(dof_tables[s_i][k])]
        for k, f in call_data.items():
            vals = f(cd["x"].reshape(-1, mesh.dim))
            cd["c_" + k] = jnp.reshape(vals, cd["x"].shape[:2] + vals.shape[1:])
        return cd

    nq = len(w1d)

    def local(uflat, vflat, cd):
        ctx = Ctx(h=cd["h"])
        u_sides = v_sides = None
        if uflat is not None:
            u_sides = [
                _unpack(uflat[s_i * ntot1 : (s_i + 1) * ntot1], layout)
                for s_i in range(nsides)
            ]
        v_sides = [
            _unpack(vflat[s_i * ntot1 : (s_i + 1) * ntot1], layout)
            for s_i in range(nsides)
        ]

        def side_evals(locs, s_i, q):
            Ji = cd[f"Jinv{s_i}"][q]
            return {
                n: _phys_evals(
                    locs[n],
                    cd[f"t{s_i}_{n}_v"][q],
                    cd[f"t{s_i}_{n}_g"][q],
                    cd[f"t{s_i}_{n}_h"][q],
                    Ji,
                )
                for n in system.names
            }

        def side_data(s_i, q):
            Ji = cd[f"Jinv{s_i}"][q]
            d_ev = {
                k: _phys_evals(
                    cd[f"d{s_i}_" + k],
                    cd[f"dt{s_i}_{k}_v"][q],
                    cd[f"dt{s_i}_{k}_g"][q],
                    cd[f"dt{s_i}_{k}_h"][q],
                    Ji,
                )
                for k in fn_data
            }
            for k in call_data:
                d_ev[k] = FieldEval(cd["c_" + k][q], None, None)
            return d_ev

        contrib = 0.0
        for q in range(nq):
            xpt, w, nrm = cd["x"][q], cd["wlen"][q], cd["n"]
            if nsides == 1:
                d0 = side_data(0, q)
                v0 = side_evals(v_sides[0], 0, q)
                if u_sides is not None:
                    u0 = side_evals(u_sides[0], 0, q)
                    contrib = contrib + w * term.integrand(
                        u0, v0, d0, xpt, nrm, ctx
                    )
                else:
                    contrib = contrib + w * term.integrand(v0, d0, xpt, nrm, ctx)
            else:
                d0, d1 = side_data(0, q), side_data(1, q)
                v0 = side_evals(v_sides[0], 0, q)
                v1 = side_evals(v_sides[1], 1, q)
                if u_sides is not None:
                    u0 = side_evals(u_sides[0], 0, q)
                    u1 = side_evals(u_sides[1], 1, q)
                    contrib = contrib + w * term.integrand(
                        u0, u1, v0, v1, d0, d1, xpt, nrm, ctx
                    )
                else:
                    contrib = contrib + w * term.integrand(
                        v0, v1, d0, d1, xpt, nrm, ctx
                    )
        return contrib

    return local, facet_data, ntot, layout, fn_data


def _interior_facets(mesh: UMesh, facet_tags, region):
    ftags = np.asarray(facet_tags)
    sel = np.isin(ftags, np.asarray(region))
    sel &= mesh.f2c[:, 1] >= 0
    facets = np.where(sel)[0].astype(np.int32)
    c0 = mesh.f2c[facets, 0]
    c1 = mesh.f2c[facets, 1]
    # n points side0 -> side1: away from c0's centroid
    mid = mesh.facet_endpoints[facets].mean(axis=1)
    d = mid - mesh.cell_centroids[c0]
    base = mesh.facet_base_normals[facets]
    signs = np.where((base * d).sum(axis=1) >= 0, 1.0, -1.0)
    return facets, c0, c1, base * signs[:, None]


def _segments_u(system: System, cells: np.ndarray):
    cj = jnp.asarray(cells)
    return [
        (n, s.cell_dofs[cj], tuple(s.value_shape))
        for n, s in system.fields.items()
    ]


def _mat_batch(system, local, data_fn, ntot, fn_data, segs) -> Optional[Batch]:
    """Build one Batch of per-entity element matrices via the shared
    ``jacfwd(grad(local))`` autodiff, with a fused-reassembly core when the
    term carries data fields."""
    zeros = jnp.zeros(ntot, _float_dtype())
    mat_fn = jax.jacfwd(jax.grad(local, argnums=1), argnums=0)
    fn = jax.jit(jax.vmap(lambda c: mat_fn(zeros, zeros, c)))
    mats = fn(data_fn())
    segs, mats, keep = _prune_batch(segs, mats)
    if not segs:
        return None
    if not fn_data:
        return Batch(segs, mats)
    core = jax.jit(
        lambda arrays, _f=fn, _d=data_fn, _k=keep: (
            _f(_d(arrays)) if _k is None else _f(_d(arrays))[:, _k][:, :, _k]
        )
    )

    def rebuild(core=core, fn_data=fn_data):
        return core({k: f.data for k, f in fn_data.items()})

    return Batch(segs, mats, rebuild=rebuild, rebuild_core=core,
                 rebuild_data=fn_data)


# ------------------------------------------------------------ entry points
def assemble_operator(
    system: System,
    mesh: UMesh,
    cell_terms: Sequence[Tuple[CellTerm, Dict]] = (),
    facet_terms: Sequence[Tuple[FacetTerm, Dict]] = (),
    boundary_terms: Sequence[Tuple[BoundaryTerm, Dict]] = (),
    cell_tags=None,
    facet_tags=None,
) -> Operator:
    """Assemble a bilinear operator on an imported mesh — same term lists
    and integrand signatures as :func:`phifem_tpu.assembly.assemble_operator`
    (``term.uniform`` is ignored: irregular geometry has no orientation
    classes)."""
    batches: List[Batch] = []

    for term, data in cell_terms:
        data = _normalize_data(data)
        cells = _region_cells_u(mesh, cell_tags, term.region)
        if len(cells) == 0:
            continue
        local, cell_data, ntot, _, fn_data = _u_cell_local_fn(
            system, term, mesh, data, cells
        )
        b = _mat_batch(system, local, cell_data, ntot, fn_data,
                       _segments_u(system, cells))
        if b is not None:
            batches.append(b)

    for term, data in facet_terms:
        data = _normalize_data(data)
        facets, c0, c1, normals = _interior_facets(mesh, facet_tags, term.region)
        if len(facets) == 0:
            continue
        local, facet_data, ntot, _, fn_data = _u_facet_local_fn(
            system, term, mesh, data, facets, (c0, c1), normals
        )
        segs = _segments_u(system, c0) + _segments_u(system, c1)
        b = _mat_batch(system, local, facet_data, ntot, fn_data, segs)
        if b is not None:
            batches.append(b)

    for term, data in boundary_terms:
        data = _normalize_data(data)
        fl: USideList = term.facets
        if fl.num_facets == 0:
            continue
        local, facet_data, ntot, _, fn_data = _u_facet_local_fn(
            system, term, mesh, data, fl.facets, (fl.cells,), fl.normals
        )
        b = _mat_batch(system, local, facet_data, ntot, fn_data,
                       _segments_u(system, fl.cells))
        if b is not None:
            batches.append(b)

    op = Operator(system, batches)
    op._tap_unsupported = True  # no lattice behind an imported mesh
    return op


def assemble_vector(
    system: System,
    mesh: UMesh,
    cell_terms: Sequence[Tuple[CellTerm, Dict]] = (),
    facet_terms: Sequence[Tuple[FacetTerm, Dict]] = (),
    boundary_terms: Sequence[Tuple[BoundaryTerm, Dict]] = (),
    cell_tags=None,
    facet_tags=None,
) -> Dict[str, Array]:
    """Assemble a linear form on an imported mesh (integrand signatures as
    :func:`phifem_tpu.assembly.assemble_vector`)."""
    b = system.zeros()

    def _accumulate(local, data_fn, ntot, segs):
        zeros = jnp.zeros(ntot, _float_dtype())
        vec_fn = jax.grad(lambda v, c: local(None, v, c), argnums=0)
        vecs = jax.jit(jax.vmap(lambda c: vec_fn(zeros, c)))(data_fn())
        return Batch(segs, None).scatter_add(b, vecs)

    for term, data in cell_terms:
        data = _normalize_data(data)
        cells = _region_cells_u(mesh, cell_tags, term.region)
        if len(cells) == 0:
            continue
        local, cell_data, ntot, _, _ = _u_cell_local_fn(
            system, term, mesh, data, cells
        )
        b = _accumulate(local, cell_data, ntot, _segments_u(system, cells))

    for term, data in facet_terms:
        data = _normalize_data(data)
        facets, c0, c1, normals = _interior_facets(mesh, facet_tags, term.region)
        if len(facets) == 0:
            continue
        local, facet_data, ntot, _, _ = _u_facet_local_fn(
            system, term, mesh, data, facets, (c0, c1), normals
        )
        segs = _segments_u(system, c0) + _segments_u(system, c1)
        b = _accumulate(local, facet_data, ntot, segs)

    for term, data in boundary_terms:
        data = _normalize_data(data)
        fl: USideList = term.facets
        if fl.num_facets == 0:
            continue
        local, facet_data, ntot, _, _ = _u_facet_local_fn(
            system, term, mesh, data, fl.facets, (fl.cells,), fl.normals
        )
        b = _accumulate(local, facet_data, ntot, _segments_u(system, fl.cells))

    return b


def assemble_scalar(
    mesh: UMesh,
    cell_terms: Sequence[Tuple[CellTerm, Dict]] = (),
    boundary_terms: Sequence[Tuple[BoundaryTerm, Dict]] = (),
    cell_tags=None,
) -> Array:
    """Assemble a functional on an imported mesh (integrand signatures as
    :func:`phifem_tpu.assembly.assemble_scalar`: cell ``(data, x, ctx)``,
    boundary ``(data, x, n, ctx)``)."""
    sys0 = System({})
    total = jnp.zeros((), _float_dtype())

    for term, data in cell_terms:
        data = _normalize_data(data)
        cells = _region_cells_u(mesh, cell_tags, term.region)
        if len(cells) == 0:
            continue
        wrapped = CellTerm(
            lambda v, d, x, ctx, _t=term: _t.integrand(d, x, ctx),
            term.region,
            degree=term.degree,
        )
        local, cell_data, _, _, _ = _u_cell_local_fn(
            sys0, wrapped, mesh, data, cells
        )
        vals = jax.jit(
            jax.vmap(lambda c: local(None, jnp.zeros(0, _float_dtype()), c))
        )(cell_data())
        total = total + jnp.sum(vals)

    for term, data in boundary_terms:
        data = _normalize_data(data)
        fl: USideList = term.facets
        if fl.num_facets == 0:
            continue
        wrapped = BoundaryTerm(
            lambda v, d, x, n, ctx, _t=term: _t.integrand(d, x, n, ctx),
            fl,
            npts=term.npts,
        )
        local, facet_data, _, _, _ = _u_facet_local_fn(
            sys0, wrapped, mesh, data, fl.facets, (fl.cells,), fl.normals
        )
        vals = jax.jit(
            jax.vmap(lambda c: local(None, jnp.zeros(0, _float_dtype()), c))
        )(facet_data())
        total = total + jnp.sum(vals)

    return total
