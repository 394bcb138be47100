"""Mesh/field I/O: XDMF+HDF5 and VTU writers, npz checkpoints.

Replaces ``dolfinx.io.XDMFFile`` usage (reference N12:
``demo/weak-dirichlet/flower/main.py:193-195``, ``tests/utils_test.py:27-33``)
with host-side writers for the structured grid.  Checkpoints use npz
(solution, tags, iterate) per SURVEY.md section 5.
"""

from __future__ import annotations

import base64
import os
import struct
from typing import Dict, Optional, Union

import numpy as np

from ..grid import Grid
from ..spaces import Function, Space, interpolate


def _p1_point_data(fn: Function) -> np.ndarray:
    """Field values at grid vertices (P1 view for visualization; higher
    degrees are interpolated down like the reference's ``save_function``,
    ``demo/interface-elasticity/main.py:50-76``)."""
    g = fn.space.grid
    if fn.space.element.family == "Lagrange" and fn.space.degree == 1:
        vals = np.asarray(fn.data)
    else:
        p1 = Space.lagrange(g, 1, fn.space.value_shape)
        vals = np.asarray(interpolate(fn, p1).data)
    return vals


def write_vtu(
    path: Union[str, os.PathLike],
    grid: Grid,
    point_data: Optional[Dict[str, Function]] = None,
    cell_data: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Write an ASCII VTU (ParaView) file with optional vertex fields
    (Functions, downsampled to P1) and per-cell arrays (e.g. tags)."""
    coords = np.asarray(grid.vertex_coords)
    conn = np.asarray(grid.cell_vertices)
    ncells, nloc = conn.shape
    vtk_type = 5 if grid.is_simplex else 8  # VTK_TRIANGLE / VTK_PIXEL
    if not grid.is_simplex:
        # VTK_PIXEL wants (00,10,01,11) — our local order already is
        pass
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">',
        "<UnstructuredGrid>",
        f'<Piece NumberOfPoints="{len(coords)}" NumberOfCells="{ncells}">',
        "<Points>",
        '<DataArray type="Float64" NumberOfComponents="3" format="ascii">',
    ]
    pts3 = np.column_stack([coords, np.zeros(len(coords))])
    lines.append(" ".join(f"{v:.17g}" for v in pts3.reshape(-1)))
    lines += ["</DataArray>", "</Points>", "<Cells>"]
    lines.append('<DataArray type="Int64" Name="connectivity" format="ascii">')
    lines.append(" ".join(map(str, conn.reshape(-1))))
    lines.append("</DataArray>")
    lines.append('<DataArray type="Int64" Name="offsets" format="ascii">')
    lines.append(" ".join(map(str, (np.arange(1, ncells + 1) * nloc))))
    lines.append("</DataArray>")
    lines.append('<DataArray type="UInt8" Name="types" format="ascii">')
    lines.append(" ".join([str(vtk_type)] * ncells))
    lines.append("</DataArray>")
    lines.append("</Cells>")

    lines.append("<PointData>")
    for name, fn in (point_data or {}).items():
        vals = _p1_point_data(fn)
        ncomp = 1 if vals.ndim == 1 else int(np.prod(vals.shape[1:]))
        lines.append(
            f'<DataArray type="Float64" Name="{name}" NumberOfComponents="{ncomp}" format="ascii">'
        )
        lines.append(" ".join(f"{v:.17g}" for v in vals.reshape(-1)))
        lines.append("</DataArray>")
    lines.append("</PointData>")

    lines.append("<CellData>")
    for name, arr in (cell_data or {}).items():
        arr = np.asarray(arr)
        lines.append(
            f'<DataArray type="Float64" Name="{name}" NumberOfComponents="1" format="ascii">'
        )
        lines.append(" ".join(f"{float(v):.17g}" for v in arr.reshape(-1)))
        lines.append("</DataArray>")
    lines.append("</CellData>")

    lines += ["</Piece>", "</UnstructuredGrid>", "</VTKFile>"]
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))


def write_vtu_umesh(
    path: Union[str, os.PathLike],
    mesh,
    point_data: Optional[Dict[str, np.ndarray]] = None,
    cell_data: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """ASCII VTU for an imported mesh (:class:`~phifem_tpu.umesh.UMesh`
    triangles/quads or :class:`~phifem_tpu.umesh3.UMesh3` tets) — the
    unstructured twin of :func:`write_vtu` (the reference writes every
    solution via dolfinx ``XDMFFile``, e.g.
    ``demo/weak-dirichlet/flower/main.py:193-195``).

    ``point_data`` values are per-vertex arrays or ``UFunction``s (whose
    leading ``num_vertices`` coefficients are the vertex values for
    Lagrange spaces — the P1 head of the DoF layout)."""
    verts = np.asarray(mesh.verts, np.float64)
    conn = np.asarray(mesh.cells)
    ncells, nloc = conn.shape
    dim = verts.shape[1]
    vtk_type = {(2, 3): 5, (2, 4): 9, (3, 4): 10}[(dim, nloc)]

    def _vertex_values(v):
        data = getattr(v, "data", v)
        arr = np.asarray(data)
        return arr[: mesh.num_vertices]

    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">',
        "<UnstructuredGrid>",
        f'<Piece NumberOfPoints="{len(verts)}" NumberOfCells="{ncells}">',
        "<Points>",
        '<DataArray type="Float64" NumberOfComponents="3" format="ascii">',
    ]
    pts3 = np.column_stack([verts] + [np.zeros(len(verts))] * (3 - dim))
    lines.append(" ".join(f"{v:.17g}" for v in pts3.reshape(-1)))
    lines += ["</DataArray>", "</Points>", "<Cells>"]
    lines.append('<DataArray type="Int64" Name="connectivity" format="ascii">')
    lines.append(" ".join(map(str, conn.reshape(-1))))
    lines.append("</DataArray>")
    lines.append('<DataArray type="Int64" Name="offsets" format="ascii">')
    lines.append(" ".join(map(str, (np.arange(1, ncells + 1) * nloc))))
    lines.append("</DataArray>")
    lines.append('<DataArray type="UInt8" Name="types" format="ascii">')
    lines.append(" ".join([str(vtk_type)] * ncells))
    lines.append("</DataArray>")
    lines.append("</Cells>")

    lines.append("<PointData>")
    for name, v in (point_data or {}).items():
        vals = _vertex_values(v)
        ncomp = 1 if vals.ndim == 1 else int(np.prod(vals.shape[1:]))
        lines.append(
            f'<DataArray type="Float64" Name="{name}" NumberOfComponents="{ncomp}" format="ascii">'
        )
        lines.append(" ".join(f"{float(x):.17g}" for x in np.asarray(vals).reshape(-1)))
        lines.append("</DataArray>")
    lines.append("</PointData>")

    lines.append("<CellData>")
    for name, arr in (cell_data or {}).items():
        arr = np.asarray(arr)
        lines.append(
            f'<DataArray type="Float64" Name="{name}" NumberOfComponents="1" format="ascii">'
        )
        lines.append(" ".join(f"{float(x):.17g}" for x in arr.reshape(-1)))
        lines.append("</DataArray>")
    lines.append("</CellData>")

    lines += ["</Piece>", "</UnstructuredGrid>", "</VTKFile>"]
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines))


def write_xdmf(
    path: Union[str, os.PathLike],
    grid: Grid,
    point_data: Optional[Dict[str, Function]] = None,
    cell_data: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """Write XDMF + HDF5 (same on-disk format family as the reference's
    ``XDMFFile``).  Requires h5py; falls back to VTU if unavailable."""
    try:
        import h5py
    except ImportError:  # pragma: no cover
        write_vtu(os.path.splitext(str(path))[0] + ".vtu", grid, point_data, cell_data)
        return

    path = str(path)
    h5path = os.path.splitext(path)[0] + ".h5"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    coords = np.asarray(grid.vertex_coords)
    conn = np.asarray(grid.cell_vertices).astype(np.int64)
    topo_type = "Triangle" if grid.is_simplex else "Quadrilateral"
    if not grid.is_simplex:
        # XDMF quadrilaterals are counter-clockwise (00,10,11,01)
        conn = conn[:, [0, 1, 3, 2]]

    with h5py.File(h5path, "w") as h5:
        h5["/Mesh/geometry"] = coords
        h5["/Mesh/topology"] = conn
        for name, fn in (point_data or {}).items():
            h5[f"/Function/{name}"] = _p1_point_data(fn)
        for name, arr in (cell_data or {}).items():
            h5[f"/CellData/{name}"] = np.asarray(arr)

    h5name = os.path.basename(h5path)
    attrs = []
    for name, fn in (point_data or {}).items():
        vals = _p1_point_data(fn)
        ncomp = 1 if vals.ndim == 1 else int(np.prod(vals.shape[1:]))
        atype = "Scalar" if ncomp == 1 else "Vector"
        attrs.append(
            f'<Attribute Name="{name}" AttributeType="{atype}" Center="Node">'
            f'<DataItem Dimensions="{len(coords)} {ncomp}" Format="HDF">'
            f"{h5name}:/Function/{name}</DataItem></Attribute>"
        )
    for name, arr in (cell_data or {}).items():
        arr = np.asarray(arr)
        attrs.append(
            f'<Attribute Name="{name}" AttributeType="Scalar" Center="Cell">'
            f'<DataItem Dimensions="{len(arr)}" Format="HDF">'
            f"{h5name}:/CellData/{name}</DataItem></Attribute>"
        )
    xml = f"""<?xml version="1.0"?>
<Xdmf Version="3.0">
  <Domain>
    <Grid Name="mesh" GridType="Uniform">
      <Topology TopologyType="{topo_type}" NumberOfElements="{len(conn)}">
        <DataItem Dimensions="{len(conn)} {conn.shape[1]}" Format="HDF">{h5name}:/Mesh/topology</DataItem>
      </Topology>
      <Geometry GeometryType="XY">
        <DataItem Dimensions="{len(coords)} 2" Format="HDF">{h5name}:/Mesh/geometry</DataItem>
      </Geometry>
      {"".join(attrs)}
    </Grid>
  </Domain>
</Xdmf>
"""
    with open(path, "w") as f:
        f.write(xml)


def save_checkpoint(path, **arrays) -> None:
    """npz snapshot of solver state (solution, tags, iterate) — the
    checkpoint/resume analogue from SURVEY.md section 5."""
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_checkpoint(path) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def write_vti(
    path: Union[str, os.PathLike],
    grid3,
    point_data: Optional[Dict[str, np.ndarray]] = None,
    cell_data: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    """VTK ImageData (.vti) writer for :class:`phifem_tpu.grid3.Grid3` —
    the natural format for the structured 3D vertex lattice (ParaView-
    compatible, ascii).  ``point_data``: name -> (D, R, C) or flat vertex
    arrays; ``cell_data``: name -> (nz, ny, nx) or flat cell arrays."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    D, R, C = grid3.lattice_shape
    (x0, y0, z0), _ = grid3.bbox
    hx, hy, hz = grid3.spacing

    def _fmt(arr, shape):
        a = np.asarray(arr, np.float64).reshape(shape + (-1,))
        ncomp = a.shape[-1]
        return a.reshape(-1, ncomp), ncomp

    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="ImageData" version="0.1" byte_order="LittleEndian">',
        f'  <ImageData WholeExtent="0 {C - 1} 0 {R - 1} 0 {D - 1}" '
        f'Origin="{x0} {y0} {z0}" Spacing="{hx} {hy} {hz}">',
        f'    <Piece Extent="0 {C - 1} 0 {R - 1} 0 {D - 1}">',
    ]

    def _section(tag, data, shape):
        if not data:
            lines.append(f"      <{tag}/>")
            return
        lines.append(f"      <{tag}>")
        for name, arr in data.items():
            vals, ncomp = _fmt(arr, shape)
            lines.append(
                f'        <DataArray type="Float64" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">'
            )
            lines.append(
                "          "
                + " ".join(f"{v:.10g}" for v in vals.reshape(-1))
            )
            lines.append("        </DataArray>")
        lines.append(f"      </{tag}>")

    # VTK ImageData ravels x fastest, matching the (D, R, C) lattice order
    _section("PointData", point_data or {}, (D, R, C))
    _section("CellData", cell_data or {}, (grid3.nz, grid3.ny, grid3.nx))
    lines += ["    </Piece>", "  </ImageData>", "</VTKFile>", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


def save_tags(path, mesh, tags) -> None:
    """Dump entity tags for visual debugging — the analogue of the
    reference's test util (``tests/utils_test.py:6-37``: MeshTags written
    as a DG0 function to XDMF).  Cell tags become per-cell VTU data on
    either a structured :class:`~phifem_tpu.grid.Grid` or an imported
    ``UMesh``/``UMesh3``."""
    from ..grid import Grid as _Grid

    values = np.asarray(getattr(tags, "values", tags))
    if isinstance(mesh, _Grid):
        write_vtu(path, mesh, cell_data={"tags": values})
    else:
        write_vtu_umesh(path, mesh, cell_data={"tags": values})


def save_levelset(path, mesh, levelset) -> None:
    """Dump a callable (or discrete) level set as a vertex field — the
    analogue of the reference's ``save_levelset`` test util
    (``tests/utils_test.py:40-57``)."""
    import jax.numpy as jnp

    from ..grid import Grid as _Grid

    if isinstance(mesh, _Grid):
        pts = np.asarray(mesh.vertex_coords)
    else:
        pts = np.asarray(mesh.verts)
    if callable(levelset):
        vals = np.asarray(levelset(jnp.asarray(pts)))
    else:
        vals = np.asarray(getattr(levelset, "data", levelset))[: len(pts)]
    if isinstance(mesh, _Grid):
        from ..spaces import Function, Space

        write_vtu(
            path, mesh,
            point_data={"phi": Function(Space.lagrange(mesh, 1), jnp.asarray(vals))},
        )
    else:
        write_vtu_umesh(path, mesh, point_data={"phi": vals})
