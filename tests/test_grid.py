"""Structured-grid connectivity invariants (closed-form index maps must be
mutually consistent — replaces trusting dolfinx topology)."""

import numpy as np
import pytest

from phifem_tpu import CellType, Grid


@pytest.mark.parametrize("cell_type", [CellType.triangle, CellType.quadrilateral])
@pytest.mark.parametrize("nx,ny", [(1, 1), (3, 2), (4, 5)])
def test_c2f_f2c_consistency(cell_type, nx, ny):
    g = Grid(nx, ny, ((-1.0, -2.0), (2.0, 1.0)), cell_type)
    c2f = np.asarray(g.c2f)
    f2c = np.asarray(g.f2c)

    assert c2f.shape == (g.num_cells, g.num_facets_per_cell)
    assert f2c.shape == (g.num_facets, 2)

    # every (cell, facet) pair in c2f appears in f2c and vice versa
    for c in range(g.num_cells):
        for f in c2f[c]:
            assert c in f2c[f], (c, f, f2c[f])
    for f in range(g.num_facets):
        for c in f2c[f]:
            if c >= 0:
                assert f in c2f[c]

    # each interior facet has exactly 2 cells, boundary facets 1
    counts = (f2c >= 0).sum(axis=1)
    n_bdry = int((counts == 1).sum())
    assert n_bdry == 2 * (nx + ny)
    assert np.all(counts >= 1)
    assert np.array_equal(np.asarray(g.boundary_facet_mask), counts == 1)


@pytest.mark.parametrize("cell_type", [CellType.triangle, CellType.quadrilateral])
def test_cell_vertices_geometry(cell_type):
    g = Grid(3, 4, ((0.0, 0.0), (3.0, 2.0)), cell_type)
    coords = np.asarray(g.vertex_coords)
    cv = np.asarray(g.cell_vertices)
    areas_expected = g.cell_volume
    for c in range(g.num_cells):
        pts = coords[cv[c]]
        if cell_type == CellType.triangle:
            a = 0.5 * abs(np.cross(pts[1] - pts[0], pts[2] - pts[0]))
        else:
            a = abs(pts[1, 0] - pts[0, 0]) * abs(pts[2, 1] - pts[0, 1])
        assert np.isclose(a, areas_expected)


@pytest.mark.parametrize("cell_type", [CellType.triangle, CellType.quadrilateral])
def test_facet_normals_point_minus_to_plus(cell_type):
    g = Grid(3, 3, ((0.0, 0.0), (1.0, 1.0)), cell_type)
    f2c = np.asarray(g.f2c)
    normals = np.asarray(g.facet_base_normals)
    mids = np.asarray(g.facet_midpoints)
    centroids = np.asarray(g.cell_midpoints)
    for f in range(g.num_facets):
        c0, c1 = f2c[f]
        if c0 >= 0:
            # normal points away from cell_minus
            assert np.dot(normals[f], mids[f] - centroids[c0]) > 0
        if c1 >= 0:
            assert np.dot(normals[f], centroids[c1] - mids[f]) > 0
        assert np.isclose(np.linalg.norm(normals[f]), 1.0)


def test_facet_lengths_and_boundary_total():
    g = Grid(10, 5, ((0.0, 0.0), (2.0, 1.0)), CellType.triangle)
    lens = np.asarray(g.facet_lengths)
    bmask = np.asarray(g.boundary_facet_mask)
    assert np.isclose(lens[bmask].sum(), 2 * (2.0 + 1.0))


def test_refine():
    g = Grid(4, 4, ((0.0, 0.0), (1.0, 1.0)), CellType.quadrilateral)
    g2 = g.refine()
    assert g2.nx == 8 and g2.ny == 8
    assert np.isclose(g2.hx, g.hx / 2)


@pytest.mark.parametrize("cell_type", [CellType.triangle, CellType.quadrilateral])
def test_map_to_physical_vertices(cell_type):
    import jax.numpy as jnp

    g = Grid(2, 2, ((0.0, 0.0), (1.0, 1.0)), cell_type)
    if cell_type == CellType.triangle:
        ref = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    else:
        ref = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    cells = jnp.arange(g.num_cells)
    phys = np.asarray(g.map_to_physical(cells, ref))
    coords = np.asarray(g.vertex_coords)
    cv = np.asarray(g.cell_vertices)
    for c in range(g.num_cells):
        if cell_type == CellType.triangle:
            expect = coords[cv[c]]  # local order p0,p1,p2 matches ref order
            assert np.allclose(phys[c], expect)
        else:
            # ref order (00,10,01,11) matches local vertex order
            assert np.allclose(phys[c], coords[cv[c]])
