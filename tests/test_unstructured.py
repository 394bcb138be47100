"""Imported (unstructured) mesh tagging: cross-path consistency with the
lattice pipeline + golden parity on the reference's disk-mesh geometries.

The reference runs its tagging suite on an unstructured ``disk.xdmf``
triangle mesh for 2 of its 7 golden geometries
(``tests/test_compute_meshtags.py:28-35``, mesh read at :136-137).  dolfinx
applies a GPS reordering to cells on import, so the golden CSV indices are
an unknown permutation of the file's cell order; tags are
numbering-independent, and parity is asserted two permutation-free ways:

* exact per-config tag histograms (cells, facets, submesh), and
* equality of the **multiset of per-entity tag signatures across all 24
  committed configurations** (2 geometries x degrees 1-3 x discretize x
  single_layer) — every entity's joint tag vector must appear in the
  reference data with the same multiplicity, which couples all configs and
  is strictly stronger than per-config histograms.

The machinery itself is validated bit-exactly against the lattice pipeline
by running structured grids through :class:`UMesh` (same cells, explicit
connectivity) and comparing entity-by-entity.
"""

import os
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import phifem_tpu as pf
from phifem_tpu import Grid, Space, UDiscreteLevelset, UMesh, compute_tags_measures, interpolate

REF = "/root/reference/tests/tests_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

SQ = ((-1.5, -1.5), (1.5, 1.5))


def ls_circle_in_square(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 - 0.125


def ls_ellipse(x):
    return x[..., 0] ** 2 + (0.3 * x[..., 1] - 0.1) ** 2 - 0.65


def ls_circle_near_boundary(x):
    return (x[..., 0] - 0.5) ** 2 + (x[..., 1] - 0.5) ** 2 - 0.2


def ls_circle_in_circle(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 - 0.125


def ls_boundary_crossing(x):
    return x[..., 0] ** 2 + (x[..., 1] + 0.5) ** 2 - 0.125


# --------------------------------------------------------------- I/O
def test_from_xdmf_meshio_layout():
    m = UMesh.from_xdmf(os.path.join(REF, "disk.xdmf"))
    assert m.num_cells == 212 and m.num_vertices == 124 and m.is_simplex
    # Euler characteristic of a disk: V - E + F = 1 (the committed file
    # carries one orphan vertex that no cell references)
    used = len(np.unique(m.cells))
    assert used - m.num_facets + m.num_cells == 1
    assert m.boundary_facet_mask.sum() > 0
    # every interior facet has two distinct cells
    f2c = m.f2c
    inner = ~m.boundary_facet_mask
    assert (f2c[inner, 0] != f2c[inner, 1]).all()


def test_from_xdmf_dolfinx_layout():
    m = UMesh.from_xdmf(os.path.join(REF, "square_quad.xdmf"))
    assert m.num_cells == 900 and not m.is_simplex
    assert np.isclose(m.verts.min(), -1.5) and np.isclose(m.verts.max(), 1.5)


# ----------------------------------------- cross-path (lattice == explicit)
STRUCTURED_CASES = [
    ("quadrilateral", SQ, 30, ls_circle_in_square),
    ("quadrilateral", SQ, 30, ls_ellipse),
    ("triangle", ((0.0, 0.0), (1.0, 1.0)), 3, ls_circle_near_boundary),
    ("triangle", SQ, 30, ls_circle_in_square),
]


@pytest.mark.parametrize("degree", [1, 2, 3])
@pytest.mark.parametrize("discretize", [False, True])
@pytest.mark.parametrize("single_layer", [False, True])
@pytest.mark.parametrize(
    "cell_type,bbox,n,levelset",
    STRUCTURED_CASES,
    ids=["circle_quad", "ellipse_quad", "near_boundary_tri", "circle_tri"],
)
def test_matches_lattice_pipeline(
    cell_type, bbox, n, levelset, degree, discretize, single_layer
):
    """The explicit-mesh pipeline must reproduce the lattice pipeline
    entity-by-entity on the same (structured) mesh, for both operating
    modes — including one-sided measures and the submesh transfer."""
    grid = Grid(n, n, bbox, cell_type)
    um, facet_map = UMesh.from_grid(grid)

    ls_s = levelset
    ls_u = levelset
    if discretize:
        ls_s = interpolate(levelset, Space.lagrange(grid, degree))
        ls_u = UDiscreteLevelset(um, levelset, degree)

    rs = compute_tags_measures(
        grid, ls_s, degree, box_mode=True, single_layer_cut=single_layer
    )
    ru = compute_tags_measures(
        um, ls_u, degree, box_mode=True, single_layer_cut=single_layer
    )

    np.testing.assert_array_equal(
        ru.cells_tags.as_numpy(), rs.cells_tags.as_numpy()
    )
    np.testing.assert_array_equal(
        ru.facets_tags.as_numpy(), rs.facets_tags.as_numpy()[facet_map]
    )

    # one-sided measures: same (cell, parent facet) pair sets, and the
    # chosen-side outward normals agree entry-for-entry
    for ind in (100, 101):
        su, ss = ru.boundaries_measure(ind), rs.boundaries_measure(ind)
        pu = np.stack([np.asarray(su.cells), facet_map[np.asarray(su.facets)]], 1)
        ps = np.stack([np.asarray(ss.cells), np.asarray(ss.facets)], 1)
        ou = np.lexsort(pu.T)
        os_ = np.lexsort(ps.T)
        np.testing.assert_array_equal(pu[ou], ps[os_])
        nu = np.asarray(su.normals)[ou]
        ns = np.asarray(ss.normals)[os_]
        np.testing.assert_allclose(nu, ns, atol=1e-12)

    # submesh mode: same active cells, same transferred tags
    rsub_s = compute_tags_measures(
        grid, ls_s, degree, box_mode=False, single_layer_cut=single_layer
    )
    rsub_u = compute_tags_measures(
        um, ls_u, degree, box_mode=False, single_layer_cut=single_layer
    )
    np.testing.assert_array_equal(rsub_u.submesh.cells, rsub_s.submesh.cells)
    np.testing.assert_array_equal(
        rsub_u.cells_tags.as_numpy(), rsub_s.cells_tags.as_numpy()
    )
    np.testing.assert_array_equal(
        np.sort(facet_map[rsub_u.submesh.facets]), np.sort(rsub_s.submesh.facets)
    )
    # facet tags compared through the parent facet ids
    order_u = np.argsort(facet_map[rsub_u.submesh.facets])
    order_s = np.argsort(rsub_s.submesh.facets)
    np.testing.assert_array_equal(
        rsub_u.facets_tags.as_numpy()[order_u],
        rsub_s.facets_tags.as_numpy()[order_s],
    )


# ------------------------------------------------- disk-mesh golden parity
DISK_CASES = [
    ("circle_in_circle", ls_circle_in_circle),
    ("boundary_crossing_circle", ls_boundary_crossing),
]


def _golden(name):
    path = os.path.join(REF, name + ".csv")
    if not os.path.exists(path):
        pytest.skip(f"golden file {name}.csv missing")
    g = np.loadtxt(path, delimiter=" ")
    idx, val = g[0].astype(int), g[1].astype(int)
    out = np.zeros(idx.max() + 1, np.int64)
    out[idx] = val
    assert len(idx) == len(out)  # golden files cover every entity
    return out


def _disk():
    return UMesh.from_xdmf(os.path.join(REF, "disk.xdmf"))


def _middle(discretize, single_layer):
    m = "_"
    if discretize:
        m += "discretize_"
    if single_layer:
        m += "single_layer_"
    return m


def _all_configs(mesh, what):
    """(my tag matrix, golden tag matrix) with one column per committed
    configuration; rows are entities (mine in file order, golden in
    dolfinx order)."""
    mine, gold = [], []
    for case, ls in DISK_CASES:
        for degree in (1, 2, 3):
            for discretize in (False, True):
                lsd = UDiscreteLevelset(mesh, ls, degree) if discretize else ls
                for single_layer in (False, True):
                    res = compute_tags_measures(
                        mesh, lsd, degree, box_mode=True,
                        single_layer_cut=single_layer,
                    )
                    middle = _middle(discretize, single_layer)
                    mine.append(
                        res.cells_tags.as_numpy()
                        if what == "cells"
                        else res.facets_tags.as_numpy()
                    )
                    gold.append(_golden(f"{case}_{degree}{middle}{what}_tags"))
    return np.stack(mine, 1), np.stack(gold, 1)


@pytest.mark.parametrize("what", ["cells", "facets"])
def test_disk_golden_per_entity_parity(what):
    """PER-ENTITY index-exact golden parity on the imported disk mesh —
    the same assertion the reference makes on its own tags
    (``tests/test_compute_meshtags.py:239-243``).

    dolfinx reorders cells on import (GPS on the dual graph) and numbers
    vertices/facets from the reordered cells; ``dolfinx_order``
    reconstructs that numbering exactly (validated by its identity fixed
    point on the three dolfinx-written structured meshes — see
    ``test_gps_fixed_point_on_dolfinx_written_meshes``).  Every one of
    the 24 committed configurations must then match entity for entity,
    for cells AND facets — strictly stronger than the round-3 signature
    multiset, which could in principle hide compensating
    misclassifications within a signature class."""
    from dolfinx_order import dolfinx_entity_maps

    mesh = _disk()
    M, G = _all_configs(mesh, what)
    assert M.shape == G.shape
    cell_order, facet_map, _ = dolfinx_entity_maps(
        np.asarray(mesh.cells), np.asarray(mesh.facets)
    )
    perm = cell_order if what == "cells" else facet_map
    np.testing.assert_array_equal(M[perm], G)


def test_gps_fixed_point_on_dolfinx_written_meshes():
    """The reconstructed GPS reorder must be the IDENTITY on the three
    structured h5 meshes, which were written by dolfinx in its own
    internal order (re-importing re-reorders; a deterministic reorder is
    a fixed point on its own output) — the independent oracle pinning the
    reconstruction beyond the disk tag configs."""
    import h5py

    from dolfinx_order import gps_cell_order

    for name in ("coarse_square", "square_tri", "square_quad"):
        path = os.path.join(REF, name + ".h5")
        if not os.path.exists(path):
            pytest.skip("reference meshes missing")
        with h5py.File(path) as f:
            topo = np.asarray(f["Mesh/mesh/topology"])
        o = gps_cell_order(topo)
        np.testing.assert_array_equal(o, np.arange(len(o)), err_msg=name)


@pytest.mark.parametrize("case,ls", DISK_CASES, ids=[c[0] for c in DISK_CASES])
@pytest.mark.parametrize("degree", [1, 2, 3])
def test_disk_golden_submesh(case, ls, degree):
    """Submesh parity on the disk mesh: active-cell count, transferred
    cell-tag multiset, and facet-tag histogram against the reference's
    submesh golden files (plain variant)."""
    mesh = _disk()
    res = compute_tags_measures(mesh, ls, degree, box_mode=False)
    sub_gold = _golden(f"{case}_{degree}_submesh_cells_tags")
    fac_gold = _golden(f"{case}_{degree}_submesh_facets_tags")
    sm = res.submesh
    assert sm.num_cells == len(sub_gold)
    np.testing.assert_array_equal(
        np.sort(sm.cell_tags.as_numpy()), np.sort(sub_gold)
    )
    assert len(sm.facets) == len(fac_gold)
    np.testing.assert_array_equal(
        np.bincount(sm.facet_tags.as_numpy(), minlength=8),
        np.bincount(fac_gold, minlength=8),
    )


def test_disk_one_sided_measures():
    """Structural sanity of the one-sided measures on the disk: id-100
    entities sit on Gamma_h seen from Omega_h (tags 1|2), id-101 on the
    ghost boundary seen from the cut side, and all normals are unit and
    outward w.r.t. the chosen cell."""
    mesh = _disk()
    res = compute_tags_measures(mesh, ls_circle_in_circle, 2, box_mode=True)
    ct = res.cells_tags.as_numpy()
    ft = res.facets_tags.as_numpy()
    for ind, ftag, side in ((100, 4, (1, 2)), (101, 3, (2, 3))):
        sl = res.boundaries_measure(ind)
        assert sl.num_facets == int((ft == ftag).sum()) > 0
        assert np.isin(ct[sl.cells], side).all()
        np.testing.assert_allclose(
            np.linalg.norm(sl.normals, axis=1), 1.0, atol=1e-12
        )
        # outward: normal points away from the chosen cell centroid
        mid = mesh.facet_endpoints[sl.facets].mean(axis=1)
        d = mid - mesh.cell_centroids[sl.cells]
        assert ((sl.normals * d).sum(axis=1) > 0).all()
        # dolfinx raveled integration-entity format
        ents = sl.integration_entities()
        assert ents.shape == (2 * sl.num_facets,)
        assert (ents[1::2] < mesh._local_edges.shape[0]).all()


def test_degenerate_cell_warning_unstructured():
    """Reference ``mesh_scripts.py:121-133``: identically-zero detection
    values are forced to cut with a RuntimeWarning."""
    mesh = _disk()
    with pytest.warns(RuntimeWarning, match="identically-zero"):
        res = compute_tags_measures(mesh, lambda x: 0.0 * x[..., 0], 1, box_mode=True)
    assert (res.cells_tags.as_numpy() == 2).all()
