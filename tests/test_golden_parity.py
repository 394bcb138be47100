"""Cross-implementation golden-file parity with the reference.

The reference commits 385 CSV benchmarks of bit-exact (cell, facet) tags
(``tests/test_compute_meshtags.py:239-243``).  Five of its seven geometries
live on structured meshes we can reproduce exactly (square_quad = 30x30
quads on [-1.5,1.5]^2, square_tri = the same with right-diagonal triangles,
coarse_square = 3x3 triangles on [0,1]^2 — verified from the committed h5
geometry).  Reference cell numbering differs from ours, so cells are
matched through their centroids (bijective on a structured grid); cell tags
are then compared **per cell, exactly**.  Facet numbering is dolfinx-
internal and not recoverable, so facet parity is checked as exact tag
histograms.

Runs only if the reference checkout is present (skipped otherwise).
"""

import os

import numpy as np
import pytest

import phifem_tpu as pf
from phifem_tpu import Grid, Space, compute_tags_measures, interpolate

REF = "/root/reference/tests/tests_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

SQ = ((-1.5, -1.5), (1.5, 1.5))


def ref_cell_map(mesh_name, grid):
    """reference cell id -> our cell id, via centroids."""
    import h5py

    with h5py.File(os.path.join(REF, mesh_name + ".h5")) as f:
        topo = np.asarray(f["Mesh/mesh/topology"])
        geo = np.asarray(f["Mesh/mesh/geometry"])
    cent = geo[topo].mean(axis=1)
    rx = (cent[:, 0] - grid.x0) / grid.hx
    ry = (cent[:, 1] - grid.y0) / grid.hy
    ix = np.clip(np.floor(rx).astype(int), 0, grid.nx - 1)
    iy = np.clip(np.floor(ry).astype(int), 0, grid.ny - 1)
    block = iy * grid.nx + ix
    if grid.is_simplex:
        r, s = rx - ix, ry - iy
        which = (s > r).astype(int)  # upper triangle above the diagonal
        mine = 2 * block + which
    else:
        mine = block
    assert len(np.unique(mine)) == grid.num_cells  # bijection sanity
    return mine


def ref_facet_map(mesh_name, grid):
    """reference (dolfinx) facet id -> our facet id.

    dolfinx numbers mesh entities by the lexicographic order of their
    sorted vertex tuples (topologycomputation.cpp sorts the per-cell
    entity keys before deduplicating), and the committed h5 topology is
    in dolfinx's internal cell/vertex order — so the reference facet
    numbering is exactly reproducible from the h5 file: build every
    cell edge as a sorted vertex pair, unique them (numpy's unique is
    lexicographic), and match midpoints to our grid facets.  Verified
    bit-exact on all 5 structured geometries (0 mismatches), closing
    the per-facet parity gap vs ``test_compute_meshtags.py:242-243``.
    """
    import h5py

    with h5py.File(os.path.join(REF, mesh_name + ".h5")) as f:
        topo = np.asarray(f["Mesh/mesh/topology"])
        geo = np.asarray(f["Mesh/mesh/geometry"])
    if topo.shape[1] == 3:  # triangle: edge i opposite vertex i
        le = np.array([[1, 2], [0, 2], [0, 1]])
    else:  # quadrilateral: XDMF/VTK ring vertex order
        le = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
    edges = np.sort(topo[:, le].reshape(-1, 2), axis=1)
    uniq = np.unique(edges, axis=0)  # lexicographic == dolfinx order
    ref_mids = geo[uniq].mean(axis=1)[:, :2]

    ep = np.asarray(grid.facet_endpoints_np)
    my_mids = 0.5 * (ep[:, 0, :] + ep[:, 1, :])

    # integer half-cell lattice keys (every facet midpoint is a multiple
    # of h/2 from the origin on a structured grid)
    def key(m):
        kx = np.round((m[:, 0] - grid.x0) * 2.0 / grid.hx).astype(np.int64)
        ky = np.round((m[:, 1] - grid.y0) * 2.0 / grid.hy).astype(np.int64)
        return kx, ky

    kx, ky = key(my_mids)
    lookup = {k: i for i, k in enumerate(zip(kx.tolist(), ky.tolist()))}
    rx, ry = key(ref_mids)
    fmap = np.array([lookup[k] for k in zip(rx.tolist(), ry.tolist())])
    assert len(np.unique(fmap)) == grid.num_facets  # bijection sanity
    return fmap


import jax.numpy as jnp


def ls_circle_in_square(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 - 0.125


def ls_square_in_square(x):
    return jnp.maximum(jnp.abs(x[..., 0]), jnp.abs(x[..., 1])) - 1.0


def ls_ellipse(x):
    return x[..., 0] ** 2 + (0.3 * x[..., 1] - 0.1) ** 2 - 0.65


def ls_circle_near_boundary(x):
    return (x[..., 0] - 0.5) ** 2 + (x[..., 1] - 0.5) ** 2 - 0.2


def ls_nasty(x):
    a = jnp.abs(jnp.arctan2(x[..., 1], x[..., 0]))
    r = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
    return r * (a * jnp.sin(1.0 / a)) - 0.25


CASES = [
    ("circle_in_square", "square_quad", "quadrilateral", SQ, 30, ls_circle_in_square),
    ("square_in_square", "square_tri", "triangle", SQ, 30, ls_square_in_square),
    ("ellipse_in_square", "square_quad", "quadrilateral", SQ, 30, ls_ellipse),
    (
        "circle_near_boundary",
        "coarse_square",
        "triangle",
        ((0.0, 0.0), (1.0, 1.0)),
        3,
        ls_circle_near_boundary,
    ),
    ("nasty_levelset", "square_tri", "triangle", SQ, 30, ls_nasty),
]


def _load_csv(name):
    path = os.path.join(REF, name + ".csv")
    if not os.path.exists(path):
        pytest.skip(f"golden file {name}.csv missing")
    return np.loadtxt(path, delimiter=" ")


def _degenerate_cells(grid, ls, degree):
    """Cells where bit-exact parity is not well-defined: a detection point
    lands exactly on {phi = 0} (e.g. the square_in_square interface lies ON
    grid lines) or phi is NaN (the nasty level set on the positive x-axis).
    There the tag is an ULP lottery decided by FMA-contraction differences
    between XLA and the FFCx C kernels — the reference's own tags flip
    across degrees on those cells."""
    from phifem_tpu import levelset as lsmod

    pts = lsmod.detection_points(grid.cell_type, degree)
    vals = np.asarray(lsmod.evaluate_on_cells(grid, ls, pts))
    scale = np.nanmax(np.abs(vals)) or 1.0
    return (np.nanmin(np.abs(vals), axis=1) < 1e-12 * scale) | np.any(
        np.isnan(vals), axis=1
    )


def _check_cells(grid, ls, degree, ours, ref_val, ref_parent_of_mine):
    """Per-cell exact tag comparison with the knife-edge escape: every
    mismatching cell must be degenerate, and the degenerate-mismatch COUNT
    is bounded by the total number of degenerate cells (not a blanket 5%).

    ``ref_parent_of_mine``: our-grid parent cell id per compared entry.
    Returns the mismatch indices (all degenerate if the assert passes)."""
    mismatch = np.where(ours != ref_val)[0]
    if len(mismatch) == 0:
        return mismatch
    degenerate = _degenerate_cells(grid, ls, degree)
    bad = ~degenerate[ref_parent_of_mine[mismatch]]
    assert not bad.any(), (
        f"{int(bad.sum())} non-degenerate cell-tag mismatches, e.g. "
        f"ref {ref_val[mismatch[bad][:5]]} vs ours {ours[mismatch[bad][:5]]}"
    )
    assert len(mismatch) <= int(degenerate.sum()), (
        len(mismatch),
        int(degenerate.sum()),
    )
    return mismatch


def _check_facet_hist(my_vals, gold_vals, slack: int = 0):
    """Exact facet-tag histograms (facet numbering is dolfinx-internal and
    not recoverable); ``slack`` bounds the allowed per-tag deviation when
    knife-edge cells mismatched (each flipped cell moves at most its
    facets between adjacent histogram bins)."""
    ref_hist = {t: int((gold_vals == t).sum()) for t in range(1, 7)}
    my_hist = {t: int((my_vals == t).sum()) for t in range(1, 7)}
    if slack == 0:
        assert my_hist == ref_hist
    else:
        for t in range(1, 7):
            assert abs(my_hist[t] - ref_hist[t]) <= slack, (
                t,
                my_hist,
                ref_hist,
                slack,
            )


@pytest.mark.parametrize("degree", [1, 2, 3])
@pytest.mark.parametrize("discretize", [False, True])
@pytest.mark.parametrize("single_layer", [False, True])
@pytest.mark.parametrize(
    "case,mesh_name,cell_type,bbox,n,levelset", CASES, ids=[c[0] for c in CASES]
)
def test_golden_cell_and_facet_tags(
    case, mesh_name, cell_type, bbox, n, levelset, degree, discretize, single_layer
):
    middle = "_"
    if discretize:
        middle += "discretize_"
    if single_layer:
        middle += "single_layer_"
    cells_gold = _load_csv(f"{case}_{degree}{middle}cells_tags")
    facets_gold = _load_csv(f"{case}_{degree}{middle}facets_tags")

    grid = Grid(n, n, bbox, cell_type)
    ls = levelset
    if discretize:
        ls = interpolate(levelset, Space.lagrange(grid, degree))
    res = compute_tags_measures(
        grid, ls, degree, box_mode=True, single_layer_cut=single_layer
    )

    cmap = ref_cell_map(mesh_name, grid)
    mine = res.cells_tags.as_numpy()
    ref_idx = cells_gold[0].astype(int)
    ref_val = cells_gold[1].astype(int)
    ours = mine[cmap[ref_idx]]
    mismatch = _check_cells(grid, ls, degree, ours, ref_val, cmap[ref_idx])

    # per-facet EXACT comparison through the reconstructed dolfinx facet
    # numbering (reference asserts indices+values,
    # test_compute_meshtags.py:242-243).  A facet's tag depends only on
    # its two adjacent cells' tags, so any mismatching facet must touch a
    # knife-edge (degenerate) mismatched cell.
    fmap = ref_facet_map(mesh_name, grid)
    fv = res.facets_tags.as_numpy()
    ref_fidx = facets_gold[0].astype(int)
    ref_fval = facets_gold[1].astype(int)
    f_ours = fv[fmap[ref_fidx]]
    fbad = np.where(f_ours != ref_fval)[0]
    if len(fbad):
        flipped = set(cmap[ref_idx[mismatch]].tolist())
        f2c = grid.f2c_np[fmap[ref_fidx[fbad]]]
        touches = [bool(set(c[c >= 0].tolist()) & flipped) for c in f2c]
        assert all(touches), (
            f"{int(len(touches) - sum(touches))} facet-tag mismatches not "
            f"adjacent to a knife-edge cell"
        )
    # histogram check retained as a cheap independent cross-check
    _check_facet_hist(fv, facets_gold[1], slack=4 * len(mismatch))


@pytest.mark.parametrize("degree", [1, 2, 3])
@pytest.mark.parametrize("discretize", [False, True])
@pytest.mark.parametrize("single_layer", [False, True])
@pytest.mark.parametrize(
    "case,mesh_name,cell_type,bbox,n,levelset", CASES, ids=[c[0] for c in CASES]
)
def test_golden_submesh_tags(
    case, mesh_name, cell_type, bbox, n, levelset, degree, discretize, single_layer
):
    """box_mode=False parity: the reference creates a dolfinx submesh of
    Omega_h = cells{1,2} (sorted parent order, ``mesh_scripts.py:638-645``)
    and transfers tags; our Submesh keeps gather lists in the identical
    sorted-parent order, so submesh cell k maps through the parent-grid
    centroid bijection and tags compare per-cell exact."""
    middle = "_"
    if discretize:
        middle += "discretize_"
    sl = "single_layer_" if single_layer else ""
    parent_gold = _load_csv(f"{case}_{degree}{middle}{sl}cells_tags")
    cells_gold = _load_csv(f"{case}_{degree}{middle}submesh_{sl}cells_tags")
    facets_gold = _load_csv(f"{case}_{degree}{middle}submesh_{sl}facets_tags")

    grid = Grid(n, n, bbox, cell_type)
    ls = levelset
    if discretize:
        ls = interpolate(levelset, Space.lagrange(grid, degree))
    res = compute_tags_measures(
        grid, ls, degree, box_mode=False, single_layer_cut=single_layer
    )
    sm = res.submesh
    assert sm is not None

    # reference parent tags -> its submesh cell ordering (sorted parents
    # tagged 1|2, create_submesh keeps input order)
    ref_parent_idx = parent_gold[0].astype(int)
    ref_parent_val = parent_gold[1].astype(int)
    ref_tags = np.zeros(ref_parent_idx.max() + 1, int)
    ref_tags[ref_parent_idx] = ref_parent_val
    ref_omega = np.sort(ref_parent_idx[np.isin(ref_parent_val, (1, 2))])

    sub_idx = cells_gold[0].astype(int)
    sub_val = cells_gold[1].astype(int)
    assert len(ref_omega) == len(sub_idx)

    cmap = ref_cell_map(mesh_name, grid)
    my_parents = cmap[ref_omega[sub_idx]]  # our parent cell per ref sub cell

    # our submesh membership + transferred tag, looked up via the sorted
    # active-cell gather list
    pos = np.searchsorted(sm.cells, my_parents)
    my_tags = np.asarray(sm.cell_tags.values)
    present = (pos < len(sm.cells)) & (sm.cells[np.minimum(pos, len(sm.cells) - 1)] == my_parents)
    ours = np.where(present, my_tags[np.minimum(pos, len(sm.cells) - 1)], -1)
    mismatch = _check_cells(grid, ls, degree, ours, sub_val, my_parents)

    # membership can only differ on degenerate (knife-edge) cells
    if not present.all():
        degenerate = _degenerate_cells(grid, ls, degree)
        assert degenerate[my_parents[~present]].all()
    # and our submesh must not contain extra non-degenerate cells either
    if len(sm.cells) != len(ref_omega):
        degenerate = _degenerate_cells(grid, ls, degree)
        extra = np.setdiff1d(sm.cells, my_parents)
        assert degenerate[extra].all()

    fv = np.asarray(sm.facet_tags.values)
    _check_facet_hist(fv, facets_gold[1], slack=4 * max(
        len(mismatch), abs(len(sm.cells) - len(ref_omega))
    ) if len(mismatch) or len(sm.cells) != len(ref_omega) else 0)

    # per-facet EXACT submesh comparison (clean cases): dolfinx
    # create_submesh renumbers vertices monotonically, so submesh facet
    # order is the lexicographic order of sorted PARENT vertex pairs —
    # reconstructable from the h5 exactly like ref_facet_map.
    if len(mismatch) == 0 and len(sm.cells) == len(ref_omega):
        import h5py

        with h5py.File(os.path.join(REF, mesh_name + ".h5")) as f:
            topo = np.asarray(f["Mesh/mesh/topology"])
            geo = np.asarray(f["Mesh/mesh/geometry"])
        if topo.shape[1] == 3:
            le = np.array([[1, 2], [0, 2], [0, 1]])
        else:
            le = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
        edges = np.sort(topo[ref_omega][:, le].reshape(-1, 2), axis=1)
        uniq = np.unique(edges, axis=0)  # == ref submesh facet order
        ref_mids = geo[uniq].mean(axis=1)[:, :2]
        assert len(uniq) == len(np.asarray(sm.facets))

        ep = np.asarray(grid.facet_endpoints_np)
        my_mids = 0.5 * (ep[:, 0, :] + ep[:, 1, :])
        kx = np.round((my_mids[:, 0] - grid.x0) * 2 / grid.hx).astype(np.int64)
        ky = np.round((my_mids[:, 1] - grid.y0) * 2 / grid.hy).astype(np.int64)
        lookup = {k: i for i, k in enumerate(zip(kx.tolist(), ky.tolist()))}
        rx = np.round((ref_mids[:, 0] - grid.x0) * 2 / grid.hx).astype(np.int64)
        ry = np.round((ref_mids[:, 1] - grid.y0) * 2 / grid.hy).astype(np.int64)
        parent_fids = np.array([lookup[k] for k in zip(rx.tolist(), ry.tolist())])

        sub_facets = np.asarray(sm.facets)
        order = np.argsort(sub_facets)
        pos = order[np.searchsorted(sub_facets[order], parent_fids)]
        assert (sub_facets[pos] == parent_fids).all()
        np.testing.assert_array_equal(fv[pos], facets_gold[1].astype(fv.dtype))


def test_no_exterior_cells_boundary_fallback():
    """Pins the no-exterior-cells facet fallback (tagging.py boundary rules)
    against the reference's set algebra (``mesh_scripts.py:469-474``): when
    Omega_h covers the whole box, the boundary facets of UNCUT boundary
    cells are tagged 4 (Gamma_h runs along the box edge) and boundary
    facets of cut cells follow the trace rule (2 if the boundary trace
    changes sign, else 4).  Geometry: a circle through the box corners —
    the four corner cells are cut, nothing is exterior."""
    import jax.numpy as jnp

    import phifem_tpu as pf

    grid = Grid(10, 10, ((0.0, 0.0), (1.0, 1.0)), "triangle")
    phi = lambda x: (x[..., 0] - 0.5) ** 2 + (x[..., 1] - 0.5) ** 2 - 0.69**2
    res = compute_tags_measures(grid, phi, 1, box_mode=True)
    ct = res.cells_tags.as_numpy()
    ft = res.facets_tags.as_numpy()
    assert (ct != 3).all()  # no exterior cells anywhere
    assert (ct == 2).any()  # but the corners are cut

    bmask = grid.boundary_facet_mask_np
    f2c = grid.f2c_np
    owner = np.max(f2c, axis=1)
    on_bdry = np.where(bmask)[0]
    for f in on_bdry:
        tag_owner = ct[owner[f]]
        if tag_owner == 1:
            assert ft[f] == 4, (f, ft[f])
        else:
            assert ft[f] in (2, 4), (f, ft[f])
    # the cut corner cells' boundary traces change sign -> their boundary
    # facets are cut facets (tag 2), reference cut_boundary_facets
    cut_owners = on_bdry[ct[owner[on_bdry]] == 2]
    assert (ft[cut_owners] == 2).any()
