"""Tagging semantics: sign classification, single-layer cut, facet rules,
one-sided measures (reference oracles from tests/test_one_sided_integral.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from phifem_tpu import (
    CellType,
    Grid,
    Space,
    compute_tags_measures,
    interpolate,
    tag_cells,
    tag_facets,
)

SQUARE = ((-1.5, -1.5), (1.5, 1.5))


def circle(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 - 0.125


def halfplane(x):
    return x[..., 0] + 0.35


def square_ls(x, r=0.35):
    return jnp.maximum(jnp.abs(x[..., 0]), jnp.abs(x[..., 1])) - r


@pytest.mark.parametrize("cell_type", [CellType.triangle, CellType.quadrilateral])
@pytest.mark.parametrize("deg", [1, 2, 3])
def test_cell_tags_circle(cell_type, deg):
    g = Grid(30, 30, SQUARE, cell_type)
    tags = np.asarray(tag_cells(g, circle, deg))
    mids = np.asarray(g.cell_midpoints)
    r = np.sqrt((mids**2).sum(-1))
    rad = np.sqrt(0.125)
    margin = g.cell_diameter
    # far inside/outside cells must be classified unambiguously
    assert np.all(tags[r < rad - margin] == 1)
    assert np.all(tags[r > rad + margin] == 3)
    assert np.any(tags == 2)
    # cut cells hug the interface
    cut = tags == 2
    assert np.all(np.abs(r[cut] - rad) < 1.5 * margin)


@pytest.mark.parametrize("cell_type", [CellType.triangle, CellType.quadrilateral])
def test_facet_tags_partition(cell_type):
    g = Grid(20, 20, SQUARE, cell_type)
    ct = tag_cells(g, circle, 1)
    ft = np.asarray(tag_facets(g, ct, circle, 1))
    ctn = np.asarray(ct)
    f2c = np.asarray(g.f2c)
    # facet-tag consistency with neighbour cell tags
    for f in range(g.num_facets):
        c0, c1 = f2c[f]
        if c0 >= 0 and c1 >= 0:
            pair = tuple(sorted((ctn[c0], ctn[c1])))
            expect = {(1, 1): 1, (1, 2): 3, (1, 3): 6, (2, 2): 2, (2, 3): 4, (3, 3): 5}
            assert ft[f] == expect[pair], (f, pair, ft[f])
        else:
            owner = max(c0, c1)
            assert ft[f] in {1, 2, 4, 5}
            if ctn[owner] == 3:
                assert ft[f] == 5
            if ctn[owner] == 1:
                assert ft[f] == 1  # has exterior cells -> interior-cell bdry = 1


def test_facet_tags_no_exterior():
    # levelset negative everywhere: whole box inside => boundary facets tag 4
    g = Grid(8, 8, SQUARE, CellType.quadrilateral)
    ct = tag_cells(g, lambda x: -jnp.ones(x.shape[:-1]), 1)
    assert np.all(np.asarray(ct) == 1)
    ft = np.asarray(tag_facets(g, ct, lambda x: -jnp.ones(x.shape[:-1]), 1))
    bmask = np.asarray(g.boundary_facet_mask)
    assert np.all(ft[bmask] == 4)
    assert np.all(ft[~bmask] == 1)


def test_single_layer_cut_removes_isolated():
    # thin spike levelset creating cut cells with no interior neighbours:
    # a tiny circle smaller than a cell => cut cells but no interior cells
    g = Grid(10, 10, ((0.0, 0.0), (1.0, 1.0)), CellType.quadrilateral)

    # circle of radius ~0.045 centered on a cell edge: crosses the edge so
    # boundary detection points see both signs, but no full cell boundary is
    # inside it -> cut cells exist, interior cells do not
    def tiny(x):
        return (x[..., 0] - 0.5) ** 2 + (x[..., 1] - 0.55) ** 2 - 0.002

    t0 = np.asarray(tag_cells(g, tiny, 3, single_layer_cut=False))
    assert np.any(t0 == 2) and not np.any(t0 == 1)
    t1 = np.asarray(tag_cells(g, tiny, 3, single_layer_cut=True))
    # with no interior cells at all, every cut cell is isolated -> outside
    assert not np.any(t1 == 2)


def test_single_layer_cut_keeps_connected():
    g = Grid(30, 30, SQUARE, CellType.triangle)
    t0 = np.asarray(tag_cells(g, circle, 1))
    t1 = np.asarray(tag_cells(g, circle, 1, single_layer_cut=True))
    # connected cut layer survives; reclassified cells (if any) become outside
    changed = t0 != t1
    assert np.all(t0[changed] == 2) and np.all(t1[changed] == 3)
    assert np.any(t1 == 2)


# ----------------------------------------------------------- one-sided oracle
# Reference tests/test_one_sided_integral.py: exact analytic boundary sums.
def _one_sided_value(measure, ind, integrand):
    fl = measure(ind)
    n = np.asarray(fl.normals)
    lens = np.asarray(fl.lengths)
    return float(np.sum(lens * integrand(n)))


@pytest.mark.parametrize("deg", [1, 2, 3])
@pytest.mark.parametrize("discretize", [False, True])
def test_one_sided_line_in_square_quad(deg, discretize):
    # reference data_1: levelset x + 0.35 on square_quad; expected [3.0, -3.0]
    g = Grid(30, 30, SQUARE, CellType.quadrilateral)
    ls = halfplane
    if discretize:
        ls = interpolate(halfplane, Space.lagrange(g, deg))
    res = compute_tags_measures(g, ls, deg, box_mode=True)
    val_in = _one_sided_value(res.boundaries_measure, 100, lambda n: n[:, 0] + n[:, 1])
    val_out = _one_sided_value(res.boundaries_measure, 101, lambda n: n[:, 0] + n[:, 1])
    assert np.isclose(val_in, 3.0, atol=1e-12)
    assert np.isclose(val_out, -3.0, atol=1e-12)


@pytest.mark.parametrize("deg", [1, 2, 3])
@pytest.mark.parametrize("discretize", [False, True])
def test_one_sided_square_in_square_quad(deg, discretize):
    # reference data_2: max(|x|,|y|) - 0.35 on square_quad; expected [3.2, 2.4]
    g = Grid(30, 30, SQUARE, CellType.quadrilateral)
    ls = lambda x: square_ls(x, 0.35)
    if discretize:
        ls = interpolate(ls, Space.lagrange(g, deg))
    res = compute_tags_measures(g, ls, deg, box_mode=True)
    f = lambda n: np.abs(n[:, 0]) + np.abs(n[:, 1])
    assert np.isclose(_one_sided_value(res.boundaries_measure, 100, f), 3.2, atol=1e-12)
    assert np.isclose(_one_sided_value(res.boundaries_measure, 101, f), 2.4, atol=1e-12)


@pytest.mark.parametrize("deg", [1, 2, 3])
@pytest.mark.parametrize("discretize", [False, True])
def test_one_sided_square_in_square_tri(deg, discretize):
    # reference data_3: max(|x|,|y|) - 0.325 on square_tri; expected [3.2, 2.4]
    g = Grid(30, 30, SQUARE, CellType.triangle)
    ls = lambda x: square_ls(x, 0.325)
    if discretize:
        ls = interpolate(ls, Space.lagrange(g, deg))
    res = compute_tags_measures(g, ls, deg, box_mode=True)
    f = lambda n: np.abs(n[:, 0]) + np.abs(n[:, 1])
    assert np.isclose(_one_sided_value(res.boundaries_measure, 100, f), 3.2, atol=1e-12)
    assert np.isclose(_one_sided_value(res.boundaries_measure, 101, f), 2.4, atol=1e-12)


def test_one_sided_facets_multi_matches_single():
    # the batched-upload path (one device_put for all measures) must build
    # exactly the same entity lists as per-measure one_sided_facets
    from phifem_tpu.measures import one_sided_facets, one_sided_facets_multi
    from phifem_tpu.tagging import tag_cells, tag_facets

    g = Grid(30, 30, SQUARE, CellType.triangle)
    ct = np.asarray(tag_cells(g, circle, 1))
    ft = np.asarray(tag_facets(g, jnp.asarray(ct), circle, 1))
    specs = {
        100: (np.where(ft == 4)[0], (1, 2)),
        101: (np.where(ft == 3)[0], (2, 3)),
    }
    multi = one_sided_facets_multi(g, specs, ct)
    for ind, (fids, side) in specs.items():
        single = one_sided_facets(g, fids, ct, side)
        for attr in ("facets", "cells", "local_facets", "signs"):
            np.testing.assert_array_equal(
                np.asarray(getattr(multi[ind], attr)),
                np.asarray(getattr(single, attr)),
            )


def test_submesh_mode():
    g = Grid(30, 30, SQUARE, CellType.triangle)
    res = compute_tags_measures(g, circle, 1, box_mode=False)
    sub = res.submesh
    assert sub is not None
    parent_tags = np.asarray(tag_cells(g, circle, 1))
    active = np.where((parent_tags == 1) | (parent_tags == 2))[0]
    assert np.array_equal(sub.cells, active)
    assert np.array_equal(sub.cell_tags.as_numpy(), parent_tags[active])
    # exterior boundary of the submesh closes (sum of outward normals == 0)
    n = np.asarray(sub.exterior.normals)
    lens = np.asarray(sub.exterior.lengths)
    assert np.allclose((n * lens[:, None]).sum(axis=0), 0.0, atol=1e-12)


def test_overwrite_tags_reserved():
    g = Grid(10, 10, SQUARE, CellType.quadrilateral)
    with pytest.raises(ValueError):
        compute_tags_measures(
            g, circle, 1, box_mode=True, overwrite={"cells": {2: np.array([0])}}
        )
    res = compute_tags_measures(
        g, circle, 1, box_mode=True, overwrite={"cells": {7: np.array([0, 1])}}
    )
    assert np.all(res.cells_tags.as_numpy()[[0, 1]] == 7)
