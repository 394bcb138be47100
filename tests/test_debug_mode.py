"""MODE=debug invariant checks (reference mesh_scripts.py:22-25, 360-374,
499-521): non-emptiness assertions inside tagging."""

import jax.numpy as jnp
import numpy as np
import pytest

import phifem_tpu as pf


def test_debug_invariants(monkeypatch):
    monkeypatch.setenv("MODE", "debug")
    g = pf.Grid(16, 16, ((-1.5, -1.5), (1.5, 1.5)), "triangle")
    # healthy geometry passes
    pf.compute_tags_measures(g, lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 0.5, 1, box_mode=True)
    # all-positive levelset -> no interior cells -> hard error in debug mode
    with pytest.raises(ValueError, match="interior cells"):
        pf.compute_tags_measures(g, lambda x: jnp.ones(x.shape[:-1]), 1, box_mode=True)


def test_no_debug_no_raise(monkeypatch):
    monkeypatch.delenv("MODE", raising=False)
    g = pf.Grid(8, 8, ((-1.5, -1.5), (1.5, 1.5)), "triangle")
    res = pf.compute_tags_measures(g, lambda x: jnp.ones(x.shape[:-1]), 1, box_mode=True)
    assert np.all(res.cells_tags.as_numpy() == 3)


def test_degenerate_cell_runtime_warning():
    """A level set that is identically zero on some cells' detection
    points must classify them as cut AND emit a RuntimeWarning (reference
    degenerate-denominator convention, mesh_scripts.py:121-133)."""
    g = pf.Grid(8, 8, ((0.0, 0.0), (1.0, 1.0)), "triangle")

    # zero on the left half of the box, negative on the right: the left
    # half's detection points all evaluate to exactly 0
    phi = lambda x: jnp.where(x[..., 0] > 0.5, -1.0, 0.0)
    with pytest.warns(RuntimeWarning, match="detection point"):
        res = pf.compute_tags_measures(g, phi, 1, box_mode=True)
        # tags are fetched lazily — the warning fires at the (packed)
        # host synchronization, like every other deferred device value
        ct = res.cells_tags.as_numpy()
    assert np.any(ct == 2)  # degenerate cells forced to cut


def test_healthy_levelset_no_degenerate_warning():
    import warnings as _w

    g = pf.Grid(8, 8, ((-1.5, -1.5), (1.5, 1.5)), "triangle")
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        res = pf.compute_tags_measures(
            g, lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 0.5, 1, box_mode=True
        )
        res.cells_tags.as_numpy()  # force the deferred fetch
