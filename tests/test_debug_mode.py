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
