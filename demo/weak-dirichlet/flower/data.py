"""Flower level-set data (reference ``demo/weak-dirichlet/flower/data.py``),
re-expressed in jnp with the framework's ``x: (n, 2)`` convention.

The smooth level set (graded smooth-min composition of a disk and 8 petal
disks, after iquilezles.org's smin) feeds the phi-FEM formulation; the
non-smooth min-composition is used for tagging only (reference comments at
data.py:26, 56).
"""

import jax.numpy as jnp
import numpy as np

_C = 2.0 * (np.cos(np.pi / 8.0) + np.sin(np.pi / 8.0))
_R = np.sqrt(2.0) * 2.0 * (np.sin(np.pi / 8.0) + np.cos(np.pi / 8.0)) * np.sin(np.pi / 8.0)


def _petal_centers():
    i = np.arange(1, 9)
    return _C * np.cos(i * np.pi / 4.0), _C * np.sin(i * np.pi / 4.0)


def _atan_r(x, radius=1.0, slope=1.0):
    r = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
    return jnp.arctan(slope * (r - radius))


def _smin(x, y1, y2, kmin=0.0, kmax=1.0):
    k = kmax * ((jnp.pi / 2.0 - _atan_r(x, radius=2.0, slope=50.0)) / jnp.pi / 2.0) + kmin
    m = jnp.maximum(k, jnp.minimum(y1, y2))
    q = jnp.sqrt(
        jnp.maximum(k - y1, 0.0) ** 2 + jnp.maximum(k - y2, 0.0) ** 2
    )
    return m - q


def levelset(x):
    """Smooth flower level set (formulation only)."""
    val = x[..., 0] ** 2 + x[..., 1] ** 2 - 4.0
    xs, ys = _petal_centers()
    for xi, yi in zip(xs, ys):
        pet = (x[..., 0] - xi) ** 2 + (x[..., 1] - yi) ** 2 - _R**2
        val = _smin(x, val, pet)
    return val


def detection_levelset(x):
    """Non-smooth min-composition (tagging only)."""
    val = x[..., 0] ** 2 + x[..., 1] ** 2 - 4.0
    xs, ys = _petal_centers()
    for xi, yi in zip(xs, ys):
        pet = (x[..., 0] - xi) ** 2 + (x[..., 1] - yi) ** 2 - _R**2
        val = jnp.minimum(val, pet)
    return val


def source_term(x):
    """10 inside the disk of radius r1/sqrt(2) around the first petal."""
    x1 = _C
    d2 = (x[..., 0] - x1) ** 2 + x[..., 1] ** 2
    return jnp.where(d2 <= _R**2 / 2.0, 10.0, 0.0)


def dirichlet_data(x):
    return jnp.zeros(x.shape[:-1])
