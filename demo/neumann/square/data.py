"""Tilted-square data (reference ``demo/neumann/square/data.py``) in jnp
with ``x: (n, 2)`` convention."""

import jax.numpy as jnp
import numpy as np

TILT = np.pi / 6.0


def _rot(angle, x):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [c * x[..., 0] + s * x[..., 1], -s * x[..., 0] + c * x[..., 1]], axis=-1
    )


def detection_levelset(x):
    y = _rot(TILT - np.pi / 4.0, x)
    return jnp.abs(y[..., 0]) + jnp.abs(y[..., 1]) - np.sqrt(2.0) / 2.0


def levelset(x):
    vect = jnp.full_like(x, 0.5)
    shift = x - _rot(-TILT, vect)
    r = _rot(TILT, shift)
    return -jnp.sin(jnp.pi * r[..., 0]) * jnp.sin(jnp.pi * r[..., 1])


def exact_solution(x):
    r = _rot(TILT, x)
    return jnp.cos(2 * jnp.pi * r[..., 0]) * jnp.cos(2 * jnp.pi * r[..., 1])


def source_term(x):
    return 8.0 * jnp.pi**2 * exact_solution(x) + exact_solution(x)


def neumann_data(x):
    """Piecewise normal derivative of the exact solution on the rotated
    square's four sides (reference data.py:36-54)."""
    r = _rot(TILT, x)
    rx, ry = r[..., 0], r[..., 1]
    dx = -2 * jnp.pi * jnp.sin(2 * jnp.pi * rx) * jnp.cos(2 * jnp.pi * ry)
    dy = -2 * jnp.pi * jnp.cos(2 * jnp.pi * rx) * jnp.sin(2 * jnp.pi * ry)
    vals = dy
    vals = jnp.where(jnp.abs(ry) < rx, dx, vals)
    vals = jnp.where(jnp.abs(rx) < ry, dy, vals)
    vals = jnp.where(jnp.abs(ry) < -rx, dx, vals)
    return vals
