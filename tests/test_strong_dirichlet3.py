"""3D strong-Dirichlet phi-FEM (u = phi w): manufactured-solution
convergence on a sphere in the unit box — the z-extension of the 2D S2
tests (the reference is 2D-only)."""

import jax
import jax.numpy as jnp
import numpy as np

from phifem_tpu.grid3 import Grid3
from phifem_tpu.models.strong_dirichlet3 import StrongDirichletPoisson3

R0 = 0.7
BOX = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))


def phi_sphere(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2 - R0**2


def w_ex(x):
    return jnp.cos(x[..., 0] + 0.5 * x[..., 1] - 0.25 * x[..., 2])


def u_exact(x):
    return phi_sphere(x) * w_ex(x)


def f_rhs(x):
    shape = x.shape[:-1]
    p = x.reshape(-1, 3)
    H = jax.vmap(jax.hessian(lambda q: u_exact(q[None])[0]))(p)
    return -jnp.trace(H, axis1=-2, axis2=-1).reshape(shape)


def _solve(n):
    g = Grid3(n, n, n, BOX)
    s = StrongDirichletPoisson3(g).setup(phi_sphere, f_rhs)
    s.assemble()
    r = s.solve(tol=1e-11, maxiter=20000)
    assert r.converged, (n, r.residual, r.iterations)
    return s


def test_strong_dirichlet3_convergence():
    e1 = _solve(8).l2_h1_errors(u_exact)
    e2 = _solve(16).l2_h1_errors(u_exact)
    rate = np.log2(e1["l2"] / e2["l2"])
    assert e2["l2"] < 0.05, (e1, e2)
    assert rate > 1.5, (e1, e2)


def test_strong_dirichlet3_boundary_exact():
    """u_h = phi w vanishes identically on {phi = 0} by construction:
    check u_h at vertices scales with phi (machine-zero where phi = 0)."""
    s = _solve(8)
    u = np.asarray(s.u_lat)
    phi = np.asarray(s.phi_lat)
    assert np.all(np.abs(u[np.abs(phi) < 1e-14]) < 1e-12)
