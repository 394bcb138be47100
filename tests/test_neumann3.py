"""3D Neumann phi-FEM (NeumannPoisson3): manufactured-solution
convergence on a sphere immersed in the unit box — the z-extension of
the 2D S3 tests (the reference is 2D-only)."""

import jax
import jax.numpy as jnp
import numpy as np

import phifem_tpu as pf
from phifem_tpu.grid3 import Grid3
from phifem_tpu.models.neumann3 import NeumannPoisson3

R = 0.7
BOX = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))


def phi_sphere(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2 - R**2


def u_ex(x):
    return jnp.cos(x[..., 0]) * jnp.exp((x[..., 1] + x[..., 2]) / 2.0)


def f_helmholtz(x):
    # -Delta u + u with Delta u = (-1 + 1/4 + 1/4) u = -u/2  ->  f = 3u/2
    return 1.5 * u_ex(x)


def u_neumann(x):
    """du/dn with n = grad(phi)/|grad(phi)| = x/|x|."""
    shape = x.shape[:-1]
    p = x.reshape(-1, 3)
    g = jax.vmap(jax.grad(lambda q: u_ex(q[None])[0]))(p)
    n = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(g * n, axis=-1).reshape(shape)


def _solve(n):
    g = Grid3(n, n, n, BOX)
    s = NeumannPoisson3(g)
    s.setup(phi_sphere, f_helmholtz, u_neumann)
    s.assemble()
    r = s.solve(tol=1e-10, maxiter=20000)
    assert r.converged, (n, r.residual, r.iterations)
    return s


def test_neumann3_convergence():
    e1 = _solve(8).l2_h1_errors(u_ex)
    e2 = _solve(16).l2_h1_errors(u_ex)
    rate = np.log2(e1["l2"] / e2["l2"])
    assert e2["l2"] < 0.02, (e1, e2)
    assert rate > 1.3, (e1, e2)
    # H10 converges at first order
    assert np.log2(e1["h10"] / e2["h10"]) > 0.6, (e1, e2)


def test_neumann3_flux_field_consistency():
    """The mixed flux y must approximate -grad u: check the cellwise
    penalty residual ||y + grad u|| is small relative to ||grad u||."""
    s = _solve(12)
    x = s.result.x
    D, R_, C = s._DRC
    hx, hy, hz = s.grid.spacing
    u3 = x["u"].reshape(D, R_, C)
    # compare channel means on cut cells via the local gathers
    cd = np.asarray(s.cut_dofs)
    from phifem_tpu.models.lattice_core import hex_quadrature

    W, V, G = hex_quadrature(2)
    Gp = G / np.array([hx, hy, hz])[None, None, :]
    ug = np.asarray(x["u"])[cd]  # (ne, 8)
    num = den = 0.0
    for c in range(3):
        yg = np.asarray(x["y"][c])[cd]
        for q in range(W.shape[0]):
            yq = yg @ V[q]
            gq = ug @ Gp[q, :, c]
            num += W[q] * np.sum((yq + gq) ** 2)
            den += W[q] * np.sum(gq**2)
    assert np.sqrt(num / den) < 0.2, np.sqrt(num / den)


def test_neumann3_lattice_preconditioner():
    """Bulk MG + multiplicative interface-block correction keeps outer
    BiCGStab iterations small and ~grid-independent (Jacobi needs 200+);
    ceilings pinned at two sizes so the inner RAS band solve can't
    silently degrade (dense path at n=12, Schwarz band path at n=16)."""
    for n, ceiling in ((12, 10), (16, 25)):
        g = Grid3(n, n, n, BOX)
        s = NeumannPoisson3(g)
        s.setup(phi_sphere, f_helmholtz, u_neumann)
        s.assemble()
        pc = s.lattice_preconditioner()
        r = s.solve(tol=1e-10, maxiter=100, precond=pc)
        assert r.converged, (n, r.residual, r.iterations)
        assert r.iterations <= ceiling, (n, r.iterations)


def test_robin3_lattice_preconditioner():
    from phifem_tpu.models.robin3 import RobinPoisson3

    g = Grid3(16, 16, 16, BOX)
    s = RobinPoisson3(g, robin_coef=1.0)
    s.setup(phi_sphere, f_helmholtz, lambda x: u_neumann(x) + u_ex(x))
    s.assemble()
    r = s.solve(tol=1e-10, maxiter=100, precond=s.lattice_preconditioner())
    assert r.converged and r.iterations <= 15, (r.iterations, r.residual)


def test_robin3_convergence():
    """3D Robin (S4 z-extension): du/dn + alpha u = u_R on the sphere."""
    from phifem_tpu.models.robin3 import RobinPoisson3

    alpha = 1.0

    def robin_data(x):
        return u_neumann(x) + alpha * u_ex(x)

    errs = []
    for n in (8, 16):
        g = Grid3(n, n, n, BOX)
        s = RobinPoisson3(g, robin_coef=alpha)
        s.setup(phi_sphere, f_helmholtz, robin_data)
        s.assemble()
        r = s.solve(tol=1e-10, maxiter=30000)
        assert r.converged, (n, r.residual, r.iterations)
        errs.append(s.l2_h1_errors(u_ex))
    rate = np.log2(errs[0]["l2"] / errs[1]["l2"])
    assert errs[1]["l2"] < 0.05, errs
    assert rate > 1.3, errs
