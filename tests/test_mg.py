"""Geometric multigrid: transfer-operator identities + V-cycle-preconditioned
solve matching the dense solution with far fewer iterations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import phifem_tpu as pf
from phifem_tpu.mg import prolong, restrict
from phifem_tpu.models import WeakDirichletPoisson
from phifem_tpu.solvers import solve


def test_transfer_adjointness():
    gf = pf.Grid(8, 8, ((0.0, 0.0), (1.0, 1.0)), "triangle")
    gc = pf.Grid(4, 4, ((0.0, 0.0), (1.0, 1.0)), "triangle")
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.normal(size=gc.num_vertices))
    yf = jnp.asarray(rng.normal(size=gf.num_vertices))
    # <P xc, yf> == <xc, R yf>  (restriction is the prolongation transpose)
    lhs = float(jnp.vdot(prolong(xc, gc, gf), yf))
    rhs = float(jnp.vdot(xc, restrict(yf, gf, gc)))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_prolong_preserves_linears():
    gc = pf.Grid(4, 4, ((0.0, 0.0), (2.0, 1.0)), "quadrilateral")
    gf = gc.refine()
    lin = lambda x: 2.0 * x[..., 0] - 3.0 * x[..., 1] + 1.0
    xc = lin(gc.vertex_coords)
    xf = prolong(xc, gc, gf)
    assert np.allclose(np.asarray(xf), np.asarray(lin(gf.vertex_coords)), atol=1e-12)


def test_mg_preconditioned_s1():
    phi = lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 0.49
    uex = lambda x: jnp.cos(x[..., 0]) * jnp.sin(x[..., 1])
    f = lambda x: 2.0 * uex(x)

    g = pf.Grid(32, 32, ((-1.0, -1.0), (1.0, 1.0)), "triangle")
    s = WeakDirichletPoisson(g, mode="bg")
    s.setup(phi, f, u_D=uex)
    s.assemble()

    vc = s.mg_preconditioner(min_n=8)
    assert len(vc.levels) == 3  # 32 -> 16 -> 8

    # tight iteration budget: the V-cycle must reach 1e-10 where plain
    # (equilibrated-)Jacobi stalls around 1e-4 (measured: mg 8e-13 vs
    # jac 1.2e-4 at 50 iterations)
    res_mg = solve(s.op, s.b, method="bicgstab", tol=1e-10, maxiter=50, precond=vc)
    assert res_mg.converged, res_mg.residual

    res_jac = solve(s.op, s.b, method="bicgstab", tol=1e-10, maxiter=50)
    assert res_mg.residual < 1e-3 * res_jac.residual, (
        res_mg.residual,
        res_jac.residual,
    )

    # and the MG solution solves the same system as the dense factorization
    res_dense = solve(s.op, s.b, method="dense")
    du = float(jnp.max(jnp.abs(res_mg.x["u"] - res_dense.x["u"])))
    scale = float(jnp.max(jnp.abs(res_dense.x["u"])))
    assert du < 1e-6 * max(scale, 1.0), (du, scale)


def test_mg_schwarz_interface_s1():
    """The scalable Schwarz interface correction (dense_max=0 forces it)
    must converge where plain Jacobi stalls, and match the dense solve."""
    phi = lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 0.49
    uex = lambda x: jnp.cos(x[..., 0]) * jnp.sin(x[..., 1])
    f = lambda x: 2.0 * uex(x)

    g = pf.Grid(32, 32, ((-1.0, -1.0), (1.0, 1.0)), "triangle")
    s = WeakDirichletPoisson(g, mode="bg")
    s.setup(phi, f, u_D=uex)
    s.assemble()

    vc = s.mg_preconditioner(min_n=8, interface_dense_max=0)
    assert vc.schwarz_inv is not None and vc.interface_inv is None

    # BiCGStab on this preconditioned system is knife-edge: trajectories
    # separated by one ulp of matvec reassociation (tap vs batch path)
    # converge in anywhere from ~80 to ~200 iterations (both measured),
    # so the budget covers the chaotic band, not the lucky path
    res = solve(s.op, s.b, method="bicgstab", tol=1e-10, maxiter=240, precond=vc)
    assert res.converged, res.residual

    res_dense = solve(s.op, s.b, method="dense")
    du = float(jnp.max(jnp.abs(res.x["u"] - res_dense.x["u"])))
    scale = float(jnp.max(jnp.abs(res_dense.x["u"])))
    assert du < 1e-6 * max(scale, 1.0), (du, scale)


def test_mg_preconditioner_memoized():
    phi = lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 0.49
    f = lambda x: jnp.ones(x.shape[:-1])
    g = pf.Grid(16, 16, ((-1.0, -1.0), (1.0, 1.0)), "triangle")
    s = WeakDirichletPoisson(g, mode="bg")
    s.setup(phi, f)
    s.assemble()
    vc1 = s.mg_preconditioner(min_n=8)
    vc2 = s.mg_preconditioner(min_n=8)
    assert vc1 is vc2
    vc3 = s.mg_preconditioner(min_n=8, refresh=True)
    assert vc3 is not vc1
