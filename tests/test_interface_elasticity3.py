"""3D interface elasticity (InterfaceElasticity3): manufactured
two-material solution on a sphere immersed in a box — the z-extension of
the 2D S5 tests (the reference, demo/interface-elasticity/main.py, is
2D-only).  The exact solution is the 3D analogue of the reference's
data.py:43-48: u = (cos r - cos 1)/E per side; with equal Poisson ratios
the stress field sigma(u) is side-independent, so displacement AND
traction are exactly continuous at r=1 and both sides share one source
term f = -div sigma_in(cos_vec)/E_in."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phifem_tpu.grid3 import Grid3
from phifem_tpu.models import InterfaceElasticity3
from phifem_tpu.models.interface_elasticity import lame

BOX = ((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5))


def phi_sphere(x):
    return 1.0 - (x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2)


def _safe_r(x):
    # cos|x| is smooth (an even function of |x|), but sqrt's derivative
    # blows up at the origin vertex — the epsilon keeps autodiff finite
    # and correct to ~1e-15 there
    return jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2 + 1e-30)


def make_data(E_in, E_out, nu=0.3):
    def exact(x):
        r = _safe_r(x)
        val = (jnp.cos(r) - jnp.cos(1.0)) / E_in
        val = jnp.where(r < 1.0, val * (E_in / E_out), val)
        return jnp.stack([val, val, val], axis=-1)

    lmbda, mu = lame(E_in, nu)

    def _sigma(p):
        G = jax.jacfwd(
            lambda q: jnp.cos(
                jnp.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + 1e-30)
            )
            * jnp.ones(3)
        )(p)
        eps = 0.5 * (G + G.T)
        return lmbda * jnp.trace(G) * jnp.eye(3) + 2 * mu * eps

    def source(x):
        shape = x.shape[:-1]
        p = x.reshape(-1, 3)
        Dg = jax.vmap(jax.jacfwd(_sigma))(p)  # (n, 3, 3, 3) = d_k sigma_ij
        return (-jnp.einsum("nijj->ni", Dg) / E_in).reshape(shape + (3,))

    return exact, source


def _solve(n, E_in, E_out, **kw):
    exact, source = make_data(E_in, E_out)
    s = InterfaceElasticity3(Grid3(n, n, n, BOX), E_in=E_in, E_out=E_out)
    s.setup(phi_sphere, source, exact)
    s.assemble()
    r = s.solve(tol=1e-9, maxiter=60000, **kw)
    assert r.converged, (n, r.residual, r.iterations)
    return s, s.l2_h1_errors(exact)


def test_interface_elasticity3_convergence_contrast1():
    """Contrast-1 control: the exact solution is globally smooth, so the
    scheme must deliver optimal Q1 rates (the 2D study's control,
    docs/s5_convergence.md)."""
    _, e1 = _solve(8, 1.0, 1.0)
    _, e2 = _solve(16, 1.0, 1.0)
    assert e2["l2"] < 0.02, (e1, e2)
    assert np.log2(e1["l2"] / e2["l2"]) > 1.5, (e1, e2)
    assert np.log2(e1["h10"] / e2["h10"]) > 0.8, (e1, e2)


def test_interface_elasticity3_preconditioned_fgmres():
    """The fast S5-3D path: per-side block-MG bulk + exact cut-block inner
    band solve, under FLEXIBLE GMRES (the inner Krylov makes the
    preconditioner nonlinear — classical BiCGStab floors at ~1e-8 with it,
    measured; FGMRES converges through to 1e-11-class).  Iteration ceiling
    pinned so the cut-block solve can't silently degrade."""
    exact, source = make_data(1.0, 0.001)
    s = InterfaceElasticity3(Grid3(8, 8, 8, BOX), E_in=1.0, E_out=0.001)
    s.setup(phi_sphere, source, exact)
    s.assemble()
    pc = s.lattice_preconditioner(sweeps=40)
    r = s.solve(
        method="fgmres", tol=1e-9, maxiter=100, precond=pc,
        deflate=s.rigid_modes(),
    )
    assert r.converged, (r.residual, r.iterations)
    assert 0 < r.iterations <= 60, r.iterations
    e = s.l2_h1_errors(exact)
    assert e["l2"] < 0.8, e


def test_interface_elasticity3_contrast1000():
    """Reference-parameter contrast (E_in/E_out = 1000): the system is
    near-singular along collective rigid modes (the reference hands this
    to MUMPS icntl 24/25); rigid-mode deflation must converge and give
    the preasymptotic error level of the 2D param1 study."""
    s, e = _solve(8, 1.0, 0.001, deflate=None)
    assert e["l2"] < 0.8, e
    # deflated solve reproduces the same scheme errors
    exact, source = make_data(1.0, 0.001)
    s2 = InterfaceElasticity3(Grid3(8, 8, 8, BOX), E_in=1.0, E_out=0.001)
    s2.setup(phi_sphere, source, exact)
    s2.assemble()
    r2 = s2.solve(tol=1e-9, maxiter=60000, deflate=s2.rigid_modes())
    assert r2.converged, (r2.residual, r2.iterations)
    e2 = s2.l2_h1_errors(exact)
    assert abs(e2["l2"] - e["l2"]) / e["l2"] < 0.05, (e, e2)


@pytest.mark.slow
def test_s53d_harmonic_coarse_iterations():
    """Round-5 solid-harmonic coarse space regression: contrast-1000
    outer iterations stay flat under refinement (measured 40 at n=12 AND
    n=16 with the per-side r^l Y_lm space, vs 100 at n=16 with the
    round-4 rigid+monomial space — docs/s53d_convergence.md).  Cap has
    ~35% headroom for BiCGStab/FGMRES summation-order wobble."""
    E_in, E_out = 1.0, 0.001
    exact, source = make_data(E_in, E_out)
    s = InterfaceElasticity3(Grid3(12, 12, 12, BOX), E_in=E_in, E_out=E_out)
    s.setup(phi_sphere, source, exact)
    s.assemble()
    pc = s.lattice_preconditioner()
    r = s.solve(
        method="fgmres", tol=1e-8, maxiter=2000, precond=pc,
        deflate=s.rigid_modes(),
    )
    assert r.converged, (r.residual, r.iterations)
    assert r.iterations <= 55, r.iterations
    e = s.l2_h1_errors(exact)
    assert e["l2"] < 0.5, e
