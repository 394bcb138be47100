"""3D phi-FEM weak-Dirichlet (models.weak_dirichlet3) — the z-axis
extension of S1 that the 2D-only reference does not have.  Oracles: exact
reproduction of affine solutions (patch test), O(h^2) L2 convergence on a
sphere levelset, and grid-independent preconditioned iteration counts over
both interface-solve variants."""

import numpy as np
import jax.numpy as jnp

import phifem_tpu as pf
from phifem_tpu.models import WeakDirichletPoisson3

R0 = 0.7
phi = lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2 - R0**2
BOX = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))

uex = lambda x: jnp.sin(x[..., 0]) * jnp.cos(x[..., 1]) * jnp.exp(
    0.5 * x[..., 2]
)
f = lambda x: 1.75 * uex(x)  # -lap u = (1 + 1 - 0.25) u


def test_patch_exactness():
    """Affine solutions are reproduced to solver tolerance: stiffness,
    penalty, ghost and one-sided boundary-flux terms are all consistent."""
    ua = lambda x: 1.0 + 2.0 * x[..., 0] - 0.5 * x[..., 1] + 0.25 * x[..., 2]
    f0 = lambda x: jnp.zeros(x.shape[:-1])
    g = pf.Grid3(12, 12, 12, BOX)
    s = WeakDirichletPoisson3(g).setup(phi, f0, u_D=ua)
    s.assemble()
    r = s.solve(method="bicgstab", tol=1e-12, maxiter=3000)
    assert r.converged, r.residual
    e = s.l2_h1_errors(ua)
    assert e["l2"] < 1e-9 and e["h10"] < 1e-9, e


def test_convergence_sphere():
    errs = []
    for n in (8, 16, 32):
        g = pf.Grid3(n, n, n, BOX)
        s = WeakDirichletPoisson3(g).setup(phi, f, u_D=uex)
        s.assemble()
        r = s.solve(method="bicgstab", tol=1e-11, maxiter=20000)
        assert r.converged, (n, r.residual)
        errs.append(s.l2_h1_errors(uex))
    # measured: L2 1.34 / 0.337 / 0.080 (ratio ~4: O(h^2), same large
    # dual-penalty constant as the 2D S1 scheme family)
    assert errs[1]["l2"] / errs[2]["l2"] > 3.0, errs
    assert errs[0]["l2"] / errs[1]["l2"] > 3.0, errs
    assert errs[2]["l2"] < 0.12, errs


def test_preconditioned_iterations():
    """Bulk lattice-MG + multiplicative cut-block solve: grid-independent
    outer iterations (measured 4 / 9 / 9 at n=16/32/48) across BOTH
    interface variants (n=16 -> dense inverse, n=32 -> Schwarz band)."""
    for n, bound in ((16, 8), (32, 15)):
        g = pf.Grid3(n, n, n, BOX)
        s = WeakDirichletPoisson3(g).setup(phi, f, u_D=uex)
        s.assemble()
        M = s.lattice_preconditioner()
        r = s.solve(method="bicgstab", tol=1e-11, maxiter=60, precond=M)
        assert r.converged, (n, r.residual)
        assert 0 <= r.iterations <= bound, (n, r.iterations)
