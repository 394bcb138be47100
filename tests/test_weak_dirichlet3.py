"""3D phi-FEM weak-Dirichlet (models.weak_dirichlet3) — the z-axis
extension of S1 that the 2D-only reference does not have.  Oracles: exact
reproduction of affine solutions (patch test), O(h^2) L2 convergence on a
sphere levelset, and grid-independent preconditioned iteration counts over
both interface-solve variants."""

import numpy as np
import jax.numpy as jnp
import pytest

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


def test_q2_quadratic_exactness():
    """Q2 hexes reproduce quadratic solutions to direct-solver precision:
    for u in Q2, the penalty (with u_D = u), the C^1 ghost jumps and the
    cell stabilization (Delta u + f = 0) all vanish identically, so any
    error is an assembly bug.  Also covers the sparse direct path (the
    MUMPS-LU analogue, lattice_core.lattice_sparse_solve)."""
    ua = (
        lambda x: 0.3
        + x[..., 0] ** 2
        - 0.5 * x[..., 1] ** 2
        + 0.25 * x[..., 2] ** 2
        + x[..., 0] * x[..., 1]
    )
    fq = lambda x: -1.5 * jnp.ones(x.shape[:-1])  # -lap ua
    g = pf.Grid3(8, 8, 8, BOX)
    s = WeakDirichletPoisson3(g, degree=2).setup(phi, fq, u_D=ua).assemble()
    r = s.solve(method="sparse")
    assert r.converged, r.residual
    e = s.l2_h1_errors(ua)
    assert e["l2"] < 1e-9 and e["h10"] < 1e-9, e


def test_q3_cubic_exactness():
    """Q3 hexes reproduce cubic solutions (plain Krylov stalls ~1e-5 on
    degree-3 penalized systems — same as 2D P3, CLAUDE.md — so degree 3
    rides the sparse direct path, like the 2D degree-3 tests).

    n=8, not smaller: at n=6 (h=1/3) the R0=0.7 cut layer reaches the
    outermost cell layer, Omega_h touches the box boundary and Gamma_h is
    incomplete there (phi-FEM containment assumption; compute_tags3 warns)
    — exactness then fails AT EVERY degree, which is geometry, not Q3."""
    uc = (
        lambda x: x[..., 0] ** 3
        - 3.0 * x[..., 0] * x[..., 1] ** 2
        + x[..., 2] ** 3
        + 0.5 * x[..., 1]
    )
    fc = lambda x: -6.0 * x[..., 2]  # -lap uc
    g = pf.Grid3(8, 8, 8, BOX)
    s = WeakDirichletPoisson3(g, degree=3).setup(phi, fc, u_D=uc).assemble()
    r = s.solve(method="sparse")
    assert r.converged, r.residual
    e = s.l2_h1_errors(uc)
    assert e["l2"] < 1e-9 and e["h10"] < 1e-9, e


def test_box_containment_warning():
    """Omega_h cells on the outermost lattice layer violate the phi-FEM
    containment assumption (Gamma_h faces on the box plane do not exist)
    — compute_tags3 must warn.  At n=6 the R0=0.7 cut layer reaches the
    box; at n=8 it does not (no warning)."""
    from phifem_tpu.tagging3 import compute_tags3
    import warnings

    with pytest.warns(RuntimeWarning, match="containment"):
        compute_tags3(pf.Grid3(6, 6, 6, BOX), phi)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        compute_tags3(pf.Grid3(8, 8, 8, BOX), phi)


def test_q2_convergence_sphere():
    """Q2 converges strictly faster than Q1's O(h^2): measured L2
    3.70e-2 / 6.82e-3 (ratio 5.4, approaching the O(h^3) 8x through the
    dual-penalty preasymptotic constant) and superconvergent H10 ratio
    5.8 (Gauss-point gradient superconvergence on uniform hex grids, as
    at degree 1)."""
    errs = []
    for n in (8, 16):
        g = pf.Grid3(n, n, n, BOX)
        s = WeakDirichletPoisson3(g, degree=2).setup(phi, f, u_D=uex)
        s.assemble()
        r = s.solve(method="sparse")
        assert r.converged, (n, r.residual)
        errs.append(s.l2_h1_errors(uex))
    assert errs[0]["l2"] / errs[1]["l2"] > 4.4, errs
    assert errs[0]["h10"] / errs[1]["h10"] > 4.4, errs
    assert errs[1]["l2"] < 8e-3, errs


def test_q2_lor_preconditioner():
    """Degree >= 2 bulk cycle is low-order-refined (Q1 lattice MG on the
    degree-refined node grid): outer BiCGStab converges in a handful of
    iterations (measured 7 at n=8 vs 4311 unpreconditioned)."""
    g = pf.Grid3(8, 8, 8, BOX)
    s = WeakDirichletPoisson3(g, degree=2).setup(phi, f, u_D=uex).assemble()
    M = s.lattice_preconditioner()
    r = s.solve(method="bicgstab", tol=1e-11, maxiter=30, precond=M)
    assert r.converged, r.residual
    assert 0 <= r.iterations <= 14, r.iterations
