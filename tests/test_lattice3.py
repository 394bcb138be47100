"""3D lattice MG (ops.lattice3): the z-axis extension the 2D-only
reference does not have.  Oracles: closed-form element integrals, a dense
assembly of the reduced operator, transfer adjointness, and the analytic
solution of -Δu = f on the unit box."""

import numpy as np
import jax.numpy as jnp
import pytest

import phifem_tpu as pf
from phifem_tpu.grid3 import Grid3
from phifem_tpu.models import BoxPoisson3
from phifem_tpu.ops.lattice3 import (
    _conv_interior3,
    _dense_coarse_inv3,
    _embed3,
    _prolong3,
    _restrict3,
    _terms3,
    build_lattice3_mg,
    hex_element_matrix,
    vertex_stencil_weights3,
)


def test_hex_element_matrix_integrals():
    """Stiffness rows sum to zero (constants in the kernel); the mass
    matrix sums to the cell volume; both symmetric."""
    A = hex_element_matrix(0.3, 0.2, 0.5, stiffness=1.0, mass=0.0)
    assert np.abs(A - A.T).max() < 1e-14
    assert np.abs(A.sum(axis=1)).max() < 1e-14
    M = hex_element_matrix(0.3, 0.2, 0.5, stiffness=0.0, mass=1.0)
    assert np.isclose(M.sum(), 0.3 * 0.2 * 0.5)
    # unit cube Q1 stiffness diagonal: 1/3 per node ring of 8 cells -> the
    # aggregated stencil center must be 8 * diag
    Au = hex_element_matrix(1.0, 1.0, 1.0)
    w = vertex_stencil_weights3(Au)
    assert np.isclose(w[1, 1, 1], 8 * Au[0, 0])


def test_conv_matches_dense_operator():
    """The 27-point interior convolution equals the dense reduced operator
    assembled from the same stencil (anisotropic spacing)."""
    n = 6
    A8 = hex_element_matrix(0.11, 0.21, 0.31, stiffness=1.0, mass=0.7)
    terms = _terms3(vertex_stencil_weights3(A8))
    D = R = C = n + 1
    Ad = np.linalg.inv(_dense_coarse_inv3(terms, D, R, C))
    rng = np.random.default_rng(0)
    v = rng.standard_normal((D - 2, R - 2, C - 2))
    xp = _embed3(jnp.asarray(v), D, R, C)
    y_conv = np.asarray(_conv_interior3(xp, terms, D, R, C))
    y_dense = (Ad @ v.reshape(-1)).reshape(D - 2, R - 2, C - 2)
    assert np.abs(y_conv - y_dense).max() < 1e-11


def test_transfer_adjointness_3d():
    """restrict3 == prolong3^T (weight sum 8) on reduced vectors."""
    rng = np.random.default_rng(1)
    Dc = Rc = Cc = 7
    D, R, C = 2 * Dc - 1, 2 * Rc - 1, 2 * Cc - 1
    ec = np.zeros((Dc + 2, Rc + 2, Cc + 2))
    ec[2:Dc, 2:Rc, 2:Cc] = rng.standard_normal((Dc - 2, Rc - 2, Cc - 2))
    rf = rng.standard_normal((D - 2, R - 2, C - 2))
    Pe = np.asarray(_prolong3(jnp.asarray(ec), Dc, Rc, Cc))[1:-1, 1:-1, 1:-1]
    lhs = float((Pe * rf).sum())
    Rr = np.asarray(_restrict3(jnp.asarray(rf), Dc, Rc, Cc))
    rhs = float((ec * Rr).sum())
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def _box3(n, beta=0.0):
    g = Grid3(n, n, n, ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)))
    uex = lambda x: (
        jnp.sin(jnp.pi * x[..., 0])
        * jnp.sin(jnp.pi * x[..., 1])
        * jnp.sin(jnp.pi * x[..., 2])
        + x[..., 0]
    )
    f = lambda x: 3.0 * jnp.pi**2 * (uex(x) - x[..., 0]) + beta * uex(x)
    s = BoxPoisson3(g, beta=beta).setup(f, uex)
    s.assemble()
    return s, uex


def test_lattice3_solve_analytic():
    """MG-CG converges to 1e-10 and matches the analytic solution at
    O(h^2), with NONZERO Dirichlet data (the +x term)."""
    errs = []
    for n in (8, 16):
        s, uex = _box3(n)
        r = s.solve_lattice(tol=1e-10, maxiter=40)
        assert r.converged, (n, r.residual)
        ue = np.asarray(s.grid.eval_at_vertices(uex))
        err = np.abs(np.asarray(s.u_lat) - ue).max()
        errs.append(err)
    assert errs[0] / errs[1] > 3.0, errs  # O(h^2) nodal error


def test_lattice3_grid_independent_iterations():
    iters = []
    for n in (16, 32):
        s, _ = _box3(n)
        r = s.solve_lattice(tol=1e-10, maxiter=40)
        assert r.converged
        iters.append(r.iterations)
    assert max(iters) <= 14, iters
    assert iters[-1] <= iters[0] + 3, iters


def test_lattice3_helmholtz_mass_term():
    """beta > 0 exercises the inhomogeneous-scaling path (stiffness ~ h,
    mass ~ h^3: per-level re-assembled stencils, not a shared one)."""
    s, uex = _box3(16, beta=2.0)
    r = s.solve_lattice(tol=1e-10, maxiter=40)
    assert r.converged, r.residual
    ue = np.asarray(s.grid.eval_at_vertices(uex))
    assert np.abs(np.asarray(s.u_lat) - ue).max() < 0.02


def test_lattice3_f32_preconditioner_f64_cg():
    s, _ = _box3(16)
    mg = s.lattice_solver(min_n=4, dtype=jnp.float32)
    r = s.solve_lattice(tol=1e-10, maxiter=40, mg=mg)
    assert r.converged and r.residual <= 1e-10, (r.iterations, r.residual)


def test_block_mg_vsz1_matches_scalar():
    """Lattice3BlockMG with vsz=1 must reproduce the validated scalar
    Lattice3MG V-cycle exactly (same stencil, same transfers, same coarse
    solve) — pins the block machinery against the scalar oracle."""
    from phifem_tpu.ops.lattice3 import build_lattice3_block_mg

    n = 8
    sp = (1.0 / n,) * 3
    mg_s = build_lattice3_mg(n, n, n, sp, stiffness=1.0, mass=0.5, min_n=4)
    elem = lambda hx, hy, hz: hex_element_matrix(
        hx, hy, hz, stiffness=1.0, mass=0.5
    )
    mg_b = build_lattice3_block_mg(n, n, n, sp, elem, vsz=1, min_n=4)
    # same smoother damping for the comparison (block default is 0.6 for
    # elasticity spectra; scalar Laplace uses the scalar default)
    mg_b.omega = mg_s.omega
    rng = np.random.default_rng(3)
    D = R = C = n + 1
    b = jnp.asarray(rng.standard_normal((D + 2, R + 2, C + 2)), jnp.float32)
    zs = mg_s(b)
    zb = mg_b(b[None])[0]
    # f32 path: einsum vs scalar-multiply reduction orders differ by ULPs
    assert np.abs(np.asarray(zs) - np.asarray(zb)).max() < 1e-5


def test_block_mg_elasticity_vcycle_contracts():
    """The (3x3)-block V-cycle on the Q1 linear-elasticity operator must
    CONTRACT as a stationary iteration (block-Jacobi omega=0.6: the
    elasticity block spectrum has lam_max(D^-1 A) ~ 2.64, so the old 0.8
    default amplified and the cycle diverged — regression-pinned here)."""
    from phifem_tpu.models.interface_elasticity import lame
    from phifem_tpu.models.interface_elasticity3 import (
        _elastic_element_matrix,
    )
    from phifem_tpu.ops.lattice3 import (
        _conv_interior3_block,
        build_lattice3_block_mg,
    )

    n = 8
    sp = (1.0 / n,) * 3
    lmbda, mu = lame(1.0, 0.3)
    elem = lambda hx, hy, hz: _elastic_element_matrix(hx, hy, hz, lmbda, mu)
    mg = build_lattice3_block_mg(n, n, n, sp, elem, vsz=3, min_n=4)
    D = R = C = n + 1
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, D + 2, R + 2, C + 2)), jnp.float32)
    # zero the padding and the boundary layer (identity rows in the cycle)
    mask = np.zeros((3, D + 2, R + 2, C + 2), np.float32)
    mask[:, 2:D, 2:R, 2:C] = 1.0
    x = x * mask
    W = mg.Ws[0]

    def apply_A(v):
        out = jnp.zeros_like(v)
        return out.at[:, 2:D, 2:R, 2:C].set(
            _conv_interior3_block(v, mg.offs, W, D, R, C)
        )

    # error-propagation norm over a few Richardson steps: e <- (I - M A) e
    e = x
    n0 = float(jnp.linalg.norm(e))
    for _ in range(3):
        e = (e - mg(apply_A(e))) * mask
    rate = (float(jnp.linalg.norm(e)) / n0) ** (1 / 3)
    assert rate < 0.35, rate
