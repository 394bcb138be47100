"""BoxPoisson (pure-MG benchmark path) + reduced-precision V-cycle."""

import jax.numpy as jnp
import numpy as np
import pytest

import phifem_tpu as pf
from phifem_tpu.models import BoxPoisson, WeakDirichletPoisson
from phifem_tpu.solvers import solve
from phifem_tpu.spaces import interpolate


def _box_problem(n):
    g = pf.Grid(n, n, ((0.0, 0.0), (1.0, 1.0)), "triangle")
    uex = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    f = lambda x: 2.0 * jnp.pi**2 * uex(x)
    s = BoxPoisson(g)
    s.setup(f)
    s.assemble()
    return s, uex


def test_box_poisson_mg_cg():
    s, uex = _box_problem(32)
    vc = s.mg_preconditioner(min_n=8)
    res = s.solve(method="cg", tol=1e-12, maxiter=40, precond=vc)
    assert res.converged, res.residual
    # discretization accuracy vs the exact solution (P1: O(h^2) in L2)
    uex_h = interpolate(uex, s.V)
    err = float(jnp.max(jnp.abs(s.u_h.data - uex_h.data)))
    assert err < 5e-3, err


def test_box_poisson_f32_vcycle_preconditioner():
    """float32 V-cycle inside a float64 CG must still reach 1e-12 — the
    preconditioner dtype must not cap the outer accuracy."""
    s, uex = _box_problem(32)
    vc = s.mg_preconditioner(min_n=8, dtype=jnp.float32)
    assert vc.dtype == jnp.float32
    res = s.solve(method="cg", tol=1e-12, maxiter=60, precond=vc)
    assert res.converged, res.residual
    ref = solve(s.op, s.b, bcs=s.bcs, method="dense")
    du = float(jnp.max(jnp.abs(res.x["u"] - ref.x["u"])))
    scale = float(jnp.max(jnp.abs(ref.x["u"])))
    assert du < 1e-8 * max(scale, 1.0), (du, scale)


def test_box_poisson_mixed_precision_ir():
    """solve_ir: f32 MG-CG corrections + f64 residual loop must reach
    1e-12 — beyond single-precision — in a couple of outer rounds."""
    from phifem_tpu.solvers import solve_ir

    s, uex = _box_problem(32)
    vc = s.mg_preconditioner(min_n=8, dtype=jnp.float32)
    res = solve_ir(
        s.op, s.b, bcs=s.bcs, precond=vc, tol=1e-12, inner_tol=1e-5,
        inner_maxiter=40,
    )
    assert res.converged, res.residual
    assert res.residual <= 1e-12
    assert res.iterations <= 4, res.iterations
    ref = solve(s.op, s.b, bcs=s.bcs, method="dense")
    du = float(jnp.max(jnp.abs(res.x["u"] - ref.x["u"])))
    scale = float(jnp.max(jnp.abs(ref.x["u"])))
    assert du < 1e-9 * max(scale, 1.0), (du, scale)


def test_box_poisson_full_term_is_maskless():
    """BoxPoisson's single bulk term covers every cell -> the stencil batch
    drops its masks entirely (the bandwidth-halving pure-Poisson path)."""
    from phifem_tpu.ops.stencil import StencilCellBatch

    s, _ = _box_problem(16)
    (batch,) = s.op.batches
    assert isinstance(batch, StencilCellBatch)
    assert batch.masks is None


def test_s1_f32_vcycle_preconditioner():
    """The bench configuration: f64 BiCGStab with an f32 V-cycle on the S1
    phi-FEM system (penalty rows span a large dynamic range — the cast must
    not break convergence)."""
    phi = lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 0.49
    uex = lambda x: jnp.cos(x[..., 0]) * jnp.sin(x[..., 1])
    f = lambda x: 2.0 * uex(x)
    g = pf.Grid(32, 32, ((-1.0, -1.0), (1.0, 1.0)), "triangle")
    s = WeakDirichletPoisson(g, mode="bg")
    s.setup(phi, f, u_D=uex)
    s.assemble()
    vc = s.mg_preconditioner(min_n=8, dtype=jnp.float32)
    res = solve(s.op, s.b, method="bicgstab", tol=1e-10, maxiter=80, precond=vc)
    assert res.converged, res.residual
    ref = solve(s.op, s.b, method="dense")
    du = float(jnp.max(jnp.abs(res.x["u"] - ref.x["u"])))
    scale = float(jnp.max(jnp.abs(ref.x["u"])))
    assert du < 1e-6 * max(scale, 1.0), (du, scale)
