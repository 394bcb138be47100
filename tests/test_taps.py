"""Tap-form lattice operator (ops.taps): exact equivalence with the
entity-batch matvec across schemes, dtypes, refresh, and the solve path.

The tap form is the Krylov hot path replacing per-batch gather ->
batched-matmul -> scatter (the reference's PETSc CSR SpMV analogue,
``demo/weak-dirichlet/flower/main.py:137-154``), so equivalence here is a
correctness gate for every scheme solve.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import phifem_tpu as pf
from phifem_tpu.models import (
    InterfaceElasticity,
    NeumannPoisson,
    RobinPoisson,
    StrongDirichletPoisson,
    WeakDirichletPoisson,
)
from phifem_tpu.ops.taps import build_tap_operator, supports_tap_form


def _rand_like(b, seed=0):
    rng = np.random.default_rng(seed)
    return {
        k: jnp.asarray(rng.standard_normal(np.asarray(v).shape))
        for k, v in b.items()
    }


def _assert_equiv(s, rtol=1e-12):
    top = build_tap_operator(s.op)
    assert top is not None
    x = _rand_like(s.b)
    y_ref = s.op.matvec(x)
    y_tap = top.make_matvec(s.op)(x)
    for k in y_ref:
        a, b = np.asarray(y_ref[k]), np.asarray(y_tap[k])
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        assert rel < rtol, (k, rel)
    return top


def _circle(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 - 0.49


def _ones(x):
    return jnp.ones(x.shape[:-1])


def _zeros(x):
    return jnp.zeros(x.shape[:-1])


def test_s1_equivalence_bg_and_sub():
    for mode in ("bg", "sub"):
        g = pf.Grid(24, 24, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
        s = WeakDirichletPoisson(g, mode=mode)
        s.setup(_circle, _ones)
        s.assemble()
        _assert_equiv(s)


def test_s2_equivalence():
    g = pf.Grid(24, 24, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
    s = StrongDirichletPoisson(g, mode="bg")
    s.setup(_circle, _ones)
    s.assemble()
    _assert_equiv(s)


@pytest.mark.parametrize(
    "cell_type", [pf.CellType.quadrilateral, pf.CellType.triangle]
)
def test_s3_equivalence(cell_type):
    """DG0 (quad: single cell lattice; tri: dual orientation lattices) +
    vector-P1 block lattices."""
    g = pf.Grid(20, 20, ((-1.0, -1.0), (1.0, 1.0)), cell_type)
    s = NeumannPoisson(g, mode="bg")
    phi = lambda x: jnp.abs(x[..., 0] + 0.1) + jnp.abs(x[..., 1]) - 0.7
    s.setup(phi, _ones, _zeros)
    s.assemble()
    _assert_equiv(s)


def test_s4_equivalence():
    g = pf.Grid(20, 20, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
    s = RobinPoisson(g, mode="bg")
    phi = lambda x: jnp.abs(x[..., 0] + 0.1) + jnp.abs(x[..., 1]) - 0.7
    s.setup(phi, _ones, _zeros)
    s.assemble()
    _assert_equiv(s)


def test_s5_equivalence_block_taps():
    """Five-field vector/tensor system: (2x2)/(4x4) channel block taps."""
    g = pf.Grid(16, 16, ((-1.5, -1.5), (1.5, 1.5)), pf.CellType.triangle)
    s = InterfaceElasticity(g, E_in=1.0, E_out=0.001)
    s.setup(
        lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 1.0,
        lambda x: jnp.zeros(x.shape[:-1] + (2,)),
        lambda x: jnp.zeros(x.shape[:-1] + (2,)),
    )
    s.assemble()
    top = _assert_equiv(s)
    # block taps keep the op count tractable for the 12-component system
    assert top.num_taps < 300


def test_f32_compute_path():
    g = pf.Grid(24, 24, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
    s = WeakDirichletPoisson(g, mode="bg")
    s.setup(_circle, _ones)
    s.assemble()
    top = build_tap_operator(s.op)
    x = _rand_like(s.b)
    y_ref = s.op.matvec(x)
    y32 = top.make_matvec(s.op, jnp.float32)(x)
    for k in y_ref:
        assert np.asarray(y32[k]).dtype == np.float32
        rel = float(
            jnp.max(jnp.abs(y_ref[k] - y32[k])) / jnp.max(jnp.abs(y_ref[k]))
        )
        assert rel < 1e-5, (k, rel)


def test_refresh_after_reassemble():
    """reassemble() with changed level-set data must be reflected in the
    cached tap form via Operator.lattice_form() (data_version tracking)."""
    g = pf.Grid(24, 24, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
    s = WeakDirichletPoisson(g, mode="bg")
    s.setup(_circle, _ones)
    s.assemble()
    top = s.op.lattice_form()
    assert top is not None
    W0 = np.asarray(top.W).copy()
    s.phi_h.data = s.phi_h.data * 1.3
    s.op.reassemble()
    top2 = s.op.lattice_form()
    assert top2 is top  # structure reused
    assert top2.data_version == s.op.data_version
    assert not np.allclose(np.asarray(top2.W), W0)  # values refreshed
    x = _rand_like(s.b)
    y_ref = s.op.matvec(x)
    y_tap = top2.make_matvec(s.op)(x)
    for k in y_ref:
        rel = float(
            jnp.max(jnp.abs(y_ref[k] - y_tap[k])) / jnp.max(jnp.abs(y_ref[k]))
        )
        assert rel < 1e-12, (k, rel)


def test_pure_stencil_operator_skips_taps():
    """BoxPoisson is one uniform stencil batch — the tap form would only
    materialize O(N) weight planes for an O(1)-weight operator."""
    from phifem_tpu.models import BoxPoisson

    g = pf.Grid(16, 16, ((0.0, 0.0), (1.0, 1.0)), pf.CellType.triangle)
    s = BoxPoisson(g).setup(_ones)
    s.assemble()
    assert s.op.lattice_form() is None


def test_unsupported_degree_falls_back():
    g = pf.Grid(16, 16, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
    s = WeakDirichletPoisson(g, mode="bg", primal_degree=2)
    s.setup(_circle, _ones)
    s.assemble()
    assert not supports_tap_form(s.system)
    assert s.op.lattice_form() is None
    # the solve must still work on the batch path
    r = s.solve(method="bicgstab", tol=1e-8, maxiter=2000)
    assert r.converged


def test_solve_reports_iteration_counts():
    """SolveResult.iterations must be the real Krylov iteration count
    (the PETSc KSPGetIterationNumber analogue) for cg and bicgstab."""
    from phifem_tpu.models import BoxPoisson
    from phifem_tpu.solvers import solve

    g = pf.Grid(16, 16, ((0.0, 0.0), (1.0, 1.0)), pf.CellType.triangle)
    uex = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    s = BoxPoisson(g).setup(lambda x: 2.0 * jnp.pi**2 * uex(x))
    s.assemble()
    r = solve(s.op, s.b, bcs=s.bcs, method="cg", tol=1e-10)
    assert r.converged and 0 < r.iterations < 200

    g2 = pf.Grid(24, 24, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
    s2 = WeakDirichletPoisson(g2, mode="bg")
    s2.setup(_circle, _ones)
    s2.assemble()
    r2 = s2.solve(method="bicgstab", tol=1e-10, maxiter=2000)
    assert r2.converged and 0 < r2.iterations <= 2000


def test_warm_pipeline_no_retrace_after_reassemble():
    """The production convergence-loop iteration: reassemble() with new
    level-set data must NOT invalidate solve()'s compiled runner (values
    enter as traced arguments), and the reused runner must solve the NEW
    operator, matching a from-scratch assembly."""
    from phifem_tpu.solvers import solve

    g = pf.Grid(24, 24, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
    s = WeakDirichletPoisson(g, mode="bg")
    s.setup(_circle, _ones)
    s.assemble()
    r1 = s.solve(method="bicgstab", tol=1e-10, maxiter=1000)
    assert r1.converged
    runner_keys = set(s.op._solve_cache.keys())
    runner, _ = next(iter(s.op._solve_cache.values()))
    n_traces = runner._cache_size()

    # new data, same topology: phi scaled => penalty terms change
    s.phi_h.data = s.phi_h.data * 1.5
    s.op.reassemble()
    r2 = s.solve(method="bicgstab", tol=1e-10, maxiter=1000)
    assert r2.converged
    assert set(s.op._solve_cache.keys()) == runner_keys  # runner survived
    assert runner._cache_size() == n_traces  # and did not retrace

    # the reused runner solved the NEW operator: rebuild from scratch
    s_ref = WeakDirichletPoisson(g, mode="bg")
    s_ref.setup(_circle, _ones)
    s_ref.assemble()
    s_ref.phi_h.data = s_ref.phi_h.data * 1.5
    s_ref.op.reassemble()
    r_ref = s_ref.solve(method="bicgstab", tol=1e-10, maxiter=1000)
    d = float(jnp.max(jnp.abs(r2.x["u"] - r_ref.x["u"])))
    sc = float(jnp.max(jnp.abs(r_ref.x["u"])))
    assert d < 1e-6 * max(sc, 1.0), (d, sc)
    # and differs from the old solution (the data change was material —
    # u is invariant under a constant phi scaling, but the auxiliary p
    # rescales by the inverse factor)
    assert float(jnp.max(jnp.abs(r2.x["p"] - r1.x["p"]))) > 1e-6
