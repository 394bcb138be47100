"""Smoothed-aggregation AMG for unstructured P1 (phifem_tpu.amg).

The imported-mesh workhorse-degree solve path previously had only
Jacobi-BiCGStab (p-MG needs degree >= 2); these tests pin that the SA-AMG
bulk preconditioner + cut-band solve gives near-grid-independent outer
iterations where Jacobi grows like 1/h (measured while building: AMG
14/16/18 at n=40/80/160 vs Jacobi 148/226/414)."""

import numpy as np
import jax.numpy as jnp
import pytest

import phifem_tpu as pf
from phifem_tpu.umesh import UMesh
from phifem_tpu.models.unstructured import WeakDirichletPoissonU

BOX = ((-1.0, -1.0), (1.0, 1.0))
R = 0.7


def phi_circle(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 - R**2


def u_mild(x):
    return jnp.cos(x[..., 0]) * jnp.sin(x[..., 1])


def f_mild(x):
    return 2.0 * u_mild(x)


def _perturbed_mesh(n, amp=0.25, seed=0):
    g = pf.Grid(n, n, BOX, pf.CellType.triangle)
    um, _ = UMesh.from_grid(g)
    verts = um.verts.copy()
    h = 2.0 / n
    rng = np.random.default_rng(seed)
    interior = (
        (np.abs(verts[:, 0] - BOX[0][0]) > 1e-12)
        & (np.abs(verts[:, 0] - BOX[1][0]) > 1e-12)
        & (np.abs(verts[:, 1] - BOX[0][1]) > 1e-12)
        & (np.abs(verts[:, 1] - BOX[1][1]) > 1e-12)
    )
    verts[interior] += amp * h * (rng.random((int(interior.sum()), 2)) - 0.5)
    return UMesh(verts, um.cells)


def _scheme(n):
    s = WeakDirichletPoissonU(_perturbed_mesh(n), mode="bg")
    s.setup(phi_circle, f_mild, u_D=u_mild)
    s.assemble()
    return s


def test_amg_cycle_solves_bulk_laplacian():
    """The raw AMG V-cycle is a usable preconditioner for CG on the bulk
    stiffness block alone (pure algebra check, no phi-FEM coupling)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from phifem_tpu.amg import build_amg

    s = _scheme(32)
    from phifem_tpu.mg import data_dependent_selection
    from phifem_tpu.solvers import masked_operator

    _, _, active = masked_operator(s.op, ())
    ddsel = data_dependent_selection(s.op, active)
    bulk = np.asarray(active["u"]) & ~np.asarray(ddsel["u"])
    sel = {
        "u": bulk,
        "p": np.zeros_like(np.asarray(active["p"])),
    }
    A, _ = s.op.restricted_csr(sel)
    amg = build_amg(A)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.shape[0])
    x = np.zeros_like(b)
    r = b.copy()
    # Richardson with the AMG preconditioner must contract fast
    for _ in range(25):
        x = x + np.asarray(amg(jnp.asarray(r)))
        r = b - A @ x
    rel = np.linalg.norm(r) / np.linalg.norm(b)
    assert rel < 1e-6, rel


@pytest.mark.slow
def test_amg_preconditioned_s1u_grid_independence():
    """AMG+band outer iterations stay near-flat under refinement and far
    below Jacobi; the converged solution resolves the analytic one."""
    iters = {}
    for n in (40, 80):
        s = _scheme(n)
        vc = s.amg_preconditioner()
        r = s.solve(method="bicgstab", tol=1e-10, maxiter=500, precond=vc)
        assert r.converged, (n, r.residual)
        iters[n] = r.iterations
        if n == 80:
            uh = pf.uassembly.UFunction(s.V, r.x["u"])
            e = s.l2_h1_errors(uh, u_mild)
            assert e["l2"] < 0.01, e
    # measured 14/16; caps leave ~2x headroom yet sit ~10x below the
    # measured Jacobi counts (148/226)
    assert iters[40] <= 30, iters
    assert iters[80] <= 34, iters
    assert iters[80] <= 2 * iters[40], iters
