"""Linear solvers: matrix-free preconditioned Krylov + BC handling.

Replaces the PETSc KSP ``preonly`` + MUMPS LU stack of every reference demo
(``demo/weak-dirichlet/flower/main.py:162-182`` and equivalents), including
the MUMPS null-pivot configuration (icntl 24=1/25=0) the reference needs
because box-mode operators are singular on the exterior of Omega_h.  Here
the singular exterior is handled the TPU way: DoFs with a zero diagonal
(touched by no active term) get identity rows and a unit preconditioner
entry, so Krylov iterations leave them at zero — no factorization anywhere.

Solvers operate on pytrees (dicts of per-field DoF arrays), are jittable
end-to-end, and use a Jacobi (inverse-diagonal) preconditioner extracted
from the assembled element matrices.  phi-FEM operators with boundary flux
terms are nonsymmetric, so the default is BiCGStab; CG is available for SPD
cases.  A dense LU fallback supports small problems and tests.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import Operator, System

Array = jnp.ndarray

__all__ = ["DirichletBC", "masked_operator", "solve", "solve_ir", "SolveResult"]


def _float_dtype():
    from jax import config

    return jnp.float64 if config.jax_enable_x64 else jnp.float32


def tree_dot(a, b) -> Array:
    leaves = jax.tree.map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree.reduce(jnp.add, leaves)


def tree_axpy(alpha, x, y):
    return jax.tree.map(lambda xi, yi: alpha * xi + yi, x, y)


@dataclasses.dataclass(frozen=True)
class DirichletBC:
    """Strong Dirichlet condition on one field: boolean mask over scalar
    DoFs (optionally per-component) + prescribed values.

    Replaces ``dfx.fem.dirichletbc`` + ``apply_lifting`` + ``bc.set``
    (reference ``demo/interface-elasticity/main.py:165-177, 274-277``).
    """

    field: str
    mask: Array  # bool, shape = space.dof_shape (broadcastable)
    values: Array  # same shape as the field's dof array


def _apply_masks(x: Dict[str, Array], bcs, zero: bool) -> Dict[str, Array]:
    out = dict(x)
    for bc in bcs:
        out[bc.field] = jnp.where(
            bc.mask, jnp.zeros_like(out[bc.field]) if zero else bc.values, out[bc.field]
        )
    return out


def masked_operator(
    op: Operator, bcs: Tuple[DirichletBC, ...] = ()
) -> Tuple[Callable, Dict[str, Array], Dict[str, Array]]:
    """Wrap an operator with Dirichlet-BC row/column masking and
    exterior-DoF identity rows.

    Returns ``(matvec, diag, active)`` where ``matvec`` acts as the reduced
    operator A_red (identity on constrained/inactive DoFs), ``diag`` is its
    Jacobi diagonal, and ``active`` masks genuinely active DoFs.
    """
    diag = op.diagonal()
    active = jax.tree.map(lambda d: d != 0.0, diag)
    for bc in bcs:
        active[bc.field] = jnp.logical_and(
            active[bc.field], jnp.logical_not(bc.mask)
        )

    # tap-form fast path (ops.taps): shifted-slice lattice arithmetic
    # instead of gather -> batched matmul -> scatter per entity batch
    lat = op.lattice_form()
    base_mv = lat.make_matvec(op) if lat is not None else op.matvec

    def matvec(x):
        xa = jax.tree.map(lambda xi, m: jnp.where(m, xi, 0.0), x, active)
        y = base_mv(xa)
        # identity on inactive/constrained dofs
        return jax.tree.map(
            lambda yi, xi, m: jnp.where(m, yi, xi), y, x, active
        )

    diag_red = jax.tree.map(lambda d, m: jnp.where(m, d, 1.0), diag, active)
    return matvec, diag_red, active


def lift_rhs(
    op: Operator, b: Dict[str, Array], bcs: Tuple[DirichletBC, ...], active
) -> Dict[str, Array]:
    """Apply Dirichlet lifting: b <- b - A g on active DoFs, b|_bc = g,
    b|_inactive = 0 (reference ``apply_lifting`` + ``bc.set``)."""
    if bcs:
        g = {
            n: jnp.zeros_like(v) for n, v in b.items()
        }
        g = _apply_masks(g, bcs, zero=False)
        Ag = op.matvec(g)
        b = jax.tree.map(lambda bi, ai: bi - ai, b, Ag)
        b = _apply_masks(b, bcs, zero=False)
    b = jax.tree.map(lambda bi, m: jnp.where(m, bi, 0.0), b, active)
    for bc in bcs:
        b[bc.field] = jnp.where(bc.mask, bc.values, b[bc.field])
    return b


@dataclasses.dataclass
class SolveResult:
    x: Dict[str, Array]
    residual: float
    iterations: int
    converged: bool


def solve(
    op: Operator,
    b: Dict[str, Array],
    bcs: Tuple[DirichletBC, ...] = (),
    method: str = "bicgstab",
    tol: float = 1e-10,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    x0: Optional[Dict[str, Array]] = None,
    precond: Optional[Callable] = None,
) -> SolveResult:
    """Solve ``A x = b`` with preconditioned Krylov iterations (or a dense
    LU fallback with ``method="dense"`` for small/tests).

    ``precond`` overrides the default Jacobi preconditioner (e.g. a
    :class:`phifem_tpu.mg.VCycle`)."""
    matvec, diag, active = masked_operator(op, bcs)
    b = lift_rhs(op, b, bcs, active)

    if method == "dense":
        return _dense_solve(op, b, bcs, active)

    # Symmetric diagonal equilibration: phi-FEM penalty rows scale like
    # h^-3 against O(1) stiffness rows; solving D^-1/2 A D^-1/2 y = D^-1/2 b
    # compresses that dynamic range, which matters in float32 where the raw
    # system's Krylov recurrences stall several digits early.
    dsqrt = jax.tree.map(
        lambda d: jnp.sqrt(jnp.where(jnp.abs(d) > 1e-30, jnp.abs(d), 1.0)), diag
    )
    dinv_sqrt = jax.tree.map(lambda d: 1.0 / d, dsqrt)
    raw_matvec = matvec

    def matvec(y):
        xs = jax.tree.map(lambda yi, di: yi * di, y, dinv_sqrt)
        z = raw_matvec(xs)
        return jax.tree.map(lambda zi, di: zi * di, z, dinv_sqrt)

    b = jax.tree.map(lambda bi, di: bi * di, b, dinv_sqrt)

    if precond is not None:
        # wrap a preconditioner P ~ A^-1 of the unscaled system:
        # M = D^1/2 P D^1/2 ~ (D^-1/2 A D^-1/2)^-1
        M = lambda r: jax.tree.map(
            lambda vi, di: vi * di,
            precond(jax.tree.map(lambda ri, di: ri * di, r, dsqrt)),
            dsqrt,
        )
    else:
        # scaled system has unit diagonal
        M = lambda r: r

    if x0 is not None:
        x0 = jax.tree.map(lambda xi, di: xi * di, x0, dsqrt)

    if maxiter is None:
        maxiter = 25 * int(np.sqrt(op.system.num_dofs)) + 1000

    solvers = {
        "cg": jax.scipy.sparse.linalg.cg,
        "bicgstab": jax.scipy.sparse.linalg.bicgstab,
        "gmres": jax.scipy.sparse.linalg.gmres,
    }
    if method not in solvers:
        raise ValueError(f"Unknown method {method!r}.")
    kw = dict(tol=tol, atol=atol, maxiter=maxiter, M=M)
    if method == "gmres":
        kw.update(restart=50, solve_method="batched")

    # jit the whole Krylov iteration (matvec + preconditioner + recurrences)
    # into one program — essential on remote devices where eager dispatch
    # latency would otherwise dominate every V-cycle application.  The
    # compiled runner is memoized on the operator so repeated solves
    # (convergence loops, benchmarks) skip retracing entirely.
    # key on BC identities (the jitted closure bakes in their masks/values;
    # closures keep the bc objects alive so ids are stable) and on the
    # preconditioner's identity + mutation version (attach_interface_solve
    # bumps _version when it equips an already-built V-cycle)
    cache_key = (
        method,
        float(tol),
        float(atol),
        int(maxiter),
        id(precond),
        getattr(precond, "_version", 0),
        tuple(id(bc) for bc in bcs),
    )
    cache = getattr(op, "_solve_cache", None)
    if cache is None:
        cache = op._solve_cache = {}
    _run = cache.get(cache_key)
    if _run is None:

        @jax.jit
        def _run(b, x0):
            x, info = solvers[method](matvec, b, x0=x0, **kw)
            r = jax.tree.map(lambda bi, ai: bi - ai, b, matvec(x))
            rnorm = jnp.sqrt(tree_dot(r, r))
            bnorm = jnp.sqrt(tree_dot(b, b))
            return x, rnorm / jnp.maximum(bnorm, 1e-300)

        cache[cache_key] = _run

    if x0 is None:
        x0 = jax.tree.map(jnp.zeros_like, b)
    x, rel = _run(b, x0)
    rel = float(rel)
    # undo the equilibration change of variables: x = D^-1/2 y
    x = jax.tree.map(lambda yi, di: yi * di, x, dinv_sqrt)
    return SolveResult(x=x, residual=rel, iterations=-1, converged=rel <= 10 * tol)


def solve_ir(
    op: Operator,
    b: Dict[str, Array],
    bcs: Tuple[DirichletBC, ...] = (),
    precond: Optional[Callable] = None,
    method: str = "cg",
    tol: float = 1e-10,
    inner_tol: float = 1e-6,
    inner_maxiter: int = 100,
    max_outer: int = 6,
    inner_dtype=jnp.float32,
) -> SolveResult:
    """Mixed-precision iterative refinement: float32 Krylov corrections
    inside a full-precision residual loop.

    TPU v5e has no float64 hardware (f64 is software-emulated pairs of
    f32), so running the whole Krylov solve in f64 wastes the VPU *and*
    doubles HBM traffic.  Classical iterative refinement gets f64-grade
    residuals (the reference's MUMPS solves in f64,
    ``demo/weak-dirichlet/flower/main.py:162-182``) at f32 bandwidth:

        r_k = b - A x_k            (full precision, 1 matvec per round)
        solve A e ~= r_k           (f32 equilibrated CG/BiCGStab + precond)
        x_{k+1} = x_k + e

    Each round multiplies the residual by ``max(inner_tol, O(kappa(A) *
    eps_f32))`` — the f32 matvec's rounding alone injects a relative error
    ~kappa*eps32 per correction, which no inner accuracy can beat.  For 2D
    Poisson kappa ~ h^-2, so IR is the right tool up to ~1M DoFs (kappa
    1e6 -> ~0.1x/round worst case, usually far better); beyond that prefer
    full-precision CG with an f32 V-cycle *preconditioner* (``solve`` with
    ``precond=VCycle(dtype=f32)``), which converges at MG rate independent
    of kappa and stalls only at the f64 floor eps64*kappa.  ``precond``
    here should be an f32-compute preconditioner (e.g. ``VCycle(dtype=
    f32)``).
    """
    from .mg import _masked_matvec

    matvec_f, diag, active = masked_operator(op, bcs)
    b = lift_rhs(op, b, bcs, active)
    out_dtype = jax.tree.leaves(b)[0].dtype

    matvec_i, _, _ = _masked_matvec(op, bcs, inner_dtype)

    # symmetric diagonal equilibration of the inner system (see solve())
    dsqrt = jax.tree.map(
        lambda d: jnp.sqrt(jnp.where(jnp.abs(d) > 1e-30, jnp.abs(d), 1.0)), diag
    )
    dsqrt_i = jax.tree.map(lambda d: d.astype(inner_dtype), dsqrt)
    dinv_i = jax.tree.map(lambda d: 1.0 / d, dsqrt_i)

    def matvec_eq(y):
        xs = jax.tree.map(jnp.multiply, y, dinv_i)
        return jax.tree.map(jnp.multiply, matvec_i(xs), dinv_i)

    if precond is not None:
        M = lambda r: jax.tree.map(
            jnp.multiply,
            precond(jax.tree.map(jnp.multiply, r, dsqrt_i)),
            dsqrt_i,
        )
    else:
        M = lambda r: r

    solvers = {
        "cg": jax.scipy.sparse.linalg.cg,
        "bicgstab": jax.scipy.sparse.linalg.bicgstab,
    }

    cache_key = (
        "ir",
        method,
        float(inner_tol),
        int(inner_maxiter),
        str(inner_dtype),
        id(precond),
        getattr(precond, "_version", 0),
        tuple(id(bc) for bc in bcs),
    )
    cache = getattr(op, "_solve_cache", None)
    if cache is None:
        cache = op._solve_cache = {}
    runners = cache.get(cache_key)
    if runners is None:

        @jax.jit
        def _resid(x, b):
            r = jax.tree.map(lambda bi, ai: bi - ai, b, matvec_f(x))
            rel = jnp.sqrt(tree_dot(r, r)) / jnp.maximum(
                jnp.sqrt(tree_dot(b, b)), 1e-300
            )
            return r, rel

        @jax.jit
        def _correct(x, r):
            rs = jax.tree.map(
                lambda ri, di: ri.astype(inner_dtype) * di, r, dinv_i
            )
            es, _ = solvers[method](
                matvec_eq, rs, tol=inner_tol, atol=0.0, maxiter=inner_maxiter, M=M
            )
            return jax.tree.map(
                lambda xi, ei, di: xi + (ei * di).astype(out_dtype),
                x,
                es,
                dinv_i,
            )

        runners = cache[cache_key] = (_resid, _correct)
    _resid, _correct = runners

    x = jax.tree.map(jnp.zeros_like, b)
    r, rel = _resid(x, b)
    rel = float(rel)
    it = 0
    while rel > tol and it < max_outer:
        x = _correct(x, r)
        r, rel = _resid(x, b)
        rel = float(rel)
        it += 1
    return SolveResult(x=x, residual=rel, iterations=it, converged=rel <= tol)


def _dense_solve(op: Operator, b, bcs, active) -> SolveResult:
    A = op.to_dense()
    off = op.system.offsets()
    n = op.system.num_dofs
    act = np.zeros(n, bool)
    bv = np.zeros(n)
    for name, s in op.system.fields.items():
        sl = slice(off[name], off[name] + s.num_dofs)
        act[sl] = np.broadcast_to(
            np.asarray(active[name]), s.dof_shape
        ).reshape(-1)
        bv[sl] = np.asarray(b[name]).reshape(-1)
    A[~act, :] = 0.0
    A[:, ~act] = 0.0
    A[~act, ~act] = 1.0
    # least-squares = minimum-norm on any numerically-null pivots, the
    # analogue of the reference's MUMPS icntl 24/25 null-pivot handling
    xv, *_ = np.linalg.lstsq(A, bv, rcond=None)
    x = {}
    for name, s in op.system.fields.items():
        sl = slice(off[name], off[name] + s.num_dofs)
        x[name] = jnp.asarray(xv[sl].reshape(s.dof_shape))
    r = np.linalg.norm(A @ xv - bv) / max(np.linalg.norm(bv), 1e-300)
    return SolveResult(x=x, residual=float(r), iterations=1, converged=True)
