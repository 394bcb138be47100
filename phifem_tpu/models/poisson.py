"""Plain Poisson on the full background box — the pure-multigrid path.

Not a phi-FEM scheme: no level set, no cut cells — every cell is a bulk
cell, so the whole operator is ONE uniform P1 stencil batch (the fused
Pallas kernel on TPU) and the V-cycle needs no interface correction.  This
is the north-star benchmark path (BASELINE.json: sub-second 10M-DoF Poisson
CG to 1e-10 relative residual) and the scaling probe for the stencil /
transfer kernels; the phi-FEM machinery (tagging, penalty, ghost) is
benchmarked separately by the S1 pipeline metric.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

from ..assembly import CellTerm, System, assemble_operator, assemble_vector
from ..grid import Grid
from ..solvers import DirichletBC, SolveResult, solve
from ..spaces import Function, Space, boundary_dof_mask, interpolate


@dataclasses.dataclass
class BoxPoisson:
    """-Delta u = f on the box, u = u_D on the box boundary, P1."""

    grid: Grid
    primal_degree: int = 1

    def setup(
        self,
        f: Union[Callable, Function],
        u_D: Union[Callable, Function, None] = None,
    ):
        g = self.grid
        V = Space.lagrange(g, self.primal_degree)
        self.V = V
        self.system = System({"u": V})
        self.f = f
        if u_D is None:
            u_D = lambda x: jnp.zeros(x.shape[:-1])
        self.u_D = u_D if isinstance(u_D, Function) else interpolate(u_D, V)
        self.bcs = (DirichletBC("u", boundary_dof_mask(V), self.u_D.data),)
        self._setup_args = (f, u_D)
        return self

    def assemble(self, rhs: bool = True):
        g = self.grid

        def stiffness(u, v, d, x, ctx):
            return jnp.dot(u["u"].grad, v["u"].grad)

        self.op = assemble_operator(
            self.system,
            g,
            cell_terms=[
                (
                    CellTerm(
                        stiffness, None, degree=2 * self.primal_degree, uniform=True
                    ),
                    {},
                )
            ],
        )
        if not rhs:
            return self

        f_h = self.f if isinstance(self.f, Function) else interpolate(self.f, self.V)

        # load vector as a mass-stencil matvec, b = M f_h (f interpolated
        # into V): on the uniform lattice the mass matrix is one more
        # orientation-stencil, so this reuses the exact kernel shapes the
        # V-cycle compiles anyway — instead of a dedicated 2*nc-cell
        # quadrature kernel whose cold compile dominates setup at 10M DoF
        def mass(u, v, d, x, ctx):
            return u["u"].val * v["u"].val

        M = assemble_operator(
            self.system,
            g,
            cell_terms=[
                (CellTerm(mass, None, degree=2 * self.primal_degree, uniform=True), {})
            ],
        )
        self.b = M.matvec({"u": f_h.data})
        return self

    def mg_preconditioner(self, min_n: int = 8, dtype=None, **vcycle_kw):
        """Geometric V-cycle: re-discretized uniform stiffness per level
        (one tiny uniform-term compile each — no tagging, no data terms)."""
        from ..mg import build_hierarchy

        def make_level(grid: Grid):
            if grid is self.grid:
                return self.op, self.bcs
            s = BoxPoisson(grid, self.primal_degree)
            s.setup(*self._setup_args)
            s.assemble(rhs=False)
            return s.op, s.bcs

        return build_hierarchy(
            self.grid, make_level, min_n=min_n, dtype=dtype, **vcycle_kw
        )

    def solve(self, method: str = "cg", tol: float = 1e-10, **kw) -> SolveResult:
        res = solve(self.op, self.b, bcs=self.bcs, method=method, tol=tol, **kw)
        self.result = res
        self.u_h = Function(self.V, res.x["u"])
        return res

    def solve_ir(self, tol: float = 1e-10, **kw) -> SolveResult:
        """Mixed-precision solve: f32 MG-preconditioned CG corrections in a
        full-precision iterative-refinement loop (solvers.solve_ir) — the
        north-star bench path (sub-second 10M-DoF Poisson to 1e-10)."""
        from ..solvers import solve_ir as _solve_ir

        precond = kw.pop("precond", None)
        if precond is None:
            precond = self.mg_preconditioner(dtype=jnp.float32)
        res = _solve_ir(self.op, self.b, bcs=self.bcs, precond=precond, tol=tol, **kw)
        self.result = res
        self.u_h = Function(self.V, res.x["u"])
        return res
