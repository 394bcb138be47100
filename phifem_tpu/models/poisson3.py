"""3D box Poisson/Helmholtz on the hex lattice — the pure-multigrid path.

The 3D sibling of :class:`phifem_tpu.models.poisson.BoxPoisson`
(reference has no 3D at all): ``alpha * (-Δu) + beta * u = f`` on the box,
``u = u_D`` on the boundary, Q1 hexahedra, solved by the lattice-resident
MG-preconditioned CG of :mod:`phifem_tpu.ops.lattice3` — everything
(load-vector mass convolution, Dirichlet lift, Krylov loop) runs as 3D
shifted-slice arithmetic in one jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..grid3 import Grid3
from ..solvers import SolveResult

Array = jnp.ndarray


def _float_dtype():
    from jax import config

    return jnp.float64 if config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass
class BoxPoisson3:
    """``alpha * (-Δu) + beta * u = f`` on the box, u = u_D on ∂box, Q1."""

    grid: Grid3
    alpha: float = 1.0
    beta: float = 0.0

    def setup(self, f: Callable, u_D: Optional[Callable] = None):
        g = self.grid
        dt = _float_dtype()
        self.f_lat = g.eval_at_vertices(f, dt)
        if u_D is None:
            self.uD_lat = jnp.zeros(g.lattice_shape, dt)
        else:
            self.uD_lat = g.eval_at_vertices(u_D, dt)
        return self

    def assemble(self):
        """Load vector b = M f_h as the 27-point mass-stencil convolution
        (interior rows only; boundary rows are overwritten by the
        Dirichlet lift — same shortcut as the 2D BoxPoisson)."""
        from ..ops.lattice3 import (
            _conv_interior3,
            _terms3,
            hex_element_matrix,
            vertex_stencil_weights3,
        )

        g = self.grid
        hx, hy, hz = g.spacing
        mass_terms = _terms3(
            vertex_stencil_weights3(
                hex_element_matrix(hx, hy, hz, stiffness=0.0, mass=1.0)
            )
        )
        D, R, C = g.lattice_shape
        fd = self.f_lat

        fp = jnp.zeros((D + 2, R + 2, C + 2), fd.dtype).at[
            1 : 1 + D, 1 : 1 + R, 1 : 1 + C
        ].set(fd)
        b = jnp.zeros((D, R, C), fd.dtype).at[1:-1, 1:-1, 1:-1].set(
            _conv_interior3(fp, mass_terms, D, R, C)
        )
        self.b_lat = b
        return self

    def lattice_solver(self, min_n: int = 8, dtype=jnp.float32, **kw):
        from ..ops.lattice3 import build_lattice3_mg

        g = self.grid
        return build_lattice3_mg(
            g.nx, g.ny, g.nz, g.spacing,
            stiffness=self.alpha, mass=self.beta,
            min_n=min_n, dtype=dtype, **kw,
        )

    def solve_lattice(
        self, tol: float = 1e-10, maxiter: int = 60, mg=None
    ) -> SolveResult:
        from ..ops.lattice3 import _conv_interior3, _embed3, lattice3_cg

        if mg is None:
            mg = self._lattice_mg = getattr(self, "_lattice_mg", None) or (
                self.lattice_solver()
            )
        g = self.grid
        D, R, C = g.lattice_shape

        key = ("lattice3", id(mg), float(tol), int(maxiter))
        cache = getattr(self, "_lat_cache", None)
        if cache is None:
            cache = self._lat_cache = {}
        runner = cache.get(key)
        if runner is None:

            @jax.jit
            def runner(b3, uD3):
                border = jnp.zeros((D, R, C), bool)
                border = border.at[0].set(True).at[-1].set(True)
                border = border.at[:, 0].set(True).at[:, -1].set(True)
                border = border.at[:, :, 0].set(True).at[:, :, -1].set(True)
                xD = jnp.where(border, uD3, 0.0)
                xDp = jnp.zeros((D + 2, R + 2, C + 2), b3.dtype).at[
                    1 : 1 + D, 1 : 1 + R, 1 : 1 + C
                ].set(xD)
                lift = _conv_interior3(xDp, mg.levels[0].terms, D, R, C)
                bp = _embed3(b3[1:-1, 1:-1, 1:-1] - lift, D, R, C)
                xp, rel, it = lattice3_cg(mg, bp, tol=tol, maxiter=maxiter)
                u3 = xp[1 : 1 + D, 1 : 1 + R, 1 : 1 + C] + xD
                return u3, jnp.stack([rel, it.astype(b3.dtype)])

            cache[key] = runner

        u3, stats = runner(self.b_lat, self.uD_lat)
        stats = np.asarray(stats)
        rel, it = float(stats[0]), int(stats[1])
        self.u_lat = u3
        return SolveResult(
            x={"u": u3.reshape(-1)}, residual=rel, iterations=it,
            converged=rel <= tol,
        )
