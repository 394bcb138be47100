"""Geometric multigrid on the structured background grid.

The reference relies on MUMPS LU (direct) for every solve
(``demo/weak-dirichlet/flower/main.py:162-182``); the TPU-native replacement
is Krylov + a geometric V-cycle preconditioner, which on this structured
grid costs only stencil transfers (cf. PAPERS.md: "A multigrid method for
CutFEM and its implementation on GPU" — re-discretized coarse levels with
level-wise tagging are the standard CutFEM/phi-FEM multigrid design).

Components, all matrix-free and shardable:

* hierarchy: grids ``n, n/2, n/4, ...`` (the uniform-refinement inverse of
  reference N11); each level is *re-discretized* (the scheme is assembled,
  with its own level-set tagging, on the coarse grid);
* transfers on P1 vertex lattices: prolongation = bilinear interpolation,
  restriction = its transpose (full weighting) — pure 2D stencils;
* smoother: damped Jacobi (weight 0.67) using the assembled diagonal, with
  inactive DoFs held fixed;
* coarse solve: a few extra smoothing sweeps (the hierarchy bottoms out on
  a tiny grid where Jacobi contracts quickly).

Works on single-field *and* mixed systems: transfers act on each scalar-P1
field's vertex lattice; non-vertex fields (DG0 etc.) are smoothed only
(treated as fine-level-local) — adequate because phi-FEM auxiliary fields
only appear on cut cells.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid import Grid

Array = jnp.ndarray

__all__ = ["VCycle", "build_hierarchy"]


def _is_vertex_lattice(grid: Grid, n: int) -> bool:
    return n == grid.num_vertices


def prolong(coarse: Array, gc: Grid, gf: Grid) -> Array:
    """Bilinear prolongation between vertex lattices (gc -> gf = gc.refine()).

    Fine vertex (2i, 2j) copies coarse (i, j); odd points average neighbours.
    """
    X = coarse.reshape(gc.ny + 1, gc.nx + 1)
    ny, nx = gf.ny + 1, gf.nx + 1
    out = jnp.zeros((ny, nx), coarse.dtype)
    out = out.at[::2, ::2].set(X)
    out = out.at[::2, 1::2].set(0.5 * (X[:, :-1] + X[:, 1:]))
    out = out.at[1::2, ::2].set(0.5 * (X[:-1, :] + X[1:, :]))
    out = out.at[1::2, 1::2].set(
        0.25 * (X[:-1, :-1] + X[:-1, 1:] + X[1:, :-1] + X[1:, 1:])
    )
    return out.reshape(-1)


def restrict(fine: Array, gf: Grid, gc: Grid) -> Array:
    """Full-weighting restriction (transpose of :func:`prolong`)."""
    Y = fine.reshape(gf.ny + 1, gf.nx + 1)
    ny, nx = gc.ny + 1, gc.nx + 1
    out = Y[::2, ::2]
    # horizontal odd neighbours
    out = out.at[:, :-1].add(0.5 * Y[::2, 1::2])
    out = out.at[:, 1:].add(0.5 * Y[::2, 1::2])
    # vertical odd neighbours
    out = out.at[:-1, :].add(0.5 * Y[1::2, ::2])
    out = out.at[1:, :].add(0.5 * Y[1::2, ::2])
    # diagonal odd-odd
    q = 0.25 * Y[1::2, 1::2]
    out = out.at[:-1, :-1].add(q)
    out = out.at[:-1, 1:].add(q)
    out = out.at[1:, :-1].add(q)
    out = out.at[1:, 1:].add(q)
    return out.reshape(-1)


@dataclasses.dataclass
class Level:
    grid: Grid
    matvec: Callable  # masked operator matvec on this level
    inv_diag: Dict[str, Array]
    active: Dict[str, Array]


@dataclasses.dataclass
class VCycle:
    """V-cycle preconditioner M^{-1} ~ A^{-1} over a grid hierarchy."""

    levels: List[Level]  # fine -> coarse
    vertex_fields: Tuple[str, ...]
    pre_smooth: int = 2
    post_smooth: int = 2
    coarse_sweeps: int = 12
    omega: float = 0.67

    def _smooth(self, lvl: Level, x, b, sweeps: int):
        for _ in range(sweeps):
            r = jax.tree.map(lambda bi, ai: bi - ai, b, lvl.matvec(x))
            x = jax.tree.map(
                lambda xi, ri, di, m: jnp.where(m, xi + self.omega * ri * di, xi),
                x,
                r,
                lvl.inv_diag,
                lvl.active,
            )
        return x

    def _cycle(self, k: int, b):
        lvl = self.levels[k]
        zero = jax.tree.map(jnp.zeros_like, b)
        if k == len(self.levels) - 1:
            return self._smooth(lvl, zero, b, self.coarse_sweeps)
        x = self._smooth(lvl, zero, b, self.pre_smooth)
        r = jax.tree.map(lambda bi, ai: bi - ai, b, lvl.matvec(x))
        coarse_lvl = self.levels[k + 1]
        rc = {}
        for name, v in r.items():
            if name in self.vertex_fields:
                if v.ndim == 1:
                    rc[name] = restrict(v, lvl.grid, coarse_lvl.grid)
                else:
                    flat = v.reshape(v.shape[0], -1)
                    cols = [
                        restrict(flat[:, j], lvl.grid, coarse_lvl.grid)
                        for j in range(flat.shape[1])
                    ]
                    rc[name] = jnp.stack(cols, axis=-1).reshape(
                        (-1,) + v.shape[1:]
                    )
            else:
                # non-vertex fields (DG0 etc.) live on the fine level only;
                # the coarse system sees a zero right-hand side for them
                rc[name] = jnp.zeros_like(coarse_lvl.inv_diag[name])
        ec = self._cycle(k + 1, rc)
        for name in b:
            if name in self.vertex_fields:
                v = ec[name]
                if v.ndim == 1:
                    corr = prolong(v, coarse_lvl.grid, lvl.grid)
                else:
                    flat = v.reshape(v.shape[0], -1)
                    cols = [
                        prolong(flat[:, j], coarse_lvl.grid, lvl.grid)
                        for j in range(flat.shape[1])
                    ]
                    corr = jnp.stack(cols, axis=-1).reshape((-1,) + b[name].shape[1:])
                x[name] = jnp.where(
                    lvl.active[name], x[name] + corr, x[name]
                )
        x = self._smooth(lvl, x, b, self.post_smooth)
        return x

    def __call__(self, b):
        return self._cycle(0, b)


def build_hierarchy(
    fine_grid: Grid,
    make_level: Callable[[Grid], Tuple[Callable, Dict, Dict]],
    min_n: int = 8,
    **vcycle_kw,
) -> VCycle:
    """Build a V-cycle from a level factory.

    ``make_level(grid) -> (matvec, inv_diag, active)`` re-discretizes the
    problem on each coarser grid (with its own tagging).  Coarsening stops
    when nx or ny would drop below ``min_n`` or become odd.
    """
    grids = [fine_grid]
    g = fine_grid
    while (
        g.nx % 2 == 0
        and g.ny % 2 == 0
        and g.nx // 2 >= min_n
        and g.ny // 2 >= min_n
    ):
        g = Grid(g.nx // 2, g.ny // 2, g.bbox, g.cell_type)
        grids.append(g)

    levels = []
    vertex_fields: Optional[Tuple[str, ...]] = None
    for g in grids:
        matvec, inv_diag, active = make_level(g)
        if vertex_fields is None:
            vertex_fields = tuple(
                n for n, v in active.items() if v.shape[0] == g.num_vertices
            )
        levels.append(Level(g, matvec, inv_diag, active))
    return VCycle(levels, vertex_fields, **vcycle_kw)
