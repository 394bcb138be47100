"""S2 in 3D — strong Dirichlet phi-FEM (u = phi * w) on the hex lattice.

The z-axis extension of :mod:`phifem_tpu.models.strong_dirichlet` (the
reference, ``demo/strong-dirichlet/flower/main.py:92-131``, is 2D-only):
the homogeneous Dirichlet condition is exact by construction since
u_h = phi * w_h vanishes on {phi = 0}.  Single Q1 field w:

  a(w; v) = int_{dx(1,2)} grad(phi w) . grad(phi v)
          - int_{Gamma_h} (grad(phi w) . n)(phi v)          (one-sided faces)
          + stab h^2 int_{dx(2)} Lap(phi w) Lap(phi v)
          + stab int_{ghost faces} h [grad(phi w) . n][grad(phi v) . n]

  L(v)    = int_{dx(1,2)} f (phi v) - stab h^2 int_{dx(2)} f Lap(phi v)

phi (and its gradient/Laplacian) are evaluated ANALYTICALLY at the
quadrature points; for trilinear w the cellwise Laplacian Lap(w) = 0, so
Lap(phi w) = 2 grad phi . grad w + w Lap phi pointwise.

Unlike S1/S3/S4-3D, the phi weight lives in EVERY term — no uniform bulk
stencil exists.  All four term families are batched (8, 8)/(16, 16)
per-entity matrices built by quadrature einsums and applied as
gather -> matmul -> scatter, which XLA fuses per batch.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..grid3 import Grid3
from ..solvers import SolveResult
from ..tagging3 import Tags3, compute_tags3
from .lattice_core import (
    cached_equilibrated_solve,
    cell_dofs_of,
    face_quadrature,
    face_quadrature_points,
    float_dtype,
    hex_quadrature,
    hex_quadrature_points,
    lattice_l2_h1_errors,
)

Array = jnp.ndarray


@dataclasses.dataclass
class StrongDirichletPoisson3:
    """3D phi-FEM strong-Dirichlet Poisson: -Lap u = f in {phi<0}, u = 0
    on {phi=0}, with the exact-by-construction ansatz u = phi w."""

    grid: Grid3
    stab_coef: float = 1.0

    # ------------------------------------------------------------ setup
    def setup(self, levelset: Callable, f: Callable):
        g = self.grid
        dt = float_dtype()
        self.tags: Tags3 = compute_tags3(g, levelset)
        self._levelset, self._f = levelset, f
        self.phi_lat = g.eval_at_vertices(levelset, dt)
        return self

    # ----------------------------------------------------------- helpers
    def _phi_eval(self, pts):
        """phi, grad phi, Lap phi at physical points (..., 3)."""
        ls = self._levelset
        phi = ls(pts)
        scalar = lambda p: ls(p[None])[0]
        grad = jax.vmap(jax.vmap(jax.grad(scalar)))(pts)
        lap = jax.vmap(
            jax.vmap(lambda p: jnp.trace(jax.hessian(scalar)(p)))
        )(pts)
        return phi, grad, lap

    def _cell_points(self, cells: np.ndarray, Pq: np.ndarray, dt):
        """(ne, nq, 3) physical quadrature points of cells (iz, iy, ix)."""
        g = self.grid
        hx, hy, hz = g.spacing
        (x0, y0, z0), _ = g.bbox
        orig = np.stack(
            [
                x0 + hx * cells[:, 2],
                y0 + hy * cells[:, 1],
                z0 + hz * cells[:, 0],
            ],
            axis=-1,
        )
        hs = np.array([hx, hy, hz])
        return jnp.asarray(orig[:, None, :] + (Pq * hs[None, :])[None, :, :], dt)

    # ------------------------------------------------- assembly (host prep)
    def assemble(self):
        g = self.grid
        dt = float_dtype()
        hx, hy, hz = g.spacing
        h = float(np.sqrt(hx * hx + hy * hy + hz * hz))
        self.h = h
        vol = hx * hy * hz
        stab = self.stab_coef
        D, R, C = g.lattice_shape
        self._DRC = (D, R, C)
        hs = np.array([hx, hy, hz])

        W, V, G = hex_quadrature(3)
        Pq = hex_quadrature_points(3)
        Gp = G / hs[None, None, :]  # (nq, 8, 3) physical gradients
        Wt = jnp.asarray(W, dt)
        Vt = jnp.asarray(V, dt)
        Gpt = jnp.asarray(Gp, dt)

        # ---- bulk stiffness over ALL Omega_h cells (phi-weighted)
        cells_h = np.argwhere(self.tags.region_mask((1, 2))).astype(np.int32)
        self.bulk_dofs = jnp.asarray(cell_dofs_of((D, R, C), cells_h), jnp.int32)
        pts = self._cell_points(cells_h, Pq, dt)
        phi, gphi, lphi = self._phi_eval(pts)  # (ne, nq), (ne, nq, 3), (ne, nq)
        # grad(phi w) coefficients per component: phi * dN_i/dc + N_i * dphi/dc
        Gc = (
            phi[:, :, None, None] * Gpt[None, :, :, :]
            + gphi[:, :, None, :] * Vt[None, :, :, None]
        )  # (ne, nq, 8, 3)
        self.E_bulk = vol * jnp.einsum("q,nqic,nqjc->nij", Wt, Gc, Gc)

        # ---- cut-cell Laplacian stabilization
        cut = self.tags.cut_cells()
        self.cut_dofs = jnp.asarray(cell_dofs_of((D, R, C), cut), jnp.int32)
        pts_c = self._cell_points(cut, Pq, dt)
        phi_c, gphi_c, lphi_c = self._phi_eval(pts_c)
        # Lap(phi w) coefficients: 2 grad phi . grad N_i + N_i Lap phi
        Lc = 2.0 * jnp.einsum("nqc,qic->nqi", gphi_c, Gpt) + (
            lphi_c[:, :, None] * Vt[None, :, :]
        )  # (ne, nq, 8)
        self.E_stab = (stab * h * h * vol) * jnp.einsum(
            "q,nqi,nqj->nij", Wt, Lc, Lc
        )

        # ---- ghost faces: batched (16, 16) phi-weighted jump matrices
        # (grad phi is continuous, so [grad(phi w) . n] = phi [dw/dn])
        self.ghost = []
        for ax in range(3):
            faces = self.tags.ghost_faces[ax]
            if faces.shape[0] == 0:
                continue
            Wf, V0, G0, k = face_quadrature(ax, at_upper=True)
            _, V1, G1, _ = face_quadrature(ax, at_upper=False)
            Pf = face_quadrature_points(ax, at_upper=True)
            area = vol / hs[k]
            dn0 = G0[:, :, k] / hs[k]
            dn1 = G1[:, :, k] / hs[k]
            J = jnp.asarray(np.concatenate([dn0, -dn1], axis=1), dt)  # (nqf, 16)
            fpts = self._cell_points(faces, Pf, dt)  # face sits at xi_k = 1
            phi_f = self._levelset(fpts)  # (nf, nqf)
            Eg = (stab * h * area) * jnp.einsum(
                "q,nq,qi,qj->nij", jnp.asarray(Wf, dt), phi_f * phi_f, J, J
            )
            upper = faces.copy()
            upper[:, ax] += 1
            dofs = np.concatenate(
                [cell_dofs_of((D, R, C), faces), cell_dofs_of((D, R, C), upper)],
                axis=1,
            )
            self.ghost.append((jnp.asarray(dofs, jnp.int32), Eg))

        # ---- Gamma_h one-sided boundary flux: -(grad(phi w) . n)(phi v)
        self.bdry = []
        for ax in range(3):
            for sign, faces in zip((+1, -1), self.tags.boundary_faces[ax]):
                if faces.shape[0] == 0:
                    continue
                Wf, Vf, Gf, k = face_quadrature(ax, at_upper=(sign > 0))
                Pf = face_quadrature_points(ax, at_upper=(sign > 0))
                area = vol / hs[k]
                dn = sign * Gf[:, :, k] / hs[k]  # outward-normal dN_i
                fpts = self._cell_points(faces, Pf, dt)
                phi_f, gphi_f, _ = self._phi_eval(fpts)
                dnphi = sign * gphi_f[:, :, k]  # outward n . grad phi
                # trial: phi dn_i + N_i (n.grad phi); test: phi N_j
                A = (
                    phi_f[:, :, None] * jnp.asarray(dn, dt)[None, :, :]
                    + dnphi[:, :, None] * jnp.asarray(Vf, dt)[None, :, :]
                )  # (nf, nqf, 8)
                B = phi_f[:, :, None] * jnp.asarray(Vf, dt)[None, :, :]
                Eb = -area * jnp.einsum(
                    "q,nqj,nqi->nij", jnp.asarray(Wf, dt), A, B
                )  # rows i = test, cols j = trial
                self.bdry.append(
                    (
                        jnp.asarray(cell_dofs_of((D, R, C), faces), jnp.int32),
                        Eb,
                    )
                )

        # ---- RHS: f (phi v) over Omega_h - stab h^2 f Lap(phi v) on cut
        N = D * R * C
        f_b = self._f(pts)  # (ne, nq) on Omega_h cells
        r_bulk = vol * jnp.einsum("q,nq,nq,qi->ni", Wt, f_b, phi, Vt)
        f_c = self._f(pts_c)
        r_stab = -(stab * h * h * vol) * jnp.einsum("q,nq,nqi->ni", Wt, f_c, Lc)
        b_w = jnp.zeros(N, dt).at[self.bulk_dofs.reshape(-1)].add(
            r_bulk.reshape(-1)
        )
        b_w = b_w.at[self.cut_dofs.reshape(-1)].add(r_stab.reshape(-1))
        self.b = {"w": b_w}

        # ---- diagonal / active
        diag = jnp.zeros(N, dt).at[self.bulk_dofs.reshape(-1)].add(
            jax.vmap(jnp.diag)(self.E_bulk).reshape(-1)
        )
        diag = diag.at[self.cut_dofs.reshape(-1)].add(
            jax.vmap(jnp.diag)(self.E_stab).reshape(-1)
        )
        for dofs, Eg in self.ghost:
            diag = diag.at[dofs.reshape(-1)].add(
                jax.vmap(jnp.diag)(Eg).reshape(-1)
            )
        for dofs, Eb in self.bdry:
            diag = diag.at[dofs.reshape(-1)].add(
                jax.vmap(jnp.diag)(Eb).reshape(-1)
            )
        active = {"w": diag != 0.0}
        self.diag = {"w": jnp.where(active["w"], diag, 1.0)}
        self.active = active
        return self

    # ------------------------------------------------------------- matvec
    def matvec(self, x: Dict[str, Array]) -> Dict[str, Array]:
        w = x["w"]
        y = jnp.zeros_like(w)
        for dofs, E in (
            (self.bulk_dofs, self.E_bulk),
            (self.cut_dofs, self.E_stab),
            *self.ghost,
            *self.bdry,
        ):
            y = y.at[dofs.reshape(-1)].add(
                jnp.einsum("nij,nj->ni", E, w[dofs]).reshape(-1)
            )
        return {"w": y}

    # -------------------------------------------------------------- solve
    def solve(
        self,
        method: str = "bicgstab",
        tol: float = 1e-10,
        maxiter: int = 8000,
        precond=None,
    ) -> SolveResult:
        x, rel, it = cached_equilibrated_solve(
            self, method, tol, maxiter, precond
        )
        self.w_lat = x["w"].reshape(self._DRC)
        # nodal product u_h = phi_h w_h (reference main.py:159-165)
        self.u_lat = jnp.asarray(self.phi_lat) * self.w_lat
        self.result = SolveResult(
            x=x, residual=rel, iterations=it, converged=rel <= 10 * tol
        )
        return self.result

    # ------------------------------------------------------------- errors
    def l2_h1_errors(self, exact: Callable, region=(1,)) -> Dict[str, float]:
        """Errors of u_h = phi w against the exact u, over INTERIOR cells
        by default (u = phi w only approximates u inside Omega; on cut
        cells phi_h w_h extends past Gamma where u_ex = phi w_ex does not
        match a generic smooth extension)."""
        return lattice_l2_h1_errors(
            self.grid, self.tags.region_mask(region), self.u_lat, exact
        )
