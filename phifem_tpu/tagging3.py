"""3D cell/face tagging on the structured hex lattice.

The z-axis extension of :mod:`phifem_tpu.tagging` (the reference's
`compute_tags_measures`, `mesh_scripts.py:136-214`, is 2D-only).  Vertex-
sign classification (detection degree 1): a cell is *inside* (tag 1) when
phi < 0 at all 8 corners, *outside* (tag 3) when phi >= 0 at all corners,
*cut* (tag 2) otherwise — computed as shifted-slice reductions on the
device-resident phi lattice, one int8 fetch per tagging (the 2D host
discipline).

Faces are classified per axis orientation from the cell-tag lattice:

* ghost faces (stabilization region): interior faces whose two cells are
  both in Omega_h {1, 2} with at least one cut — the 3D analogue of the
  2D facet-tag (2, 3) region of `tagging.tag_facets`;
* Gamma_h faces (one-sided boundary measure, id 100): faces between a
  cell in {1, 2} and a cell in {3}, integration/normal from the Omega_h
  side — the 3D `measures.one_sided_facets`.  Domains are assumed
  strictly inside the box (the 2D golden geometries' box-crossing cases
  need the box-face extension).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid3 import Grid3

Array = jnp.ndarray


@jax.jit
def _cell_tags_from_phi(phi_lat: Array) -> Array:
    """(D, R, C) vertex phi -> (nz, ny, nx) int8 cell tags 1/2/3."""
    neg = phi_lat < 0.0
    all_neg = None
    any_neg = None
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                c = neg[
                    dz : phi_lat.shape[0] - 1 + dz,
                    dy : phi_lat.shape[1] - 1 + dy,
                    dx : phi_lat.shape[2] - 1 + dx,
                ]
                all_neg = c if all_neg is None else (all_neg & c)
                any_neg = c if any_neg is None else (any_neg | c)
    return jnp.where(
        all_neg, jnp.int8(1), jnp.where(any_neg, jnp.int8(2), jnp.int8(3))
    ).astype(jnp.int8)


@dataclasses.dataclass(frozen=True)
class Tags3:
    """Host-side tagging result: cell-tag lattice + per-orientation face
    index lists (static shapes for the assembly/solve path)."""

    grid: Grid3
    cell_tags: np.ndarray  # (nz, ny, nx) int8
    # per axis k (0=x, 1=y, 2=z): ghost interior faces as the (iz, iy, ix)
    # of the LOWER cell (the face sits between cell and cell+e_k)
    ghost_faces: Tuple[np.ndarray, np.ndarray, np.ndarray]
    # Gamma_h faces per axis and side: (cells_inside, sign) where sign=+1
    # means the outward normal is +e_k (inside cell below the face)
    boundary_faces: Tuple[Tuple[np.ndarray, np.ndarray], ...]

    @property
    def num_cut_cells(self) -> int:
        return int((self.cell_tags == 2).sum())

    def cut_cells(self) -> np.ndarray:
        """(ne, 3) int32 (iz, iy, ix) of cut cells."""
        return np.argwhere(self.cell_tags == 2).astype(np.int32)

    def region_mask(self, tags=(1, 2)) -> np.ndarray:
        return np.isin(self.cell_tags, np.asarray(tags))

    def faces_between(self, tags_a, tags_b):
        """Per-axis ONE-SIDED interior face lists between region A and
        region B: for each slicing axis ``ax``, ``(cells_plus, cells_minus)``
        where each entry is the (iz, iy, ix) of the A-side cell and the
        outward (A -> B) normal is +e_ax for the plus list, -e_ax for the
        minus list.  Generalizes ``boundary_faces`` (A={1,2}, B={3}) to
        arbitrary regions — the 3D analogue of the 2D one-sided measures
        100/101 (`tagging.py:492-502`) and S5's per-side face families."""
        A = np.isin(self.cell_tags, np.asarray(tags_a))
        B = np.isin(self.cell_tags, np.asarray(tags_b))
        out = []
        for ax in (0, 1, 2):
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(None, -1)
            hi[ax] = slice(1, None)
            plus = np.argwhere(A[tuple(lo)] & B[tuple(hi)]).astype(np.int32)
            minus = np.argwhere(B[tuple(lo)] & A[tuple(hi)]).astype(np.int32)
            minus[:, ax] += 1  # the A-side (upper) cell
            out.append((plus, minus))
        return tuple(out)

    def jump_faces_between(self, tags_a, tags_b):
        """Per-axis LOWER-cell lists of interior faces whose two cells lie
        one in region A and one in region B (either orientation) — the
        jump-stabilization families (the 2D facet-tag regions 3 = 1|2 and
        4 = 2|3 of `tagging.tag_facets`)."""
        A = np.isin(self.cell_tags, np.asarray(tags_a))
        B = np.isin(self.cell_tags, np.asarray(tags_b))
        out = []
        for ax in (0, 1, 2):
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(None, -1)
            hi[ax] = slice(1, None)
            m = (A[tuple(lo)] & B[tuple(hi)]) | (B[tuple(lo)] & A[tuple(hi)])
            out.append(np.argwhere(m).astype(np.int32))
        return tuple(out)


def compute_tags3(grid: Grid3, levelset: Callable) -> Tags3:
    """Tag the 3D grid: one device kernel + one int8 fetch, then
    closed-form host face classification."""
    phi_lat = grid.eval_at_vertices(levelset)
    ct = np.asarray(_cell_tags_from_phi(phi_lat))  # the single fetch

    in_h = (ct == 1) | (ct == 2)  # Omega_h cells
    n_border = int(
        in_h[0].sum() + in_h[-1].sum()
        + in_h[:, 0].sum() + in_h[:, -1].sum()
        + in_h[:, :, 0].sum() + in_h[:, :, -1].sum()
    )
    if n_border > 0:
        warnings.warn(
            f"{n_border} Omega_h cell(s) touch the background-box boundary:"
            " the box must contain Omega_h strictly (phi-FEM containment"
            " assumption) or the Gamma_h face set is incomplete there and"
            " the scheme loses consistency. Enlarge the box or refine.",
            RuntimeWarning,
            stacklevel=2,
        )
    cut = ct == 2
    out = ct == 3

    ghost = []
    bdry = []
    # axis k in lattice order (z, y, x) -> slicing axis 0/1/2 of ct; we
    # expose faces keyed by the SLICING axis so consumers shift the same way
    for ax in (0, 1, 2):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(None, -1)
        hi[ax] = slice(1, None)
        a, b = ct[tuple(lo)], ct[tuple(hi)]
        both_in = in_h[tuple(lo)] & in_h[tuple(hi)]
        a_cut = cut[tuple(lo)] | cut[tuple(hi)]
        ghost.append(np.argwhere(both_in & a_cut).astype(np.int32))
        # Gamma_h: inside-below/outside-above -> outward normal +e_ax
        plus = np.argwhere(in_h[tuple(lo)] & out[tuple(hi)]).astype(np.int32)
        # outside-below/inside-above -> inside cell is the UPPER one,
        # outward normal -e_ax; store the inside cell's index
        minus_faces = np.argwhere(out[tuple(lo)] & in_h[tuple(hi)])
        minus = minus_faces.astype(np.int32)
        minus[:, ax] += 1  # inside (upper) cell
        bdry.append((plus, minus))
    return Tags3(grid, ct, tuple(ghost), tuple(bdry))
