"""S4 in 3D — Robin phi-FEM (mixed flux formulation) on the hex lattice.

The z-axis extension of :mod:`phifem_tpu.models.robin` (the reference,
``demo/robin/square/main.py:119-174``, is 2D-only):

  -Delta u + u = f in Omega,  du/dn + alpha u = u_R on Gamma

Identical machinery to :class:`~phifem_tpu.models.neumann3.NeumannPoisson3`
with two scheme deltas (mirroring the 2D S3 -> S4 differences,
models/robin.py:60-68 and :102):

* the penalized flux factor picks up the Robin term:
  ``y . grad phi  -  |grad phi| alpha u  +  h^-1 p phi``;
* ghost stabilization acts on the CUT-CUT faces only (the 2D dS(2)
  region) instead of every Omega_h face touching a cut cell.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .neumann3 import _NLOC, NeumannPoisson3

Array = jnp.ndarray


@dataclasses.dataclass
class RobinPoisson3(NeumannPoisson3):
    """3D phi-FEM Robin Poisson (mixed flux scheme) on a hex box grid."""

    robin_coef: float = 1.0

    def _build_flux_factor(self, Vt, phi_q, gphi, h, ne, nq, dt) -> Array:
        ngphi = jnp.sqrt(jnp.sum(gphi * gphi, axis=-1))  # (ne, nq)
        F3 = jnp.zeros((ne, nq, _NLOC), dt)
        F3 = F3.at[:, :, :8].set(
            -self.robin_coef * ngphi[:, :, None] * Vt[None, :, :]
        )
        for c in range(3):
            F3 = F3.at[:, :, 8 + 8 * c : 16 + 8 * c].set(
                gphi[:, :, c : c + 1] * Vt[None, :, :]
            )
        return F3.at[:, :, 32].set(phi_q / h)

    def _ghost_face_lists(self):
        """Cut-cut faces only (2D S4 stabilizes dS(2), robin.py:102)."""
        ct = self.tags.cell_tags
        cut = ct == 2
        out = []
        for ax in range(3):
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(None, -1)
            hi[ax] = slice(1, None)
            out.append(
                np.argwhere(cut[tuple(lo)] & cut[tuple(hi)]).astype(np.int32)
            )
        return tuple(out)
