"""Element-distributed SPMD execution for unstructured (imported) meshes.

The reference's unstructured path inherits dolfinx's MPI partitioning:
cells are distributed over ranks, each rank assembles and applies its own
elements, and PETSc reduces the shared-DoF (ghost) contributions
(reference ``demo/weak-dirichlet/flower/main.py:46`` — every mesh lives on
``MPI.COMM_WORLD``).  The SPMD twin for the unstructured backend
(:mod:`phifem_tpu.uassembly`):

* every entity batch's ELEMENT axis is padded and sharded over a 1D
  ``jax.sharding.Mesh`` — the per-element work (gather -> batched local
  matmul -> scatter-add) is where the arithmetic lives;
* DoF vectors stay replicated — imported meshes are reference-scale
  (10^3-10^5 cells; the structured lattice is the scale path), so one
  vector copy per device is cheap and removes all halo bookkeeping on
  irregular connectivity;
* the matvec is ONE ``shard_map`` program: each device scatters its
  elements' contributions into a device-local accumulator and a single
  ``lax.psum`` reduces them — the MPI ghost-update analogue.

Unlike :class:`~phifem_tpu.parallel.halo.HaloOperator` (structured row
slabs, ppermute halo exchange, O(1) vector memory per device) this trades
replicated vectors for zero assumptions about mesh structure — exactly the
dolfinx decomposition contract the reference relies on.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assembly import Operator
from ..solvers import lift_rhs, tree_axpy, tree_dot

Array = jnp.ndarray

AXIS = "shard"

__all__ = ["ElementShardedOperator", "element_sharded_solve"]


def _rep(mesh: Mesh):
    return NamedSharding(mesh, P())


def _shd(mesh: Mesh):
    return NamedSharding(mesh, P(AXIS))


class ElementShardedOperator:
    """Entity batches sharded over the device mesh; replicated DoF vectors.

    The matvec acts as the reduced operator (identity on inactive/BC DoFs)
    like :func:`phifem_tpu.solvers.masked_operator`.  After
    ``op.reassemble()`` call :meth:`refresh` to re-shard the rebuilt
    data-dependent element matrices (geometry-uniform batches are
    constants and never change).
    """

    def __init__(self, op: Operator, mesh: Mesh, bcs=()):
        self.op, self.mesh, self.bcs = op, mesh, tuple(bcs)
        nP = mesh.shape[AXIS]
        self.nP = nP

        self._segdofs: List[List[Array]] = []
        self._segmeta: List[List[Tuple[str, Tuple[int, ...]]]] = []
        self._valid: List[Array] = []
        self._orient: List[Optional[Array]] = []
        self._nep: List[int] = []
        for b in op.batches:
            ne = b.segments[0][1].shape[0]
            ne_p = max(1, -(-ne // nP))
            self._nep.append(ne_p)
            valid = np.zeros(nP * ne_p, bool)
            valid[:ne] = True
            valid = valid.reshape(nP, ne_p)
            segdofs, segmeta = [], []
            for name, dofs, vs in b.segments:
                d = np.zeros((nP * ne_p,) + dofs.shape[1:], np.int32)
                d[:ne] = np.asarray(dofs)
                segdofs.append(
                    jax.device_put(d.reshape((nP, ne_p) + dofs.shape[1:]), _shd(mesh))
                )
                segmeta.append((name, tuple(vs)))
            self._segdofs.append(segdofs)
            self._segmeta.append(segmeta)
            self._valid.append(jax.device_put(valid, _shd(mesh)))
            if b.orient is not None:
                o = np.zeros(nP * ne_p, np.int32)
                o[:ne] = np.asarray(b.orient)
                self._orient.append(
                    jax.device_put(o.reshape(nP, ne_p), _shd(mesh))
                )
            else:
                self._orient.append(None)
        self._mats = self._shard_mats()

        # masked-operator data (replicated — vectors are replicated too)
        diag = op.diagonal()
        active = jax.tree.map(lambda d: d != 0.0, diag)
        for bc in bcs:
            active[bc.field] = jnp.logical_and(
                active[bc.field],
                jnp.logical_not(jnp.broadcast_to(bc.mask, active[bc.field].shape)),
            )
        self.active = active
        self.diag = jax.tree.map(
            lambda d, a: jnp.where(a, d, jnp.ones_like(d)), diag, active
        )
        self._mv = self._build_matvec()

    def _shard_mats(self) -> List[Array]:
        mats = []
        for b, ne_p, orient in zip(self.op.batches, self._nep, self._orient):
            if orient is not None:
                # uniform batch: tiny (norient, L, L) table — replicate
                mats.append(jax.device_put(jnp.asarray(b.matrices), _rep(self.mesh)))
            else:
                m = np.asarray(b.matrices)
                ne = m.shape[0]
                pad = np.zeros((self.nP * ne_p,) + m.shape[1:], m.dtype)
                pad[:ne] = m
                mats.append(
                    jax.device_put(
                        pad.reshape((self.nP, ne_p) + m.shape[1:]), _shd(self.mesh)
                    )
                )
        return mats

    def refresh(self) -> None:
        """Re-shard element matrices after ``op.reassemble()`` (the
        distributed-assembly step: rebuilt per-element matrices repartition
        over the mesh; dof tables/orientations are topology and never move)."""
        self._mats = self._shard_mats()

    # ------------------------------------------------------------- matvec
    def _build_matvec(self) -> Callable:
        segmeta = self._segmeta
        mesh = self.mesh

        def local_mv(x, segdofs, valids, mats_list, orients):
            y = jax.tree.map(jnp.zeros_like, x)
            for meta, dofs_l, valid, mats, orient in zip(
                segmeta, segdofs, valids, mats_list, orients
            ):
                dofs = [d[0] for d in dofs_l]  # (ne_p, nloc): leading dev axis
                ne_p = dofs[0].shape[0]
                parts = []
                for (f, vs), di in zip(meta, dofs):
                    parts.append(x[f][di].reshape(ne_p, -1))
                xg = jnp.concatenate(parts, axis=1)
                if orient is None:
                    yl = jnp.einsum("eij,ej->ei", mats[0], xg)
                else:
                    ol = orient[0]
                    yl = xg @ mats[0].T
                    for o in range(1, mats.shape[0]):
                        yl = jnp.where((ol == o)[:, None], xg @ mats[o].T, yl)
                    yl = yl * valid[0][:, None].astype(yl.dtype)
                cur = 0
                for (f, vs), di in zip(meta, dofs):
                    nloc = di.shape[1]
                    vsz = int(np.prod(vs)) if vs else 1
                    seg = yl[:, cur : cur + nloc * vsz].reshape((ne_p, nloc) + vs)
                    y[f] = y[f].at[di].add(seg)
                    cur += nloc * vsz
            return jax.tree.map(lambda v: lax.psum(v, AXIS), y)

        rep, shd = P(), P(AXIS)
        x_spec = {f: rep for f in self.op.system.fields}
        in_specs = (
            x_spec,
            [[shd for _ in ds] for ds in self._segdofs],
            [shd for _ in self._valid],
            [rep if o is not None else shd for o in self._orient],
            [None if o is None else shd for o in self._orient],
        )
        mv_sharded = jax.shard_map(
            local_mv, mesh=mesh, in_specs=in_specs, out_specs=x_spec
        )

        segdofs, valids, orients = self._segdofs, self._valid, self._orient
        active = self.active

        def matvec(x, mats_list=None):
            mats_list = self._mats if mats_list is None else mats_list
            xa = jax.tree.map(lambda xi, a: jnp.where(a, xi, 0.0), x, active)
            yv = mv_sharded(xa, segdofs, valids, mats_list, orients)
            return jax.tree.map(
                lambda yi, xi, a: jnp.where(a, yi, xi), yv, x, active
            )

        return matvec

    def matvec(self, x: Dict[str, Array]) -> Dict[str, Array]:
        """Masked distributed matvec on replicated DoF pytrees."""
        return self._mv(x)


def element_sharded_solve(
    op: Operator,
    b: Dict[str, Array],
    mesh: Mesh,
    bcs=(),
    method: str = "bicgstab",
    tol: float = 1e-10,
    atol: float = 0.0,
    maxiter: Optional[int] = None,
    deflate: Optional[Tuple[Dict[str, Array], ...]] = None,
):
    """Distributed Krylov solve on an imported (unstructured) mesh.

    The element work and the per-element assembly distribute over the
    mesh; the Krylov recurrence runs replicated (its vectors are) and the
    matvec's single psum is the only cross-device reduction per iteration
    — the SPMD replacement for PETSc's MPI KSP on a dolfinx-partitioned
    mesh (reference N13).  ``deflate`` carries known null-space modes
    (e.g. S5 rigid modes) exactly like :func:`phifem_tpu.solvers.solve`.

    Returns ``(x, relres, iterations)``.
    """
    E = ElementShardedOperator(op, mesh, bcs)
    b = lift_rhs(op, b, bcs, E.active, raw_matvec=None)
    b = jax.device_put(b, _rep(mesh))

    dsqrt = jax.tree.map(
        lambda d: jnp.sqrt(jnp.where(jnp.abs(d) > 1e-30, jnp.abs(d), 1.0)),
        E.diag,
    )
    dinv = jax.tree.map(lambda d: 1.0 / d, dsqrt)

    def mv_eq(y):
        xs = jax.tree.map(jnp.multiply, y, dinv)
        return jax.tree.map(jnp.multiply, E.matvec(xs), dinv)

    if maxiter is None:
        maxiter = 25 * int(math.isqrt(op.system.num_dofs)) + 1000

    from ..solvers import _pbicgstab, _pcg

    runner = {"cg": _pcg, "bicgstab": _pbicgstab}[method]

    @jax.jit
    def run(b, defl):
        beq = jax.tree.map(jnp.multiply, b, dinv)
        mv, M = mv_eq, lambda r: r
        if defl:
            ortho = []
            for v in defl:
                q = jax.tree.map(
                    lambda vi, m, di: jnp.where(m, vi, 0.0) * di,
                    v, E.active, dsqrt,
                )
                for o in ortho:
                    q = tree_axpy(-tree_dot(o, q), o, q)
                nrm = jnp.sqrt(tree_dot(q, q))
                q = jax.tree.map(lambda qi: qi / jnp.maximum(nrm, 1e-300), q)
                ortho.append(q)

            def _proj(v):
                for o in ortho:
                    v = tree_axpy(-tree_dot(o, v), o, v)
                return v

            mv_plain = mv_eq

            def mv(y):
                z = _proj(mv_plain(_proj(y)))
                for o in ortho:
                    z = tree_axpy(tree_dot(o, y), o, z)
                return z

            M = _proj
            beq = _proj(beq)

        x0 = jax.tree.map(jnp.zeros_like, beq)
        x, it = runner(mv, beq, x0, tol=tol, atol=atol, maxiter=maxiter, M=M)
        r = jax.tree.map(lambda bi, ai: bi - ai, beq, mv(x))
        rnorm = jnp.sqrt(tree_dot(r, r))
        bnorm = jnp.sqrt(tree_dot(beq, beq))
        if defl:
            x = _proj(x)
        x = jax.tree.map(jnp.multiply, x, dinv)
        return x, jnp.stack(
            [rnorm / jnp.maximum(bnorm, 1e-300), it.astype(rnorm.dtype)]
        )

    x, stats = run(b, deflate)
    stats = np.asarray(stats)
    return x, float(stats[0]), int(stats[1])
