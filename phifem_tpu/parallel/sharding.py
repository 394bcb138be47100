"""Domain-decomposed execution of assembly/solve over a device mesh.

Decomposition: 1D partition over the DoF/entity leading axes (the FEM
analogue of data parallelism — a spatial slab decomposition of the
structured background grid, since both vertex and facet numbering are
row-major in y).  The matrix-free matvec's gather/scatter at slab seams
becomes XLA-inserted collectives; CG/BiCGStab dot products become psums.

This module is exercised two ways:
* single-chip: constraints are no-ops, zero overhead;
* multi-chip dry run (``__graft_entry__.dryrun_multichip``): an N-device CPU
  mesh compiles and executes one full solve step, validating the sharded
  program end-to-end without N physical chips.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..assembly import Operator
from ..solvers import lift_rhs, masked_operator

Array = jnp.ndarray

AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1D device mesh over the spatial-decomposition axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _pad_to(v: Array, n: int) -> Array:
    """Zero-pad the leading axis to a multiple of n (so the DoF axis always
    genuinely shards — no silent replication on awkward sizes)."""
    r = (-v.shape[0]) % n
    if r == 0:
        return v
    return jnp.concatenate(
        [v, jnp.zeros((r,) + v.shape[1:], v.dtype)], axis=0
    )


def _spec_for(v: Array, mesh: Mesh) -> NamedSharding:
    """Shard the leading (scalar-DoF) axis (callers pad to divisibility)."""
    n = mesh.shape[AXIS]
    lead = AXIS if v.shape[0] % n == 0 else None
    return NamedSharding(mesh, P(lead, *([None] * (v.ndim - 1))))


def shard_vector(x: Dict[str, Array], mesh: Mesh) -> Dict[str, Array]:
    """Place a DoF pytree with the leading (scalar-DoF) axis sharded."""
    return {k: jax.device_put(v, _spec_for(v, mesh)) for k, v in x.items()}


def _constrain(x: Dict[str, Array], mesh: Mesh) -> Dict[str, Array]:
    return {
        k: jax.lax.with_sharding_constraint(v, _spec_for(v, mesh))
        for k, v in x.items()
    }


def sharded_matvec_fn(op: Operator, mesh: Mesh, bcs=()):
    """The masked operator matvec with sharding constraints on input and
    output DoF vectors (XLA partitions the gathers/scatters in between)."""
    matvec, diag, active = masked_operator(op, bcs)

    def mv(x):
        x = _constrain(x, mesh)
        y = matvec(x)
        return _constrain(y, mesh)

    return mv, diag, active


def sharded_solve(
    op: Operator,
    b: Dict[str, Array],
    mesh: Mesh,
    bcs=(),
    method: str = "bicgstab",
    tol: float = 1e-10,
    maxiter: int = 1000,
    grid=None,
):
    """jit-compiled sharded Krylov solve over the mesh; returns (x, relres).

    Prefers the explicit row-slab halo-exchange decomposition
    (:mod:`.halo`): shard_map matvec with collective-permute halo traffic
    and psum'd Krylov dot products — the SPMD replacement for PETSc's
    MPI-collective KSP (reference N9/N13).  Falls back to GSPMD sharding
    constraints (XLA-chosen partitioning of the gathers) for systems the
    slab decomposition does not cover (degree > 1 fields).
    """
    if grid is None:
        grid = next(iter(op.system.fields.values())).grid
    try:
        from .halo import UnsupportedFieldError, halo_solve

        return halo_solve(
            op, grid, b, mesh, bcs=bcs, method=method, tol=tol, maxiter=maxiter
        )
    except UnsupportedFieldError:
        pass

    mv, diag, active = sharded_matvec_fn(op, mesh, bcs)
    b = lift_rhs(op, b, bcs, active)
    inv_diag = jax.tree.map(lambda d: 1.0 / d, diag)
    n = mesh.shape[AXIS]
    shapes = {k: v.shape for k, v in b.items()}

    def unpad(x):
        return {k: x[k][: shapes[k][0]] for k in x}

    def mv_pad(x):
        y = mv(unpad(x))
        return _constrain(
            {k: _pad_to(y[k], n) for k in y}, mesh
        )

    def M(x):
        z = jax.tree.map(lambda xi, di: xi * di, unpad(x), inv_diag)
        return _constrain({k: _pad_to(z[k], n) for k in z}, mesh)

    solver = {
        "cg": jax.scipy.sparse.linalg.cg,
        "bicgstab": jax.scipy.sparse.linalg.bicgstab,
    }[method]

    @jax.jit
    def run(b):
        b = _constrain({k: _pad_to(v, n) for k, v in b.items()}, mesh)
        x, _ = solver(mv_pad, b, tol=tol, atol=0.0, maxiter=maxiter, M=M)
        r = jax.tree.map(lambda bi, ai: bi - ai, b, mv_pad(x))
        rn = jnp.sqrt(
            jax.tree.reduce(
                jnp.add, jax.tree.map(lambda v: jnp.vdot(v, v), r)
            )
        )
        bn = jnp.sqrt(
            jax.tree.reduce(
                jnp.add, jax.tree.map(lambda v: jnp.vdot(v, v), b)
            )
        )
        return unpad(x), rn / jnp.maximum(bn, 1e-300)

    with mesh:
        x, rel = run(shard_vector(b, mesh))
    return x, float(rel)
