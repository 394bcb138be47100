"""SPMD sharding: the sharded solve must run on a multi-device mesh and
match the single-device solution (conftest forces an 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import phifem_tpu as pf
from phifem_tpu.models import WeakDirichletPoisson
from phifem_tpu.parallel import make_mesh, shard_vector, sharded_solve
from phifem_tpu.solvers import solve


def _problem(n):
    phi = lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 0.49
    uex = lambda x: jnp.cos(x[..., 0]) * jnp.sin(x[..., 1])
    f = lambda x: 2.0 * uex(x)
    g = pf.Grid(n, n, ((-1.0, -1.0), (1.0, 1.0)), "triangle")
    s = WeakDirichletPoisson(g, mode="bg")
    s.setup(phi, f, u_D=uex)
    s.assemble()
    return s


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_solve_matches_single_device():
    s = _problem(15)  # 16x16 = 256 vertex DoFs, divisible by 8
    mesh = make_mesh(8)
    x_sh, rel = sharded_solve(s.op, s.b, mesh, method="bicgstab", tol=1e-10, maxiter=3000)
    assert rel < 1e-8, rel
    ref = solve(s.op, s.b, method="dense")
    du = float(jnp.max(jnp.abs(x_sh["u"] - ref.x["u"])))
    assert du < 1e-6, du
    # DoF arrays really are distributed across the mesh
    xs = shard_vector(s.b, mesh)
    assert len(xs["u"].sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(len(jax.devices()))
