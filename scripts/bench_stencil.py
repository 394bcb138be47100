"""Fetch-synced stencil-matvec microbenchmark: XLA gather-form conv
(ops.lattice) vs the Pallas slab kernel (ops.pallas_stencil), f32.

Run on the TPU: python scripts/bench_stencil.py
NOTE: time only via VALUE FETCHES — through the axon tunnel,
jax.block_until_ready does not synchronize, so un-fetched timings
measure dispatch latency, not compute.
"""
import os, time
os.environ.setdefault("PHIFEM_X64", "1")
import jax, jax.numpy as jnp
import numpy as np

import phifem_tpu as pf
from phifem_tpu.models import BoxPoisson
from phifem_tpu.ops.lattice import _conv_interior, _embed
from phifem_tpu.ops.pallas_stencil import stencil_matvec_pallas

REP = 100

for n in (1024, 3200):
    grid = pf.Grid(n, n, ((0.0, 0.0), (1.0, 1.0)), pf.CellType.triangle)
    s = BoxPoisson(grid).setup(lambda x: jnp.ones(x.shape[:-1]))
    s.assemble(rhs=False)
    batch = s.op.batches[0]
    mg = s.lattice_solver(min_n=16, dtype=jnp.float32)
    R = C = n + 1
    ndofs = R * C

    @jax.jit
    def null(x):
        return x[0]

    x1 = jnp.full((ndofs,), 1e-3, jnp.float32)
    mats32 = batch.matrices.astype(jnp.float32)

    @jax.jit
    def loop_pallas(x):
        def body(i, x):
            return stencil_matvec_pallas(grid, x, None, mats32) * 0.05
        return jax.lax.fori_loop(0, REP, body, x)[5]

    xp = jnp.full((R + 2, C + 2), 1e-3, jnp.float32)

    @jax.jit
    def loop_xla(x):
        def body(i, x):
            return _embed(_conv_interior(x, mg.terms, R, C), R, C) * 0.05
        return jax.lax.fori_loop(0, REP, body, x)[5, 5]

    float(null(x1))
    t0 = time.perf_counter(); float(null(x1)); t_null = time.perf_counter() - t0
    float(loop_pallas(x1))
    t0 = time.perf_counter(); float(loop_pallas(x1)); t_p = time.perf_counter() - t0
    float(loop_xla(xp))
    t0 = time.perf_counter(); float(loop_xla(xp)); t_x = time.perf_counter() - t0
    per_p = (t_p - t_null) / REP
    per_x = (t_x - t_null) / REP
    print(f"n={n} ({ndofs/1e6:.2f}M DoF): pallas {per_p*1e3:.3f} ms ({ndofs/per_p/1e9:.2f} GDoF/s)"
          f"  xla-conv {per_x*1e3:.3f} ms ({ndofs/per_x/1e9:.2f} GDoF/s)", flush=True)
