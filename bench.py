"""Benchmark: phi-FEM stabilized assembly + solve throughput on the
reference's headline config (S1 weak-Dirichlet flower, 200x200 background,
demo/weak-dirichlet/flower/main.py:45-46).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the BASELINE.json north-star target of 100 MDoF/s stabilized
assembly.

Runs in float32 (production/serving dtype on TPU; the MXU path) — accuracy
tests run in float64 on CPU in tests/.
"""

import json
import os
import sys
import time

os.environ.setdefault("PHIFEM_X64", "0")

import jax
import jax.numpy as jnp


def main():
    import phifem_tpu as pf
    from phifem_tpu.models import WeakDirichletPoisson
    from phifem_tpu.solvers import masked_operator

    n = int(os.environ.get("PHIFEM_BENCH_N", "200"))
    grid = pf.Grid(n, n, ((-4.5, -4.5), (4.5, 4.5)), pf.CellType.triangle)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "demo", "weak-dirichlet", "flower"))
    from data import detection_levelset, levelset, source_term

    s = WeakDirichletPoisson(grid, mode="bg", detection_degree=1, single_layer_cut=True)

    t0 = time.perf_counter()
    s.setup(levelset, source_term, detection_levelset=detection_levelset)
    jax.block_until_ready(s.cell_tags)
    t_tag = time.perf_counter() - t0

    # assembly: warm-up (compile) then timed re-run
    s.assemble()
    jax.block_until_ready(s.b["u"])
    t0 = time.perf_counter()
    s.assemble()
    jax.block_until_ready(s.b["u"])
    t_asm = time.perf_counter() - t0

    ndofs = s.system.num_dofs
    asm_mdofs = ndofs / t_asm / 1e6

    # solver hot kernel: preconditioned matvec throughput
    matvec, diag, active = masked_operator(s.op)
    x = jax.tree.map(jnp.ones_like, s.b)
    mv = jax.jit(matvec)
    y = mv(x)
    jax.block_until_ready(y)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        x = mv(x)
    jax.block_until_ready(x)
    t_mv = (time.perf_counter() - t0) / iters
    mv_mdofs = ndofs / t_mv / 1e6

    result = {
        "metric": "s1_flower_stabilized_assembly",
        "value": round(asm_mdofs, 3),
        "unit": "MDoF/s",
        "vs_baseline": round(asm_mdofs / 100.0, 3),
        "extra": {
            "ndofs": ndofs,
            "tag_s": round(t_tag, 4),
            "assemble_s": round(t_asm, 4),
            "matvec_s": round(t_mv, 6),
            "matvec_mdofs": round(mv_mdofs, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
