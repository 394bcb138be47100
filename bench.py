"""Benchmark: end-to-end phi-FEM pipeline on the reference's headline config
(S1 weak-Dirichlet flower, 200x200 triangle background on [-4.5,4.5]^2,
reference demo/weak-dirichlet/flower/main.py:45-46).

Measures the production inner loop on a fixed mesh — new level-set data in,
solution out:
  tag (jitted pipeline) -> reassemble data-dependent element matrices ->
  Jacobi-BiCGStab solve (matrix-free, stencil bulk terms).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}:
value = pipeline MDoF/s = ndofs / (tag + reassemble + solve) wall seconds,
vs_baseline anchored at the BASELINE.json north-star 100 MDoF/s stabilized
assembly (the reference itself publishes no numbers, BASELINE.md).

Runs float64 by default (PHIFEM_X64=1): the reference solves in f64
(PETSc/MUMPS) and f32 Krylov stalls near 1e-4 relative residual on the
penalized phi-FEM systems.  The V-cycle preconditioner runs in float32 so
the Pallas stencil kernel is live on the benched path.
"""

import json
import os
import sys
import time

# float64 throughout: the reference solves in f64 (PETSc/MUMPS);
# f32 Krylov stalls near 1e-4 relative residual on the penalized
# phi-FEM systems, so parity-grade accuracy needs f64 (emulated on
# the MXU but the pipeline is gather/VPU-dominated)
os.environ.setdefault("PHIFEM_X64", "1")

import jax
import jax.numpy as jnp


def main():
    import phifem_tpu as pf
    from phifem_tpu.models import WeakDirichletPoisson
    from phifem_tpu.solvers import solve

    n = int(os.environ.get("PHIFEM_BENCH_N", "200"))
    # f64 outer BiCGStab with symmetric equilibration; the geometric
    # multigrid preconditioner runs in f32 (Pallas stencil path)
    tol = float(os.environ.get("PHIFEM_BENCH_TOL", "1e-8"))
    grid = pf.Grid(n, n, ((-4.5, -4.5), (4.5, 4.5)), pf.CellType.triangle)

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "demo", "weak-dirichlet", "flower")
    )
    from data import detection_levelset, levelset, source_term

    s = WeakDirichletPoisson(grid, mode="bg", detection_degree=1, single_layer_cut=True)

    # ---- cold setup (compiles everything once)
    t0 = time.perf_counter()
    s.setup(levelset, source_term, detection_levelset=detection_levelset)
    jax.block_until_ready(s.cell_tags)
    t_cold_tag = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.assemble()
    jax.block_until_ready(s.b["u"])
    t_cold_asm = time.perf_counter() - t0

    # compile the reassembly cores once before timing
    s.op.reassemble()
    for b in s.op.batches:
        if getattr(b, "rebuild", None) is not None:
            jax.block_until_ready(b.matrices)

    # ---- warm pipeline: re-tag with the same (jitted) kernels + rebuild
    # data-dependent matrices
    t0 = time.perf_counter()
    res_tags = pf.compute_tags_measures(
        grid, detection_levelset, 1, box_mode=True, single_layer_cut=True
    )
    jax.block_until_ready(res_tags.cells_tags.values)
    t_tag = time.perf_counter() - t0

    t0 = time.perf_counter()
    s.op.reassemble()
    for b in s.op.batches:
        if getattr(b, "rebuild", None) is not None:
            jax.block_until_ready(b.matrices)
    t_reasm = time.perf_counter() - t0

    # ---- geometric multigrid preconditioner (re-discretized coarse levels)
    t0 = time.perf_counter()
    vc = s.mg_preconditioner(min_n=13)
    t_mg_setup = time.perf_counter() - t0

    # ---- solve (warm-up once for compile, then timed)
    r0 = s.solve(method="bicgstab", tol=tol, maxiter=60, precond=vc)
    t0 = time.perf_counter()
    r = s.solve(method="bicgstab", tol=tol, maxiter=60, precond=vc)
    t_solve = time.perf_counter() - t0

    # ---- matvec kernel throughput
    from phifem_tpu.solvers import masked_operator

    matvec, diag, active = masked_operator(s.op)
    mv = jax.jit(matvec)
    x = jax.tree.map(jnp.ones_like, s.b)
    jax.block_until_ready(mv(x))
    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        x = mv(x)
    jax.block_until_ready(x)
    t_mv = (time.perf_counter() - t0) / iters

    ndofs = s.system.num_dofs
    total = t_tag + t_reasm + t_solve
    value = ndofs / total / 1e6

    result = {
        "metric": "s1_flower_pipeline_tag_assemble_solve",
        "value": round(value, 4),
        "unit": "MDoF/s",
        "vs_baseline": round(value / 100.0, 4),
        "extra": {
            "ndofs": ndofs,
            "n": n,
            "tag_warm_s": round(t_tag, 4),
            "reassemble_s": round(t_reasm, 4),
            "solve_s": round(t_solve, 4),
            "solve_residual": f"{r.residual:.2e}",
            "solve_converged": bool(r.converged),
            "matvec_s": round(t_mv, 6),
            "matvec_mdofs": round(ndofs / t_mv / 1e6, 1),
            "cold_tag_s": round(t_cold_tag, 2),
            "cold_assemble_s": round(t_cold_asm, 2),
            "mg_setup_s": round(t_mg_setup, 2),
            "mg_levels": len(vc.levels),
            "device": str(jax.devices()[0]),
            "dtype": "float64" if os.environ["PHIFEM_X64"] == "1" else "float32",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
