"""Benchmarks: the north-star 10M-DoF Poisson multigrid solve + the S1
weak-Dirichlet phi-FEM pipeline.

Headline metric (BASELINE.json north star: "sub-second 10M-DoF Poisson CG
solve to 1e-10 rel-res on v5e-8"): BoxPoisson on an n x n triangle
background (default n=3200 -> 10.25M vertex DoFs), solved to 1e-10 relative
residual by mixed-precision iterative refinement — float32 MG(V-cycle)-
preconditioned CG corrections (fused maskless Pallas stencil matvec) inside
a float64 residual loop (solvers.solve_ir).  value = MDoF/s of the timed
warm solve; vs_baseline = 1/t_solve x (ndofs/10.25M), so 1.0 == exactly
sub-second at 10M DoF ON ONE CHIP (the north star allows 8).

The S1 phi-FEM pipeline (tag -> reassemble -> solve on the reference's
headline 200x200 flower config, demo/weak-dirichlet/flower/main.py:45-46)
is reported in extra.s1 with the same fields as round 1.  S1 solves run
float64 (PHIFEM_X64=1): the reference solves in f64 (PETSc/MUMPS) and f32
Krylov stalls near 1e-4 on penalized phi-FEM systems; the V-cycle
preconditioner runs float32 so the Pallas stencil is live on that path too.

Timeout robustness (round-4 redesign; round 3's artifact was an empty
rc=124): the HEADLINE poisson_mg section runs first IN-PROCESS; every
subsequent section runs in its own bounded SUBPROCESS (`bench.py --section
NAME`), and after each section a complete, self-contained result JSON line
is printed and flushed — the driver keeps the tail and parses the last
line, so a stall anywhere after the headline can only cost the remaining
sections, never the round's perf record.  A global wall-clock deadline
(PHIFEM_BENCH_BUDGET seconds, default 1080) skips sections that no longer
fit; per-section subprocess timeouts bound remote-compile wedges (observed
13 s - 1495 s variance for the same kernel through the tunnel).

Env knobs: PHIFEM_POISSON_N (default 3200), PHIFEM_BENCH_N (S1 grid, 200),
PHIFEM_BENCH_S5_N (S5 grid, 128), PHIFEM_BENCH_S5I_N (S5 iterative
on-device grid, 64), PHIFEM_BENCH_ASM_N (large reassemble, 3200),
PHIFEM_BENCH_3D_N (3D Poisson, 128 -> 2.15M DoF);
PHIFEM_BENCH_SKIP_{S1,POISSON,S5,S5I,ASM,3D}=1 to skip a section;
PHIFEM_BENCH_BUDGET (global deadline, s).
"""

import json
import os
import subprocess
import sys
import time
import traceback

os.environ.setdefault("PHIFEM_X64", "1")

import jax
import jax.numpy as jnp


def _demo_data(*rel):
    """Load a demo's data.py under a unique module name (the demo dirs all
    call it `data`, so plain `import data` collides across sections)."""
    import importlib.util

    path = os.path.join(os.path.dirname(__file__), "demo", *rel, "data.py")
    name = "phifem_bench_data_" + "_".join(rel).replace("-", "_")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _t(fn, *args, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    return out, time.perf_counter() - t0


def _fetch(*arrays) -> float:
    """Synchronize by VALUE FETCH.  jax.block_until_ready does NOT
    synchronize through the axon tunnel (it returns once the dispatch is
    queued), so timings synced that way measure dispatch latency only.
    Reduce each array to one scalar on device and fetch the sum."""
    s = None
    for a in arrays:
        t = jnp.sum(jnp.abs(jnp.asarray(a)).astype(jnp.float32))
        s = t if s is None else s + t
    return float(s)


def bench_poisson_mg(n: int) -> dict:
    """North-star path: n x n box Poisson, f32 MG-CG + f64 refinement."""
    import phifem_tpu as pf
    from phifem_tpu.models import BoxPoisson

    grid = pf.Grid(n, n, ((0.0, 0.0), (1.0, 1.0)), pf.CellType.triangle)
    uex = lambda x: jnp.sin(jnp.pi * x[..., 0]) * jnp.sin(jnp.pi * x[..., 1])
    f = lambda x: 2.0 * jnp.pi**2 * uex(x)

    s = BoxPoisson(grid)
    t0 = time.perf_counter()
    s.setup(f)
    s.assemble()
    _fetch(s.b["u"])
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    mg = s.lattice_solver(min_n=16, dtype=jnp.float32)
    t_mg = time.perf_counter() - t0

    # lattice-resident solve (ops.lattice): float64 CG with the float32
    # 2D V-cycle preconditioner, whole Krylov loop in one on-chip
    # lax.while_loop.  MG-rate convergence (grid-independent ~8 iters)
    # down to the f64 rounding floor.  (Mixed-precision iterative
    # refinement [solvers.solve_ir] is NOT used: its per-round reduction
    # is capped at ~kappa * eps32, which at 10M DoFs [kappa ~ 1e7] is
    # ~0.6 — see the solve_ir docstring.)
    r0, t_cold = _t(s.solve_lattice, tol=1e-10, maxiter=40, mg=mg)
    r, t_solve = _t(s.solve_lattice, tol=1e-10, maxiter=40, mg=mg)

    ndofs = s.system.num_dofs
    return {
        "ndofs": ndofs,
        "n": n,
        "solve_s": round(t_solve, 4),
        "cold_solve_s": round(t_cold, 2),
        "setup_assemble_s": round(t_setup, 2),
        "mg_setup_s": round(t_mg, 2),
        "residual": f"{r.residual:.2e}",
        "converged": bool(r.converged),
        "iterations": int(r.iterations),
        "mg_levels": len(mg.levels),
        "mdofs_per_s": round(ndofs / t_solve / 1e6, 2),
    }


def bench_s1_pipeline(n: int) -> dict:
    """Round-1 metric: S1 flower pipeline tag -> reassemble -> solve."""
    import phifem_tpu as pf
    from phifem_tpu.models import WeakDirichletPoisson
    from phifem_tpu.solvers import masked_operator
    from phifem_tpu.utils import fetch_all

    tol = float(os.environ.get("PHIFEM_BENCH_TOL", "1e-8"))
    grid = pf.Grid(n, n, ((-4.5, -4.5), (4.5, 4.5)), pf.CellType.triangle)

    D = _demo_data("weak-dirichlet", "flower")
    detection_levelset, levelset, source_term = (
        D.detection_levelset, D.levelset, D.source_term
    )

    s = WeakDirichletPoisson(grid, mode="bg", detection_degree=1, single_layer_cut=True)

    t0 = time.perf_counter()
    s.setup(levelset, source_term, detection_levelset=detection_levelset)
    _fetch(s.cell_tags)
    t_cold_tag = time.perf_counter() - t0
    t0 = time.perf_counter()
    s.assemble()
    _fetch(s.b["u"])
    t_cold_asm = time.perf_counter() - t0

    # compile the reassembly cores once before timing
    s.op.reassemble()
    _fetch(
        *(b.matrices for b in s.op.batches if getattr(b, "rebuild", None) is not None)
    )

    # per-phase warm timings (each fetch-synced => each pays the full
    # dispatch+fetch round trip; the fused pipeline below avoids the
    # artificial middle sync)
    t0 = time.perf_counter()
    res_tags = pf.compute_tags_measures(
        grid, detection_levelset, 1, box_mode=True, single_layer_cut=True
    )
    _fetch(res_tags.cells_tags.values)
    t_tag = time.perf_counter() - t0

    t0 = time.perf_counter()
    s.op.reassemble()
    _fetch(
        *(b.matrices for b in s.op.batches if getattr(b, "rebuild", None) is not None)
    )
    t_reasm = time.perf_counter() - t0

    # full-box lattice V-cycle + cut-block Schwarz correction: no
    # per-level re-tagging/re-assembly (mg.LatticeBulkVCycle)
    t0 = time.perf_counter()
    vc = s.lattice_preconditioner(min_n=13)
    t_mg_setup = time.perf_counter() - t0

    r0 = s.solve(method="bicgstab", tol=tol, maxiter=60, precond=vc)
    t0 = time.perf_counter()
    r = s.solve(method="bicgstab", tol=tol, maxiter=60, precond=vc)
    t_solve = time.perf_counter() - t0

    # the PIPELINE metric: one warm convergence-loop iteration — re-tag
    # (tags fetched: the host entity lists are how a caller would detect a
    # topology change), rebuild the data-dependent element matrices
    # (device dispatch only), solve (its packed stats fetch synchronizes
    # the whole chain).  This is the production iteration; the reference's
    # equivalent is re-running tags + assembly + LU per refinement level.
    def pipeline_once():
        res = pf.compute_tags_measures(
            grid, detection_levelset, 1, box_mode=True, single_layer_cut=True
        )
        s.op.reassemble()
        # reassemble bumped data_version, which clears compiled solve
        # runners; rebuild the preconditioner handle (cached dense/band
        # inverses are value-stale but structurally identical, so reuse)
        r = s.solve(method="bicgstab", tol=tol, maxiter=60, precond=vc, sync=False)
        # ONE packed host round trip for the whole iteration: the fresh
        # tags (how a caller detects a topology change) + the solve's
        # (relres, iters) stats fetch together
        fetch_all(res, r)
        return r

    pipeline_once()
    t0 = time.perf_counter()
    r_pipe = pipeline_once()
    t_pipe = time.perf_counter() - t0

    # matvec throughput: lax.fori_loop repetition inside ONE jit + a value
    # fetch, so the ~26 ms dispatch+fetch round trip amortizes over all
    # applications instead of polluting each
    matvec, diag, active = masked_operator(s.op)
    iters = 100

    @jax.jit
    def _mv_loop(x):
        x = jax.lax.fori_loop(
            0,
            iters,
            lambda i, v: jax.tree.map(
                lambda a, d: a / jnp.maximum(d, 1e-30), matvec(v), diag
            ),
            x,
        )
        return sum(jnp.sum(jnp.abs(v)) for v in x.values())

    x = jax.tree.map(jnp.ones_like, s.b)
    float(_mv_loop(x))  # compile
    t0 = time.perf_counter()
    float(_mv_loop(x))
    t_mv = (time.perf_counter() - t0) / iters

    ndofs = s.system.num_dofs
    return {
        "ndofs": ndofs,
        "n": n,
        # fused warm iteration (tag + reassemble dispatch + solve, one
        # mid-pipeline fetch for the host entity lists + the solve's
        # packed stats fetch)
        "pipeline_s": round(t_pipe, 4),
        "pipeline_mdofs_per_s": round(ndofs / t_pipe / 1e6, 4),
        "phase_sum_mdofs_per_s": round(
            ndofs / (t_tag + t_reasm + t_solve) / 1e6, 4
        ),
        "tag_warm_s": round(t_tag, 4),
        "reassemble_s": round(t_reasm, 4),
        "solve_s": round(t_solve, 4),
        "solve_iterations": int(r.iterations),
        "pipeline_residual": f"{r_pipe.residual:.2e}",
        "pipeline_converged": bool(r_pipe.converged),
        "solve_residual": f"{r.residual:.2e}",
        "solve_converged": bool(r.converged),
        "matvec_s": round(t_mv, 6),
        "matvec_mdofs": round(ndofs / t_mv / 1e6, 1),
        "cold_tag_s": round(t_cold_tag, 2),
        "cold_assemble_s": round(t_cold_asm, 2),
        "mg_setup_s": round(t_mg_setup, 2),
        "mg_levels": len(vc.levels),
    }


def bench_poisson3(n: int) -> dict:
    """3D Q1-hex lattice MG-CG (ops.lattice3) — the z-axis extension the
    2D-only reference lacks.  Default n=128 -> 2.15M vertex DoFs: the
    n=216 (10.2M) size never completed through the remote-compile tunnel
    (>28 min cold, killed; the 2D 10M headline covers the at-scale claim —
    raise PHIFEM_BENCH_3D_N when the tunnel cache is warm)."""
    from phifem_tpu.grid3 import Grid3
    from phifem_tpu.models import BoxPoisson3

    g = Grid3(n, n, n, ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)))
    uex = lambda x: (
        jnp.sin(jnp.pi * x[..., 0])
        * jnp.sin(jnp.pi * x[..., 1])
        * jnp.sin(jnp.pi * x[..., 2])
    )
    f = lambda x: 3.0 * jnp.pi**2 * uex(x)
    s = BoxPoisson3(g)
    t0 = time.perf_counter()
    s.setup(f)
    s.assemble()
    _fetch(s.b_lat)
    t_setup = time.perf_counter() - t0
    t0 = time.perf_counter()
    mg = s.lattice_solver(min_n=8, dtype=jnp.float32)
    t_mg = time.perf_counter() - t0
    r0, t_cold = _t(s.solve_lattice, tol=1e-10, maxiter=40, mg=mg)
    r, t_solve = _t(s.solve_lattice, tol=1e-10, maxiter=40, mg=mg)
    ndofs = (n + 1) ** 3
    return {
        "ndofs": ndofs,
        "n": n,
        "solve_s": round(t_solve, 4),
        "cold_solve_s": round(t_cold, 2),
        "setup_assemble_s": round(t_setup, 2),
        "mg_setup_s": round(t_mg, 2),
        "residual": f"{r.residual:.2e}",
        "converged": bool(r.converged),
        "iterations": int(r.iterations),
        "mg_levels": len(mg.levels),
        "mdofs_per_s": round(ndofs / t_solve / 1e6, 2),
    }


def bench_s5(n: int) -> dict:
    """S5 interface elasticity (reference param1 problem) on the DIRECT
    path: cached sparse SuperLU of the 9-field system — the exact analogue
    of the reference's only S5 solver (MUMPS LU,
    demo/interface-elasticity/main.py:237-288).  Reported: assembly,
    factorization (cold solve) and factor-reusing re-solve times.

    The ITERATIVE S5 path runs on device in its own section
    (:func:`bench_s5_iter` — the round-5 host-driven loop + shrunk
    preconditioner graph; the round-4 fused while_loop graph never
    returned from the remote compiler, >47 min, killed)."""
    import phifem_tpu as pf
    from phifem_tpu.models import InterfaceElasticity

    D = _demo_data("interface-elasticity")
    grid = pf.Grid(n, n, ((-1.5, -1.5), (1.5, 1.5)), pf.CellType.triangle)
    s = InterfaceElasticity(
        grid, mode="bg", E_in=D.E_in, nu_in=D.nu_in, E_out=D.E_out,
        nu_out=D.nu_out,
    )
    t0 = time.perf_counter()
    s.setup(D.levelset, D.source_term, D.exact_solution)
    s.assemble()
    _fetch(s.b["u_in"])
    t_setup = time.perf_counter() - t0

    r0, t_factor = _t(s.solve, method="sparse")  # build + factor + solve
    r, t_solve = _t(s.solve, method="sparse")    # cached factor, new solve
    ndofs = s.system.num_dofs
    return {
        "ndofs": ndofs,
        "n": n,
        "solve_s": round(t_solve, 4),
        "factor_solve_s": round(t_factor, 2),
        "setup_assemble_s": round(t_setup, 2),
        "residual": f"{r.residual:.2e}",
        "converged": bool(r.converged),
        "mdofs_per_s": round(ndofs / t_solve / 1e6, 3),
    }


def bench_s5_3d(n: int) -> dict:
    """S5-3D interface elasticity (beyond the 2D-only reference): warm
    rigid-mode-deflated BiCGStab with the per-side block-MG + exact
    cut-block preconditioner.  OPT-IN (PHIFEM_BENCH_S53D=1): the nested
    inner-band-Krylov graph is a remote-compile wedge risk through the
    tunnel (CLAUDE.md)."""
    import jax.numpy as jnp

    from phifem_tpu.grid3 import Grid3
    from phifem_tpu.models import InterfaceElasticity3
    from phifem_tpu.models.interface_elasticity import lame

    E_in, E_out = 1.0, 0.001
    box = ((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5))
    phi = lambda x: 1.0 - (
        x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2
    )

    def exact(x):
        r = jnp.sqrt(
            x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2 + 1e-30
        )
        v = (jnp.cos(r) - jnp.cos(1.0)) / E_in
        v = jnp.where(r < 1.0, v * (E_in / E_out), v)
        return jnp.stack([v, v, v], axis=-1)

    lmbda, mu = lame(E_in, 0.3)

    def _sigma(p):
        G = jax.jacfwd(
            lambda q: jnp.cos(
                jnp.sqrt(q[0] ** 2 + q[1] ** 2 + q[2] ** 2 + 1e-30)
            )
            * jnp.ones(3)
        )(p)
        eps = 0.5 * (G + G.T)
        return lmbda * jnp.trace(G) * jnp.eye(3) + 2 * mu * eps

    def source(x):
        sh = x.shape[:-1]
        p = x.reshape(-1, 3)
        Dg = jax.vmap(jax.jacfwd(_sigma))(p)
        return (-jnp.einsum("nijj->ni", Dg) / E_in).reshape(sh + (3,))

    t0 = time.perf_counter()
    s = InterfaceElasticity3(Grid3(n, n, n, box), E_in=E_in, E_out=E_out)
    s.setup(phi, source, exact)
    s.assemble()
    _fetch(s.b["ui"])
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    pc = s.lattice_preconditioner()
    t_mg = time.perf_counter() - t0

    tol = float(os.environ.get("PHIFEM_BENCH_TOL", "1e-8"))
    defl = s.rigid_modes()
    r0, t_cold = _t(
        s.solve, method="fgmres", tol=tol, maxiter=400, precond=pc,
        deflate=defl,
    )
    r, t_solve = _t(
        s.solve, method="fgmres", tol=tol, maxiter=400, precond=pc,
        deflate=defl,
    )
    ndofs = 27 * s._N
    return {
        "ndofs": ndofs,
        "n": n,
        "solve_s": round(t_solve, 4),
        "cold_solve_s": round(t_cold, 2),
        "setup_assemble_s": round(t_setup, 2),
        "mg_setup_s": round(t_mg, 2),
        "iterations": int(r.iterations),
        "residual": f"{r.residual:.2e}",
        "converged": bool(r.converged),
        "mdofs_per_s": round(ndofs / t_solve / 1e6, 3),
    }


def bench_s5_iter(n: int) -> dict:
    """S5 interface elasticity, ITERATIVE path ON DEVICE: rigid-mode
    deflated HOST-DRIVEN BiCGStab (solvers._host_bicgstab — three small
    jitted programs, async step dispatches, one convergence fetch per
    check window) with the flat preconditioner (per-side var-MG bulk +
    Fourier coarse space + fixed-sweep fori_loop band solve).

    The round-4 fused while_loop graph never returned from this
    environment's remote compiler (>47 min, killed); the round-5
    graph-shrink (see mg._band_bicgstab, LatticeVarMG._conv, coarse_AZ)
    plus the host loop keeps each compiled unit small.  Reported: cold
    (compile-inclusive) and warm solve, iterations, and MDoF/s —
    comparable to the sparse-direct section's warm re-solve.  The
    reference has no iterative S5 solver at all (MUMPS LU,
    demo/interface-elasticity/main.py:237-288)."""
    import phifem_tpu as pf
    from phifem_tpu.models import InterfaceElasticity

    D = _demo_data("interface-elasticity")
    grid = pf.Grid(n, n, ((-1.5, -1.5), (1.5, 1.5)), pf.CellType.triangle)
    s = InterfaceElasticity(
        grid, mode="bg", E_in=D.E_in, nu_in=D.nu_in, E_out=D.E_out,
        nu_out=D.nu_out,
    )
    t0 = time.perf_counter()
    s.setup(D.levelset, D.source_term, D.exact_solution)
    s.assemble()
    _fetch(s.b["u_in"])
    t_setup = time.perf_counter() - t0

    t0 = time.perf_counter()
    # dense band inverse: at bench sizes the cut block (m ~ 4.5k at n=64,
    # 9k at n=128) fits a dense m x m f32 inverse, and ONE MXU matmul per
    # application replaces ~50 latency-bound inner Krylov sweeps — the
    # band solve measured 260 ms/application with the Schwarz inner loop
    # on this backend (scripts/probe_s5_parts.py) vs ~1 ms dense
    pc = s.lattice_preconditioner(coupled=False, dense_max=20000)
    t_pc = time.perf_counter() - t0

    # host-driven loop with SPLIT half-iteration programs: the smallest
    # compiled units (the fused while_loop graph with the dense taps was
    # OOM-killed by the remote compile service; the full-step host
    # program compiled but at ~45+ min).  tol/maxiter/check_every are
    # baked into the compiled programs (cache keys AND loop constants):
    # keep them EXACTLY in sync with scripts' probe usage so bench runs
    # hit the server-side compile cache.
    os.environ.setdefault("PHIFEM_HOST_SPLIT", "1")
    tol = float(os.environ.get("PHIFEM_BENCH_S5I_TOL", "1e-10"))
    kw = dict(
        method="bicgstab", tol=tol, maxiter=100, precond=pc,
        host_loop=True, check_every=10,
    )
    r0, t_cold = _t(s.solve, **kw)
    r, t_solve = _t(s.solve, **kw)
    ndofs = s.system.num_dofs
    return {
        "ndofs": ndofs,
        "n": n,
        "solve_s": round(t_solve, 4),
        "cold_solve_s": round(t_cold, 2),
        "setup_assemble_s": round(t_setup, 2),
        "precond_setup_s": round(t_pc, 2),
        "iterations": int(r.iterations),
        "residual": f"{r.residual:.2e}",
        "converged": bool(r.converged),
        "mdofs_per_s": round(ndofs / t_solve / 1e6, 3),
    }


def bench_reassemble_large(n: int) -> dict:
    """Measured (not extrapolated) stabilized-assembly rate at the 10M-DoF
    scale: all data-dependent cut/ghost/boundary element-matrix rebuilds of
    the S1 flower operator at n x n as ONE jitted call, fetch-synced."""
    import phifem_tpu as pf
    from phifem_tpu.models import WeakDirichletPoisson

    D = _demo_data("weak-dirichlet", "flower")
    detection_levelset, levelset, source_term = (
        D.detection_levelset, D.levelset, D.source_term
    )

    grid = pf.Grid(n, n, ((-4.5, -4.5), (4.5, 4.5)), pf.CellType.triangle)
    s = WeakDirichletPoisson(grid, mode="bg", detection_degree=1, single_layer_cut=True)
    t0 = time.perf_counter()
    s.setup(levelset, source_term, detection_levelset=detection_levelset)
    s.assemble()
    _fetch(s.b["u"])
    t_cold = time.perf_counter() - t0

    def reasm():
        s.op.reassemble()
        _fetch(
            *(
                b.matrices
                for b in s.op.batches
                if getattr(b, "rebuild", None) is not None
            )
        )

    reasm()  # compile
    t0 = time.perf_counter()
    reasm()
    t_reasm = time.perf_counter() - t0
    ndofs = s.system.num_dofs
    return {
        "ndofs": ndofs,
        "n": n,
        "reassemble_s": round(t_reasm, 4),
        "cold_setup_s": round(t_cold, 2),
        "mdofs_per_s": round(ndofs / t_reasm / 1e6, 2),
    }


# ---------------------------------------------------------------------------
# Orchestration.  Registry maps section key -> (fn, env var for size, default
# size, skip env var, minimum seconds of remaining budget required to start).
# ---------------------------------------------------------------------------

_SECTIONS = {
    "poisson_mg": (bench_poisson_mg, "PHIFEM_POISSON_N", 3200, "PHIFEM_BENCH_SKIP_POISSON", 0),
    "s1": (bench_s1_pipeline, "PHIFEM_BENCH_N", 200, "PHIFEM_BENCH_SKIP_S1", 0),
    "reassemble_large": (bench_reassemble_large, "PHIFEM_BENCH_ASM_N", 3200, "PHIFEM_BENCH_SKIP_ASM", 180),
    "poisson3d": (bench_poisson3, "PHIFEM_BENCH_3D_N", 128, "PHIFEM_BENCH_SKIP_3D", 150),
    "s5": (bench_s5, "PHIFEM_BENCH_S5_N", 128, "PHIFEM_BENCH_SKIP_S5", 120),
    "s5_iter": (
        bench_s5_iter, "PHIFEM_BENCH_S5I_N", 64, "PHIFEM_BENCH_SKIP_S5I", 180
    ),
    "s5_3d": (bench_s5_3d, "PHIFEM_BENCH_S53D_N", 16, None, 240),
}


def _result_line(extra) -> str:
    """One complete driver-parseable result from whatever has finished so
    far.  Headline = poisson_mg MDoF/s vs the 10.25 MDoF/s north-star rate
    (sub-second 10M-DoF solve == vs_baseline 1.0); falls back to the S1
    pipeline metric if the headline section is missing."""
    poisson = extra.get("poisson_mg")
    s1 = extra.get("s1")
    if poisson is not None:
        value = poisson["mdofs_per_s"]
        result = {
            "metric": "poisson_mg_ir_solve_10m_dof",
            "value": value,
            "unit": "MDoF/s",
            "vs_baseline": round(value / 10.25, 4),
            "extra": extra,
        }
    else:
        value = s1["pipeline_mdofs_per_s"] if s1 else 0.0
        result = {
            "metric": "s1_flower_pipeline_tag_assemble_solve",
            "value": value,
            "unit": "MDoF/s",
            "vs_baseline": round(value / 100.0, 4),
            "extra": extra,
        }
    return json.dumps(result)


def _run_section_inproc(key: str) -> dict:
    fn, size_env, size_default, _, _ = _SECTIONS[key]
    return fn(int(os.environ.get(size_env, str(size_default))))


def _probe_tunnel(max_wait_s: float = 360.0) -> str:
    """After a killed child, check the device tunnel with a trivial fetch in
    a fresh bounded subprocess; retry with backoff until it answers or
    ``max_wait_s`` elapses.  Returns '' if healthy, else a description."""
    probe = "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(8))))"
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        try:
            p = subprocess.run(
                [sys.executable, "-c", probe],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                timeout=60, text=True,
            )
            if p.returncode == 0 and "8.0" in p.stdout:
                return "" if attempt == 0 else f"recovered after {attempt} retries"
        except subprocess.TimeoutExpired:
            pass
        attempt += 1
        if time.monotonic() >= deadline:
            return f"still wedged after {max_wait_s:.0f}s"
        time.sleep(min(30.0 * attempt, 60.0))


def _run_section_subproc(key: str, timeout_s: float):
    """Run one section in a bounded child process.  Returns (data, error):
    a wedged remote compile or tunnel stall kills only the child; the
    parent's already-printed result lines survive.  stderr is inherited
    (compile progress visible in the driver log), stdout is captured for
    the one-line JSON payload."""
    cmd = [sys.executable, os.path.abspath(__file__), "--section", key]
    try:
        proc = subprocess.run(
            cmd, stdout=subprocess.PIPE, timeout=timeout_s, text=True
        )
    except subprocess.TimeoutExpired:
        # Killing a JAX client mid-handshake can wedge the axon tunnel for
        # ~5 min (CLAUDE.md); probe before the next section launches so a
        # wedge is waited out here (and recorded) instead of cascading
        # spurious timeouts into every subsequent section.
        wedge = _probe_tunnel()
        err = f"timeout after {timeout_s:.0f}s"
        if wedge:
            err += f"; tunnel probe: {wedge}"
        return None, err
    if proc.returncode != 0:
        return None, f"rc={proc.returncode}; stdout tail: {proc.stdout[-800:]}"
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            payload = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if payload.get("section") == key:
            return payload["data"], None
    return None, f"no payload line; stdout tail: {proc.stdout[-800:]}"


def main():
    if "--section" in sys.argv:  # child mode: one section, one JSON line
        key = sys.argv[sys.argv.index("--section") + 1]
        data = _run_section_inproc(key)
        print(json.dumps({"section": key, "data": data}), flush=True)
        return

    t_start = time.monotonic()
    budget = float(os.environ.get("PHIFEM_BENCH_BUDGET", "1080"))
    extra = {
        "device": str(jax.devices()[0]),
        "dtype": "float64" if os.environ["PHIFEM_X64"] == "1" else "float32",
    }

    # s5_iter (the on-device iterative S5 — round-5's headline addition)
    # runs BEFORE the sparse-direct s5 section so the global budget
    # cannot starve it
    order = [
        "poisson_mg", "s1", "reassemble_large", "poisson3d", "s5_iter", "s5"
    ]
    if os.environ.get("PHIFEM_BENCH_S53D") == "1":
        order.append("s5_3d")

    for i, key in enumerate(order):
        _, _, _, skip_env, min_budget = _SECTIONS[key]
        if skip_env and os.environ.get(skip_env) == "1":
            continue
        remaining = budget - (time.monotonic() - t_start)
        if remaining < min_budget:
            extra[key + "_skipped"] = f"budget ({remaining:.0f}s left)"
            print(_result_line(extra), flush=True)
            continue
        if i == 0:
            # headline runs in-process (shares this process's device handle;
            # a retry covers transient tunnel resets whose kernels compile
            # fine seconds later thanks to the server-side cache)
            for attempt in range(2):
                try:
                    extra[key] = _run_section_inproc(key)
                    extra.pop(key + "_error", None)
                    break
                except Exception:
                    extra[key + "_error"] = traceback.format_exc()[-1500:]
                    if attempt == 0:
                        time.sleep(20.0)
        else:
            # leave headroom so a stuck child can't eat the whole budget
            cap = max(min_budget, min(remaining - 60.0, 600.0))
            data, err = _run_section_subproc(key, cap)
            if data is not None:
                extra[key] = data
            else:
                extra[key + "_error"] = err
        print(_result_line(extra), flush=True)


if __name__ == "__main__":
    main()
