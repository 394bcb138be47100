"""Run ONE level of the S5 param1 convergence study and append to the
results CSV — levels run as separate processes so a wedged remote compile
(tunnel variance, CLAUDE.md) or a TPU worker restart only loses one level.

Usage: python scripts/run_s5_level.py LEVEL [--out results.csv]
       [--coupled] [--tol 1e-10] [--initial-h 0.2]
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(__file__), "..", "demo", "interface-elasticity"
    ),
)

import numpy as np

import phifem_tpu as pf
from phifem_tpu.models import InterfaceElasticity
from data import E_in, E_out, exact_solution, levelset, nu_in, nu_out, source_term


def main():
    p = argparse.ArgumentParser()
    p.add_argument("level", type=int)
    p.add_argument("--out", default=None)
    p.add_argument("--coupled", action="store_true")
    p.add_argument("--tol", type=float, default=1e-10)
    p.add_argument("--maxiter", type=int, default=4000)
    p.add_argument("--initial-h", type=float, default=0.2)
    p.add_argument(
        "--method", default="bicgstab",
        choices=("bicgstab", "fgmres", "sparse"),
    )
    a = p.parse_args()

    # param1.yaml geometry: [-1.5, 1.5]^2, initial mesh size 0.2 -> n=15
    n0 = int(round(3.0 / a.initial_h))
    n = n0 * (2**a.level)
    grid = pf.Grid(n, n, ((-1.5, -1.5), (1.5, 1.5)), pf.CellType.triangle)

    t0 = time.time()
    s = InterfaceElasticity(
        grid, mode="bg", E_in=E_in, nu_in=nu_in, E_out=E_out, nu_out=nu_out
    )
    s.setup(levelset, source_term, exact_solution)
    s.assemble()
    t_setup = time.time() - t0

    t0 = time.time()
    if a.method == "sparse":
        # plain SuperLU (the reference's MUMPS-LU path) — the robust
        # choice for the large levels, where flat-preconditioned BiCGStab
        # breaks down before converging; reproduces the recorded level
        # 0/1 errors to 6 digits
        res = s.solve(method="sparse")
    else:
        pc = s.lattice_preconditioner(coupled=a.coupled)
        res = s.solve(
            method=a.method, tol=a.tol, maxiter=a.maxiter, precond=pc
        )
    t_solve = time.time() - t0

    errs = s.l2_h1_errors(s.u_h, exact_solution, region=None)
    row = {
        "level": a.level,
        "dof": s.U.num_dofs,
        "H10 relative error": errs["h10"],
        "L2 relative error": errs["l2"],
        "iters": res.iterations,
        "residual": res.residual,
        "converged": res.converged,
        "setup_s": round(t_setup, 1),
        "solve_s": round(t_solve, 1),
    }
    print(row, flush=True)

    out = a.out or os.path.join(
        os.path.dirname(__file__), "..", "docs", "s5_param1_l7_results.csv"
    )
    exists = os.path.exists(out)
    with open(out, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            w.writeheader()
        w.writerow(row)


if __name__ == "__main__":
    main()
