"""Run ONE level of the 3D interface-elasticity (S5-3D) convergence study
and append to a results CSV — the 3D analogue of ``run_s5_level.py``
(reference ``demo/interface-elasticity/main.py:341-400`` is 2D-only; this
records the surpass-goal 3D rates).  MMS of tests/test_interface_elasticity3:
u = (cos r - cos 1)/E per side on a sphere immersed in [-1.5,1.5]^3.

Usage: python scripts/run_s53d_level.py LEVEL [--out csv] [--contrast 1000]
       [--tol 1e-8] [--n0 8]
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("level", type=int)
    p.add_argument("--out", default=None)
    p.add_argument("--contrast", type=float, default=1000.0)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--maxiter", type=int, default=60000)
    p.add_argument("--n0", type=int, default=8)
    p.add_argument(
        "--precond", action="store_true",
        help="block-MG + exact cut-block preconditioner with fgmres "
        "(tests/test_interface_elasticity3.py::test_..._preconditioned_fgmres)",
    )
    a = p.parse_args()

    from test_interface_elasticity3 import BOX, make_data, phi_sphere

    from phifem_tpu.grid3 import Grid3
    from phifem_tpu.models import InterfaceElasticity3

    E_in, E_out = 1.0, 1.0 / a.contrast
    n = a.n0 * (2**a.level)
    exact, source = make_data(E_in, E_out)

    t0 = time.time()
    s = InterfaceElasticity3(Grid3(n, n, n, BOX), E_in=E_in, E_out=E_out)
    s.setup(phi_sphere, source, exact)
    s.assemble()
    t_setup = time.time() - t0

    t0 = time.time()
    if a.precond:
        pc = s.lattice_preconditioner()
        r = s.solve(
            method="fgmres", tol=a.tol, maxiter=a.maxiter, precond=pc,
            deflate=s.rigid_modes(),
        )
    else:
        r = s.solve(tol=a.tol, maxiter=a.maxiter)
    t_solve = time.time() - t0

    errs = s.l2_h1_errors(exact)
    row = {
        "level": a.level,
        "n": n,
        "dof": 27 * s._N,
        "H10 relative error": errs["h10"],
        "L2 relative error": errs["l2"],
        "iters": r.iterations,
        "residual": r.residual,
        "converged": r.converged,
        "contrast": a.contrast,
        "setup_s": round(t_setup, 1),
        "solve_s": round(t_solve, 1),
    }
    print(row, flush=True)

    out = a.out or os.path.join(
        os.path.dirname(__file__), "..", "docs", "s53d_results.csv"
    )
    exists = os.path.exists(out)
    with open(out, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            w.writeheader()
        w.writerow(row)


if __name__ == "__main__":
    main()
