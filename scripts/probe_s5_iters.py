"""Probe S5 outer-iteration scaling vs grid size and preconditioner
composition knobs.  CPU-friendly (run with JAX_PLATFORMS=cpu).

Usage: python scripts/probe_s5_iters.py [n ...] [--kind auto|dense]
       [--sweeps-coef C] [--tol T]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "demo", "interface-elasticity")
)

import phifem_tpu as pf
from phifem_tpu.models import InterfaceElasticity
from data import E_in, E_out, exact_solution, levelset, nu_in, nu_out, source_term


def run(n, kind, coef, tol, maxiter, coupled=True):
    grid = pf.Grid(n, n, ((-1.5, -1.5), (1.5, 1.5)), pf.CellType.triangle)
    s = InterfaceElasticity(
        grid, mode="bg", E_in=E_in, nu_in=nu_in, E_out=E_out, nu_out=nu_out
    )
    s.setup(levelset, source_term, exact_solution)
    s.assemble()
    t0 = time.time()
    pc = s.lattice_preconditioner(kind=kind, sweeps_coef=coef, coupled=coupled)
    t1 = time.time()
    res = s.solve(tol=tol, maxiter=maxiter, precond=pc)
    t2 = time.time()
    print(
        f"n={n:4d} dof={s.system.num_dofs:8d} kind={kind:5s} coef={coef} "
        f"coupled={coupled} "
        f"iters={res.iterations:4d} res={res.residual:.2e} conv={res.converged} "
        f"setup={t1-t0:.1f}s solve={t2-t1:.1f}s",
        flush=True,
    )
    return res


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("ns", nargs="*", type=int, default=[32, 64, 128])
    p.add_argument("--kind", default="auto")
    p.add_argument("--sweeps-coef", type=float, default=0.6)
    p.add_argument("--tol", type=float, default=1e-10)
    p.add_argument("--maxiter", type=int, default=2000)
    p.add_argument("--flat", action="store_true", help="single-level precond")
    a = p.parse_args()
    for n in a.ns or [32, 64, 128]:
        run(n, a.kind, a.sweeps_coef, a.tol, a.maxiter, coupled=not a.flat)
