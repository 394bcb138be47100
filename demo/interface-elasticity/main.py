"""Two-material immersed-interface elasticity with a convergence study.

Mirrors reference ``demo/interface-elasticity/main.py``: YAML-configured
5-field mixed scheme, uniform refinement loop, per-level L2/H10 relative
errors appended to results.csv, final log-log slope fit vs DoF count
(expected ~ -1 for L2 and ~ -0.5 for H10 with P1).
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import phifem_tpu as pf
from phifem_tpu.models import InterfaceElasticity
from phifem_tpu.utils import Timer, load_config, write_xdmf
from data import E_in, E_out, exact_solution, levelset, nu_in, nu_out, source_term


def main():
    parser = argparse.ArgumentParser(
        prog="Run the demo.",
        description="Run phiFEM on a multimaterial elasticity test case.",
    )
    parser.add_argument("parameters", type=str,
                        help="Name of parameters file (without yaml extension).")
    parser.add_argument("--solver", type=str, default="bicgstab")
    parser.add_argument(
        "--precond", type=str, default="lattice", choices=("none", "lattice"),
        help="lattice: block lattice-MG bulk + cut-band interface solve "
        "(rigid-mode deflated Krylov); none: Jacobi only",
    )
    parser.add_argument("--tol", type=float, default=1e-10)
    parser.add_argument("--maxiter", type=int, default=2000)
    args = parser.parse_args()

    pdir = os.path.dirname(__file__)
    cfg = load_config(os.path.join(pdir, args.parameters + ".yaml"))
    out = os.path.join(pdir, args.parameters + "_output")
    os.makedirs(out, exist_ok=True)

    nx, ny = cfg.resolve_resolution()
    grid = pf.Grid(nx, ny, cfg.bbox, cfg.cell_type)

    results = {"dof": [], "H10 relative error": [], "L2 relative error": []}
    timer = Timer()
    for i in range(cfg.num_iterations):
        scheme = InterfaceElasticity(
            grid,
            mode="bg",
            detection_degree=cfg.boundary_detection_degree,
            pen_coef=cfg.penalization_coefficient,
            stab_coef=cfg.stabilization_coefficient,
            primal_degree=cfg.primal_degree,
            flux_degree=cfg.flux_degree,
            auxiliary_degree=cfg.auxiliary_degree,
            levelset_degree=cfg.levelset_degree,
            E_in=E_in, nu_in=nu_in, E_out=E_out, nu_out=nu_out,
        )
        with timer.phase(f"setup_{i}"):
            scheme.setup(levelset, source_term, exact_solution)
            scheme.assemble()
        with timer.phase(f"solve_{i}"):
            kw = {}
            if args.solver != "dense":
                kw = dict(tol=args.tol, maxiter=args.maxiter)
                if args.precond == "lattice":
                    kw["precond"] = scheme.lattice_preconditioner()
            res = scheme.solve(method=args.solver, **kw)
        print(
            f"[level {i}] iters {res.iterations} "
            f"residual {res.residual:.2e} converged={res.converged}"
        )

        errs = scheme.l2_h1_errors(scheme.u_h, exact_solution, region=None)
        results["dof"].append(scheme.U.num_dofs)
        results["H10 relative error"].append(errs["h10"])
        results["L2 relative error"].append(errs["l2"])

        with open(os.path.join(out, "results.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(results.keys())
            w.writerows(zip(*results.values()))
        print({k: v[-1] for k, v in results.items()})

        write_xdmf(
            os.path.join(out, "functions", f"solution_{str(i).zfill(2)}.xdmf"),
            grid,
            point_data={"solution": scheme.u_h},
            cell_data={"tags": scheme.cell_tags},
        )

        if i < cfg.num_iterations - 1:
            grid = grid.refine()

    h10_slope, _ = np.polyfit(
        np.log(results["dof"]), np.log(results["H10 relative error"]), 1
    )
    l2_slope, _ = np.polyfit(
        np.log(results["dof"]), np.log(results["L2 relative error"]), 1
    )
    print("H10 relative error slope:", h10_slope)
    print("L2 relative error slope:", l2_slope)
    print(timer.report())


if __name__ == "__main__":
    main()
