"""Neumann phi-FEM demo on the tilted square (quadrilateral background).

Mirrors reference ``demo/neumann/square/main.py``: 200x200 quad mesh on
[-1,1]^2, P1 x P1-vector x DG0 mixed, phi_h degree 2; prints the relative
H1 error vs the analytic rotated-square solution (reference :248-249).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import phifem_tpu as pf
from phifem_tpu.models import NeumannPoisson
from phifem_tpu.utils import Timer, write_xdmf
from data import detection_levelset, exact_solution, levelset, neumann_data, source_term


def main():
    parser = argparse.ArgumentParser(prog="main.py", description="Run neumann phiFEM demo.")
    parser.add_argument("mesh_type", type=str, choices=["bg", "sub"])
    parser.add_argument("--n", type=int, default=200)
    parser.add_argument("--solver", type=str, default="bicgstab")
    args = parser.parse_args()

    out = os.path.join(os.path.dirname(__file__), args.mesh_type + "_output")
    os.makedirs(out, exist_ok=True)

    timer = Timer()
    grid = pf.Grid(args.n, args.n, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.quadrilateral)
    scheme = NeumannPoisson(grid, mode=args.mesh_type, detection_degree=1, levelset_degree=2)
    with timer.phase("tag+setup"):
        scheme.setup(levelset, source_term, neumann_data,
                     detection_levelset=detection_levelset)
    with timer.phase("assemble"):
        scheme.assemble()
    with timer.phase("solve"):
        res = scheme.solve(method=args.solver)
    print(f"solver residual: {res.residual:.3e} converged={res.converged}")

    with timer.phase("errors"):
        errs = scheme.l2_h1_errors(scheme.u_h, exact_solution)
    print("Relative H1 error:")
    print(errs["h1"])
    print(timer.report())

    write_xdmf(
        os.path.join(out, "solution.xdmf"),
        grid,
        point_data={"solution": scheme.u_h},
        cell_data={"tags": scheme.cell_tags},
    )


if __name__ == "__main__":
    main()
