"""Strong-Dirichlet (product space u = phi*w) phi-FEM demo on the flower.

Mirrors reference ``demo/strong-dirichlet/flower/main.py``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", "weak-dirichlet", "flower"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import phifem_tpu as pf
from phifem_tpu.models import StrongDirichletPoisson
from phifem_tpu.utils import Timer, write_xdmf
from data import detection_levelset, levelset, source_term


def main():
    parser = argparse.ArgumentParser(
        prog="main.py", description="Run strong dirichlet phiFEM demo."
    )
    parser.add_argument("mesh_type", type=str, choices=["bg", "sub"])
    parser.add_argument("--n", type=int, default=200)
    parser.add_argument("--solver", type=str, default="bicgstab")
    args = parser.parse_args()

    out = os.path.join(os.path.dirname(__file__), args.mesh_type + "_output")
    os.makedirs(out, exist_ok=True)

    timer = Timer()
    grid = pf.Grid(args.n, args.n, ((-4.5, -4.5), (4.5, 4.5)), pf.CellType.triangle)
    scheme = StrongDirichletPoisson(grid, mode=args.mesh_type, detection_degree=1)
    with timer.phase("tag+setup"):
        scheme.setup(levelset, source_term, detection_levelset=detection_levelset)
    with timer.phase("assemble"):
        scheme.assemble()
    with timer.phase("solve"):
        res = scheme.solve(method=args.solver)
    print(f"solver residual: {res.residual:.3e} converged={res.converged}")
    print(timer.report())

    write_xdmf(
        os.path.join(out, "solution.xdmf"),
        grid,
        point_data={"solution": scheme.u_h},
        cell_data={"tags": scheme.cell_tags},
    )


if __name__ == "__main__":
    main()
