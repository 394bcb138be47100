"""Weak-Dirichlet phi-FEM demo on the flower level set.

Mirrors reference ``demo/weak-dirichlet/flower/main.py``: 200x200 triangle
background mesh on [-4.5, 4.5]^2, P1 x P1 mixed, detection degree 1,
single-layer cut, bg|sub CLI modes.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import phifem_tpu as pf
from phifem_tpu.models import WeakDirichletPoisson
from phifem_tpu.utils import Timer, write_xdmf
from data import detection_levelset, dirichlet_data, levelset, source_term


def main():
    parser = argparse.ArgumentParser(
        prog="main.py", description="Run weak dirichlet phiFEM demo."
    )
    parser.add_argument("mesh_type", type=str, choices=["bg", "sub"])
    parser.add_argument("--n", type=int, default=200, help="background resolution")
    parser.add_argument("--solver", type=str, default="bicgstab")
    args = parser.parse_args()

    out = os.path.join(os.path.dirname(__file__), args.mesh_type + "_output")
    os.makedirs(out, exist_ok=True)

    timer = Timer()
    grid = pf.Grid(args.n, args.n, ((-4.5, -4.5), (4.5, 4.5)), pf.CellType.triangle)
    scheme = WeakDirichletPoisson(
        grid, mode=args.mesh_type, detection_degree=1, single_layer_cut=True
    )
    with timer.phase("tag+setup"):
        scheme.setup(levelset, source_term, u_D=dirichlet_data,
                     detection_levelset=detection_levelset)
    with timer.phase("assemble"):
        scheme.assemble()
    with timer.phase("solve"):
        res = scheme.solve(method=args.solver)
    print(f"solver residual: {res.residual:.3e} converged={res.converged}")
    print(timer.report())

    with timer.phase("io"):
        write_xdmf(
            os.path.join(out, "solution.xdmf"),
            grid,
            point_data={"solution": scheme.u_h},
            cell_data={"tags": scheme.cell_tags},
        )


if __name__ == "__main__":
    main()
