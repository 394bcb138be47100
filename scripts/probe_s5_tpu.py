"""Probe: can the S5 iterative solve (flat preconditioner + HOST-DRIVEN
BiCGStab) compile and run on the TPU through the remote compiler?

Round-4 finding: the fused while_loop solve graph never returns from the
remote compiler at any size (>47 min, killed).  Round-5 changes split the
loop off (solvers._host_bicgstab), replaced the inner band Krylov with a
fixed-sweep fori_loop (mg._band_bicgstab) and collapsed the var-MG conv
to one einsum per level — this script measures, stage by stage, where
the compile budget goes now.  Usage:

    nohup python scripts/probe_s5_tpu.py > /tmp/probe_s5.log 2>&1 &

PHIFEM_PROBE_N sets the grid (default 64)."""

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import phifem_tpu as pf  # noqa: E402
from phifem_tpu.models import InterfaceElasticity  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    n = int(os.environ.get("PHIFEM_PROBE_N", "64"))
    import jax

    log(f"devices: {jax.devices()}  n={n}")
    spec = importlib.util.spec_from_file_location(
        "s5data",
        os.path.join(
            os.path.dirname(__file__), "..", "demo", "interface-elasticity",
            "data.py",
        ),
    )
    D = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(D)

    t0 = time.perf_counter()
    g = pf.Grid(n, n, ((-1.5, -1.5), (1.5, 1.5)), "triangle")
    s = InterfaceElasticity(
        g, mode="bg", E_in=D.E_in, nu_in=D.nu_in, E_out=D.E_out,
        nu_out=D.nu_out,
    )
    s.setup(D.levelset, D.source_term, D.exact_solution)
    s.assemble()
    np.asarray(s.b["u_in"])  # fetch-sync
    log(f"setup+assemble {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    vc = s.lattice_preconditioner(coupled=False)
    log(f"preconditioner built (incl device coarse basis) "
        f"{time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    r = s.solve(
        method="bicgstab", tol=1e-10, maxiter=100, precond=vc,
        host_loop=True, check_every=10,
    )
    log(
        f"solve COLD {time.perf_counter() - t0:.1f}s  iters={r.iterations} "
        f"res={r.residual:.2e} conv={r.converged}"
    )

    for i in range(3):
        t0 = time.perf_counter()
        r = s.solve(
            method="bicgstab", tol=1e-10, maxiter=100, precond=vc,
            host_loop=True, check_every=10,
        )
        log(
            f"solve WARM#{i} {time.perf_counter() - t0:.3f}s "
            f"iters={r.iterations} res={r.residual:.2e}"
        )
    log("done")


if __name__ == "__main__":
    main()
