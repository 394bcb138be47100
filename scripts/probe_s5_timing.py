"""Granular timing of the on-device S5 host-loop solve (run after
probe_s5_tpu.py has populated the server-side compile cache): varies
maxiter / check_every on the SAME compiled programs to separate per-step
compute, per-fetch round trips, and fixed overhead."""

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
    np.asarray(s.b["u_in"])
    log(f"setup {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    vc = s.lattice_preconditioner(coupled=False)
    log(f"pc {time.perf_counter() - t0:.1f}s")

    def solve(**kw):
        return s.solve(method="bicgstab", precond=vc, host_loop=True, **kw)

    r = solve(tol=1e-10, maxiter=100, check_every=10)
    log(f"warm baseline iters={r.iterations} res={r.residual:.1e}")
    for mi, ce in ((100, 40), (10, 10), (4, 10), (2, 10), (1, 10)):
        t0 = time.perf_counter()
        r = solve(tol=1e-10, maxiter=mi, check_every=ce)
        dt = time.perf_counter() - t0
        log(
            f"maxiter={mi} check_every={ce}: {dt:.3f}s "
            f"iters={r.iterations} res={r.residual:.1e}"
        )
    log("done")


if __name__ == "__main__":
    main()
