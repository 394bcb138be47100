"""3D phi-FEM demo — Poisson problems on a sphere immersed in a hex box.

The reference framework is 2D-only; this demo exercises the z-axis
extension: all four Poisson scheme families plus two-material interface
elasticity on the same sphere geometry.

    python demo/poisson3d/main.py weak|strong|neumann|robin|elasticity [--n 32]

Prints relative L2/H10 errors vs the analytic solution, Krylov iteration
counts, and writes a VTI (VTK ImageData) volume for ParaView.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from phifem_tpu.grid3 import Grid3
from phifem_tpu.models import (
    NeumannPoisson3,
    RobinPoisson3,
    StrongDirichletPoisson3,
    WeakDirichletPoisson3,
)
from phifem_tpu.utils import Timer

R0 = 0.7
BOX = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))


def phi(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2 - R0**2


def u_smooth(x):
    return jnp.cos(x[..., 0]) * jnp.exp((x[..., 1] + x[..., 2]) / 2.0)


def du_dn(x):
    shape = x.shape[:-1]
    p = x.reshape(-1, 3)
    g = jax.vmap(jax.grad(lambda q: u_smooth(q[None])[0]))(p)
    n = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(g * n, axis=-1).reshape(shape)


def u_product(x):
    return phi(x) * jnp.cos(x[..., 0] + 0.5 * x[..., 1] - 0.25 * x[..., 2])


def neg_lap(u):
    def f(x):
        shape = x.shape[:-1]
        p = x.reshape(-1, 3)
        H = jax.vmap(jax.hessian(lambda q: u(q[None])[0]))(p)
        return -jnp.trace(H, axis1=-2, axis2=-1).reshape(shape)

    return f


def elasticity_data(E_in, E_out, nu=0.3):
    """Manufactured two-material solution (equal Poisson ratios: the
    stress of the radial cos profile is side-independent, so displacement
    and traction are exactly continuous at r = R0)."""
    from phifem_tpu.models.interface_elasticity import lame

    def _r(x):
        return jnp.sqrt(
            x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2 + 1e-30
        )

    def exact(x):
        val = (jnp.cos(_r(x)) - jnp.cos(R0)) / E_in
        val = jnp.where(_r(x) < R0, val * (E_in / E_out), val)
        return jnp.stack([val, val, val], axis=-1)

    lmbda, mu = lame(E_in, nu)

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
        shape = x.shape[:-1]
        p = x.reshape(-1, 3)
        Dg = jax.vmap(jax.jacfwd(_sigma))(p)
        return (-jnp.einsum("nijj->ni", Dg) / E_in).reshape(shape + (3,))

    return exact, source


def main():
    ap = argparse.ArgumentParser(prog="main.py", description="3D phi-FEM demo.")
    ap.add_argument(
        "scheme",
        choices=["weak", "strong", "neumann", "robin", "elasticity"],
    )
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument(
        "--degree", type=int, default=1, choices=(1, 2, 3),
        help="Q_degree hexes (weak scheme only; degree 3 uses the sparse"
        " direct solve, like the 2D degree-3 path)",
    )
    ap.add_argument("--tol", type=float, default=1e-10)
    ap.add_argument("--maxiter", type=int, default=20000)
    ap.add_argument("--E-out", type=float, default=0.001)
    ap.add_argument(
        "--sweeps", type=int, default=None,
        help="inner band-Krylov sweeps of the elasticity cut-block solve",
    )
    args = ap.parse_args()

    g = Grid3(args.n, args.n, args.n, BOX)
    timer = Timer()

    if args.scheme == "elasticity":
        from phifem_tpu.models import InterfaceElasticity3

        phi_e = lambda x: R0**2 - (
            x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2
        )
        uex, f = elasticity_data(1.0, args.E_out)
        with timer.phase("setup+assemble"):
            s = InterfaceElasticity3(g, E_in=1.0, E_out=args.E_out)
            s.setup(phi_e, f, uex)
            s.assemble()
        with timer.phase("precond setup"):
            pc = s.lattice_preconditioner(sweeps=args.sweeps)
        with timer.phase("solve"):
            # FLEXIBLE GMRES: the cut-block inner band Krylov makes the
            # preconditioner nonlinear; classical BiCGStab floors ~1e-8
            r = s.solve(
                method="fgmres", tol=args.tol, maxiter=args.maxiter,
                precond=pc, deflate=s.rigid_modes(),
            )
        print(
            f"iters {r.iterations} residual {r.residual:.2e} "
            f"converged={r.converged}"
        )
        errs = s.l2_h1_errors(uex)
        print(f"Relative L2 error: {errs['l2']:.6e}")
        print(f"Relative H10 error: {errs['h10']:.6e}")
        print(timer.report())
        out = os.path.join(os.path.dirname(__file__), "elasticity_output")
        os.makedirs(out, exist_ok=True)
        try:
            from phifem_tpu.utils.io import write_vti

            write_vti(
                os.path.join(out, "solution.vti"),
                g,
                point_data={
                    "ux": s.u_lat[0], "uy": s.u_lat[1], "uz": s.u_lat[2]
                },
            )
        except Exception as e:
            print("vti write skipped:", e)
        return

    with timer.phase("setup+assemble"):
        if args.scheme == "weak":
            uex = u_smooth
            s = WeakDirichletPoisson3(g, degree=args.degree).setup(
                phi, neg_lap(u_smooth), u_D=u_smooth
            )
        elif args.scheme == "strong":
            uex = u_product
            s = StrongDirichletPoisson3(g).setup(phi, neg_lap(u_product))
        elif args.scheme == "neumann":
            uex = u_smooth
            f = lambda x: neg_lap(u_smooth)(x) + u_smooth(x)
            s = NeumannPoisson3(g).setup(phi, f, du_dn)
        else:  # robin
            uex = u_smooth
            f = lambda x: neg_lap(u_smooth)(x) + u_smooth(x)
            robin = lambda x: du_dn(x) + u_smooth(x)
            s = RobinPoisson3(g, robin_coef=1.0).setup(phi, f, robin)
        s.assemble()

    with timer.phase("solve"):
        if args.scheme == "weak" and args.degree >= 3:
            r = s.solve(method="sparse")
        else:
            kw = {}
            if args.scheme == "weak":
                kw["precond"] = s.lattice_preconditioner()
            r = s.solve(tol=args.tol, maxiter=args.maxiter, **kw)

    print(f"iters {r.iterations} residual {r.residual:.2e} converged={r.converged}")
    errs = s.l2_h1_errors(uex)
    print(f"Relative L2 error: {errs['l2']:.6e}")
    print(f"Relative H10 error: {errs['h10']:.6e}")
    print(timer.report())

    out = os.path.join(os.path.dirname(__file__), args.scheme + "_output")
    os.makedirs(out, exist_ok=True)
    try:
        from phifem_tpu.utils.io import write_vti

        # degree >= 2 fields live on the degree-refined NODE grid
        write_vti(
            os.path.join(out, "solution.vti"),
            getattr(s, "_node_grid", g),
            point_data={"u": s.u_lat},
        )
    except Exception as e:  # VTI writer is best-effort in the demo
        print("vti write skipped:", e)


if __name__ == "__main__":
    main()
