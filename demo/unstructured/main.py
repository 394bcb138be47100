"""phi-FEM on an IMPORTED unstructured mesh — the reference's
arbitrary-dolfinx-mesh execution path (its golden ``disk.xdmf`` is the
canonical example, ``tests/test_compute_meshtags.py:136-137``).

Runs any of the four Poisson-family schemes (S1 weak Dirichlet, S2 strong
Dirichlet, S3 Neumann, S4 Robin) on an XDMF triangle mesh through the
unstructured assembly/solve backend and prints the relative errors vs a
manufactured solution on an immersed circle.

    python demo/unstructured/main.py s1 [--mesh path.xdmf] [--r2 0.125]

Default mesh: the reference checkout's ``disk.xdmf`` if present, else a
randomly perturbed triangulation of [-1,1]^2 (so the demo is self-contained).

``--dim 3`` switches to imported TETRAHEDRAL meshes (surpass scope — the
reference is 2D-only): an immersed sphere on an XDMF tet mesh, default a
Kuhn-split box of [-1,1]^3.

    python demo/unstructured/main.py s1 --dim 3 [--n 12]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

REF_DISK = "/root/reference/tests/tests_data/disk.xdmf"


def _fallback_mesh(n=24, amp=0.25, seed=0):
    import phifem_tpu as pf

    g = pf.Grid(n, n, ((-1.0, -1.0), (1.0, 1.0)), pf.CellType.triangle)
    um, _ = pf.UMesh.from_grid(g)
    verts = um.verts.copy()
    h = 2.0 / n
    rng = np.random.default_rng(seed)
    interior = (np.abs(np.abs(verts[:, 0]) - 1.0) > 1e-12) & (
        np.abs(np.abs(verts[:, 1]) - 1.0) > 1e-12
    )
    verts[interior] += amp * h * (rng.random((int(interior.sum()), 2)) - 0.5)
    return pf.UMesh(verts, um.cells)


def main():
    parser = argparse.ArgumentParser(
        prog="main.py", description="phi-FEM schemes on an imported mesh."
    )
    parser.add_argument("scheme", choices=["s1", "s2", "s3", "s4"])
    parser.add_argument("--mesh", type=str, default=None, help="XDMF mesh path")
    parser.add_argument("--mode", choices=["bg", "sub"], default="bg")
    parser.add_argument("--r2", type=float, default=None,
                        help="squared circle/sphere radius of the immersed domain")
    parser.add_argument("--solver", type=str, default="bicgstab")
    parser.add_argument("--dim", type=int, choices=[2, 3], default=2)
    parser.add_argument("--n", type=int, default=12,
                        help="3D fallback box resolution (6 tets per hex)")
    args = parser.parse_args()

    if args.dim == 3:
        return main3(args)

    import jax
    import jax.numpy as jnp

    import phifem_tpu as pf
    from phifem_tpu.models import (
        NeumannPoissonU,
        RobinPoissonU,
        StrongDirichletPoissonU,
        WeakDirichletPoissonU,
    )

    if args.mesh:
        mesh = pf.UMesh.from_xdmf(args.mesh)
        r2 = args.r2 if args.r2 is not None else 0.125
    elif os.path.isfile(REF_DISK):
        mesh = pf.UMesh.from_xdmf(REF_DISK)
        r2 = args.r2 if args.r2 is not None else 0.125
    else:
        mesh = _fallback_mesh()
        r2 = args.r2 if args.r2 is not None else 0.49
    print(f"mesh: {mesh.num_vertices} vertices, {mesh.num_cells} triangles")

    ls = lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - r2
    uex = lambda x: jnp.cos(x[..., 0]) * jnp.sin(x[..., 1])

    def nderiv(x):
        g = jax.vmap(jax.grad(lambda p: uex(p)))(x)
        gp = 2.0 * x
        norm = jnp.maximum(jnp.linalg.norm(gp, axis=-1), 1e-12)
        return jnp.sum(g * gp, axis=-1) / norm

    if args.scheme == "s1":
        s = WeakDirichletPoissonU(mesh, mode=args.mode)
        s.setup(ls, lambda x: 2.0 * uex(x), u_D=uex)
    elif args.scheme == "s2":
        # homogeneous-Dirichlet manufactured solution: u = sin(phi)
        uex = lambda x: jnp.sin(x[..., 0] ** 2 + x[..., 1] ** 2 - r2)

        def f2(x):
            r2x = x[..., 0] ** 2 + x[..., 1] ** 2
            return 4.0 * r2x * jnp.sin(r2x - r2) - 4.0 * jnp.cos(r2x - r2)

        s = StrongDirichletPoissonU(mesh, mode=args.mode)
        s.setup(ls, f2)
    elif args.scheme == "s3":
        s = NeumannPoissonU(mesh, mode=args.mode)
        s.setup(ls, lambda x: 2.0 * uex(x) + uex(x), nderiv)
    else:
        s = RobinPoissonU(mesh, mode=args.mode, robin_coef=1.0)
        s.setup(ls, lambda x: 2.0 * uex(x) + uex(x),
                lambda x: nderiv(x) + uex(x))

    s.assemble()
    res = s.solve(method=args.solver, tol=1e-10)
    print(f"solver: iters={res.iterations} residual={res.residual:.3e} "
          f"converged={res.converged}")
    region = (1,) if args.scheme in ("s3", "s4") else (1, 2)
    errs = s.l2_h1_errors(s.u_h, uex, region=region)
    print(f"Relative L2 error:  {errs['l2']:.6e}")
    print(f"Relative H10 error: {errs['h10']:.6e}")


def main3(args):
    """Tetrahedral (3D) variant: immersed sphere, same scheme menu."""
    import jax
    import jax.numpy as jnp

    import phifem_tpu as pf
    from phifem_tpu.models import (
        NeumannPoissonU,
        RobinPoissonU,
        StrongDirichletPoissonU,
        WeakDirichletPoissonU,
    )

    if args.mesh:
        mesh = pf.UMesh3.from_xdmf(args.mesh)
    else:
        mesh = pf.UMesh3.box(
            args.n, args.n, args.n, ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
        )
    r2 = args.r2 if args.r2 is not None else 0.61**2
    print(f"mesh: {mesh.num_vertices} vertices, {mesh.num_cells} tets")

    ls = lambda x: (x**2).sum(-1) - r2
    uex = lambda x: jnp.cos(x[..., 0]) * jnp.sin(x[..., 1]) * jnp.cos(x[..., 2])
    fex = lambda x: 3.0 * uex(x)

    def nderiv(x):
        g = jax.vmap(jax.grad(lambda p: uex(p)))(x)
        nrm = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
        )
        return jnp.sum(g * nrm, axis=-1)

    if args.scheme == "s1":
        s = WeakDirichletPoissonU(mesh, mode=args.mode, levelset_degree=2)
        s.setup(ls, fex, u_D=uex)
    elif args.scheme == "s2":
        uex = lambda x: jnp.sin((x**2).sum(-1) - r2)

        def f2(x):
            q = (x**2).sum(-1)
            return 4.0 * q * jnp.sin(q - r2) - 6.0 * jnp.cos(q - r2)

        s = StrongDirichletPoissonU(mesh, mode=args.mode, levelset_degree=2)
        s.setup(ls, f2)
    elif args.scheme == "s3":
        s = NeumannPoissonU(mesh, mode=args.mode, levelset_degree=2)
        s.setup(ls, lambda x: fex(x) + uex(x), nderiv)
    else:
        s = RobinPoissonU(mesh, mode=args.mode, levelset_degree=2,
                          robin_coef=1.0)
        s.setup(ls, lambda x: fex(x) + uex(x),
                lambda x: nderiv(x) + uex(x))

    s.assemble()
    res = s.solve(method=args.solver, tol=1e-10, maxiter=5000)
    print(f"solver: iters={res.iterations} residual={res.residual:.3e} "
          f"converged={res.converged}")
    region = (1,) if args.scheme in ("s3", "s4") else (1, 2)
    errs = s.l2_h1_errors(s.u_h, uex, region=region)
    print(f"Relative L2 error:  {errs['l2']:.6e}")
    print(f"Relative H10 error: {errs['h10']:.6e}")


if __name__ == "__main__":
    main()
