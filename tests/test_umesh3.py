"""Imported tetrahedral meshes (``umesh3``): elements, quadrature,
connectivity, the tagging pipeline, one-sided measures and the S1-S4
solve path — 3D surpass scope (the reference is 2D-only; the tagging
semantics mirrored here are ``src/phifem/mesh_scripts.py:284-558``
extended to tets, and the analytic one-sided oracles mirror the
reference's ``tests/test_one_sided_integral.py`` protocol)."""

import math
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import phifem_tpu as pf
from phifem_tpu.elements import (
    TET_EDGES,
    classify_nodes_tet,
    dg0_element,
    lagrange_element,
)
from phifem_tpu.models import (
    NeumannPoissonU,
    RobinPoissonU,
    StrongDirichletPoissonU,
    WeakDirichletPoissonU,
)
from phifem_tpu.quadrature import cell_rule
from phifem_tpu.uassembly import USpace, boundary_dof_mask
from phifem_tpu.umesh import u_one_sided, u_tag_cells, u_tag_facets
from phifem_tpu.umesh3 import UMesh3, tet_boundary_points

BOX3 = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))
# R < 2/3 keeps the cut layer strictly off the box walls at every mesh
# size used here (n >= 6) — CONTAINMENT: a cut cell touching the
# background boundary silently breaks Gamma_h completeness (CLAUDE.md)
R = 0.61


def phi_sphere(x):
    return x[..., 0] ** 2 + x[..., 1] ** 2 + x[..., 2] ** 2 - R**2


def u_mild3(x):
    return jnp.cos(x[..., 0]) * jnp.sin(x[..., 1]) * jnp.cos(x[..., 2])


def f_mild3(x):
    return 3.0 * u_mild3(x)


# --------------------------------------------------------------- elements
@pytest.mark.parametrize("degree", [1, 2, 3])
def test_tet_lagrange_basis(degree):
    el = lagrange_element("tetrahedron", degree)
    # Kronecker at nodes
    V = el.tabulate(el.nodes)
    assert np.abs(V - np.eye(el.nloc)).max() < 1e-10
    # partition of unity + zero gradient sum at random interior points
    rng = np.random.default_rng(0)
    b = rng.dirichlet(np.ones(4), size=20)
    pts = b[:, 1:]
    assert np.abs(el.tabulate(pts).sum(axis=1) - 1.0).max() < 1e-10
    assert np.abs(el.tabulate_grad(pts).sum(axis=1)).max() < 1e-9
    assert np.abs(el.tabulate_hess(pts).sum(axis=1)).max() < 1e-8


def test_tet_nloc():
    assert lagrange_element("tetrahedron", 1).nloc == 4
    assert lagrange_element("tetrahedron", 2).nloc == 10
    assert lagrange_element("tetrahedron", 3).nloc == 20
    assert dg0_element("tetrahedron").nloc == 1


def test_classify_nodes_tet():
    kind, entity, param = classify_nodes_tet(lagrange_element("tetrahedron", 2))
    assert (np.sort(entity[kind == 0]) == np.arange(4)).all()
    assert (np.sort(entity[kind == 1]) == np.arange(6)).all()
    assert np.allclose(param[kind == 1], 0.5)
    kind3, entity3, _ = classify_nodes_tet(lagrange_element("tetrahedron", 3))
    assert int((kind3 == 1).sum()) == 12  # 2 nodes per edge
    assert (np.sort(entity3[kind3 == 2]) == np.arange(4)).all()  # 1/face


# ------------------------------------------------------------- quadrature
@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6])
def test_tet_quadrature_exactness(degree):
    """Conical-product rule integrates all monomials r^a s^b t^c with
    a+b+c <= degree exactly: int_T r^a s^b t^c = a! b! c! / (a+b+c+3)!."""
    pts, w = cell_rule("tetrahedron", degree)
    assert (w > 0).all()
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            for c in range(degree + 1 - a - b):
                val = np.sum(
                    w * pts[:, 0] ** a * pts[:, 1] ** b * pts[:, 2] ** c
                )
                exact = (
                    math.factorial(a)
                    * math.factorial(b)
                    * math.factorial(c)
                    / math.factorial(a + b + c + 3)
                )
                assert abs(val - exact) < 1e-14, (a, b, c, val, exact)


# ------------------------------------------------------------ mesh basics
def test_box_mesh_connectivity():
    m = UMesh3.box(2, 3, 2, (((0.0, 0.0, 0.0)), (1.0, 1.0, 1.0)))
    assert m.num_cells == 6 * 12
    assert m.num_vertices == 3 * 4 * 3
    # conforming manifold: f2c builds without error, boundary closes
    bmask = m.boundary_facet_mask
    assert 0.0 < bmask.mean() < 1.0
    # total volume through the affine geometry = 1
    from phifem_tpu.umesh3 import _cell_geometry3

    _, _, absdet, h = _cell_geometry3(m, np.arange(m.num_cells))
    assert abs(absdet.sum() / 6.0 - 1.0) < 1e-12  # ref tet volume 1/6
    # boundary face areas sum to the box surface area 6
    assert abs(m.facet_lengths[bmask].sum() - 6.0) < 1e-12
    # local facet lookup round-trips
    f = np.where(~bmask)[0][:10]
    c = m.f2c[f, 0]
    loc = m.local_facet_index(c, f)
    assert (np.take_along_axis(m.c2f[c], loc[:, None], 1)[:, 0] == f).all()


def test_dof_map_consistency_p2_p3():
    """cell_dofs + dof_coords agree with the per-cell physical node
    positions — pins the global edge/face orientation rules."""
    m = UMesh3.box(2, 2, 2, BOX3)
    for deg in (1, 2, 3):
        sp = USpace.lagrange(m, deg)
        node_phys = m.map_to_physical(sp.element.nodes)  # (nc, nloc, 3)
        got = sp.dof_coords_np[sp.cell_dofs_np]  # (nc, nloc, 3)
        assert np.abs(got - node_phys).max() < 1e-12, deg
        assert sp.cell_dofs_np.max() + 1 == sp.num_scalar_dofs


def test_boundary_dof_mask3():
    m = UMesh3.box(3, 3, 3, BOX3)
    for deg in (1, 2):
        sp = USpace.lagrange(m, deg)
        mask = np.asarray(boundary_dof_mask(sp))
        coords = sp.dof_coords_np
        on_surf = (np.abs(np.abs(coords) - 1.0) < 1e-12).any(axis=1)
        assert (mask == on_surf).all(), deg


# ---------------------------------------------------------------- tagging
def test_detection_points_tet():
    assert tet_boundary_points(0).shape == (1, 3)
    p1 = tet_boundary_points(1)
    assert p1.shape == (4, 3)  # the 4 vertices
    p3 = tet_boundary_points(3)
    lam0 = 1.0 - p3.sum(axis=1)
    lam = np.concatenate([lam0[:, None], p3], axis=1)
    assert (np.min(lam, axis=1) < 1e-12).all()  # all on the surface


def test_tag_cells_halfspace_oracle():
    """Degree-1 detection on tets samples the 4 vertices, so a half-space
    cut has an exact vertex-sign oracle."""
    m = UMesh3.box(4, 4, 4, ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)))
    phi = lambda x: x[..., 0] - 0.55
    tags = u_tag_cells(m, phi, detection_degree=1)
    vx = m.verts[m.cells][..., 0]
    expect = np.where(
        (vx < 0.55).all(axis=1), 1, np.where((vx > 0.55).all(axis=1), 3, 2)
    )
    assert (tags == expect).all()
    assert (tags == 2).sum() == 6 * 16  # the x in [0.5, 0.75] hex slab


def test_one_sided_measures_analytic3():
    """Half-space cut: Gamma_h is exactly the lattice plane x = 0.75 and
    the interior|cut interface the plane x = 0.5 — integrating n . e_x
    gives +1 / -1 exactly (reference protocol
    ``tests/test_one_sided_integral.py:28-96`` lifted to 3D)."""
    m = UMesh3.box(4, 4, 4, ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0)))
    phi = lambda x: x[..., 0] - 0.55
    ct = u_tag_cells(m, phi, detection_degree=1)
    ft = u_tag_facets(m, ct, phi, detection_degree=1)

    gamma = u_one_sided(m, np.where(ft == 4)[0], ct, (1, 2))
    flux = float((gamma.lengths * gamma.normals[:, 0]).sum())
    area = float(gamma.lengths.sum())
    assert abs(flux - 1.0) < 1e-12 and abs(area - 1.0) < 1e-12

    inner = u_one_sided(m, np.where(ft == 3)[0], ct, (2, 3))
    flux1 = float((inner.lengths * inner.normals[:, 0]).sum())
    assert abs(flux1 + 1.0) < 1e-12


def test_compute_tags_measures_entry3():
    """The public entry point dispatches UMesh3 and the debug invariants
    hold on a genuine sphere cut."""
    m = UMesh3.box(8, 8, 8, BOX3)
    res = pf.compute_tags_measures(m, phi_sphere, detection_degree=2, box_mode=True)
    ct = res.cells_tags.as_numpy()
    ft = res.facets_tags.as_numpy()
    assert set(np.unique(ct)) <= {1, 2, 3} and (ct == 1).any() and (ct == 2).any()
    assert set(np.unique(ft)) <= {1, 2, 3, 4, 5, 6}
    gamma = res.boundaries_measure(100)
    assert gamma.num_facets > 0
    # Gamma_h area is within the staircase band of the sphere area
    area = float(gamma.lengths.sum())
    assert 0.5 * 4 * np.pi * R**2 < area < 3.0 * 4 * np.pi * R**2


# ------------------------------------------------------------- solve path
def _weak3(n, uex, f, method="bicgstab", **kw):
    m = UMesh3.box(n, n, n, BOX3)
    s = WeakDirichletPoissonU(m, mode="bg", **kw)
    s.setup(phi_sphere, f, u_D=uex)
    s.assemble()
    if method == "pmg":
        vc = s.p_multigrid_preconditioner()
        r = s.solve(method="fgmres", tol=1e-11, maxiter=300, precond=vc)
        assert r.converged, r.residual
    else:
        r = s.solve(method=method, tol=1e-11, maxiter=3000)
        assert r.converged, r.residual
    return s.l2_h1_errors(s.u_h, uex)


def test_usolve3_s1_patch_exact():
    uex = lambda x: 1.0 + 2.0 * x[..., 0] - x[..., 1] + 0.5 * x[..., 2]
    fz = lambda x: jnp.zeros(x.shape[:-1])
    e = _weak3(6, uex, fz)
    assert e["l2"] < 1e-8 and e["h10"] < 1e-8, e


def test_usolve3_s1_p2_quadratic_exact():
    """P2 tets reproduce quadratic solutions to solver tolerance (the 3D
    unstructured twin of the structured Q2 exactness test): stiffness,
    one-sided flux, penalty with u_D = u, cell stab (nonzero P2
    Hessians) and C^1 ghost jumps are all exactly consistent.

    Rides the ON-DEVICE p-multigrid path (phifem_tpu.pmg): plain
    Jacobi-BiCGStab stagnates at ~5.6e-10 relative residual on the
    P2-tet penalized system (the degree>=2 Krylov floor), above the 1e-8
    error bound this exactness test needs headroom for; p-MG-fgmres
    reaches ~7e-14 in ~20 iterations (measured n=5/8)."""
    uex = lambda x: (
        1.0
        + 2.0 * x[..., 0]
        - x[..., 1]
        + 0.5 * x[..., 0] * x[..., 1]
        + x[..., 2] ** 2
        - 0.25 * x[..., 0] * x[..., 2]
    )
    fq = lambda x: -2.0 * jnp.ones(x.shape[:-1])  # -lap uex
    e = _weak3(5, uex, fq, method="pmg", primal_degree=2, levelset_degree=2)
    assert e["l2"] < 1e-8 and e["h10"] < 1e-8, e


def test_usolve3_s1_convergence():
    """O(h^2) on the sphere; the dual-penalty constant is large at these
    coarse 3D sizes exactly as in the structured path (which measures L2
    1.34/0.337/0.080 at n=8/16/32, ``test_weak_dirichlet3.py``).
    Measured here: L2 0.590 / 0.133 (ratio 4.4), H10 0.655 / 0.166
    (Gauss-point superconvergence on the uniform Kuhn mesh)."""
    e1 = _weak3(12, u_mild3, f_mild3, levelset_degree=2)
    e2 = _weak3(24, u_mild3, f_mild3, levelset_degree=2)
    assert e1["l2"] / e2["l2"] > 3.5, (e1, e2)
    assert e1["h10"] / e2["h10"] > 3.0, (e1, e2)
    assert e2["l2"] < 0.2, (e1, e2)


def test_usolve3_s2_strong_dirichlet():
    """S2 (u = phi w): exact solution vanishing on the sphere.  Degree-2
    levelset (the quadratic sphere is then interpolated exactly — the
    same one-order levelset-accuracy lesson as the structured 3D path,
    CLAUDE.md).  Measured: L2 0.0922 / 0.0224 at n=12/24 (rate 2.04),
    H10 rate 0.90."""
    uex = lambda x: (R**2 - (x**2).sum(-1)) / 4.0  # -Delta u = 3/2
    fex = lambda x: 1.5 * jnp.ones(x.shape[:-1])

    def run(n):
        m = UMesh3.box(n, n, n, BOX3)
        s = StrongDirichletPoissonU(m, mode="bg", levelset_degree=2)
        s.setup(phi_sphere, fex)
        s.assemble()
        r = s.solve(method="bicgstab", tol=1e-11, maxiter=4000)
        assert r.converged, r.residual
        return s.l2_h1_errors(s.u_h, uex)

    e1, e2 = run(8), run(16)
    assert e2["l2"] < 0.08, (e1, e2)
    assert np.log2(e1["l2"] / e2["l2"]) > 1.5, (e1, e2)


def test_usolve3_s3_s4_assemble_solve():
    """S3/S4 mixed flux systems assemble and converge on tets (small
    smoke at one size; the 2D rates + structured-3D twins carry the
    convergence burden)."""
    m = UMesh3.box(8, 8, 8, BOX3)
    uex = u_mild3

    import jax

    gu = jax.grad(lambda p: jnp.sum(uex(p)))

    def u_N(x):  # du/dn with n = grad(phi)/|grad(phi)| on the sphere
        g = gu(x)
        nrm = x / jnp.sqrt((x**2).sum(-1, keepdims=True))
        return (g * nrm).sum(-1)

    f3 = lambda x: 3.0 * uex(x) + uex(x)  # -lap + id with -lap u = 3u

    s = NeumannPoissonU(m, mode="bg", levelset_degree=2)
    s.setup(phi_sphere, f3, u_N)
    s.assemble()
    r = s.solve(method="bicgstab", tol=1e-10, maxiter=4000)
    assert r.converged, r.residual
    e = s.l2_h1_errors(s.u_h, uex, region=(1,))
    assert e["l2"] < 0.1, e

    s4 = RobinPoissonU(m, mode="bg", levelset_degree=2, robin_coef=1.0)
    g_robin = lambda x: u_N(x) + uex(x)
    s4.setup(phi_sphere, f3, g_robin)
    s4.assemble()
    r4 = s4.solve(method="bicgstab", tol=1e-10, maxiter=4000)
    assert r4.converged, r4.residual
    e4 = s4.l2_h1_errors(s4.u_h, uex, region=(1,))
    assert e4["l2"] < 0.12, e4
