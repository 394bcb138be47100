"""phi-FEM schemes on imported (unstructured) meshes.

The reference runs every scheme on whatever dolfinx mesh it is handed —
including imported XDMF meshes like its golden ``disk.xdmf``
(``tests/test_compute_meshtags.py:136-137``).  This module provides the
same capability for the flagship S1 weak-Dirichlet scheme: the EXACT form
definitions of the structured scheme (shared via
:func:`phifem_tpu.models.weak_dirichlet.s1_forms`) assembled through the
unstructured backend (:mod:`phifem_tpu.uassembly`) and solved with the
same equilibrated Krylov stack.  On a ``UMesh.from_grid`` copy of a
structured grid this reproduces the structured solution to solver
tolerance (pinned in ``tests/test_usolve.py``) — the two backends
discretize identically; only the geometry bookkeeping differs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly import CellTerm
from ..solvers import DirichletBC, SolveResult, solve
from ..tagging import compute_tags_measures
from ..uassembly import (
    UFunction,
    USpace,
    assemble_operator,
    assemble_scalar,
    assemble_vector,
    boundary_dof_mask,
    interpolate,
)
from ..umesh import UMesh, _u_build_submesh
from ..assembly import System
from .weak_dirichlet import s1_forms

LevelSetLike = Union[Callable, UFunction]


def _grad_of(f: Callable) -> Callable:
    """Batched gradient of a pointwise scalar callable ``f((n,2)) -> (n,)``
    (rows decouple, so ``grad(sum(f))`` is the per-row gradient)."""
    g = jax.grad(lambda pts: jnp.sum(f(pts)))
    return lambda pts: g(pts)


@dataclasses.dataclass
class USchemeBase:
    """Shared tagging/measure/error machinery for unstructured schemes —
    the :class:`~phifem_tpu.models.base.SchemeBase` twin for ``UMesh``."""

    mesh: UMesh
    mode: str = "bg"
    detection_degree: int = 1
    single_layer_cut: bool = False
    pen_coef: float = 1.0
    stab_coef: float = 1.0

    def tag(self, detection_levelset: LevelSetLike):
        res = compute_tags_measures(
            self.mesh,
            detection_levelset,
            self.detection_degree,
            box_mode=True,
            single_layer_cut=self.single_layer_cut,
        )
        self.tags = res
        self.cell_tags = res.cells_tags.as_numpy()
        self.facet_tags = res.facets_tags.as_numpy()
        if self.mode == "sub":
            self.submesh = _u_build_submesh(
                self.mesh, self.cell_tags, self.facet_tags
            )
        else:
            self.submesh = None
        return res

    def boundary_measure(self):
        if self.mode == "bg":
            return self.tags.boundaries_measure(100)
        return self.submesh.exterior

    def solve(self, method: str = "bicgstab", tol: float = 1e-10, **kw) -> SolveResult:
        res = solve(self.op, self.b, method=method, tol=tol, **kw)
        self.result = res
        return res

    def amg_preconditioner(
        self, refresh: bool = False, theta: float = 0.08, **kw
    ):
        """Smoothed-aggregation AMG on each scalar field's bulk block +
        the multiplicative cut-band solve (:mod:`phifem_tpu.amg`) — the
        degree-1 imported-mesh analogue of the structured backend's
        ``lattice_preconditioner`` (grid-independent-ish iterations where
        plain Jacobi-BiCGStab grows like 1/h).  Memoized on the
        operator's data version."""
        from ..amg import amg_preconditioner

        key = ("amg", float(theta), repr(sorted(kw.items())),
               self.op.data_version)
        cache = getattr(self, "_mg_cache", None)
        if cache is None:
            cache = self._mg_cache = {}
        if not refresh and key in cache:
            return cache[key]
        vc = amg_preconditioner(
            self.op, getattr(self, "bcs", ()), theta=theta, **kw
        )
        cache[key] = vc
        return vc

    def _p1_twin(self):
        """Degree-1 twin on the same mesh (p-multigrid coarse problem);
        level-set/detection degrees untouched."""
        import dataclasses as _dc

        degree_fields = {"primal_degree", "flux_degree", "auxiliary_degree"}
        repl = {
            fld.name: 1
            for fld in _dc.fields(self)
            if fld.name in degree_fields
        }
        return _dc.replace(self, **repl)

    def p_multigrid_preconditioner(
        self, low_iters: int = 30, refresh: bool = False, **interface_kw
    ):
        """p-multigrid preconditioner for degree>=2 unstructured systems:
        high-degree Jacobi smoothing + an equilibrated inner-BiCGStab
        degree-1 correction + the cut-band solve on the high-degree
        penalty block (see :mod:`phifem_tpu.pmg`).  Nonstationary — pair
        with ``method="fgmres"``."""
        from ..pmg import build_p_preconditioner

        key = (
            "pmg", low_iters, repr(sorted(interface_kw.items())),
            self.op.data_version,
        )
        cache = getattr(self, "_mg_cache", None)
        if cache is None:
            cache = self._mg_cache = {}
        if not refresh and key in cache:
            return cache[key]
        vc = build_p_preconditioner(self, low_iters=low_iters, **interface_kw)
        cache[key] = vc
        return vc

    def l2_h1_errors(
        self,
        uh: UFunction,
        exact: Callable,
        exact_grad: Optional[Callable] = None,
        region=(1, 2),
        ref_degree: Optional[int] = None,
    ):
        """Relative L2/H10/H1 errors vs an analytic solution by direct
        high-order quadrature of ``u_h - u`` over the region cells (the
        irregular-mesh analogue of the reference's refined-space protocol;
        ``exact_grad`` defaults to autodiff of ``exact``)."""
        deg = 2 * ((ref_degree or uh.space.degree + 2))
        guex = exact_grad or _grad_of(exact)

        def _scalar(integrand):
            return float(
                assemble_scalar(
                    self.mesh,
                    cell_terms=[
                        (
                            CellTerm(integrand, tuple(region), degree=deg),
                            {"u": uh, "uex": exact, "guex": guex},
                        )
                    ],
                    cell_tags=self.cell_tags,
                )
            )

        l2_num = _scalar(
            lambda d, x, ctx: jnp.sum((d["u"].val - d["uex"].val) ** 2)
        )
        l2_den = _scalar(lambda d, x, ctx: jnp.sum(d["uex"].val ** 2))
        h1_num = _scalar(
            lambda d, x, ctx: jnp.sum((d["u"].grad - d["guex"].val) ** 2)
        )
        h1_den = _scalar(lambda d, x, ctx: jnp.sum(d["guex"].val ** 2))
        return {
            "l2": float(np.sqrt(l2_num / l2_den)),
            "h10": float(np.sqrt(h1_num / h1_den)),
            "h1": float(np.sqrt((l2_num + h1_num) / (l2_den + h1_den))),
        }


@dataclasses.dataclass
class WeakDirichletPoissonU(USchemeBase):
    """S1 weak-Dirichlet phi-FEM Poisson on an imported mesh (reference
    ``demo/weak-dirichlet/flower/main.py:102-154`` run on an arbitrary
    dolfinx mesh)."""

    primal_degree: int = 1
    levelset_degree: int = 1

    def setup(
        self,
        levelset: LevelSetLike,
        f: Union[Callable, UFunction],
        u_D: Union[Callable, UFunction, None] = None,
        detection_levelset: Optional[LevelSetLike] = None,
    ):
        self.tag(detection_levelset if detection_levelset is not None else levelset)
        V = USpace.lagrange(self.mesh, self.primal_degree)
        Vphi = USpace.lagrange(self.mesh, self.levelset_degree)
        self.V, self.Vphi = V, Vphi
        self.system = System({"u": V, "p": V})
        self.phi_h = levelset if isinstance(levelset, UFunction) else interpolate(levelset, Vphi)
        self.f_h = f if isinstance(f, UFunction) else interpolate(f, V)
        if u_D is None:
            u_D = lambda x: jnp.zeros(x.shape[:-1])
        self.u_D = u_D if isinstance(u_D, UFunction) else interpolate(u_D, V)
        self._setup_args = (levelset, f, u_D, detection_levelset)
        return self

    def assemble(self, rhs: bool = True):
        cell_terms, facet_terms, boundary_terms, rhs_cell_terms = s1_forms(
            self.pen_coef,
            self.stab_coef,
            self.primal_degree,
            self.levelset_degree,
            self.phi_h,
            self.f_h,
            self.u_D,
            self.boundary_measure(),
        )
        self.op = assemble_operator(
            self.system,
            self.mesh,
            cell_terms=cell_terms,
            facet_terms=facet_terms,
            boundary_terms=boundary_terms,
            cell_tags=self.cell_tags,
            facet_tags=self.facet_tags,
        )
        if not rhs:
            return self
        self.b = assemble_vector(
            self.system,
            self.mesh,
            cell_terms=rhs_cell_terms,
            cell_tags=self.cell_tags,
        )
        return self

    def solve(self, method: str = "bicgstab", tol: float = 1e-10, **kw) -> SolveResult:
        res = super().solve(method=method, tol=tol, **kw)
        self.u_h = UFunction(self.V, res.x["u"])
        self.p_h = UFunction(self.V, res.x["p"])
        return res


@dataclasses.dataclass
class StrongDirichletPoissonU(USchemeBase):
    """S2 strong-Dirichlet (u = phi w) on an imported mesh (reference
    ``demo/strong-dirichlet/flower/main.py:92-131``)."""

    primal_degree: int = 1
    levelset_degree: int = 1

    def setup(
        self,
        levelset: Callable,
        f: Union[Callable, UFunction],
        detection_levelset: Optional[Callable] = None,
    ):
        self.tag(detection_levelset if detection_levelset is not None else levelset)
        V = USpace.lagrange(self.mesh, self.primal_degree)
        Vphi = USpace.lagrange(self.mesh, self.levelset_degree)
        self.V, self.Vphi = V, Vphi
        self.system = System({"w": V})
        self.phi_h = levelset if isinstance(levelset, UFunction) else interpolate(levelset, Vphi)
        self.f_h = f if isinstance(f, UFunction) else interpolate(f, V)
        self._levelset = levelset
        self._setup_args = (levelset, f, detection_levelset)
        return self

    def assemble(self, rhs: bool = True):
        from .strong_dirichlet import s2_forms

        cell_terms, facet_terms, boundary_terms, rhs_cell_terms = s2_forms(
            self.stab_coef,
            self.primal_degree,
            self.levelset_degree,
            self.phi_h,
            self.f_h,
            self.boundary_measure(),
        )
        self.op = assemble_operator(
            self.system,
            self.mesh,
            cell_terms=cell_terms,
            facet_terms=facet_terms,
            boundary_terms=boundary_terms,
            cell_tags=self.cell_tags,
            facet_tags=self.facet_tags,
        )
        if not rhs:
            return self
        self.b = assemble_vector(
            self.system,
            self.mesh,
            cell_terms=rhs_cell_terms,
            cell_tags=self.cell_tags,
        )
        return self

    def solve(self, method: str = "bicgstab", tol: float = 1e-10, **kw) -> SolveResult:
        res = super().solve(method=method, tol=tol, **kw)
        self.w_h = UFunction(self.V, res.x["w"])
        # nodal product u = w * phi in the primal space (reference
        # demo/strong-dirichlet/flower/main.py:159-165); phi re-interpolated
        # into V when the level-set space differs
        phi_V = (
            self.phi_h
            if self.phi_h.space.degree == self.V.degree
            else interpolate(self._levelset, self.V)
        )
        self.u_h = UFunction(self.V, self.w_h.data * phi_V.data)
        return res


@dataclasses.dataclass
class NeumannPoissonU(USchemeBase):
    """S3 Neumann mixed-flux scheme on an imported mesh (reference
    ``demo/neumann/square/main.py:112-158``)."""

    primal_degree: int = 1
    vector_degree: int = 1
    levelset_degree: int = 2

    def setup(
        self,
        levelset: Callable,
        f: Union[Callable, UFunction],
        u_N: Union[Callable, UFunction],
        detection_levelset: Optional[Callable] = None,
    ):
        self.tag(detection_levelset if detection_levelset is not None else levelset)
        V = USpace.lagrange(self.mesh, self.primal_degree)
        Y = USpace.lagrange(self.mesh, self.vector_degree, (self.mesh.dim,))
        Q = USpace.dg0(self.mesh)
        Vphi = USpace.lagrange(self.mesh, self.levelset_degree)
        self.V, self.Y, self.Q, self.Vphi = V, Y, Q, Vphi
        self.system = System({"u": V, "y": Y, "p": Q})
        self.phi_h = levelset if isinstance(levelset, UFunction) else interpolate(levelset, Vphi)
        self.f_h = f if isinstance(f, UFunction) else interpolate(f, V)
        self.u_N = u_N if isinstance(u_N, UFunction) else interpolate(u_N, V)
        self._setup_args = (levelset, f, u_N, detection_levelset)
        return self

    def assemble(self, rhs: bool = True):
        from .neumann import s3_forms

        cell_terms, facet_terms, boundary_terms, rhs_cell_terms = s3_forms(
            self.pen_coef,
            self.stab_coef,
            self.primal_degree,
            self.vector_degree,
            self.levelset_degree,
            self.phi_h,
            self.f_h,
            self.u_N,
            self.boundary_measure(),
        )
        self.op = assemble_operator(
            self.system,
            self.mesh,
            cell_terms=cell_terms,
            facet_terms=facet_terms,
            boundary_terms=boundary_terms,
            cell_tags=self.cell_tags,
            facet_tags=self.facet_tags,
        )
        if not rhs:
            return self
        self.b = assemble_vector(
            self.system,
            self.mesh,
            cell_terms=rhs_cell_terms,
            cell_tags=self.cell_tags,
        )
        return self

    def solve(self, method: str = "bicgstab", tol: float = 1e-10, **kw) -> SolveResult:
        res = super().solve(method=method, tol=tol, **kw)
        self.u_h = UFunction(self.V, res.x["u"])
        self.y_h = UFunction(self.Y, res.x["y"])
        return res


@dataclasses.dataclass
class InterfaceElasticityU(USchemeBase):
    """S5 two-material interface elasticity on an imported mesh (reference
    ``demo/interface-elasticity/main.py:145-277`` run on an arbitrary
    dolfinx mesh).  Same 5-field system, contrast-weighted penalties,
    one-sided ds(100)/ds(101) terms, Dirichlet lifting on the outer
    boundary, rigid-mode deflation and cut-cell recombination as the
    structured :class:`~phifem_tpu.models.interface_elasticity.InterfaceElasticity`
    — the discrete form is literally shared (:func:`s5_forms`)."""

    primal_degree: int = 1
    flux_degree: int = 1
    auxiliary_degree: int = 1
    levelset_degree: int = 1
    E_in: float = 1.0
    nu_in: float = 0.3
    E_out: float = 0.001
    nu_out: float = 0.3

    def setup(
        self,
        levelset: LevelSetLike,
        f: Union[Callable, UFunction],
        u_dbc: Union[Callable, UFunction],
    ):
        if self.mode != "bg":
            raise ValueError("S5 runs on the background mesh (reference bg mode)")
        if self.mesh.dim != 2:
            raise NotImplementedError(
                "S5-U is 2D (plane strain); the structured "
                "InterfaceElasticity3 covers 3D interface elasticity"
            )
        self.tag(levelset)
        m = self.mesh
        U = USpace.lagrange(m, self.primal_degree, (2,))
        T = USpace.lagrange(m, self.flux_degree, (2, 2))
        P = USpace.lagrange(m, self.auxiliary_degree, (2,))
        Vphi = USpace.lagrange(m, self.levelset_degree)
        self.U, self.T, self.P = U, T, P
        self.system = System(
            {"u_in": U, "u_out": U, "y_in": T, "y_out": T, "p": P}
        )
        self.phi_h = levelset if isinstance(levelset, UFunction) else interpolate(levelset, Vphi)
        self.f = f
        self.u_dbc = u_dbc if isinstance(u_dbc, UFunction) else interpolate(u_dbc, U)
        bmask = boundary_dof_mask(U)
        self.bcs = (DirichletBC("u_in", bmask[:, None], self.u_dbc.data),)
        self._setup_args = (levelset, f, u_dbc)
        return self

    def assemble(self, rhs: bool = True):
        from .interface_elasticity import s5_forms

        cell_terms, facet_terms, boundary_terms, rhs_cell_terms = s5_forms(
            self.pen_coef,
            self.stab_coef,
            self.E_in,
            self.nu_in,
            self.E_out,
            self.nu_out,
            self.primal_degree,
            self.flux_degree,
            self.levelset_degree,
            self.phi_h,
            self.f,
            self.tags.boundaries_measure(100),
            self.tags.boundaries_measure(101),
        )
        self.op = assemble_operator(
            self.system,
            self.mesh,
            cell_terms=cell_terms,
            facet_terms=facet_terms,
            boundary_terms=boundary_terms,
            cell_tags=self.cell_tags,
            facet_tags=self.facet_tags,
        )
        if not rhs:
            return self
        self.b = assemble_vector(
            self.system,
            self.mesh,
            cell_terms=rhs_cell_terms,
            cell_tags=self.cell_tags,
        )
        return self

    def rigid_modes(self) -> tuple:
        from .interface_elasticity import s5_rigid_modes

        return s5_rigid_modes(self.system, self.U, interpolate)

    def solve(self, method: str = "bicgstab", tol: float = 1e-10, **kw) -> SolveResult:
        from .interface_elasticity import s5_recombine

        if method != "dense" and "deflate" not in kw:
            kw["deflate"] = self.rigid_modes()
        res = solve(self.op, self.b, bcs=self.bcs, method=method, tol=tol, **kw)
        self.result = res
        self.u_in_h = UFunction(self.U, res.x["u_in"])
        self.u_out_h = UFunction(self.U, res.x["u_out"])
        self.u_h = UFunction(
            self.U,
            s5_recombine(self.U, self.cell_tags, res.x["u_in"], res.x["u_out"]),
        )
        return res


@dataclasses.dataclass
class RobinPoissonU(NeumannPoissonU):
    """S4 Robin mixed-flux scheme on an imported mesh (reference
    ``demo/robin/square/main.py:119-174``)."""

    robin_coef: float = 1.0

    def assemble(self, rhs: bool = True):
        from .robin import s4_forms

        cell_terms, facet_terms, boundary_terms, rhs_cell_terms = s4_forms(
            self.pen_coef,
            self.stab_coef,
            self.robin_coef,
            self.primal_degree,
            self.vector_degree,
            self.levelset_degree,
            self.phi_h,
            self.f_h,
            self.u_N,
            self.boundary_measure(),
        )
        self.op = assemble_operator(
            self.system,
            self.mesh,
            cell_terms=cell_terms,
            facet_terms=facet_terms,
            boundary_terms=boundary_terms,
            cell_tags=self.cell_tags,
            facet_tags=self.facet_tags,
        )
        if not rhs:
            return self
        self.b = assemble_vector(
            self.system,
            self.mesh,
            cell_terms=rhs_cell_terms,
            cell_tags=self.cell_tags,
        )
        return self
