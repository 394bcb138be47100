"""phi-FEM schemes (the reference's "model zoo", SURVEY.md section 2d).

Each scheme packages the variational terms its reference demo writes in UFL
(the reference keeps schemes in demo scripts, ``ROADMAP.md:16`` notes the
missing abstraction layer — we provide it):

* S1 :class:`WeakDirichletPoisson`   (demo/weak-dirichlet/flower/main.py)
* S2 :class:`StrongDirichletPoisson` (demo/strong-dirichlet/flower/main.py)
* S3 :class:`NeumannPoisson`         (demo/neumann/square/main.py)
* S4 :class:`RobinPoisson`           (demo/robin/square/main.py)
* S5 :class:`InterfaceElasticity`    (demo/interface-elasticity/main.py)
"""

from .weak_dirichlet import WeakDirichletPoisson
from .strong_dirichlet import StrongDirichletPoisson
from .neumann import NeumannPoisson
from .robin import RobinPoisson
from .interface_elasticity import InterfaceElasticity
from .poisson import BoxPoisson
from .poisson3 import BoxPoisson3
from .neumann3 import NeumannPoisson3
from .robin3 import RobinPoisson3
from .strong_dirichlet3 import StrongDirichletPoisson3
from .weak_dirichlet3 import WeakDirichletPoisson3
from .interface_elasticity3 import InterfaceElasticity3
from .unstructured import (
    InterfaceElasticityU,
    NeumannPoissonU,
    RobinPoissonU,
    StrongDirichletPoissonU,
    WeakDirichletPoissonU,
)

__all__ = [
    "WeakDirichletPoissonU",
    "StrongDirichletPoissonU",
    "NeumannPoissonU",
    "InterfaceElasticityU",
    "RobinPoissonU",
    "WeakDirichletPoisson",
    "StrongDirichletPoisson",
    "NeumannPoisson",
    "RobinPoisson",
    "InterfaceElasticity",
    "BoxPoisson",
    "BoxPoisson3",
    "NeumannPoisson3",
    "RobinPoisson3",
    "StrongDirichletPoisson3",
    "WeakDirichletPoisson3",
    "InterfaceElasticity3",
]
