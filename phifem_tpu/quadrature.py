"""Quadrature rules on reference cells and facets.

Replaces the basix/FFCx quadrature machinery the reference relies on
implicitly (its UFL forms never set a quadrature degree; FFCx picks one that
integrates the polynomial integrand exactly — SURVEY.md section 7 hard part
(e)).  We expose degree-exact rules and let each scheme term request a
degree; assembly happens once per mesh, so generous rules cost nothing on
the solve hot path.

* triangle: symmetric Gauss (Dunavant-style) rules, exact to degree 1/2/4/5/6
  on the reference triangle conv{(0,0),(1,0),(0,1)} (weights sum to 1/2);
* quadrilateral: tensor Gauss-Legendre on [0,1]^2;
* segment: Gauss-Legendre on [0,1] for facet integrals.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np

__all__ = ["cell_rule", "segment_rule"]


@lru_cache(maxsize=None)
def segment_rule(npts: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre on [0,1]: (points (n,), weights (n,)); exact to degree
    2n-1."""
    x, w = np.polynomial.legendre.leggauss(npts)
    return (x + 1.0) / 2.0, w / 2.0


@lru_cache(maxsize=None)
def _triangle_rule(degree: int) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric rules on the reference triangle; weights sum to area 1/2."""
    if degree <= 1:
        bary = np.array([[1 / 3, 1 / 3, 1 / 3]])
        w = np.array([1.0])
    elif degree == 2:
        bary = np.array([[2 / 3, 1 / 6, 1 / 6], [1 / 6, 2 / 3, 1 / 6], [1 / 6, 1 / 6, 2 / 3]])
        w = np.full(3, 1 / 3)
    elif degree <= 4:
        # Dunavant degree-4, 6 points
        a1, a2 = 0.445948490915965, 0.091576213509771
        w1, w2 = 0.223381589678011, 0.109951743655322
        bary = np.array(
            [
                [1 - 2 * a1, a1, a1],
                [a1, 1 - 2 * a1, a1],
                [a1, a1, 1 - 2 * a1],
                [1 - 2 * a2, a2, a2],
                [a2, 1 - 2 * a2, a2],
                [a2, a2, 1 - 2 * a2],
            ]
        )
        w = np.array([w1, w1, w1, w2, w2, w2])
    elif degree == 5:
        # Dunavant degree-5, 7 points
        a1, a2 = 0.470142064105115, 0.101286507323456
        w0, w1, w2 = 0.225, 0.132394152788506, 0.125939180544827
        bary = np.array(
            [
                [1 / 3, 1 / 3, 1 / 3],
                [1 - 2 * a1, a1, a1],
                [a1, 1 - 2 * a1, a1],
                [a1, a1, 1 - 2 * a1],
                [1 - 2 * a2, a2, a2],
                [a2, 1 - 2 * a2, a2],
                [a2, a2, 1 - 2 * a2],
            ]
        )
        w = np.array([w0, w1, w1, w1, w2, w2, w2])
    else:
        # Dunavant degree-6, 12 points (covers P3 x P3 products)
        a1, a2 = 0.249286745170910, 0.063089014491502
        b, c = 0.310352451033785, 0.053145049844816
        w1, w2, w3 = 0.116786275726379, 0.050844906370207, 0.082851075618374
        s3 = [
            [1 - 2 * a1, a1, a1],
            [a1, 1 - 2 * a1, a1],
            [a1, a1, 1 - 2 * a1],
            [1 - 2 * a2, a2, a2],
            [a2, 1 - 2 * a2, a2],
            [a2, a2, 1 - 2 * a2],
        ]
        s6 = []
        for (x, y) in [(b, c), (c, b)]:
            s6 += [[1 - x - y, x, y], [x, 1 - x - y, y], [x, y, 1 - x - y]]
        bary = np.array(s3 + s6)
        w = np.array([w1] * 3 + [w2] * 3 + [w3] * 6)
    pts = bary[:, 1:3]  # (r, s) = (lambda1, lambda2)
    return pts.astype(np.float64), (w / 2.0).astype(np.float64)


@lru_cache(maxsize=None)
def _quad_rule(degree: int) -> Tuple[np.ndarray, np.ndarray]:
    n = max(1, degree // 2 + 1)  # Gauss n exact to 2n-1 per axis
    x, w = segment_rule(n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    W = np.outer(w, w)
    return (
        np.stack([X.reshape(-1), Y.reshape(-1)], axis=-1),
        W.reshape(-1),
    )


@lru_cache(maxsize=None)
def _tet_rule(degree: int) -> Tuple[np.ndarray, np.ndarray]:
    """Conical-product (collapsed Duffy) rule on the reference tetrahedron
    conv{0, e1, e2, e3}: Gauss-Jacobi((1-x)^2) x Gauss-Jacobi((1-x)^1) x
    Gauss-Legendre, exact to ``degree`` with all-positive weights summing to
    the volume 1/6.  Simple, positive and degree-general — the tet twin of
    the Dunavant triangle rules above."""
    from scipy.special import roots_jacobi

    n = max(1, degree // 2 + 1)  # 2n-1 >= degree per collapsed axis
    x1, w1 = roots_jacobi(n, 2.0, 0.0)  # weight (1-x)^2 on [-1,1]
    x2, w2 = roots_jacobi(n, 1.0, 0.0)
    x3, w3 = np.polynomial.legendre.leggauss(n)
    x1, x2, x3 = (x1 + 1) / 2, (x2 + 1) / 2, (x3 + 1) / 2
    # [-1,1] -> [0,1] with the Jacobi weight (1-x)^a: extra factor 2^-(a+1)
    w1, w2, w3 = w1 / 8.0, w2 / 4.0, w3 / 2.0
    X1, X2, X3 = np.meshgrid(x1, x2, x3, indexing="ij")
    W = (
        w1[:, None, None] * w2[None, :, None] * w3[None, None, :]
    ).reshape(-1)
    u = X1.reshape(-1)
    v = (X2 * (1 - X1)).reshape(-1)
    w = (X3 * (1 - X1) * (1 - X2)).reshape(-1)
    pts = np.stack([u, v, w], axis=-1)
    return pts.astype(np.float64), W.astype(np.float64)


def cell_rule(cell: str, degree: int) -> Tuple[np.ndarray, np.ndarray]:
    """(points (n,dim), weights (n,)) on the reference cell; weights include
    the reference-cell measure so physical weights are ``w * |det J|``."""
    if cell == "triangle":
        return _triangle_rule(degree)
    if cell == "quadrilateral":
        return _quad_rule(degree)
    if cell == "tetrahedron":
        return _tet_rule(degree)
    raise ValueError(f"Unknown cell {cell!r}.")
