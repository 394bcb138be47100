"""Pallas fused stencil matvec vs the reference XLA stencil (interpret mode
on CPU; the compiled kernel runs in bench on the TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

import phifem_tpu as pf
from phifem_tpu.assembly import CellTerm, System, assemble_operator
from phifem_tpu.ops.pallas_stencil import stencil_matvec_pallas
from phifem_tpu.ops.stencil import StencilCellBatch


@pytest.mark.parametrize("cell_type", ["triangle", "quadrilateral"])
def test_pallas_matches_xla_stencil(cell_type):
    g = pf.Grid(20, 12, ((-1.0, -1.0), (1.0, 1.0)), cell_type)
    sp = pf.Space.lagrange(g, 1)
    sys_ = System({"u": sp})

    def bulk(u, v, d, x, ctx):
        return jnp.dot(u["u"].grad, v["u"].grad) + u["u"].val * v["u"].val

    tags = pf.tag_cells(g, lambda x: x[..., 0] ** 2 + x[..., 1] ** 2 - 0.3, 1)
    op = assemble_operator(
        sys_,
        g,
        cell_terms=[(CellTerm(bulk, (1, 2), degree=2, uniform=True), {})],
        cell_tags=tags,
    )
    batch = op.batches[0]
    assert isinstance(batch, StencilCellBatch)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=sp.dof_shape))
    y_ref = op.matvec({"u": x})["u"]
    y_pl = stencil_matvec_pallas(
        g, x, batch.masks, batch.matrices, TY=8, interpret=True
    )
    assert np.allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-12), (
        np.abs(np.asarray(y_pl) - np.asarray(y_ref)).max()
    )


@pytest.mark.parametrize("cell_type", ["triangle", "quadrilateral"])
def test_pallas_maskless_full_term(cell_type):
    """A term covering every cell builds masks=None and the maskless kernel
    (iota validity) must match the masked XLA stencil, including the
    lattice-boundary rows/cols where fake padded cells must not leak."""
    g = pf.Grid(20, 12, ((-1.0, -1.0), (1.0, 1.0)), cell_type)
    sp = pf.Space.lagrange(g, 1)
    sys_ = System({"u": sp})

    def bulk(u, v, d, x, ctx):
        return jnp.dot(u["u"].grad, v["u"].grad) + u["u"].val * v["u"].val

    op = assemble_operator(
        sys_,
        g,
        cell_terms=[(CellTerm(bulk, None, degree=2, uniform=True), {})],
    )
    batch = op.batches[0]
    assert isinstance(batch, StencilCellBatch)
    assert batch.masks is None  # full-coverage term -> maskless fast path

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=sp.dof_shape))
    # independent oracle: the SAME term with explicit all-ones masks (the
    # masked path is itself golden-tested above) — guards against a shared
    # boundary bug between the maskless XLA and maskless Pallas paths
    no = 2 if g.is_simplex else 1
    masked = StencilCellBatch(
        g, "u", batch.matrices, jnp.ones((no, g.ny, g.nx))
    )
    y_ref = masked.matvec_into({"u": x}, {"u": jnp.zeros_like(x)})["u"]
    y_xla = op.matvec({"u": x})["u"]
    assert np.allclose(np.asarray(y_xla), np.asarray(y_ref), atol=1e-12)
    y_pl = stencil_matvec_pallas(g, x, None, batch.matrices, TY=8, interpret=True)
    assert np.allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-12), (
        np.abs(np.asarray(y_pl) - np.asarray(y_ref)).max()
    )
