"""Hot-path compute kernels (stencils, Pallas fusions)."""

from .stencil import StencilCellBatch

__all__ = ["StencilCellBatch"]
