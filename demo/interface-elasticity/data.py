"""Two-material elasticity data (reference ``demo/interface-elasticity/data.py``)
with the source term derived by JAX autodiff instead of UFL symbolics."""

import jax
import jax.numpy as jnp

from phifem_tpu.models.interface_elasticity import lame

E_in, nu_in = 1.0, 0.3
E_out, nu_out = 0.001, 0.3
lmbda_in, mu_in = lame(E_in, nu_in)
lmbda_out, mu_out = lame(E_out, nu_out)


def levelset(x):
    return 1.0 - (x[..., 0] ** 2 + x[..., 1] ** 2)


def exact_solution(x):
    r = jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
    val = (jnp.cos(r) - jnp.cos(1.0)) / E_in
    val = jnp.where(r < 1.0, val * (E_in / E_out), val)
    return jnp.stack([val, val], axis=-1)


def _cos_vec(p):
    r = jnp.sqrt(p[0] ** 2 + p[1] ** 2)
    return jnp.stack([jnp.cos(r), jnp.cos(r)])


def _sigma_in(p):
    G = jax.jacfwd(_cos_vec)(p)
    eps = 0.5 * (G + G.T)
    return lmbda_in * jnp.trace(G) * jnp.eye(2) + 2.0 * mu_in * eps


def source_term(x):
    """f = -div sigma_in(cos_vec) / E_in (reference main.py:147)."""
    D = jax.vmap(jax.jacfwd(_sigma_in))(x)  # (n, 2, 2, 2) = d_k sigma_ij
    return -jnp.einsum("nijj->ni", D) / E_in
