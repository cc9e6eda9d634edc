"""Bare (undamped) truncated Coulomb: factor * sum qq / r.

Capability parity with reference `CoulombReal` (`Ewald/energy.jl:618-711`,
selected by coulombStyle="bare", `Ewald/main.jl:74`).
"""

import jax.numpy as jnp

from metropolismontecarlo_tpu.utils.constants import COULOMB_FACTOR


def bare_pair_sum(d2, qq, mask, factor=COULOMB_FACTOR):
    """Masked pairwise 1/r sum over included pairs."""
    d2s = jnp.where(mask, d2, jnp.ones((), d2.dtype))
    term = qq / jnp.sqrt(d2s)
    return factor * jnp.sum(jnp.where(mask, term, 0.0), axis=(-1, -2))
