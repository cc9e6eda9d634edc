"""Periodic-boundary geometry primitives (vectorized, jit/vmap friendly).

Capability parity with reference `Ewald/boundaries.jl` (`vector1D`, `PBC`),
re-designed as whole-array ops: minimum-image displacement and coordinate
wrapping for cubic boxes, broadcasting over arbitrary leading axes so the
same code serves (atoms,), (P, A) pair grids, and (chains, ...) batches.
"""

import jax.numpy as jnp


def min_image(dr, box):
    """Minimum-image displacement for a cubic box.

    dr:  displacement array (..., 3) or any shape (component-wise).
    box: scalar or broadcastable array of box lengths.

    Returns dr wrapped into (-box/2, box/2].
    """
    return dr - box * jnp.round(dr / box)


def min_image_dist2(ri, rj, box):
    """Squared minimum-image distance between position arrays.

    ri: (..., 3), rj: (..., 3) broadcastable; box scalar/broadcastable.
    Returns (...,) squared distances.
    """
    dr = min_image(ri - rj, box)
    return jnp.sum(dr * dr, axis=-1)


def wrap(r, box):
    """Wrap coordinates into [0, box). Reference: `Ewald/boundaries.jl:16-26`."""
    return r - box * jnp.floor(r / box)


def pair_min_image(ra, rb, box):
    """All-pairs minimum-image displacement.

    ra: (..., P, 3), rb: (..., A, 3) -> (..., P, A, 3) displacements ra - rb.
    """
    dr = ra[..., :, None, :] - rb[..., None, :, :]
    return min_image(dr, box)
