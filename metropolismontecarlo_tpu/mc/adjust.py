"""Adaptive maximum-displacement controller (Frenkel & Smit style).

Capability parity with reference `Adjust!`/`Adjust_rot!`
(`Ewald/adjust.jl:1-83`): steer each move type's max displacement toward a
target acceptance ratio, with multiplicative clamps [0.5, 1.5] and an
upper bound of box/2.  Vectorized over chains; counters are windowed by
resetting after every call (equivalent to the reference's prev/current
bookkeeping).

Note: step-size adaptation formally breaks detailed balance, so (as is
standard, and as the reference does implicitly by converging d_max) it
should only run during equilibration; the driver takes an `adjust` flag.
"""

import jax.numpy as jnp


def adjust_dmax(d_max, n_acc, n_att, target, upper):
    """One controller update.  All args (C,) arrays (or scalars).

    d_max' = clip(d_max * ratio/target, 0.5 d_max, 1.5 d_max), <= upper,
    where ratio = n_acc/n_att over the window; no-op where n_att == 0.
    """
    att = jnp.maximum(n_att.astype(d_max.dtype), 1.0)
    ratio = n_acc.astype(d_max.dtype) / att
    proposed = d_max * ratio / target
    new = jnp.clip(proposed, 0.5 * d_max, 1.5 * d_max)
    new = jnp.minimum(new, upper)
    return jnp.where(n_att > 0, new, d_max)
