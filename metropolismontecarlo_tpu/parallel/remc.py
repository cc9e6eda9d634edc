"""Replica-exchange Monte Carlo (parallel tempering) across the chain axis.

The reference lists REMC as an unimplemented TODO (`Ewald/main.jl:55`,
`Ewald/readme.md:16`); here it is the framework's multi-device
communication showcase: replicas live along the sharded chains axis, and
the partner gathers lower to ICI collective-permutes when neighbours
straddle device boundaries.

Ladder layout: chain c holds temperature T_c (SimState.temp).  An
exchange round proposes swaps of CONFIGURATIONS between adjacent chains
(even phase: pairs (0,1),(2,3),...; odd phase: (1,2),(3,4),...), accepted
with

  P_acc = min(1, exp((1/T_i - 1/T_j)(E_i - E_j)))

Both partners draw the SAME decision (randomness keyed on the pair id),
so the swap is symmetric and collective-free in logic — only the state
exchange itself communicates.
"""

import jax
import jax.numpy as jnp


def temperature_ladder(t_min, t_max, n, kind="geometric", dtype=jnp.float32):
    """Standard geometric (or linear) replica ladder."""
    if kind == "geometric":
        return jnp.asarray(
            t_min * (t_max / t_min) ** (jnp.arange(n) / max(n - 1, 1)), dtype
        )
    return jnp.linspace(t_min, t_max, n, dtype=dtype)


def exchange(state, key, phase):
    """One replica-exchange round over SimState.

    key: scalar PRNG key for this round (host-supplied, shared by all
    chains).  phase: 0 (even pairs) or 1 (odd pairs).  Temperatures stay
    attached to chain slots; configurations (and their energies, virials,
    structure factors) swap.  Adaptive step sizes travel WITH the
    temperature slot (they are tuned per temperature, not per config).
    Returns (state, swap_fraction).
    """
    C = state.temp.shape[0]
    c = jnp.arange(C)
    # partner pairing within this phase; self-partner at the edges
    base = c - ((c - phase) % 2 * 2 - 1)
    partner = jnp.clip(jnp.where((base >= 0) & (base < C), base, c), 0, C - 1)
    active = partner != c

    e_p = jnp.take(state.energy, partner, axis=0)
    t_p = jnp.take(state.temp, partner, axis=0)
    arg = (1.0 / state.temp - 1.0 / t_p) * (state.energy - e_p)

    # identical draw for both members of a pair: key folded with pair id
    pair_id = jnp.minimum(c, partner)
    u = jax.vmap(lambda i: jax.random.uniform(jax.random.fold_in(key, i)))(pair_id)
    swap = active & ((arg > 0.0) | (u < jnp.exp(jnp.minimum(arg, 0.0))))

    def take_partner(x):
        xp = jnp.take(x, partner, axis=0)
        s = swap.reshape((C,) + (1,) * (x.ndim - 1))
        return jnp.where(s, xp, x)

    state = state._replace(
        com=take_partner(state.com),
        quat=take_partner(state.quat),
        coords=take_partner(state.coords),
        box=take_partner(state.box),
        sfac=take_partner(state.sfac),
        energy=take_partner(state.energy),
        virial=take_partner(state.virial),
    )
    swap_fraction = jnp.sum(swap) / jnp.maximum(jnp.sum(active), 1)
    return state, swap_fraction
