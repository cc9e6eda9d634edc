"""Long-range (tail) corrections for truncated LJ interactions.

Capability parity with reference `Ewald/auxillary.jl:16-35`
(`potential_lrc`, `pressure_lrc`, `pressure_delta`) and the per-type
`ener_corr`/`press_corr` (`Ewald/energy.jl:514-614`), generalized to
arbitrary multi-species mixtures.

For u(r) = 4 eps [(sigma/r)^12 - (sigma/r)^6] truncated at r_cut, the
standard corrections assuming g(r)=1 beyond the cutoff are

  U_lrc = (8 pi / 3V) sum_ab N_a N_b eps_ab sigma_ab^3
          [ (1/3) (sigma_ab/r_cut)^9 - (sigma_ab/r_cut)^3 ]
  P_lrc = (16 pi / 3V^2) sum_ab N_a N_b eps_ab sigma_ab^3
          [ (2/3) (sigma_ab/r_cut)^9 - (sigma_ab/r_cut)^3 ]
"""

import jax.numpy as jnp


def _species_sum(counts, eps_table, sig_table, r_cut):
    counts = jnp.asarray(counts, dtype=eps_table.dtype)
    sc3 = (sig_table / r_cut) ** 3
    sc9 = sc3**3
    nn = counts[:, None] * counts[None, :]
    e_term = jnp.sum(nn * eps_table * sig_table**3 * (sc9 / 3.0 - sc3))
    p_term = jnp.sum(nn * eps_table * sig_table**3 * (2.0 * sc9 / 3.0 - sc3))
    return e_term, p_term


def lrc_energy(counts, eps_table, sig_table, r_cut, volume):
    """Tail energy correction; counts (T,) atoms of each LJ type."""
    e_term, _ = _species_sum(counts, eps_table, sig_table, r_cut)
    return (8.0 * jnp.pi / (3.0 * volume)) * e_term


def lrc_pressure(counts, eps_table, sig_table, r_cut, volume):
    """Tail pressure correction (energy/volume units)."""
    _, p_term = _species_sum(counts, eps_table, sig_table, r_cut)
    return (16.0 * jnp.pi / (3.0 * volume**2)) * p_term
