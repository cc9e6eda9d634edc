"""Wolf damped-Coulomb summation (real-space only alternative to Ewald).

Capability parity with the reference's Wolf path (`Ewald/energy.jl:863-943`,
flagged at `Ewald/main.jl:75-81`), implemented in the standard form of
Wolf et al., J. Chem. Phys. 110, 8254 (1999):

  E = factor * [ sum_{i<j, r<rc} q_i q_j ( erfc(k r)/r - erfc(k rc)/rc )
                 - ( erfc(k rc)/(2 rc) + k/sqrt(pi) ) sum_i q_i^2 ]

The pairwise shift term makes the potential continuous at the cutoff so
that per-move delta energies are well defined as molecules cross it.
(The reference's own shift uses the total-charge square, which vanishes
for neutral systems, `Ewald/energy.jl:924-934`; the standard pairwise
form is kept here and validated against Ewald via RDF agreement, the
reference's own cross-check `Ewald/readme.md:30-32`.)
"""

import jax.numpy as jnp
from jax.scipy.special import erfc as _erfc

from metropolismontecarlo_tpu.utils.constants import COULOMB_FACTOR


def wolf_pair_sum(d2, qq, mask, kappa, r_cut, factor=COULOMB_FACTOR,
                  shifted=True):
    """Masked pairwise Wolf sum: factor * sum qq [erfc(k r)/r - erfc(k rc)/rc]
    over included pairs with r < r_cut.  d2/qq/mask as in ewald.real_space_sum.
    shifted=False drops the pairwise shift (the reference convention's
    plain erfc pair sum; its global constant is wolf_ref_const)."""
    d2s = jnp.where(mask, d2, jnp.ones((), d2.dtype))
    r = jnp.sqrt(d2s)
    shift = _erfc(kappa * r_cut) / r_cut if shifted else 0.0
    term = qq * (_erfc(kappa * r) / r - shift)
    keep = mask & (d2 < r_cut * r_cut)
    return factor * jnp.sum(jnp.where(keep, term, 0.0), axis=(-1, -2))


def wolf_ref_const(charges, kappa, r_cut, factor=COULOMB_FACTOR):
    """The reference convention's global constant
    (`Ewald/energy.jl:924-931`): -factor * erfc(k rc)/rc * (sum_i q_i)^2
    — the total-charge-square "prefactor", zero for neutral systems.
    Position-independent, so per-move deltas are unaffected."""
    q_tot = jnp.sum(jnp.asarray(charges), axis=-1)
    return -factor * _erfc(kappa * r_cut) / r_cut * q_tot * q_tot


def wolf_ref_const_kappa(charges, kappa, r_cut, factor=COULOMB_FACTOR):
    """kappa-virial of wolf_ref_const (kappa = kappa_L/box is volume-
    dependent): W = kappa dE/dkappa = +factor (2k/sqrt(pi)) e^{-k^2 rc^2}
    (sum q)^2."""
    q_tot = jnp.sum(jnp.asarray(charges), axis=-1)
    coeff = 2.0 * kappa / jnp.sqrt(jnp.pi) * jnp.exp(-(kappa * r_cut) ** 2)
    return factor * coeff * q_tot * q_tot


def wolf_self(charges, kappa, r_cut, factor=COULOMB_FACTOR):
    """Self/background term: -factor (erfc(k rc)/(2 rc) + k/sqrt(pi)) sum q^2."""
    q = jnp.asarray(charges)
    coeff = _erfc(kappa * r_cut) / (2.0 * r_cut) + kappa / jnp.sqrt(jnp.pi)
    return -factor * coeff * jnp.sum(q * q, axis=-1)


def wolf_self_kappa(charges, kappa, r_cut, factor=COULOMB_FACTOR):
    """Exact-virial kappa term of the Wolf self energy (kappa = kappa_L/box
    is volume-dependent; r_cut is not):
    W = kappa dE_self/dkappa = -factor (k/sqrt(pi)) (1 - e^{-k^2 rc^2}) sum q^2."""
    q = jnp.asarray(charges)
    coeff = kappa / jnp.sqrt(jnp.pi) * (1.0 - jnp.exp(-(kappa * r_cut) ** 2))
    return -factor * coeff * jnp.sum(q * q, axis=-1)
