"""Lennard-Jones energy kernels (dense masked reductions, jnp reference path).

Capability parity with reference `Ewald/energy.jl` (`LJ_poly_ΔU`,
`LJ_ΔU`, `potential` LJ parts) and `Poly/energy.jl:7-111` (Mossa
cut-and-shifted form), re-designed as fixed-shape array reductions.

Shift modes:
  * "none"   — plain truncated LJ: u = 4 eps (s12 - s6) for r < r_cut
               (the reference's Ewald/Monatomic convention; tail
               corrections in ops.tail).
  * "linear" — cut-and-force-shifted (Mossa et al. PRE 65 041205):
               u = 4 eps (s12 - s6) + eps*l1 + eps*l2*(r/sigma); u and du/dr
               both vanish at r_cut (reference `Poly/energy.jl:14-19`).

Virial convention: functions return (pot, w) where
  w = sum_pairs  r_ij_com . f_ab   (the molecular virial),
and the pressure is P = rho k T + w / (3 V) (+ LRC).  The reference
returns w/3 from its kernels (`Ewald/energy.jl:289`).
"""

import jax.numpy as jnp


def _shift_coeffs(r_cut_over_sigma):
    """Mossa force-shift coefficients (dimensionless, sigma=eps=1 form)."""
    sc = 1.0 / r_cut_over_sigma
    sc6 = sc**6
    sc12 = sc6 * sc6
    lam1 = 4.0 * (7.0 * sc6 - 13.0 * sc12)
    lam2 = -24.0 * (sc6 - 2.0 * sc12) * sc
    return lam1, lam2


def lj_pair_terms(d2, eps, sigma, r_cut, shift="none", site_cutoff=False):
    """Per-pair LJ energy and virial scalar.

    d2:    (...,) squared distances (positive; masked entries pre-floored).
    eps:   (...,) pair epsilon (energy units; 0 disables the pair).
    sigma: (...,) pair sigma.
    Returns (pot, wvir) where wvir is r_ab . f_ab per pair, i.e.
    24 eps (2 s12 - s6) [- shift term]; the caller converts to the
    molecular virial by scaling with (r_ij_com . r_ab) / r_ab^2.
    If site_cutoff, pairs with d2 >= r_cut^2 are zeroed here.
    """
    s2 = sigma * sigma / d2
    s6 = s2 * s2 * s2
    s12 = s6 * s6
    pot = 4.0 * eps * (s12 - s6)
    wvir = 24.0 * eps * (2.0 * s12 - s6)
    if shift == "linear":
        r = jnp.sqrt(d2)
        lam1, lam2 = _shift_coeffs(r_cut / sigma)
        pot = pot + eps * (lam1 + lam2 * r / sigma)
        wvir = wvir - eps * lam2 * r / sigma
    elif shift != "none":
        raise ValueError(f"unknown shift mode {shift!r}")
    if site_cutoff:
        inside = d2 < r_cut * r_cut
        pot = jnp.where(inside, pot, 0.0)
        wvir = jnp.where(inside, wvir, 0.0)
    return pot, wvir


def lj_masked_sum(d2, dr_ab, dr_ij, mask, eps, sigma, r_cut, shift, site_cutoff):
    """Masked LJ reduction over a pair grid.

    d2, mask, eps, sigma: (..., P, A); dr_ab: (..., P, A, 3) atom-atom
    min-image displacement; dr_ij: (..., P, A, 3) molecular (COM)
    displacement for the virial (may alias dr_ab for monatomic systems).
    Returns (pot, w) reduced over the trailing two axes.
    """
    d2s = jnp.where(mask, d2, jnp.ones((), d2.dtype))
    pot, wvir = lj_pair_terms(d2s, eps, sigma, r_cut, shift, site_cutoff)
    mf = mask.astype(d2.dtype)
    pot = jnp.sum(pot * mf, axis=(-1, -2))
    # molecular virial: (r_ij . r_ab / r_ab^2) * wvir
    proj = jnp.sum(dr_ij * dr_ab, axis=-1) / d2s
    w = jnp.sum(wvir * proj * mf, axis=(-1, -2))
    return pot, w
