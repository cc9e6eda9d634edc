"""Full-system energy evaluation with component breakdown.

The TPU-native analogue of the reference's six `potential(...)` overloads
(`Ewald/energy.jl:343-1032`): one function, dense masked pair grids, a
dict of components.  Used for initialization, NIST golden validation,
block-end drift checks, and NPT volume moves.  Per-move delta energies
live in `mc.moves` (they share the same ops, guaranteeing consistency).

Single-chain signature; batch over chains with `jax.vmap`.
"""

import functools

import jax
import jax.numpy as jnp

from metropolismontecarlo_tpu.ops import coulomb as coulomb_ops
from metropolismontecarlo_tpu.ops import ewald as ewald_ops
from metropolismontecarlo_tpu.ops import lj as lj_ops
from metropolismontecarlo_tpu.ops import tail as tail_ops
from metropolismontecarlo_tpu.ops import wolf as wolf_ops
from metropolismontecarlo_tpu.ops.pairs import full_pair_mask, pair_dist2


def energy_breakdown(system, params, coords, com, box, kvecs=None, kweights=None):
    """Total potential energy of one configuration, by component.

    coords (A, 3), com (M, 3), box scalar (all jnp, any float dtype).
    Returns a dict of scalars:
      disp, lrc, coul_real, coul_fourier, coul_self, coul_intra, total,
      w (molecular virial sum r_ij.f_ij), and sfac (K, 2) when Ewald.
    """
    M, P = system.n_mol, system.atoms_per_mol
    dtype = coords.dtype
    tid = system.flat(system.type_ids)
    charges = jnp.asarray(system.flat(system.charges), dtype)
    eps_t = jnp.asarray(system.eps_table, dtype)
    sig_t = jnp.asarray(system.sig_table, dtype)
    eps_pair = eps_t[tid[:, None], tid[None, :]]
    sig_pair = sig_t[tid[:, None], tid[None, :]]

    coords_mp = coords.reshape(M, P, 3)
    key = com if params.cutoff_mode != "first" else coords_mp[:, 0, :]

    d2, dr_ab = pair_dist2(coords, coords, box)
    # molecular displacement grid for the virial
    mol_dr = com[:, None, :] - com[None, :, :]
    mol_dr = mol_dr - box * jnp.round(mol_dr / box)
    dr_ij = jnp.repeat(jnp.repeat(mol_dr, P, axis=0), P, axis=1)

    site = params.cutoff_mode == "site"
    mask_lj = full_pair_mask(coords, key, M, box, params.r_cut,
                             "site" if site else params.cutoff_mode)
    pot, w = lj_ops.lj_masked_sum(
        d2, dr_ab, dr_ij, mask_lj, eps_pair, sig_pair, params.r_cut,
        params.lj_shift, site_cutoff=False,  # mask already applies site cutoff
    )
    out = {}
    out["disp"] = 0.5 * pot
    w_total = 0.5 * w

    counts = jnp.asarray(system.type_counts, dtype)
    vol = box**3
    if params.use_lrc and params.lj_shift == "none":
        out["lrc"] = tail_ops.lrc_energy(counts, eps_t, sig_t, params.r_cut, vol)
        w_total = w_total + 3.0 * vol * tail_ops.lrc_pressure(
            counts, eps_t, sig_t, params.r_cut, vol
        )
    else:
        out["lrc"] = jnp.zeros((), dtype)

    e_real = e_four = e_self = e_intra = jnp.zeros((), dtype)
    sfac = jnp.zeros((1, 2), dtype)
    if params.coulomb != "none":
        kappa = params.kappa_L / box
        qq = charges[:, None] * charges[None, :]
        if params.qq_r_cut is None and params.cutoff_mode != "site":
            mask_qq = mask_lj
        else:
            mask_qq = full_pair_mask(coords, key, M, box, params.qq_cut,
                                     params.cutoff_mode)
        if params.coulomb == "ewald":
            e_real = 0.5 * ewald_ops.real_space_sum(d2, qq, mask_qq, kappa)
            cf = ewald_ops.cfac_coeffs(kvecs, kweights, kappa, box, dtype)
            sfac = ewald_ops.structure_factor(coords, charges, kvecs, box)
            e_four = ewald_ops.recip_energy(sfac, cf)
            e_self = ewald_ops.ewald_self(charges, kappa)
            e_intra = ewald_ops.ewald_intra(
                coords_mp, jnp.asarray(system.charges, dtype), kappa, box
            )
        elif params.coulomb == "wolf":
            e_real = 0.5 * wolf_ops.wolf_pair_sum(
                d2, qq, mask_qq, kappa, params.qq_cut
            )
            e_self = wolf_ops.wolf_self(charges, kappa, params.qq_cut)
        elif params.coulomb == "bare":
            e_real = 0.5 * coulomb_ops.bare_pair_sum(d2, qq, mask_qq)
        else:
            raise ValueError(f"unknown coulomb style {params.coulomb!r}")
        # Coulomb virial: pair-virial of 1/r equals its energy; the
        # reference uses E_coul/3 per component (`Ewald/energy.jl:1004-1021`).
        w_total = w_total + (e_real + e_four + e_self + e_intra)

    out["coul_real"] = e_real
    out["coul_fourier"] = e_four
    out["coul_self"] = e_self
    out["coul_intra"] = e_intra
    out["total"] = (
        out["disp"] + out["lrc"] + e_real + e_four + e_self + e_intra
    )
    out["w"] = w_total
    out["sfac"] = sfac
    return out


@functools.partial(jax.jit, static_argnums=(0, 1))
def energy_breakdown_jit(system, params, coords, com, box, kvecs=None,
                         kweights=None):
    """Jitted energy_breakdown (system/params static by identity)."""
    return energy_breakdown(system, params, coords, com, box, kvecs, kweights)


def pressure(params, n_mol, volume, w):
    """P/kB = rho T + w/(3V)  (LRC folded into w by energy_breakdown).
    Reference: `Pressure` (`Ewald/auxillary.jl:116-123`)."""
    rho = n_mol / volume
    return rho * params.temperature + w / (3.0 * volume)
