"""Single-molecule MC move kernel: proposal, delta energy, Metropolis.

The TPU-native re-design of the reference's hot loop body
(`Ewald/main.jl:490-639`): instead of one molecule mutated in place with
early-exit energy loops, every chain advances one move per call with

  * branchless proposals: BOTH the translation and the rotation are formed
    and `where`-selected by the per-chain move-type draw,
  * ONE stacked (2P, A) masked pair grid evaluating the old and new
    positions together (distances computed once, shared by the cutoff
    mask, the LJ terms, the erfc terms, and the overlap veto),
  * the Ewald reciprocal delta via carried structure factors, O(P*K)
    (the reference's RecipMove trick, `Ewald/ewalds.jl:718-826`),
  * accept/reject as `jnp.where` selection — no copy-backs.

The virial is intentionally NOT accumulated per move: pressure is an
observable, sampled from the exact full recompute at block boundaries
(driver.run_block), which keeps ~40% of the per-move HBM traffic off the
hot path.

The same ops functions back the full-system recompute (models.energy), so
accumulated deltas and recomputed totals agree to roundoff (the drift
invariant, reference `Poly/main.jl:232-235`).
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc as _erfc

from metropolismontecarlo_tpu.ops import ewald as ewald_ops
from metropolismontecarlo_tpu.ops.pbc import min_image, wrap
from metropolismontecarlo_tpu.ops.quaternions import (
    random_rotate_quaternion,
    rotate_vectors,
)
from metropolismontecarlo_tpu.utils.constants import COULOMB_FACTOR


def make_move_fn(system, params, kvecs, kweights, dtype=jnp.float32):
    """Build `move(state_slice..., m, step) -> updates` for one chain.

    Returns a function over UNBATCHED per-chain state; the driver vmaps it
    over the chains axis.  Static tables (body frames, charges, pair
    epsilon/sigma/qq rows) are closed over as device constants.
    """
    M, P, A = system.n_mol, system.atoms_per_mol, system.n_atoms

    body = jnp.asarray(system.body, dtype)                      # (M,P,3)
    charges_mp = jnp.asarray(system.charges, dtype)             # (M,P)
    charges_flat = jnp.asarray(system.flat(system.charges), dtype)  # (A,)
    tid = system.flat(system.type_ids)
    eps_t = jnp.asarray(system.eps_table, dtype)
    sig_t = jnp.asarray(system.sig_table, dtype)
    # Pair-parameter strategy: for small systems precompute (A, A) rows and
    # dynamic-slice (P, A) per move; for large A that is O(A^2) memory, so
    # instead gather the (P, T) sub-table per move and expand via a one-hot
    # (T, A) matmul (tiny K -> MXU-cheap).
    big = system.n_atoms > 4096
    tid_j = jnp.asarray(tid)
    if big:
        n_types = system.eps_table.shape[0]
        type_onehot = jax.nn.one_hot(tid_j, n_types, dtype=dtype).T  # (T, A)
        tid_mp = jnp.asarray(system.type_ids)                        # (M, P)
    else:
        eps_rows = eps_t[tid[:, None], tid[None, :]]
        sig2_rows = (sig_t**2)[tid[:, None], tid[None, :]]

    mol_of_atom = jnp.repeat(jnp.arange(M), P)                  # (A,)
    kv = None if kvecs is None else jnp.asarray(kvecs)
    kw = None if kweights is None else jnp.asarray(kweights, dtype)

    site = params.cutoff_mode == "site"
    use_rot = P > 1 and params.p_translate < 1.0
    use_coul = params.coulomb != "none"
    factor = jnp.asarray(COULOMB_FACTOR, dtype)
    rc2 = jnp.asarray(params.r_cut**2, dtype)
    qrc2 = jnp.asarray(params.qq_cut**2, dtype)
    if params.lj_shift == "linear":
        from metropolismontecarlo_tpu.ops.lj import _shift_coeffs  # noqa: PLC0415

    def pair_energy_rows(ra2p, key_old, key_new, com, coords_t, m, box, kappa):
        """Stacked old/new pair energies.

        ra2p: (2P, 3) = [old atoms; new atoms]; coords_t: (3, A).  Returns
        (e_lj (2P,), e_coul (2P,), overlap ()) where row sums split as
        old = rows[:P], new = rows[P:].
        """
        dr = min_image(ra2p.T[:, :, None] - coords_t[:, None, :], box)
        d2 = jnp.maximum(jnp.sum(dr * dr, axis=0), jnp.asarray(1e-12, dtype))

        other = (mol_of_atom != m)[None, :]                     # (1, A)
        if site:
            mask_lj = other & (d2 < rc2)
            mask_qq = mask_lj if params.qq_r_cut is None else other & (d2 < qrc2)
        else:
            keys = com if params.cutoff_mode == "com" \
                else coords_t.reshape(3, M, P)[:, :, 0].T
            kpts = jnp.stack([key_old, key_new])                # (2, 3)
            d2m = jnp.sum(min_image(kpts[:, None, :] - keys[None], box) ** 2,
                          axis=-1)                              # (2, M)
            halves = jnp.repeat(jnp.arange(2), P)               # (2P,)
            inc = (d2m < rc2)[:, mol_of_atom]                   # (2, A)
            mask_lj = other & inc[halves]
            mask_qq = mask_lj if params.qq_r_cut is None \
                else other & ((d2m < qrc2)[:, mol_of_atom])[halves]

        d2s = jnp.where(mask_lj | mask_qq, d2, jnp.ones((), dtype))
        if big:
            tm = tid_mp[m]                                   # (P,) type ids
            eps_pa = eps_t[tm] @ type_onehot                 # (P,T)@(T,A)
            sig2_pa = (sig_t**2)[tm] @ type_onehot
        else:
            eps_pa = jax.lax.dynamic_slice(eps_rows, (m * P, 0), (P, A))
            sig2_pa = jax.lax.dynamic_slice(sig2_rows, (m * P, 0), (P, A))
        eps2 = jnp.concatenate([eps_pa, eps_pa], axis=0)
        sig2 = jnp.concatenate([sig2_pa, sig2_pa], axis=0)

        s2 = sig2 / d2s
        s6 = s2 * s2 * s2
        pot = 4.0 * eps2 * (s6 * s6 - s6)
        if params.lj_shift == "linear":
            sig_pa = jnp.sqrt(sig2)
            lam1, lam2 = _shift_coeffs(params.r_cut / sig_pa)
            pot = pot + eps2 * (lam1 + lam2 * jnp.sqrt(d2s) / sig_pa)
        e_lj = jnp.sum(jnp.where(mask_lj, pot, 0.0), axis=-1)

        e_coul = jnp.zeros((2 * P,), dtype)
        overlap = jnp.zeros((), bool)
        if use_coul:
            # charge products are separable: outer product, no table
            qq_pa = charges_mp[m][:, None] * charges_flat[None, :]
            qq2 = jnp.concatenate([qq_pa, qq_pa], axis=0)
            r = jnp.sqrt(d2s)
            if params.coulomb == "ewald":
                cpair = qq2 * _erfc(kappa * r) / r
            elif params.coulomb == "wolf":
                shift = _erfc(kappa * params.qq_cut) / params.qq_cut
                cpair = qq2 * (_erfc(kappa * r) / r - shift)
            elif params.coulomb == "bare":
                cpair = qq2 / r
            else:
                raise ValueError(params.coulomb)
            e_coul = factor * jnp.sum(jnp.where(mask_qq, cpair, 0.0), axis=-1)
            # hard-overlap veto on the NEW half only
            bad = (d2 < params.d2_overlap) & (qq2 < 0.0) & mask_qq
            overlap = jnp.any(bad[P:])
        return e_lj, e_coul, overlap

    def move(com, quat, coords, box, sfac, energy, virial, key, dr_max,
             dphi_max, temp, m, step):
        """One MC move of molecule m for one chain. Returns updated fields
        plus (is_trans, accept) for the counters."""
        kappa = jnp.asarray(params.kappa_L, dtype) / box
        kmove = jax.random.fold_in(key, step)
        k_sel, k_trans, k_rot, k_acc = jax.random.split(kmove, 4)

        com_m = com[m]
        quat_m = quat[m]
        body_m = body[m]
        ra_old = jax.lax.dynamic_slice(coords, (0, m * P), (3, P)).T  # (P, 3)

        if use_rot:
            is_trans = jax.random.uniform(k_sel, dtype=dtype) < params.p_translate
        else:
            is_trans = jnp.asarray(True)
        # reference convention: components uniform in (-dr_max/2, dr_max/2)
        # (`random_translate_vector`, `Ewald/auxillary.jl:94-103`)
        delta = (jax.random.uniform(k_trans, (3,), dtype=dtype) - 0.5) * dr_max
        com_new = wrap(com_m + jnp.where(is_trans, delta, 0.0), box)
        if use_rot:
            quat_rot = random_rotate_quaternion(k_rot, quat_m, dphi_max)
            quat_new = jnp.where(is_trans, quat_m, quat_rot)
            ra_new = com_new[None, :] + rotate_vectors(quat_new, body_m)
        else:
            quat_new = quat_m
            ra_new = com_new[None, :] + rotate_vectors(quat_m, body_m) if P > 1 \
                else com_new[None, :]

        key_old = ra_old[0] if params.cutoff_mode == "first" else com_m
        key_new = ra_new[0] if params.cutoff_mode == "first" else com_new

        ra2p = jnp.concatenate([ra_old, ra_new], axis=0)
        e_lj, e_coul, ovr = pair_energy_rows(
            ra2p, key_old, key_new, com, coords, m, box, kappa)
        d_e = (jnp.sum(e_lj[P:]) - jnp.sum(e_lj[:P])
               + jnp.sum(e_coul[P:]) - jnp.sum(e_coul[:P]))

        if params.coulomb == "ewald":
            q_m = charges_mp[m]
            dsfac = ewald_ops.delta_structure_factor(
                ra_old[None], ra_new[None], q_m[None], kv, box
            )[0]
            cf = ewald_ops.cfac_coeffs(kv, kw, kappa, box, dtype)
            d_recip = ewald_ops.recip_energy_delta(sfac, dsfac, cf)
            d_e = d_e + d_recip
        else:
            dsfac = jnp.zeros_like(sfac)

        # Metropolis (`Ewald/auxillary.jl:106-114`) with overlap veto
        beta_de = d_e / temp
        u = jax.random.uniform(k_acc, dtype=dtype)
        accept = ((beta_de < 0.0) | (u < jnp.exp(-beta_de))) & (~ovr)

        com = jax.lax.dynamic_update_slice(
            com, jnp.where(accept, com_new, com_m)[None, :], (m, 0))
        quat = jax.lax.dynamic_update_slice(
            quat, jnp.where(accept, quat_new, quat_m)[None, :], (m, 0))
        coords = jax.lax.dynamic_update_slice(
            coords, jnp.where(accept, ra_new, ra_old).T, (0, m * P))
        sfac = jnp.where(accept, sfac + dsfac, sfac)
        energy = jnp.where(accept, energy + d_e, energy)
        return com, quat, coords, sfac, energy, virial, is_trans, accept

    return move
