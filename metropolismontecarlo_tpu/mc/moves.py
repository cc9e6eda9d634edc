"""Single-molecule MC move kernel: proposal, delta energy, Metropolis.

The TPU-native re-design of the reference's hot loop body
(`Ewald/main.jl:490-639`): instead of one molecule mutated in place with
early-exit energy loops, every chain advances one move per call with

  * branchless proposals: BOTH the translation and the rotation are formed
    and `where`-selected by the per-chain move-type draw,
  * delta energies as dense (P, A) masked reductions over all atoms,
  * the Ewald reciprocal delta via carried structure factors, O(P*K)
    (the reference's RecipMove trick, `Ewald/ewalds.jl:718-826`),
  * accept/reject as `jnp.where` selection — no copy-backs.

The same ops functions back the full-system recompute (models.energy), so
accumulated deltas and recomputed totals agree to roundoff (the drift
invariant, reference `Poly/main.jl:232-235`).
"""

import jax
import jax.numpy as jnp

from metropolismontecarlo_tpu.ops import coulomb as coulomb_ops
from metropolismontecarlo_tpu.ops import ewald as ewald_ops
from metropolismontecarlo_tpu.ops import lj as lj_ops
from metropolismontecarlo_tpu.ops import wolf as wolf_ops
from metropolismontecarlo_tpu.ops.pairs import pair_dist2
from metropolismontecarlo_tpu.ops.pbc import min_image, wrap
from metropolismontecarlo_tpu.ops.quaternions import (
    random_rotate_quaternion,
    rotate_vectors,
)


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
    # (A, A) pair tables, rows sliced per move (P, A).  ~3*A^2*4 bytes.
    eps_rows = eps_t[tid[:, None], tid[None, :]]
    sig_rows = sig_t[tid[:, None], tid[None, :]]
    qq_rows = charges_flat[:, None] * charges_flat[None, :]

    mol_of_atom = jnp.repeat(jnp.arange(M), P)                  # (A,)
    kv = None if kvecs is None else jnp.asarray(kvecs)
    kw = None if kweights is None else jnp.asarray(kweights, dtype)

    site = params.cutoff_mode == "site"
    use_rot = P > 1 and params.p_translate < 1.0

    def pair_masks(ra, key_m, com, coords, m, box, r_cut):
        """Include-mask for moved atoms vs all atoms; (P, A) or (1, A)."""
        other = (mol_of_atom != m)[None, :]
        if site:
            d2 = jnp.sum(
                min_image(ra[:, None, :] - coords[None, :, :], box) ** 2, axis=-1
            )
            return other & (d2 < r_cut * r_cut)
        keys = com if params.cutoff_mode == "com" else None
        if keys is None:  # "first": key point is each molecule's first atom
            keys = coords.reshape(M, P, 3)[:, 0, :]
        d2m = jnp.sum(min_image(key_m[None, :] - keys, box) ** 2, axis=-1)
        return other & (d2m < r_cut * r_cut)[mol_of_atom][None, :]

    def half_energy(ra, key_m, com, coords, m, box, kappa):
        """Energy of molecule m's atoms `ra` against the rest of the system
        (LJ + real-space Coulomb), plus molecular virial and overlap flag."""
        d2, dr_ab = pair_dist2(ra, coords, box)
        eps_pa = jax.lax.dynamic_slice(eps_rows, (m * P, 0), (P, A))
        sig_pa = jax.lax.dynamic_slice(sig_rows, (m * P, 0), (P, A))
        mask_lj = pair_masks(ra, key_m, com, coords, m, box, params.r_cut)
        # molecular displacement for the virial: com_m vs each atom's molecule
        com_atoms = com[mol_of_atom]
        dr_ij = min_image(key_m[None, :] - com_atoms, box)[None, :, :]
        pot, w = lj_ops.lj_masked_sum(
            d2, dr_ab, dr_ij, mask_lj, eps_pa, sig_pa,
            params.r_cut, params.lj_shift, site_cutoff=False,
        )
        e_coul = jnp.zeros((), dtype)
        overlap = jnp.zeros((), bool)
        if params.coulomb != "none":
            qq_pa = jax.lax.dynamic_slice(qq_rows, (m * P, 0), (P, A))
            if params.qq_r_cut is None:
                mask_qq = mask_lj
            else:
                mask_qq = pair_masks(ra, key_m, com, coords, m, box, params.qq_cut)
            if params.coulomb == "ewald":
                e_coul = ewald_ops.real_space_sum(d2, qq_pa, mask_qq, kappa)
            elif params.coulomb == "wolf":
                e_coul = wolf_ops.wolf_pair_sum(d2, qq_pa, mask_qq, kappa,
                                                params.qq_cut)
            elif params.coulomb == "bare":
                e_coul = coulomb_ops.bare_pair_sum(d2, qq_pa, mask_qq)
            overlap = ewald_ops.overlap_any(d2, qq_pa, mask_qq, params.d2_overlap)
        return pot, w, e_coul, overlap

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
        ra_old = jax.lax.dynamic_slice(coords, (m * P, 0), (P, 3))

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

        pot_o, w_o, ec_o, _ = half_energy(ra_old, key_old, com, coords, m, box, kappa)
        pot_n, w_n, ec_n, ovr = half_energy(ra_new, key_new, com, coords, m, box, kappa)

        d_e = (pot_n - pot_o) + (ec_n - ec_o)
        d_w = w_n - w_o + (ec_n - ec_o)  # 1/r pair virial == pair energy

        if params.coulomb == "ewald":
            q_m = charges_mp[m]
            dsfac = ewald_ops.delta_structure_factor(
                ra_old[None], ra_new[None], q_m[None], kv, box
            )[0]
            cf = ewald_ops.cfac_coeffs(kv, kw, kappa, box, dtype)
            d_recip = ewald_ops.recip_energy_delta(sfac, dsfac, cf)
            d_e = d_e + d_recip
            d_w = d_w + d_recip
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
            coords, jnp.where(accept, ra_new, ra_old), (m * P, 0))
        sfac = jnp.where(accept, sfac + dsfac, sfac)
        energy = jnp.where(accept, energy + d_e, energy)
        virial = jnp.where(accept, virial + d_w, virial)
        return com, quat, coords, sfac, energy, virial, is_trans, accept

    return move
