"""NPT volume-change move with full-energy recompute.

The reference only sketches this inside docstrings
(`Ewald/volumeChange.jl:8-150`, `Poly/mainPoly.jl:960-1102` — dead
pseudocode); here it is implemented for real, as BASELINE config #4
requires.

Move: a symmetric random walk in ln V.  Molecular COMs scale by
s = (V'/V)^(1/3); rigid molecules translate with their COM (internal
geometry and orientation unchanged).  The total energy at the new volume
is recomputed from scratch (LJ + LRC + full Ewald/Wolf including the
box-dependent kappa, cfac, self and intra terms).  Acceptance:

  P_acc = min(1, exp(-beta (dU + P dV) + (M+1) ln(V'/V)))

(the +1 from sampling in ln V).  Chains are independent; the recompute
is vmapped in chunks to bound the O(A^2) memory.

Scheduling: volume attempts follow a DETERMINISTIC cycle — every chain
attempts one volume move every round(1/p_volume) sweeps (driver.sweep) —
rather than a per-chain Bernoulli(p_volume) each sweep.  The attempt rate
is 1/round(1/p_volume): exact when 1/p_volume is an integer, else the
nearest integer period (p_volume=0.4 gives 1/2, not 2/5 — pick p_volume
= 1/n for an exact rate).  The move mixture is a valid systematic cycle
(like the molecule scan itself: detailed balance holds within each
kernel), and the O(A^2) recompute is skipped entirely on the other
sweeps instead of being paid by every chain and discarded by 1-p_volume
of them.
"""

import jax
import jax.numpy as jnp

from metropolismontecarlo_tpu.models.energy import energy_breakdown
from metropolismontecarlo_tpu.ops.quaternions import rotate_vectors
from metropolismontecarlo_tpu.utils.chunking import chunked_vmap


def make_volume_move_fn(system, params, kvecs, kweights, dtype=jnp.float32,
                        chunk=8, build_coords=None, pressure=None):
    """Build `volume_move(state) -> state` over the full chain batch.

    build_coords: (com, quat) -> (3, A_pad) transposed padded atoms (the
    driver's ragged-aware builder); a uniform-width fallback is used when
    not given.

    pressure: overrides params.pressure; a (C,) array runs every chain
    at its own pressure (isotherm/EOS ladders — the batch counterpart of
    the per-chain temperature ladder, one compiled program sampling many
    state points)."""
    M, P, A = system.n_mol, system.atoms_per_mol, system.n_atoms
    body = jnp.asarray(system.body, dtype)
    pres = jnp.asarray(params.pressure if pressure is None else pressure,
                       dtype)

    def attempt_one(com, quat, box, energy, key, dv_max, step):  # noqa: ARG001
        """Propose scaled config for one chain; returns proposal pieces."""
        # all of this move's randomness (including the acceptance uniform)
        # comes from splits of a sentinel-tagged double fold of the chain
        # key: molecule moves draw from splits of fold_in(key, step), so
        # the extra fold with a fixed sentinel puts the volume stream on a
        # disjoint branch regardless of the step value (robust to the
        # int32 counter wrapping on multi-day runs); each scheduled
        # attempt (distinct step) still gets a fresh fold
        k_vol = jax.random.fold_in(jax.random.fold_in(key, step), 0x5DEECE6)
        k_lnv, k_acc = jax.random.split(k_vol)
        u = jax.random.uniform(k_lnv, dtype=dtype)
        u_acc = jax.random.uniform(k_acc, dtype=dtype)
        dlnv = (2.0 * u - 1.0) * dv_max
        vol_old = box**3
        vol_new = vol_old * jnp.exp(dlnv)
        box_new = vol_new ** (1.0 / 3.0)
        scale = box_new / box
        com_new = com * scale
        if build_coords is not None:
            coords_new = build_coords(com_new, quat)
        else:
            coords_new = (com_new[:, None, :] + rotate_vectors(quat, body)) \
                .reshape(A, 3).T  # (3, A) transposed layout
            pad = system.n_atoms_padded - A
            if pad:
                coords_new = jnp.pad(coords_new, ((0, 0), (0, pad)))
        return box_new, com_new, coords_new, vol_old, vol_new, u_acc

    def recompute(coords_t, com, box):
        out = energy_breakdown(system, params, coords_t[:, :A].T, com, box,
                               kvecs, kweights)
        return out["total"], out["w"], out["sfac"]

    def volume_move(state):
        C = state.com.shape[0]
        if pres.ndim == 1 and pres.shape[0] != C:
            raise ValueError(
                f"pressure ladder has {pres.shape[0]} entries but the "
                f"state carries {C} chains — one pressure per chain "
                "(or a scalar) is required")
        box_new, com_new, coords_new, vol_old, vol_new, u_acc = \
            jax.vmap(attempt_one, in_axes=(0, 0, 0, 0, 0, 0, None))(
                state.com, state.quat, state.box, state.energy, state.key,
                state.dv_max, state.step)

        e_new, w_new, sfac_new = chunked_vmap(
            recompute, chunk, coords_new, com_new, box_new)

        d_e = e_new - state.energy
        arg = -(d_e + pres * (vol_new - vol_old)) / state.temp \
            + (M + 1.0) * jnp.log(vol_new / vol_old)
        # hard minimum-image wall: boxes below 2*cutoff silently miss
        # second-image interactions (reference asserts this at startup,
        # `Ewald/main.jl:483-485`; under NPT it must hold for every
        # SAMPLED volume).  Rejecting the proposal preserves detailed
        # balance (hard-wall veto).  strict_min_image=False samples the
        # truncated-nearest-image model without the wall.
        legal = jnp.ones_like(arg, dtype=bool)
        if params.strict_min_image:
            max_cut = float(max(params.r_cut, params.qq_cut))
            legal = box_new >= 2.0 * max_cut - 1e-9   # counts as attempted
        accept = legal & (
            (arg > 0.0) | (u_acc < jnp.exp(jnp.minimum(arg, 0.0))))

        sel = lambda new, old: jnp.where(
            accept.reshape((C,) + (1,) * (new.ndim - 1)), new, old)
        state = state._replace(
            com=sel(com_new, state.com),
            coords=sel(coords_new, state.coords),
            box=jnp.where(accept, box_new, state.box),
            energy=jnp.where(accept, e_new, state.energy),
            virial=jnp.where(accept, w_new, state.virial),
            sfac=sel(sfac_new, state.sfac) if params.coulomb == "ewald"
            else state.sfac,
            # step is NOT advanced: it is a pure molecule-move counter, so
            # step // n_mol is always the exact sweep index (the driver's
            # deterministic volume-attempt schedule relies on this)
            att=state.att.at[:, 2].add(1),
            acc=state.acc.at[:, 2].add(accept.astype(jnp.int32)),
        )
        return state

    return volume_move
