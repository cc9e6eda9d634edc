"""Single-molecule MC move kernels: proposal, delta energy, Metropolis.

The TPU-native re-design of the reference's hot loop body
(`Ewald/main.jl:490-639`): instead of one molecule mutated in place with
early-exit energy loops, every chain advances one move per call with

  * branchless proposals: BOTH the translation and the rotation are formed
    and `where`-selected by the per-chain move-type draw,
  * ONE stacked (2P, A) masked pair grid evaluating the old and new
    positions together — either as fused jnp ops or as the Pallas TPU
    kernel (ops.pallas.delta_energy) operating on coordinate planes,
  * the Ewald reciprocal delta via carried structure factors, O(P*K)
    (the reference's RecipMove trick, `Ewald/ewalds.jl:718-826`),
  * accept/reject as `jnp.where` selection — no copy-backs.

The virial is intentionally NOT accumulated per move: pressure is an
observable, sampled from the exact full recompute at block boundaries
(driver.run_block).  The same ops functions back the full-system
recompute (models.energy), so accumulated deltas and recomputed totals
agree to roundoff (the drift invariant, reference `Poly/main.jl:232-235`).

Atom storage is the padded transposed layout (C, 3, A_pad); padding
columns carry molecule id -1 and are excluded by every mask.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import erfc as _erfc

from metropolismontecarlo_tpu.ops import ewald as ewald_ops
from metropolismontecarlo_tpu.ops.pbc import min_image, wrap
from metropolismontecarlo_tpu.ops.quaternions import (
    random_rotate_quaternion,
    rotate_vectors,
)
from metropolismontecarlo_tpu.utils.constants import COULOMB_FACTOR


def _round_up(x, m):
    return -(-x // m) * m



def _check_mega_envelope(C, A_plane, what):
    """Round-3 observed a hard TPU device fault at C=4096 chains on the
    750-water system (C*A_plane ~ 9.4e6) and guarded it with a hard
    refusal above 2048*2432.  The round-4 bisect
    (scripts/probe_mega_envelope.py) could NOT reproduce it: the exact
    config (4096 x 2304, auto cb=64) now runs at 4978 aggregate
    sweeps/s, as do grid-64, 10.5M-chain-lane and cb=32 variants — the
    fault was transient device/tunnel flakiness (the same environment
    produced multi-hour tunnel wedges and a FailedPrecondition crash
    this round).  The guard is therefore a WARNING now: if a run above
    the old envelope faults the chip, prefer fewer chains or
    MMC_MEGA_CB=32 (measured throughput-neutral at 4096 chains).
    MMC_MEGA_STRICT=1 restores the hard refusal."""
    if C * A_plane > 2048 * 2432:
        import warnings

        msg = (f"{what}: C={C} x A_plane={A_plane} chain-lanes exceeds "
               "the round-3 validated envelope (2048x2432). This regime "
               "re-validated clean in round 4 (4096x2304 runs at full "
               "throughput), but the round-3 device fault here was "
               "never reproduced or explained - if this run faults the "
               "TPU, reduce chains or set MMC_MEGA_CB=32.")
        if os.environ.get("MMC_MEGA_STRICT"):
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=3)

def _kernel_coulomb(params):
    """Static coulomb style for the Pallas kernels ('wolf_ref' selects
    the reference convention's unshifted erfc pair form)."""
    if params.coulomb == "wolf" and params.wolf_style != "pairwise":
        return "wolf_ref"
    return params.coulomb


def _coulomb_pair(qq2, r, kappa, params):
    """Per-pair Coulomb energies for the jnp move paths (style dispatch
    mirrors models.energy; the wolf 'reference' convention's global
    constant cancels in per-move deltas — ops.wolf)."""
    if params.coulomb == "ewald":
        return qq2 * _erfc(kappa * r) / r
    if params.coulomb == "wolf":
        if params.wolf_style == "pairwise":
            shift = _erfc(kappa * params.qq_cut) / params.qq_cut
            return qq2 * (_erfc(kappa * r) / r - shift)
        return qq2 * _erfc(kappa * r) / r
    if params.coulomb == "bare":
        return qq2 / r
    raise ValueError(params.coulomb)


# ---------------- sorted-slab windows (mega path) -----------------------
#
# TPU-native sparsity (the reference's neighbor-list TODO,
# `Ewald/readme.md:21`, re-designed for lane-oriented storage): every
# chain keeps the LAST (largest) species block z-SORTED, so a molecule's
# sorted SLOT determines its z-region in every chain and each move's
# pair scan against that block reads a static 128-aligned window of
# atom lanes.  Periodic wrap is handled by a halo of ghost columns at
# the end of the atom axis replicating the block's first W columns
# (window width W <= A_blk guarantees no real+ghost double count).
# Cross-block movers (also z-sorted) get slot-proportional windows.
# Coverage is verified per sort (searchsorted spans vs the static
# windows) into the nbr_needed counter, checked at block boundaries —
# the same staleness-guard pattern as the Verlet lists.


def slab_config(system, params, box_hint, z_hint=None):
    """Sorted-slab window configuration for the mega path, or None.

    box_hint: a representative box edge.  z_hint: optional (M,) host
    z-coordinates of a representative configuration — the window is
    sized to cover its MEASURED worst slab occupancy (+15%), not just
    the uniform-density estimate (lattice starts cluster molecules into
    discrete z-planes that blow a mean-density margin).  The per-sort
    coverage check still guards against later drift/fluctuations."""
    if params.slab_mode == "off" or os.environ.get("MMC_SLABS") == "0":
        return None
    if box_hint is None or params.p_volume > 0.0:
        return None     # NPT boxes change; window sizing needs a box
    force = params.slab_mode == "force" or os.environ.get("MMC_SLABS") == "1"
    slices = system.species_slices
    _, m0, m1, P_w, a0_w = slices[-1]
    M_w = m1 - m0
    A_blk = M_w * P_w
    A = system.n_atoms
    assert a0_w + A_blk == A, "windowed block must end the atom axis"
    if M_w < 2:
        return None
    bodies = np.asarray(system.body)
    r_body = [float(np.max(np.linalg.norm(bodies[b0:b1, :p], axis=-1)))
              for _, b0, b1, p, _ in slices]
    r_half = (max(params.r_cut, params.qq_cut) + r_body[-1]
              + max(r_body) + params.slab_skin)
    frac = 2.0 * r_half / float(box_hint)
    if frac >= 1.0:
        return None
    env_w = int(os.environ.get("MMC_SLAB_W", "0"))
    if env_w:
        W = _round_up(env_w, 128)
    else:
        # windows are slot-CENTERED, so sizing is driven by the worst
        # ONE-SIDED slab occupancy (an interface/lattice clump is
        # asymmetric around a molecule at its edge): W covers twice that
        # (+15% fluctuation margin, +2 molecules, +256 alignment slack)
        one_sided = frac * M_w / 2.0 * 1.12
        if z_hint is not None:
            # measure on the hint config, probed at EVERY molecule's z
            # (movers of other blocks scan this window too); the driver
            # can re-tune after equilibration (MonteCarlo.retune_slabs)
            L = float(box_hint)
            zq = np.asarray(z_hint, np.float64) % L
            zb = np.sort(zq[m0:m1])
            mid = np.searchsorted(zb, zq)
            lo = np.where(zq - r_half < 0,
                          np.searchsorted(zb, zq - r_half + L) - M_w,
                          np.searchsorted(zb, zq - r_half))
            hi = np.where(zq + r_half >= L,
                          np.searchsorted(zb, zq + r_half - L) + M_w,
                          np.searchsorted(zb, zq + r_half))
            one_sided = max(one_sided,
                            1.15 * float(np.max(np.maximum(mid - lo,
                                                           hi - mid))))
        W = _round_up(2 * int(np.ceil(one_sided + 2)) * P_w + 256, 128)
        W = min(W, _round_up(A_blk, 128) - 128 if A_blk % 128 else A_blk)
    if W > A_blk or (not force and W > 0.7 * A_blk):
        return None     # window would not pay for itself
    if params.dr_max > params.slab_skin:
        if force:
            raise ValueError(
                f"sorted slabs require dr_max <= slab_skin "
                f"({params.dr_max} > {params.slab_skin})")
        return None
    return dict(m0=m0, m1=m1, P=P_w, a0=a0_w, A_blk=A_blk, W=W,
                r_half=float(r_half), A=A,
                A_store=_round_up(A + W, 128))


def slab_window_starts(system, cfg):
    """(M,) int32: the static, 128-aligned global window base for every
    molecule's scan of the windowed block.  Same-block molecules center
    on their own sorted slot; other (also z-sorted) blocks map their
    slot proportionally.  Shared by the kernel (static per move) and the
    resort coverage check."""
    m0_w, P_w, a0_w = cfg["m0"], cfg["P"], cfg["a0"]
    M_w = cfg["m1"] - m0_w
    A_blk, W, A_store = cfg["A_blk"], cfg["W"], cfg["A_store"]
    out = np.zeros(system.n_mol, np.int32)
    for _, b0, b1, p, _ in system.species_slices:
        for m in range(b0, b1):
            if b0 == m0_w:
                c = (m - m0_w) * P_w
            else:
                c = int((m - b0 + 0.5) / (b1 - b0) * M_w) * P_w
            start_rel = (c + P_w // 2 - W // 2) % A_blk
            g = a0_w + start_rel
            out[m] = min((g // 128) * 128, A_store - W)
    return out


def make_slab_resort_fn(system, params, cfg):
    """Returns resort(state) -> state: per-chain z-sort of every species
    block (>= 2 molecules), plus the window-coverage check folded into
    state.nbr_needed (max columns any molecule's neighbors needed vs the
    static W; driver errors at block boundaries if it exceeds W)."""
    m0_w, m1_w, P_w, a0_w = cfg["m0"], cfg["m1"], cfg["P"], cfg["a0"]
    M_w = m1_w - m0_w
    A_blk, W, r_half = cfg["A_blk"], cfg["W"], cfg["r_half"]
    wstarts = jnp.asarray(slab_window_starts(system, cfg))   # (M,) global
    wstart_rel = wstarts - a0_w    # may be negative (alignment overhang)
    sortable = [(b0, b1, p, a0) for _, b0, b1, p, a0
                in system.species_slices if b1 - b0 >= 2]

    def resort(state):
        C = state.com.shape[0]
        box = state.box[:, None]                                # (C, 1)
        com, quat, coords = state.com, state.quat, state.coords
        z_s_w = None
        for b0, b1, p, a0 in sortable:
            z = com[:, b0:b1, 2]
            z = z - box * jnp.floor(z / box)                    # [0, box)
            perm = jnp.argsort(z, axis=1).astype(jnp.int32)     # (C, Mb)
            idx_m = b0 + perm
            com = com.at[:, b0:b1].set(
                jnp.take_along_axis(com, idx_m[:, :, None], axis=1))
            quat = quat.at[:, b0:b1].set(
                jnp.take_along_axis(quat, idx_m[:, :, None], axis=1))
            cols = (a0 + perm[:, :, None] * p
                    + jnp.arange(p, dtype=jnp.int32)[None, None, :]
                    ).reshape(C, 1, (b1 - b0) * p)
            blk = jnp.take_along_axis(
                coords, jnp.broadcast_to(cols, (C, 3, (b1 - b0) * p)),
                axis=2)
            coords = coords.at[:, :, a0:a0 + (b1 - b0) * p].set(blk)
            if b0 == m0_w:
                z_s_w = jnp.take_along_axis(z, perm, axis=1)    # sorted

        # coverage check: every molecule's z-neighborhood in the windowed
        # block must fit its static window (circular, in columns)
        z_all = com[:, :, 2]
        z_all = z_all - box * jnp.floor(z_all / box)
        lo_v = z_all - r_half
        wl = lo_v < 0.0
        vs = jax.vmap(jnp.searchsorted)
        lo = vs(z_s_w, jnp.where(wl, lo_v + box, lo_v)) \
            - jnp.where(wl, M_w, 0)
        hi_v = z_all + r_half
        wh = hi_v >= box
        hi = vs(z_s_w, jnp.where(wh, hi_v - box, hi_v)) \
            + jnp.where(wh, M_w, 0)
        offset = jnp.mod(lo * P_w - wstart_rel[None, :], A_blk)
        needed = offset + (hi - lo) * P_w                       # (C, M)
        needed = jnp.where(hi > lo, needed, 0)  # empty span: nothing owed
        needed = jnp.max(needed, axis=1).astype(jnp.int32)      # (C,)
        return state._replace(
            com=com, quat=quat, coords=coords,
            nbr_needed=jnp.maximum(state.nbr_needed, needed))

    return resort


def nlist_radius(system, params):
    """COM-based list radius: the site cutoff, plus the skin, plus twice
    the largest atom-to-COM distance (atoms of a molecule pair can be
    closer than their COMs by up to 2 r_body)."""
    r_body = float(np.max(np.linalg.norm(np.asarray(system.body), axis=-1)))
    return max(params.r_cut, params.qq_cut) + params.nlist_skin + 2.0 * r_body


def rebuild_nlist(com, box, params, r_list, chunk=8):
    """Molecule-level Verlet lists: for every molecule, the indices of the
    nlist_width nearest other molecules, kept only when within `r_list`
    (see nlist_radius; out-of-range and padding slots hold the molecule's
    OWN index, which every pair mask already excludes).

    com (C, M, 3), box (C,) -> (C, M, NB) int32.  Chunked over chains to
    bound the O(M^2) distance matrix.  Exact while no molecule pair
    approaches by more than nlist_skin between rebuilds (rebuilds happen
    every sweep; see RunParams.nlist_skin).
    """
    C, M, _ = com.shape
    nb = params.nlist_width
    self_idx = jnp.arange(M, dtype=jnp.int32)

    def one(com_c, box_c):
        dr = com_c[:, None, :] - com_c[None, :, :]
        dr = dr - box_c * jnp.round(dr / box_c)
        d2 = jnp.sum(dr * dr, axis=-1)
        d2 = d2 + jnp.eye(M, dtype=d2.dtype) * 1e12   # exclude self
        needed = jnp.max(jnp.sum(d2 < r_list * r_list, axis=1))
        neg, idx = jax.lax.top_k(-d2, nb)
        within = (-neg) < r_list * r_list
        lists = jnp.where(within, idx.astype(jnp.int32), self_idx[:, None])
        return lists, needed.astype(jnp.int32)

    from metropolismontecarlo_tpu.utils.chunking import chunked_vmap

    return chunked_vmap(one, chunk, com, box)


def make_sweep_fn(system, params, kvecs, kweights, dtype=jnp.float32,
                  pallas_mode=None, species=None):
    """Build `sweep_body(state, m) -> (state, None)` advancing every chain
    by one move of molecule m.

    species: a System.species_slices entry (name, m0, m1, p, a0) — the
    molecule range this body serves (m must lie in [m0, m1)); None means
    the whole system as one uniform-width block.  Ragged mixtures build
    one body per species block (each with its own static atom count p
    and atom offset a0) and scan them in sequence — no per-molecule
    padding work anywhere.

    pallas_mode: None (pure jnp), "tpu" (compiled Pallas kernel), or
    "interpret" (Pallas interpreter — CPU testing).
    """
    M = system.n_mol
    A = system.n_atoms
    A_pad = system.n_atoms_padded
    if species is None:
        if not system.uniform_width:
            raise ValueError("ragged systems need per-species sweep bodies")
        species = ("all", 0, M, system.atoms_per_mol, 0)
    _, m0, m1, P, a0 = species
    off0 = a0 - m0 * P          # atom base of molecule m is off0 + m*P

    body = jnp.asarray(np.asarray(system.body)[:, :P], dtype)   # (M,P,3)
    charges_mp = jnp.asarray(np.asarray(system.charges)[:, :P], dtype)
    charges_pad = np.zeros(A_pad)
    charges_pad[:A] = system.flat(system.charges)
    charges_flat = jnp.asarray(charges_pad, dtype)              # (A_pad,)
    mol_of_atom = jnp.asarray(system.mol_of_atom_padded)        # (A_pad,)
    first_atom_idx = jnp.asarray(system.mol_a0)                 # (M,)

    tid = system.flat(system.type_ids)
    # padded per-atom type ids with pads clamped to 0 (pads are excluded by
    # molecule-id masks before any parameter lookup matters)
    tid_safe = jnp.asarray(np.concatenate([tid, np.zeros(A_pad - A, tid.dtype)]))
    eps_t = jnp.asarray(system.eps_table, dtype)
    sig_t = jnp.asarray(system.sig_table, dtype)

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

    # ---------------- proposal / finalize (per chain, vmapped) ----------

    def propose_full(com, quat, coords, box, key, dr_max, dphi_max, m, step):
        # reference proposal conventions: translation components uniform in
        # (-dr_max/2, dr_max/2) (`random_translate_vector`,
        # `Ewald/auxillary.jl:94-103`); rotation by a random angle about a
        # random axis (`random_rotate_quaternion`).
        kmove = jax.random.fold_in(key, step)
        k_sel, k_trans, k_rot, k_acc = jax.random.split(kmove, 4)
        com_m = com[m]
        quat_m = quat[m]
        body_m = body[m]
        ra_old = jax.lax.dynamic_slice(coords, (0, off0 + m * P), (3, P)).T
        if use_rot:
            is_trans = jax.random.uniform(k_sel, dtype=dtype) < params.p_translate
        else:
            is_trans = jnp.asarray(True)
        delta = (jax.random.uniform(k_trans, (3,), dtype=dtype) - 0.5) * dr_max
        com_new = wrap(com_m + jnp.where(is_trans, delta, 0.0), box)
        if use_rot:
            quat_rot = random_rotate_quaternion(k_rot, quat_m, dphi_max)
            quat_new = jnp.where(is_trans, quat_m, quat_rot)
            ra_new = com_new[None, :] + rotate_vectors(quat_new, body_m)
        else:
            quat_new = quat_m
            ra_new = com_new[None, :] + rotate_vectors(quat_m, body_m) \
                if P > 1 else com_new[None, :]
        return dict(k_acc=k_acc, com_m=com_m, quat_m=quat_m, ra_old=ra_old,
                    is_trans=is_trans, com_new=com_new, quat_new=quat_new,
                    ra_new=ra_new)

    def finalize(com, quat, coords, box, sfac, energy, temp, pr, d_e, ovr, m):
        """Metropolis + where-select state update (per chain)."""
        if params.coulomb == "ewald":
            q_m = charges_mp[m]
            dsfac = ewald_ops.delta_structure_factor(
                pr["ra_old"][None], pr["ra_new"][None], q_m[None], kv, box
            )[0]
            kappa = jnp.asarray(params.kappa_L, dtype) / box
            cf = ewald_ops.cfac_coeffs(kv, kw, kappa, box, dtype)
            d_recip = ewald_ops.recip_energy_delta(sfac, dsfac, cf)
            d_e = d_e + d_recip
            if params.ewald_surface:
                # dipole/surface delta: E = c |M|^2, c = factor 2pi/(3V);
                # M recomputed from state (O(A), jnp path only) and the
                # moved molecule's dipole swapped old -> new
                com_all = com[jnp.clip(mol_of_atom, 0, M - 1)]  # (A_pad, 3)
                m_tot = ewald_ops.surface_dipole(
                    coords.T, com_all, charges_flat, box)
                mu_old = ewald_ops.surface_dipole(
                    pr["ra_old"], pr["com_m"][None, :], q_m, box)
                mu_new = ewald_ops.surface_dipole(
                    pr["ra_new"], pr["com_new"][None, :], q_m, box)
                m_new = m_tot - mu_old + mu_new
                c_surf = factor * 2.0 * jnp.pi / (3.0 * box**3)
                d_e = d_e + c_surf * (jnp.sum(m_new * m_new)
                                      - jnp.sum(m_tot * m_tot))
        else:
            dsfac = jnp.zeros_like(sfac)

        beta_de = d_e / temp
        u = jax.random.uniform(pr["k_acc"], dtype=dtype)
        accept = ((beta_de < 0.0) | (u < jnp.exp(-beta_de))) & (~ovr)

        com = jax.lax.dynamic_update_slice(
            com, jnp.where(accept, pr["com_new"], pr["com_m"])[None, :], (m, 0))
        quat = jax.lax.dynamic_update_slice(
            quat, jnp.where(accept, pr["quat_new"], pr["quat_m"])[None, :],
            (m, 0))
        coords = jax.lax.dynamic_update_slice(
            coords, jnp.where(accept, pr["ra_new"], pr["ra_old"]).T,
            (0, off0 + m * P))
        sfac = jnp.where(accept, sfac + dsfac, sfac)
        energy = jnp.where(accept, energy + d_e, energy)
        return com, quat, coords, sfac, energy, pr["is_trans"], accept

    # ---------------- jnp pair-energy path (per chain) ------------------

    def pair_energy_rows(ra2p, key_old, key_new, com, coords_t, m, box, kappa):
        """Stacked old/new pair energies: ra2p (2P, 3), coords_t (3, A_pad).
        Returns (d_e_pairs (), overlap ())."""
        dr = min_image(ra2p.T[:, :, None] - coords_t[:, None, :], box)
        d2 = jnp.maximum(jnp.sum(dr * dr, axis=0), jnp.asarray(1e-4, dtype))

        other = ((mol_of_atom != m) & (mol_of_atom >= 0))[None, :]
        if site:
            mask_lj = other & (d2 < rc2)
            mask_qq = mask_lj if params.qq_r_cut is None else other & (d2 < qrc2)
        else:
            keys = com if params.cutoff_mode == "com" \
                else coords_t[:, first_atom_idx].T
            kpts = jnp.stack([key_old, key_new])                # (2, 3)
            d2m = jnp.sum(min_image(kpts[:, None, :] - keys[None], box) ** 2,
                          axis=-1)                              # (2, M)
            halves = jnp.repeat(jnp.arange(2), P)               # (2P,)
            inc = (d2m < rc2)[:, mol_of_atom]                   # (2, A_pad)
            mask_lj = other & inc[halves]
            mask_qq = mask_lj if params.qq_r_cut is None \
                else other & ((d2m < qrc2)[:, mol_of_atom])[halves]

        d2s = jnp.where(mask_lj | mask_qq, d2, jnp.ones((), dtype))
        tm = tid_mp_all[m]                                      # (P,)
        eps_pa = eps_t[tm][:, tid_safe]                         # (P, A_pad)
        sig2_pa = (sig_t**2)[tm][:, tid_safe]
        eps2 = jnp.concatenate([eps_pa, eps_pa], axis=0)
        sig2 = jnp.concatenate([sig2_pa, sig2_pa], axis=0)

        s2 = sig2 / d2s
        s6 = s2 * s2 * s2
        pot = 4.0 * eps2 * (s6 * s6 - s6)
        if params.lj_shift == "linear":
            sig_pa = jnp.sqrt(sig2)
            lam1, lam2 = _shift_coeffs(params.r_cut / sig_pa)
            pot = pot + eps2 * (lam1 + lam2 * jnp.sqrt(d2s) / sig_pa)
        e_lj = jnp.sum(jnp.where(mask_lj, pot, 0.0), axis=-1)   # (2P,)

        d_e = jnp.sum(e_lj[P:]) - jnp.sum(e_lj[:P])
        overlap = jnp.zeros((), bool)
        if use_coul:
            qq_pa = charges_mp[m][:, None] * charges_flat[None, :]
            qq2 = jnp.concatenate([qq_pa, qq_pa], axis=0)
            r = jnp.sqrt(d2s)
            cpair = _coulomb_pair(qq2, r, kappa, params)
            e_coul = factor * jnp.sum(jnp.where(mask_qq, cpair, 0.0), axis=-1)
            d_e = d_e + jnp.sum(e_coul[P:]) - jnp.sum(e_coul[:P])
            bad = (d2 < params.d2_overlap) & (qq2 < 0.0) & mask_qq
            overlap = jnp.any(bad[P:])
        return d_e, overlap

    use_nlist = params.nlist_width > 0
    if use_nlist and not site:
        raise NotImplementedError("neighbor lists require site cutoff")
    tid_mp_all = jnp.asarray(np.asarray(system.type_ids)[:, :P])
    # ragged-aware neighbor gather tables: neighbor molecule j owns
    # mol_p[j] atoms starting at mol_a0[j]; gather width is the widest
    # species, with out-of-molecule slots masked (clamped to column 0)
    nl_p = system.atoms_per_mol
    mol_p_j = jnp.asarray(system.mol_p)
    mol_a0_j = jnp.asarray(system.mol_a0)

    def pair_energy_nlist(ra2p, nbr_row, coords_t, m, box, kappa):
        """Pair energies against gathered neighbor atoms only.
        ra2p (2P, 3); nbr_row (NB,) neighbor molecule indices (self-padded).
        """
        slots = jnp.arange(nl_p, dtype=nbr_row.dtype)
        valid = (slots[None, :] < mol_p_j[nbr_row][:, None]).reshape(-1)
        atom_idx = (mol_a0_j[nbr_row][:, None] + slots[None, :]).reshape(-1)
        atom_idx = jnp.where(valid, atom_idx, 0)       # clamped; masked out
        g = coords_t[:, atom_idx]                      # (3, NB*nl_p)
        mol_g = jnp.repeat(nbr_row, nl_p)              # (NB*nl_p,)
        dr = min_image(ra2p.T[:, :, None] - g[:, None, :], box)
        d2 = jnp.maximum(jnp.sum(dr * dr, axis=0), jnp.asarray(1e-4, dtype))
        other = ((mol_g != m) & valid)[None, :]
        mask_lj = other & (d2 < rc2)
        mask_qq = mask_lj if params.qq_r_cut is None else other & (d2 < qrc2)
        d2s = jnp.where(mask_lj | mask_qq, d2, jnp.ones((), dtype))

        tm = tid_mp_all[m]
        tid_g = tid_safe[atom_idx]
        eps_pa = jnp.take(eps_t[tm], tid_g, axis=1)    # (P, NB*P)
        sig2_pa = jnp.take((sig_t**2)[tm], tid_g, axis=1)
        eps2 = jnp.concatenate([eps_pa, eps_pa], axis=0)
        sig2 = jnp.concatenate([sig2_pa, sig2_pa], axis=0)
        s2 = sig2 / d2s
        s6 = s2 * s2 * s2
        pot = 4.0 * eps2 * (s6 * s6 - s6)
        if params.lj_shift == "linear":
            sig_g = jnp.sqrt(sig2)
            lam1, lam2 = _shift_coeffs(params.r_cut / sig_g)
            pot = pot + eps2 * (lam1 + lam2 * jnp.sqrt(d2s) / sig_g)
        e_lj = jnp.sum(jnp.where(mask_lj, pot, 0.0), axis=-1)
        d_e = jnp.sum(e_lj[P:]) - jnp.sum(e_lj[:P])
        overlap = jnp.zeros((), bool)
        if use_coul:
            q_g = charges_flat[atom_idx]
            qq_pa = charges_mp[m][:, None] * q_g[None, :]
            qq2 = jnp.concatenate([qq_pa, qq_pa], axis=0)
            r = jnp.sqrt(d2s)
            cpair = _coulomb_pair(qq2, r, kappa, params)
            e_coul = factor * jnp.sum(jnp.where(mask_qq, cpair, 0.0), axis=-1)
            d_e = d_e + jnp.sum(e_coul[P:]) - jnp.sum(e_coul[:P])
            bad = (d2 < params.d2_overlap) & (qq2 < 0.0) & mask_qq
            overlap = jnp.any(bad[P:])
        return d_e, overlap

    def move_jnp(com, quat, coords, box, sfac, energy, key, dr_max,
                 dphi_max, temp, nbr, m, step):
        kappa = jnp.asarray(params.kappa_L, dtype) / box
        pr = propose_full(com, quat, coords, box, key, dr_max, dphi_max,
                          m, step)
        key_old = pr["ra_old"][0] if params.cutoff_mode == "first" \
            else pr["com_m"]
        key_new = pr["ra_new"][0] if params.cutoff_mode == "first" \
            else pr["com_new"]
        ra2p = jnp.concatenate([pr["ra_old"], pr["ra_new"]], axis=0)
        if use_nlist:
            d_e, ovr = pair_energy_nlist(ra2p, nbr[m], coords, m, box, kappa)
        else:
            d_e, ovr = pair_energy_rows(ra2p, key_old, key_new, com, coords,
                                        m, box, kappa)
        return finalize(com, quat, coords, box, sfac, energy, temp, pr,
                        d_e, ovr, m)

    # ---------------- sweep bodies --------------------------------------

    def _update_counters(state, is_trans, accept):
        it = is_trans.astype(jnp.int32)
        ac = accept.astype(jnp.int32)
        att = state.att.at[:, 0].add(it).at[:, 1].add(1 - it)
        acc = state.acc.at[:, 0].add(it * ac).at[:, 1].add((1 - it) * ac)
        return att, acc

    if pallas_mode is None:
        vmove = jax.vmap(
            move_jnp,
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
        )

        def sweep_body(state, m):
            com, quat, coords, sfac, energy, is_trans, accept = vmove(
                state.com, state.quat, state.coords, state.box, state.sfac,
                state.energy, state.key, state.dr_max, state.dphi_max,
                state.temp, state.nbr, m, state.step)
            att, acc = _update_counters(state, is_trans, accept)
            return state._replace(
                com=com, quat=quat, coords=coords, sfac=sfac, energy=energy,
                step=state.step + 1, att=att, acc=acc), None

        return sweep_body

    # ---------------- Pallas path ----------------------------------------

    if not site or params.lj_shift != "none":
        raise NotImplementedError(
            "Pallas path supports site cutoff with unshifted LJ; "
            "use pallas_mode=None for other conventions")
    from metropolismontecarlo_tpu.ops.pallas.delta_energy import (
        delta_energy_pallas,
    )

    n_rows = _round_up(2 * P, 8)
    n_types = system.eps_table.shape[0]
    t_pad = _round_up(n_types, 8)

    # static per-row work flags: when every molecule OF THIS SPECIES has
    # the same type pattern (always true for species built from one
    # template), rows whose site has no LJ (or no charge) skip that work
    # at trace time (e.g. water H sites carry charge but no LJ)
    tids_np = np.asarray(system.type_ids)[:, :P]
    qs_np = np.asarray(system.charges)[:, :P]
    uniform = bool((tids_np[m0:m1] == tids_np[m0]).all()
                   and (qs_np[m0:m1] == qs_np[m0]).all())
    if uniform:
        eps_np = np.asarray(system.eps_table)
        has_lj_p = [bool(np.any(eps_np[tids_np[m0, p]] != 0.0))
                    for p in range(P)]
        has_q_p = [bool(qs_np[m0, p] != 0.0) for p in range(P)]
    else:
        has_lj_p = [True] * P
        has_q_p = [True] * P
    row_has_lj = tuple(has_lj_p + has_lj_p + [False] * (n_rows - 2 * P))
    row_has_q = tuple(has_q_p + has_q_p + [False] * (n_rows - 2 * P))

    tid_row_np = np.zeros(A_pad, np.float32)
    tid_row_np[:A] = tid.astype(np.float32)
    tid_row_np[A:] = -1.0
    molid_row_np = system.mol_of_atom_padded.astype(np.float32)
    q_row_np = charges_pad.astype(np.float32)

    tid_row_j = jnp.asarray(tid_row_np)
    molid_row_j = jnp.asarray(molid_row_np)
    q_row_j = jnp.asarray(q_row_np)

    # per-molecule (R, T_pad) LJ parameter rows and (R,) charges for THIS
    # species block only (rows indexed by m - m0), gathered per move
    M_blk = m1 - m0
    eps_rows_mol = np.zeros((M_blk, n_rows, t_pad), np.float32)
    sig2_rows_mol = np.zeros((M_blk, n_rows, t_pad), np.float32)
    q8_mol = np.zeros((M_blk, n_rows), np.float32)
    et = np.asarray(system.eps_table, np.float32)
    st2 = np.asarray(system.sig_table, np.float32) ** 2
    for mi in range(m0, m1):
        tm = tids_np[mi]
        for p in range(P):
            eps_rows_mol[mi - m0, p, :n_types] = et[tm[p]]
            eps_rows_mol[mi - m0, P + p, :n_types] = et[tm[p]]
            sig2_rows_mol[mi - m0, p, :n_types] = st2[tm[p]]
            sig2_rows_mol[mi - m0, P + p, :n_types] = st2[tm[p]]
        q8_mol[mi - m0, :P] = qs_np[mi]
        q8_mol[mi - m0, P:2 * P] = qs_np[mi]
    eps_rows_mol = jnp.asarray(eps_rows_mol)
    sig2_rows_mol = jnp.asarray(sig2_rows_mol)
    q8_mol = jnp.asarray(q8_mol)

    vprop = jax.vmap(propose_full,
                     in_axes=(0, 0, 0, 0, 0, 0, 0, None, None))
    vfin = jax.vmap(finalize,
                    in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None))

    def sweep_body(state, m):
        C = state.com.shape[0]
        pr = vprop(state.com, state.quat, state.coords, state.box,
                   state.key, state.dr_max, state.dphi_max, m, state.step)
        # pack moved rows [P old; P new; pad] as coordinate planes (C, R)
        ra = jnp.concatenate([pr["ra_old"], pr["ra_new"]], axis=1)  # (C,2P,3)
        pad = n_rows - 2 * P
        if pad:
            # park padding rows far outside the cutoff of everything by
            # reusing the first old atom (its energies cancel old vs new
            # anyway, but they'd double-count rows; give them zero charge
            # and pad LJ type instead: they use rows >= 2P of eps/q tables,
            # which are zero)
            ra = jnp.concatenate(
                [ra, jnp.broadcast_to(ra[:, :1, :], (C, pad, 3))], axis=1)
        mx, my, mz = ra[..., 0], ra[..., 1], ra[..., 2]

        e_lj, e_coul, ovr_cnt = delta_energy_pallas(
            state.coords[:, 0, :], state.coords[:, 1, :],
            state.coords[:, 2, :],
            mx.astype(jnp.float32), my.astype(jnp.float32),
            mz.astype(jnp.float32),
            state.box, m,
            eps_rows_mol[m - m0], sig2_rows_mol[m - m0], q8_mol[m - m0],
            tid_row_j, molid_row_j, q_row_j,
            coulomb=_kernel_coulomb(params), n_types=n_types,
            n_used=2 * P, row_has_lj=row_has_lj, row_has_q=row_has_q,
            cb=int(os.environ.get("MMC_PALLAS_CB", "256")),
            l_tile=int(os.environ.get("MMC_PALLAS_L", "1024")),
            d2_overlap=float(params.d2_overlap),
            kappa_l=float(params.kappa_L),
            rc2=float(params.r_cut**2), qrc2=float(params.qq_cut**2),
            wolf_rc=float(params.qq_cut),
            interpret=(pallas_mode == "interpret"),
        )
        new_sl = slice(P, 2 * P)
        old_sl = slice(0, P)
        d_e = (jnp.sum(e_lj[:, new_sl], -1) - jnp.sum(e_lj[:, old_sl], -1))
        if use_coul:
            d_e = d_e + factor * (jnp.sum(e_coul[:, new_sl], -1)
                                  - jnp.sum(e_coul[:, old_sl], -1))
        ovr = jnp.sum(ovr_cnt[:, new_sl], -1) > 0.0
        d_e = d_e.astype(dtype)

        com, quat, coords, sfac, energy, is_trans, accept = vfin(
            state.com, state.quat, state.coords, state.box, state.sfac,
            state.energy, state.temp, pr, d_e, ovr, m)
        att, acc = _update_counters(state, is_trans, accept)
        return state._replace(
            com=com, quat=quat, coords=coords, sfac=sfac, energy=energy,
            step=state.step + 1, att=att, acc=acc), None

    return sweep_body


def make_mega_sweep_fn(system, params, kvecs, kweights, interpret=False,
                       box_hint=None, z_hint=None, with_activity=False,
                       n_exch=0, tmmc_exch=False, n_widom=0):
    """Whole-sweep Pallas path: returns `sweep_full(state) -> state`.

    with_activity=True returns instead the fluctuating-N variant
    `sweep_act(com, quat, coords, active, box, sfac, chain_keys, seed)
    -> (com, quat, coords, sfac, d_e, acc, att)` operating on the
    molecular-GCMC state layout (mc/gcmc_mol.MolGCMCState fields,
    batched over chains): inactive slots neither move nor contribute to
    any pair energy, so one call is a valid fixed-N displacement/
    rotation sweep between exchange steps.  Requires the dense path
    (no sorted-slab windows) and a uniform system.

    Requires a species-uniform system (one body/charge/type template per
    species block — System.species_uniform), site cutoff, none/linear LJ
    shift, f32.  Ragged mixtures run ONE kernel call per species block:
    each call sweeps that block's molecules (static atom count P and
    offsets) over the FULL atom planes, threading coordinate/structure-
    factor planes from call to call, so a sweep is exactly one move per
    molecule in storage order — the same schedule as the jnp and
    per-move-Pallas paths.  See ops.pallas.sweep_kernel.

    NOTE the signature switch: when n_exch and n_widom are 0 (ints or
    ALL-ZERO sequences) the returned callable is the 8-argument
    sweep_act, not the 11-argument sweep_x — callers passing computed
    per-species counts must branch on `any(counts)` exactly as the
    ensemble builders do (mc/gcmc_mol.py mega="full").

    box_hint (a representative box edge) enables the sorted-slab window
    path when profitable (see slab_config): each sweep starts with a
    per-chain z-resort, the planes grow a ghost halo, and the kernels
    scan a static window of the big block instead of all lanes.
    """
    from metropolismontecarlo_tpu.ops.pallas.sweep_kernel import sweep_pallas

    M, A = system.n_mol, system.n_atoms
    A_pad = system.n_atoms_padded
    tids_np = np.asarray(system.type_ids)
    qs_np = np.asarray(system.charges)
    bodies_np = np.asarray(system.body)
    if not system.species_uniform or params.cutoff_mode != "site" \
            or params.lj_shift not in ("none", "linear"):
        raise ValueError("mega sweep requires a species-uniform system "
                         "and site cutoff")

    cfg = slab_config(system, params, box_hint, z_hint)
    if with_activity:
        if cfg is not None:
            raise ValueError("activity-masked mega sweeps do not support "
                             "the sorted-slab window path")
    nb_sp = len(system.species_slices)
    n_exchs = (n_exch,) * nb_sp if isinstance(n_exch, int) \
        else tuple(n_exch)
    n_widoms = (n_widom,) * nb_sp if isinstance(n_widom, int) \
        else tuple(n_widom)
    if any(n_exchs) or any(n_widoms):
        if not with_activity:
            raise ValueError("in-kernel exchanges/Widom require "
                             "with_activity")
        if len(n_exchs) != nb_sp or len(n_widoms) != nb_sp:
            raise ValueError("n_exch/n_widom must be an int or one count "
                             "per species block")
        if tmmc_exch and nb_sp != 1:
            raise ValueError("in-kernel TMMC deposits support a single "
                             "species block")
        if nb_sp > 1:
            # the in-kernel exchange constant tracks only the OWN
            # block's count; a charged species' reference-Wolf global
            # term couples the two counts (gcmc_binary.exchange_const)
            qs_tot = [float(np.sum(qs_np[m0])) for _, m0, _, _, _
                      in system.species_slices]
            if params.coulomb == "wolf" and any(abs(q) > 1e-5
                                                for q in qs_tot):
                raise ValueError("multi-block in-kernel exchanges need "
                                 "charge-neutral species under wolf")
    if cfg is not None:
        A_plane = cfg["A_store"]
        a0w, Wc = cfg["a0"], cfg["W"]
        resort = make_slab_resort_fn(system, params, cfg)
        wstarts_np = slab_window_starts(system, cfg)
    else:
        A_plane = A_pad
        resort = None
        wstarts_np = np.zeros(M, np.int32)
    wstarts_j = jnp.asarray(wstarts_np)

    n_types = system.eps_table.shape[0]
    t_pad = _round_up(n_types, 8)
    et = np.asarray(system.eps_table, np.float32)
    st = np.asarray(system.sig_table, np.float32)
    st2 = st**2
    use_coul = params.coulomb != "none"

    def block_tables(m0, P):
        """Per-species constant tables from the block's template
        (molecule m0): body row, per-site charges, per-site LJ rows."""
        p_pad = _round_up(max(3 * P, P), 32)
        body_row = np.zeros((1, p_pad), np.float32)
        body_row[0, : 3 * P] = bodies_np[m0, :P].reshape(-1)
        qp_row = np.zeros((1, p_pad), np.float32)
        qp_row[0, :P] = qs_np[m0, :P]
        eps_pt = np.zeros((max(P, 8), t_pad), np.float32)
        sig2_pt = np.zeros((max(P, 8), t_pad), np.float32)
        lam1_pt = np.zeros((max(P, 8), t_pad), np.float32)
        lam2_pt = np.zeros((max(P, 8), t_pad), np.float32)
        for p in range(P):
            eps_pt[p, :n_types] = et[tids_np[m0, p]]
            sig2_pt[p, :n_types] = st2[tids_np[m0, p]]
            if params.lj_shift == "linear":
                from metropolismontecarlo_tpu.ops.lj import _shift_coeffs
                srow = st[tids_np[m0, p]]
                l1, l2 = _shift_coeffs(params.r_cut / srow)
                # pre-scale: in-kernel shift is eps*(lam1 + lam2 * r)
                lam1_pt[p, :n_types] = et[tids_np[m0, p]] * l1
                lam2_pt[p, :n_types] = et[tids_np[m0, p]] * l2 / srow
        has_lj = tuple(bool(np.any(et[tids_np[m0, p]] != 0.0))
                       for p in range(P))
        has_q = tuple(bool(qs_np[m0, p] != 0.0) for p in range(P))
        return (body_row, qp_row, eps_pt, sig2_pt, lam1_pt, lam2_pt,
                has_lj, has_q)

    tid_row = np.full(A_plane, -1.0, np.float32)
    tid_row[:A] = system.flat(system.type_ids)
    molid_row = np.full(A_plane, -1.0, np.float32)
    molid_row[:A] = system.atom_mol_slot[0]
    q_row = np.zeros(A_plane, np.float32)
    q_row[:A] = system.flat(system.charges)
    if cfg is not None:
        # ghost halo replicates the windowed block's head columns (the
        # replicated TEMPLATE values are permutation-invariant; ghost
        # mol ids stay -1 — slab masks are column-range based)
        tid_row[A:A + Wc] = tid_row[a0w:a0w + Wc]
        q_row[A:A + Wc] = q_row[a0w:a0w + Wc]
    shared_rows = (jnp.asarray(tid_row), jnp.asarray(molid_row),
                   jnp.asarray(q_row))

    if kvecs is not None:
        kx = jnp.asarray(kvecs[:, 0], jnp.float32)
        ky = jnp.asarray(kvecs[:, 1], jnp.float32)
        kz = jnp.asarray(kvecs[:, 2], jnp.float32)
        kw_r = jnp.asarray(kweights, jnp.float32)
    else:
        kx = ky = kz = kw_r = jnp.zeros((1,), jnp.float32)

    m_pad = _round_up(M, 128)
    K = len(kweights) if kvecs is not None else 1
    P_max = max(sl[3] for sl in system.species_slices)
    # Auto chain-block size: the kernel's VMEM working set must fit the
    # ~16 MiB scoped limit.  Per chain: in+out atom/COM-quat/sfac planes
    # + cfac scratch; shared: tid/mol/q rows, k rows, per-row LJ scratch.
    np_pad = _round_up(M + 1, 128) if tmmc_exch else 0
    per_chain = 4 * (2 * 3 * A_plane + 2 * 7 * m_pad + (2 * 2 + 1) * K + 40
                     + (A_plane if with_activity else 0)
                     + ((2 * m_pad + A_plane + 3 + 6 * np_pad + 1)
                        if any(n_exchs) or any(n_widoms) else 0)
                     + (128 if any(n_widoms) else 0))
    lam_w = A_plane if params.lj_shift == "linear" else 128
    shared = 4 * (3 * A_plane + 4 * K
                  + max(P_max, 8) * (2 * A_plane + 2 * lam_w))
    budget = 12 * 1024 * 1024 - shared
    cb_fit = max(1, budget // per_chain)
    # cap 128: measured +31% on 256-atom LJ (amortized per-cell fixed
    # cost); 256 wedges Mosaic even when the model says it fits
    cb = int(os.environ.get("MMC_MEGA_CB", "0")) \
        or next(b for b in (128, 64, 32, 16, 8, 4, 2, 1) if b <= cb_fit)
    blocks = []
    for _, m0, m1, P, a0 in system.species_slices:
        (body_row, qp_row, eps_pt, sig2_pt, lam1_pt, lam2_pt,
         has_lj, has_q) = block_tables(m0, P)
        if cfg is None:
            slab_b = None
        else:
            dense_segs = tuple(
                (s_a0, (s_m1 - s_m0) * s_p, s_m0 == m0)
                for _, s_m0, s_m1, s_p, s_a0 in system.species_slices[:-1])
            slab_b = (cfg["a0"], cfg["A_blk"], cfg["W"],
                      m0 == cfg["m0"], dense_segs)
        statics = dict(
            M=m1 - m0, P=P, coulomb=_kernel_coulomb(params), n_types=n_types,
            has_lj=has_lj, has_q=has_q, rc2=float(params.r_cut**2),
            qrc2=float(params.qq_cut**2), kappa_l=float(params.kappa_L),
            d2_overlap=float(params.d2_overlap),
            p_translate=float(params.p_translate),
            use_rot=(P > 1 and params.p_translate < 1.0),
            lj_shift=params.lj_shift, cb=cb, interpret=interpret,
            m_start=m0, a_start=a0, slab=slab_b, use_act=with_activity,
        )
        consts = (jnp.asarray(body_row), jnp.asarray(qp_row),
                  jnp.asarray(eps_pt), jnp.asarray(sig2_pt),
                  jnp.asarray(lam1_pt), jnp.asarray(lam2_pt),
                  *shared_rows, kx, ky, kz, kw_r)
        blocks.append((statics, consts))

    def sweep_full(state):
        if resort is not None:
            # per-chain z-sort (energy-invariant relabeling of identical
            # molecules) + window-coverage check into nbr_needed
            state = resort(state)
        C = state.com.shape[0]
        # Empirical safety envelope: C=4096 chains on the 750-water system
        # (C*A_plane ~ 9.4e6) hard-faults the TPU ("TPU device error" on
        # the first sweep) and wedges the device tunnel for minutes, while
        # every validated config (2048x2304 water, 4096x256 LJ) sits under
        # ~4.8e6 chain-lanes.  The per-launch VMEM model says both fit, so
        # until the root cause is known, refuse the unvalidated regime
        # with a clear error instead of faulting the chip mid-run.
        if not interpret:
            _check_mega_envelope(C, A_plane, "mega sweep")
        f32 = jnp.float32
        stats = jnp.zeros((C, 8), f32)
        chain_keys = state.key[:, 0].astype(jnp.int32)

        def mplane(arr):  # (C, M) -> (C, M_pad) for aligned window access
            return jnp.pad(arr.astype(f32), ((0, 0), (0, m_pad - M)))

        def aplane(k):    # (C, A_pad) -> (C, A_plane) + ghost-halo fill
            p = state.coords[:, k, :].astype(f32)
            if cfg is not None:
                p = jnp.pad(p, ((0, 0), (0, A_plane - A_pad)))
                p = p.at[:, A:A + Wc].set(p[:, a0w:a0w + Wc])
            return p

        planes = (
            aplane(0), aplane(1), aplane(2),
            mplane(state.com[:, :, 0]), mplane(state.com[:, :, 1]),
            mplane(state.com[:, :, 2]),
            mplane(state.quat[:, :, 0]), mplane(state.quat[:, :, 1]),
            mplane(state.quat[:, :, 2]), mplane(state.quat[:, :, 3]),
            state.sfac[:, :, 0].astype(f32), state.sfac[:, :, 1].astype(f32),
        )
        box_t = (state.box.reshape(C, 1).astype(f32),
                 state.temp.reshape(C, 1).astype(f32),
                 state.dr_max.reshape(C, 1).astype(f32),
                 state.dphi_max.reshape(C, 1).astype(f32))
        act_dummy = jnp.zeros((C, 128), jnp.float32)
        moves_done = 0
        for statics, consts in blocks:
            # per-block seed = the global move counter at block start, so
            # RNG streams stay disjoint across blocks and sweeps
            seed = (state.step + moves_done).astype(jnp.int32)
            out = sweep_pallas(*planes, act_dummy, *box_t, stats, seed,
                               chain_keys, wstarts_j, *consts, **statics)
            planes, stats = out[:12], out[12]
            moves_done += statics["M"]
        x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim = planes
        if cfg is not None:   # drop the ghost halo
            x, y, z = x[:, :A_pad], y[:, :A_pad], z[:, :A_pad]
            if A < A_pad:
                # the halo overlaps the lane padding [A, A_pad); re-zero
                # it to preserve the zero-filled-pad invariant (the halo
                # is rebuilt from coords at every sweep entry, aplane())
                pad0 = (jnp.arange(A_pad) < A).astype(f32)[None, :]
                x, y, z = x * pad0, y * pad0, z * pad0
        cx, cy, cz = cx[:, :M], cy[:, :M], cz[:, :M]
        qw, qx, qy, qz = qw[:, :M], qx[:, :M], qy[:, :M], qz[:, :M]
        dtype = state.com.dtype
        acc_d = jnp.stack([stats[:, 1], stats[:, 2],
                           jnp.zeros_like(stats[:, 1])], 1).astype(jnp.int32)
        att_d = jnp.stack([stats[:, 3], stats[:, 4],
                           jnp.zeros_like(stats[:, 3])], 1).astype(jnp.int32)
        return state._replace(
            coords=jnp.stack([x, y, z], axis=1).astype(dtype),
            com=jnp.stack([cx, cy, cz], axis=-1).astype(dtype),
            quat=jnp.stack([qw, qx, qy, qz], axis=-1).astype(dtype),
            sfac=jnp.stack([sre, sim], axis=-1).astype(dtype)
            if use_coul and params.coulomb == "ewald" else state.sfac,
            energy=state.energy + stats[:, 0].astype(dtype),
            step=state.step + M,
            acc=state.acc + acc_d,
            att=state.att + att_d,
        )

    if with_activity:
        def sweep_act(com, quat, coords, active, box, sfac, chain_keys,
                      seed):
            """One activity-masked displacement/rotation sweep on the
            molecular-GCMC state layout: com (C, M, 3), quat (C, M, 4),
            coords (C, 3, A_pad) transposed planes, active (C, M) bool,
            box (C,), sfac (C, K, 2), chain_keys (C,) int32, seed ()
            int32 (a monotone counter — PRNG stream selector).
            Species-blocked systems (binary ensembles) run one kernel
            call per block, exactly like sweep_full.
            Returns (com, quat, coords, sfac, d_e, acc, att) in f32:
            d_e (C,) the summed accepted pair+recip energy delta, acc/
            att (C, 2) accepted/attempted [translate, rotate] counts
            (attempts count ACTIVE slots only)."""
            C = com.shape[0]
            if not interpret:
                _check_mega_envelope(C, A_plane, "mega sweep")
            f32 = jnp.float32
            segs = [jnp.repeat(active[:, m0:m1].astype(f32), p, axis=1)
                    for _, m0, m1, p, _ in system.species_slices]
            act_a = segs[0] if len(segs) == 1 \
                else jnp.concatenate(segs, axis=1)           # (C, A)
            act_a = jnp.pad(act_a, ((0, 0), (0, A_plane - A)))

            def mplane(arr):
                return jnp.pad(arr.astype(f32), ((0, 0), (0, m_pad - M)))

            planes = (
                coords[:, 0, :].astype(f32), coords[:, 1, :].astype(f32),
                coords[:, 2, :].astype(f32),
                mplane(com[:, :, 0]), mplane(com[:, :, 1]),
                mplane(com[:, :, 2]),
                mplane(quat[:, :, 0]), mplane(quat[:, :, 1]),
                mplane(quat[:, :, 2]), mplane(quat[:, :, 3]),
                sfac[:, :, 0].astype(f32), sfac[:, :, 1].astype(f32),
            )
            ones = jnp.ones((C, 1), f32)
            box_t = (box.reshape(C, 1).astype(f32),
                     float(params.temperature) * ones,
                     float(params.dr_max) * ones,
                     float(params.dphi_max) * ones)
            stats = jnp.zeros((C, 8), f32)
            seed = jnp.asarray(seed, jnp.int32)
            moves_done = 0
            for statics, consts in blocks:
                out = sweep_pallas(*planes, act_a, *box_t, stats,
                                   seed + moves_done,
                                   chain_keys.astype(jnp.int32),
                                   wstarts_j, *consts, **statics)
                planes, stats = out[:12], out[12]
                moves_done += statics["M"]
            x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim = planes
            com_o = jnp.stack([cx[:, :M], cy[:, :M], cz[:, :M]], axis=-1)
            quat_o = jnp.stack([qw[:, :M], qx[:, :M], qy[:, :M],
                                qz[:, :M]], axis=-1)
            coords_o = jnp.stack([x, y, z], axis=1)
            sfac_o = jnp.stack([sre, sim], axis=-1)
            return (com_o, quat_o, coords_o, sfac_o, stats[:, 0],
                    stats[:, 1:3], stats[:, 3:5])

        if not any(n_exchs) and not any(n_widoms):
            return sweep_act

        def sweep_x(com, quat, coords, active, box, sfac, chain_keys,
                    seed, zact, si, wc, energy=None, eta=None,
                    lrc_cross=None):
            """One kernel call per species block = [block-M-move
            activity-masked sweep + n_exchs[b] in-kernel muVT exchange
            attempts of that species] on the molecular-GCMC state
            layout (see sweep_act for the displacement part and
            ops.pallas.sweep_kernel._make_kernel for the exchange
            algorithm).  zact/si/wc: per-chain (C,) activity,
            self+intra exchange constant (ev.self_intra(box)) and
            reference-Wolf coefficient (ev.wolf_const_coeff(box) *
            q_t_tot^2) — plain arrays for a single-species system, one
            per species block (tuple/list) otherwise.  With tmmc_exch
            (single block only), energy (C,) carried energy and eta
            (cap+1,) bias are required, and the return grows the
            per-call collection matrix and energy moments, each
            (C, cap+1, 3).
            Returns (com, quat, coords, active, sfac, d_e, acc, att
            [, cmat, uhist][, wid]): active the updated (C, M) bool
            mask, acc/att (C, 2 + 2*n_blocks) f32 counters [translate,
            rotate, then per block insert, delete].  With any
            n_widom, wid (C, n_blocks, 2) appends each block's
            [sum w, sum w^2] over its n_widoms[b] post-exchange ghost
            insertions (w = exp(-beta dU_ins); see
            ops.pallas.sweep_kernel)."""
            C = com.shape[0]
            if not interpret:
                _check_mega_envelope(C, A_plane, "mega sweep")
            f32 = jnp.float32
            nb = len(blocks)
            z_b = (zact,) if nb == 1 and not isinstance(
                zact, (tuple, list)) else tuple(zact)
            si_b = (si,) if nb == 1 and not isinstance(
                si, (tuple, list)) else tuple(si)
            wc_b = (wc,) if nb == 1 and not isinstance(
                wc, (tuple, list)) else tuple(wc)
            actf = active.astype(f32)
            segs = [jnp.repeat(actf[:, m0:m1], p, axis=1)
                    for _, m0, m1, p, _ in system.species_slices]
            act_a = segs[0] if nb == 1 else jnp.concatenate(segs, axis=1)
            act_a = jnp.pad(act_a, ((0, 0), (0, A_plane - A)))
            actm = jnp.pad(actf, ((0, 0), (0, m_pad - M)))

            def mplane(arr):
                return jnp.pad(arr.astype(f32), ((0, 0), (0, m_pad - M)))

            planes = (
                coords[:, 0, :].astype(f32), coords[:, 1, :].astype(f32),
                coords[:, 2, :].astype(f32),
                mplane(com[:, :, 0]), mplane(com[:, :, 1]),
                mplane(com[:, :, 2]),
                mplane(quat[:, :, 0]), mplane(quat[:, :, 1]),
                mplane(quat[:, :, 2]), mplane(quat[:, :, 3]),
                sfac[:, :, 0].astype(f32), sfac[:, :, 1].astype(f32),
            )
            ones = jnp.ones((C, 1), f32)
            box_t = (box.reshape(C, 1).astype(f32),
                     float(params.temperature) * ones,
                     float(params.dr_max) * ones,
                     float(params.dphi_max) * ones)
            stats = jnp.zeros((C, 8), f32)
            seed = jnp.asarray(seed, jnp.int32)
            xacc, xatt = [], []
            xprev = (jnp.zeros((C,), f32),) * 3
            wids = []
            cm_uh = None
            moves_done = 0
            for b, (statics_b, consts_b) in enumerate(blocks):
                extra = dict(n_exch=n_exchs[b], tmmc=tmmc_exch,
                             n_widom=n_widoms[b])
                if n_exchs[b] or n_widoms[b]:
                    si_eff = si_b[b].astype(f32)
                    if lrc_cross is not None and nb > 1:
                        # cross-species LJ tail term: inserting a block-b
                        # molecule adds 2 g_bo N_o to the quadratic tail
                        # (ops/tail.mol_tail_coeff) — the OTHER blocks'
                        # counts are frozen during block b's call, so the
                        # term folds into the +-si constant lane, read
                        # from the LIVE activity plane (block calls
                        # earlier in this cycle may have changed N_o)
                        _, m0b, m1b, _, _ = system.species_slices[b]
                        n_oth = (jnp.sum(actm[:, :M], axis=1)
                                 - jnp.sum(actm[:, m0b:m1b], axis=1))
                        si_eff = si_eff + 2.0 \
                            * lrc_cross[b].astype(f32) * n_oth
                    extra.update(actm=actm, zact=z_b[b].astype(f32),
                                 si=si_eff,
                                 wc=wc_b[b].astype(f32))
                    if tmmc_exch:
                        eta_row = jnp.pad(eta.astype(f32).reshape(-1),
                                          (0, np_pad - (M + 1)))
                        extra.update(eta=eta_row,
                                     e_in=energy.astype(f32))
                out = sweep_pallas(*planes, act_a, *box_t, stats,
                                   seed + moves_done,
                                   chain_keys.astype(jnp.int32),
                                   wstarts_j, *consts_b, **statics_b,
                                   **extra)
                planes, stats = out[:12], out[12]
                i_o = 13
                if n_exchs[b] or n_widoms[b]:
                    act_a, actm = out[i_o], out[i_o + 1]
                    i_o += 2
                    if tmmc_exch:
                        cm_uh = out[i_o:i_o + 2]
                        i_o += 2
                if n_widoms[b]:
                    wids.append(out[i_o][:, 0:2])
                elif any(n_widoms):
                    wids.append(jnp.zeros((C, 2), f32))
                moves_done += statics_b["M"] + n_exchs[b] + n_widoms[b]
                # per-species exchange counters: difference the shared
                # stats columns across block calls
                xacc.append((stats[:, 5] - xprev[0],
                             stats[:, 6] - xprev[1]))
                xatt.append((stats[:, 7] - xprev[2],
                             float(n_exchs[b])
                             - (stats[:, 7] - xprev[2])))
                xprev = (stats[:, 5], stats[:, 6], stats[:, 7])
            (x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim) = planes
            com_o = jnp.stack([cx[:, :M], cy[:, :M], cz[:, :M]], axis=-1)
            quat_o = jnp.stack([qw[:, :M], qx[:, :M], qy[:, :M],
                                qz[:, :M]], axis=-1)
            coords_o = jnp.stack([x, y, z], axis=1)
            sfac_o = jnp.stack([sre, sim], axis=-1)
            active_o = actm[:, :M] > 0.5
            acc = jnp.stack([stats[:, 1], stats[:, 2]]
                            + [c for pair in xacc for c in pair], axis=1)
            att = jnp.stack([stats[:, 3], stats[:, 4]]
                            + [c for pair in xatt for c in pair], axis=1)
            res = (com_o, quat_o, coords_o, active_o, sfac_o,
                   stats[:, 0], acc, att)
            if tmmc_exch:
                cm, uh = cm_uh
                cmat = jnp.transpose(
                    cm.reshape(C, 3, np_pad)[:, :, :M + 1], (0, 2, 1))
                uhist = jnp.transpose(
                    uh.reshape(C, 3, np_pad)[:, :, :M + 1], (0, 2, 1))
                res = res + (cmat, uhist)
            if any(n_widoms):
                res = res + (jnp.stack(wids, axis=1),)
            return res

        return sweep_x

    return sweep_full


def make_mega_gibbs_fn(system, params, kvecs, kweights, interpret=False,
                       n_exch=1):
    """Fully in-kernel Gibbs cycle: returns `sweep_gibbs(com, quat,
    coords, active, box, sfac, chain_keys, seed, si2, wc2)` running
    [2*cap displacement/rotation moves + n_exch transfer attempts] in
    ONE Pallas call on the MolGibbsState layout (mc/gibbs_mol.py):
    com (C, 2, cap, 3), quat (C, 2, cap, 4), coords (C, 2, 3, A_pad),
    active (C, 2, cap) bool, box (C, 2), sfac (C, 2, K, 2); si2/wc2
    (C, 2) per-box self+intra constants (ev.self_intra(box_b)) and
    reference-Wolf coefficients (ev.wolf_const_coeff(box_b) * q_tot^2).

    Both boxes of a chain fold into ONE kernel row (box 1's columns
    offset by A_pad / m_pad — see ops.pallas.gibbs_kernel), so a
    transfer is an in-kernel deletion+insertion pair on that row;
    volume exchanges stay on the jnp path.  Requires a uniform
    single-species system, site cutoff, f32.

    Returns (com, quat, coords, active, sfac, d_e (C, 2) per-box
    accepted energy deltas, acc (C, 3) [trans, rot, transfer] counts,
    att (C, 3))."""
    from metropolismontecarlo_tpu.ops.pallas.gibbs_kernel import (
        sweep_gibbs_pallas,
    )

    if not system.is_uniform or params.cutoff_mode != "site" \
            or params.lj_shift not in ("none", "linear"):
        raise ValueError("mega Gibbs requires a uniform single-species "
                         "system and site cutoff")
    cap, A = system.n_mol, system.n_atoms
    A_pad = system.n_atoms_padded
    P = system.atoms_per_mol
    assert A == cap * P
    A2 = 2 * A_pad
    m_pad = _round_up(cap, 128)
    M2 = 2 * m_pad
    n_types = system.eps_table.shape[0]
    t_pad = _round_up(n_types, 8)
    tids_np = np.asarray(system.type_ids)
    qs_np = np.asarray(system.charges)
    bodies_np = np.asarray(system.body)
    et = np.asarray(system.eps_table, np.float32)
    st = np.asarray(system.sig_table, np.float32)

    # template tables (one species, both boxes)
    p_pad = _round_up(max(3 * P, P), 32)
    body_row = np.zeros((1, p_pad), np.float32)
    body_row[0, :3 * P] = bodies_np[0, :P].reshape(-1)
    qp_row = np.zeros((1, p_pad), np.float32)
    qp_row[0, :P] = qs_np[0, :P]
    eps_pt = np.zeros((max(P, 8), t_pad), np.float32)
    sig2_pt = np.zeros((max(P, 8), t_pad), np.float32)
    lam1_pt = np.zeros((max(P, 8), t_pad), np.float32)
    lam2_pt = np.zeros((max(P, 8), t_pad), np.float32)
    for p in range(P):
        eps_pt[p, :n_types] = et[tids_np[0, p]]
        sig2_pt[p, :n_types] = st[tids_np[0, p]] ** 2
        if params.lj_shift == "linear":
            from metropolismontecarlo_tpu.ops.lj import _shift_coeffs
            srow = st[tids_np[0, p]]
            l1, l2 = _shift_coeffs(params.r_cut / srow)
            lam1_pt[p, :n_types] = et[tids_np[0, p]] * l1
            lam2_pt[p, :n_types] = et[tids_np[0, p]] * l2 / srow
    has_lj = tuple(bool(np.any(et[tids_np[0, p]] != 0.0))
                   for p in range(P))
    has_q = tuple(bool(qs_np[0, p] != 0.0) for p in range(P))

    # per-box shared rows: box 1 molecule ids offset by m_pad so plane
    # positions and ids coincide (the kernel's slot arithmetic)
    def half_rows():
        tid = np.full(A_pad, -1.0, np.float32)
        tid[:A] = system.flat(system.type_ids)
        mol = np.full(A_pad, -1.0, np.float32)
        mol[:A] = system.atom_mol_slot[0]
        q = np.zeros(A_pad, np.float32)
        q[:A] = system.flat(system.charges)
        return tid, mol, q

    tid_h, mol_h, q_h = half_rows()
    tid_row = np.concatenate([tid_h, tid_h])
    mol_b1 = np.where(mol_h >= 0.0, mol_h + m_pad, -1.0)
    molid_row = np.concatenate([mol_h, mol_b1]).astype(np.float32)
    q_row = np.concatenate([q_h, q_h])

    if kvecs is not None:
        kx = jnp.asarray(kvecs[:, 0], jnp.float32)
        ky = jnp.asarray(kvecs[:, 1], jnp.float32)
        kz = jnp.asarray(kvecs[:, 2], jnp.float32)
        kw_r = jnp.asarray(kweights, jnp.float32)
        K = len(kweights)
    else:
        kx = ky = kz = kw_r = jnp.zeros((1,), jnp.float32)
        K = 1

    # VMEM chain-block model (see make_mega_sweep_fn): doubled planes,
    # four sfac planes, two cfac scratches
    per_chain = 4 * (2 * 3 * A2 + 2 * 7 * M2 + (2 * 4 + 2) * K
                     + 2 * (A2 + M2) + 56)
    lam_w = A2 if params.lj_shift == "linear" else 128
    shared = 4 * (3 * A2 + 4 * K + max(P, 8) * (2 * A2 + 2 * lam_w))
    budget = 12 * 1024 * 1024 - shared
    cb_fit = max(1, budget // per_chain)
    cb = int(os.environ.get("MMC_MEGA_CB", "0")) \
        or next(b for b in (128, 64, 32, 16, 8, 4, 2, 1) if b <= cb_fit)

    statics = dict(
        M=cap, P=P, coulomb=_kernel_coulomb(params), n_types=n_types,
        has_lj=has_lj, has_q=has_q, rc2=float(params.r_cut**2),
        qrc2=float(params.qq_cut**2), kappa_l=float(params.kappa_L),
        d2_overlap=float(params.d2_overlap),
        p_translate=float(params.p_translate),
        use_rot=(P > 1 and params.p_translate < 1.0),
        lj_shift=params.lj_shift, cb=cb, interpret=interpret,
        n_exch=int(n_exch),
    )
    consts = (jnp.asarray(body_row), jnp.asarray(qp_row),
              jnp.asarray(eps_pt), jnp.asarray(sig2_pt),
              jnp.asarray(lam1_pt), jnp.asarray(lam2_pt),
              jnp.asarray(tid_row), jnp.asarray(molid_row),
              jnp.asarray(q_row), kx, ky, kz, kw_r)

    def sweep_gibbs(com, quat, coords, active, box, sfac, chain_keys,
                    seed, si2, wc2):
        C = com.shape[0]
        if not interpret:
            _check_mega_envelope(C, A2, "mega Gibbs")
        f32 = jnp.float32

        def aplane(k):
            return jnp.concatenate(
                [coords[:, 0, k, :], coords[:, 1, k, :]],
                axis=1).astype(f32)

        def mplane(arr):                      # (C, 2, cap) -> (C, M2)
            return jnp.concatenate(
                [jnp.pad(arr[:, 0].astype(f32),
                         ((0, 0), (0, m_pad - cap))),
                 jnp.pad(arr[:, 1].astype(f32),
                         ((0, 0), (0, m_pad - cap)))], axis=1)

        actf = active.astype(f32)
        act_halves = []
        for b in range(2):
            seg = jnp.repeat(actf[:, b], P, axis=1)       # (C, A)
            act_halves.append(jnp.pad(seg, ((0, 0), (0, A_pad - A))))
        act_a = jnp.concatenate(act_halves, axis=1)
        actm = mplane(actf)
        ones = jnp.ones((C, 1), f32)
        out = sweep_gibbs_pallas(
            aplane(0), aplane(1), aplane(2),
            mplane(com[..., 0]), mplane(com[..., 1]),
            mplane(com[..., 2]),
            mplane(quat[..., 0]), mplane(quat[..., 1]),
            mplane(quat[..., 2]), mplane(quat[..., 3]),
            sfac[:, 0, :, 0].astype(f32), sfac[:, 0, :, 1].astype(f32),
            sfac[:, 1, :, 0].astype(f32), sfac[:, 1, :, 1].astype(f32),
            act_a, actm,
            box.astype(f32),
            float(params.temperature) * ones,
            float(params.dr_max) * ones,
            float(params.dphi_max) * ones,
            si2.astype(f32), wc2.astype(f32),
            jnp.zeros((C, 8), f32),
            jnp.asarray(seed, jnp.int32),
            chain_keys.astype(jnp.int32),
            *consts, **statics)
        (x, y, z, cx, cy, cz, qw, qx, qy, qz,
         sre0, sim0, sre1, sim1, act_o, actm_o, stats) = out

        def unfold_m(arr):                    # (C, M2) -> (C, 2, cap)
            return jnp.stack([arr[:, :cap],
                              arr[:, m_pad:m_pad + cap]], axis=1)

        com_o = jnp.stack([unfold_m(cx), unfold_m(cy), unfold_m(cz)],
                          axis=-1)
        quat_o = jnp.stack([unfold_m(qw), unfold_m(qx), unfold_m(qy),
                            unfold_m(qz)], axis=-1)

        def unfold_a(arr):                    # (C, A2) -> (C, 2, A_pad)
            return jnp.stack([arr[:, :A_pad], arr[:, A_pad:]], axis=1)

        coords_o = jnp.stack([unfold_a(x), unfold_a(y), unfold_a(z)],
                             axis=2)          # (C, 2, 3, A_pad)
        active_o = unfold_m(actm_o) > 0.5
        sfac_o = jnp.stack(
            [jnp.stack([sre0, sim0], axis=-1),
             jnp.stack([sre1, sim1], axis=-1)], axis=1)   # (C, 2, K, 2)
        d_e = stats[:, 0:2]
        acc = jnp.stack([stats[:, 2], stats[:, 3], stats[:, 6]], axis=1)
        att = jnp.stack([stats[:, 4], stats[:, 5],
                         jnp.full((C,), float(n_exch), f32)], axis=1)
        return com_o, quat_o, coords_o, active_o, sfac_o, d_e, acc, att

    return sweep_gibbs


def make_mega_gibbs_binary_fn(system, params, kvecs, kweights,
                              interpret=False, n_exch=(1, 1)):
    """In-kernel BINARY Gibbs cycle: returns `sweep_gibbs_b(com, quat,
    coords, active0, active1, box, sfac, chain_keys, seed, si2s,
    wc2s)` on the BinaryGibbsState layout (mc/gibbs_binary.py): com
    (C, 2, M, 3) with M = cap0 + cap1 total slots per box, coords
    (C, 2, 3, A_pad), active0 (C, 2, cap0), active1 (C, 2, cap1), box
    (C, 2), sfac (C, 2, K, 2); si2s/wc2s = per-species tuples of
    (C, 2) per-box self+intra constants / reference-Wolf coefficients.

    The muVT multi-block pattern on the round-4 both-boxes-in-one-row
    layout: one gibbs-kernel call per species block (m_start/a_start
    statics address the block, n_exch[s] transfer attempts of species
    s per call), activity planes threaded between the calls,
    per-species transfer counters by differencing the shared stats
    columns.  Requires two internally uniform species blocks, site
    cutoff, lj_shift='none', f32.

    Returns (com, quat, coords, active0, active1, sfac, d_e (C, 2),
    acc (C, 4) [trans, rot, transfer0, transfer1], att (C, 4))."""
    from metropolismontecarlo_tpu.ops.pallas.gibbs_kernel import (
        sweep_gibbs_pallas,
    )

    slices = system.species_slices
    if len(slices) != 2 or not system.species_uniform:
        raise ValueError("mega binary Gibbs requires exactly two "
                         "internally uniform species blocks")
    if params.cutoff_mode != "site" or params.lj_shift != "none":
        raise ValueError("mega binary Gibbs requires site cutoff and "
                         "lj_shift='none'")
    _, m0_a, m1_a, P0, a0_a = slices[0]
    _, m0_b, m1_b, P1, a0_b = slices[1]
    assert m0_a == 0 and a0_a == 0
    caps = (m1_a - m0_a, m1_b - m0_b)
    m0s, a0s, Ps = (m0_a, m0_b), (a0_a, a0_b), (P0, P1)
    M, A = system.n_mol, system.n_atoms
    A_pad = system.n_atoms_padded
    A2 = 2 * A_pad
    m_pad = _round_up(M, 128)
    M2 = 2 * m_pad
    n_types = system.eps_table.shape[0]
    t_pad = _round_up(n_types, 8)
    tids_np = np.asarray(system.type_ids)
    qs_np = np.asarray(system.charges)
    bodies_np = np.asarray(system.body)
    et = np.asarray(system.eps_table, np.float32)
    st2 = np.asarray(system.sig_table, np.float32) ** 2

    def species_tables(m0, P):
        p_pad = _round_up(max(3 * P, P), 32)
        body_row = np.zeros((1, p_pad), np.float32)
        body_row[0, :3 * P] = bodies_np[m0, :P].reshape(-1)
        qp_row = np.zeros((1, p_pad), np.float32)
        qp_row[0, :P] = qs_np[m0, :P]
        eps_pt = np.zeros((max(P, 8), t_pad), np.float32)
        sig2_pt = np.zeros((max(P, 8), t_pad), np.float32)
        for p in range(P):
            eps_pt[p, :n_types] = et[tids_np[m0, p]]
            sig2_pt[p, :n_types] = st2[tids_np[m0, p]]
        has_lj = tuple(bool(np.any(et[tids_np[m0, p]] != 0.0))
                       for p in range(P))
        has_q = tuple(bool(qs_np[m0, p] != 0.0) for p in range(P))
        return body_row, qp_row, eps_pt, sig2_pt, has_lj, has_q

    # shared per-box rows (all species); box-1 ids offset by m_pad
    tid_h = np.full(A_pad, -1.0, np.float32)
    tid_h[:A] = system.flat(system.type_ids)
    mol_h = np.full(A_pad, -1.0, np.float32)
    mol_h[:A] = system.atom_mol_slot[0]
    q_h = np.zeros(A_pad, np.float32)
    q_h[:A] = system.flat(system.charges)
    tid_row = np.concatenate([tid_h, tid_h])
    mol_b1 = np.where(mol_h >= 0.0, mol_h + m_pad, -1.0)
    molid_row = np.concatenate([mol_h, mol_b1]).astype(np.float32)
    q_row = np.concatenate([q_h, q_h])

    if kvecs is not None:
        kx = jnp.asarray(kvecs[:, 0], jnp.float32)
        ky = jnp.asarray(kvecs[:, 1], jnp.float32)
        kz = jnp.asarray(kvecs[:, 2], jnp.float32)
        kw_r = jnp.asarray(kweights, jnp.float32)
        K = len(kweights)
    else:
        kx = ky = kz = kw_r = jnp.zeros((1,), jnp.float32)
        K = 1

    P_max = max(Ps)
    per_chain = 4 * (2 * 3 * A2 + 2 * 7 * M2 + (2 * 4 + 2) * K
                     + 2 * (A2 + M2) + 56)
    shared = 4 * (3 * A2 + 4 * K + max(P_max, 8) * (2 * A2 + 2 * 128))
    budget = 12 * 1024 * 1024 - shared
    cb_fit = max(1, budget // per_chain)
    cb = int(os.environ.get("MMC_MEGA_CB", "0")) \
        or next(b for b in (128, 64, 32, 16, 8, 4, 2, 1) if b <= cb_fit)

    lam_dummy = np.zeros((8, t_pad), np.float32)
    blocks = []
    for s in range(2):
        body_row, qp_row, eps_pt, sig2_pt, has_lj, has_q = \
            species_tables(m0s[s], Ps[s])
        statics = dict(
            M=caps[s], P=Ps[s], coulomb=_kernel_coulomb(params),
            n_types=n_types, has_lj=has_lj, has_q=has_q,
            rc2=float(params.r_cut**2), qrc2=float(params.qq_cut**2),
            kappa_l=float(params.kappa_L),
            d2_overlap=float(params.d2_overlap),
            p_translate=float(params.p_translate),
            use_rot=(Ps[s] > 1 and params.p_translate < 1.0),
            lj_shift="none", cb=cb, interpret=interpret,
            n_exch=int(n_exch[s]), m_start=m0s[s], a_start=a0s[s],
        )
        consts = (jnp.asarray(body_row), jnp.asarray(qp_row),
                  jnp.asarray(eps_pt), jnp.asarray(sig2_pt),
                  jnp.asarray(lam_dummy), jnp.asarray(lam_dummy),
                  jnp.asarray(tid_row), jnp.asarray(molid_row),
                  jnp.asarray(q_row), kx, ky, kz, kw_r)
        blocks.append((statics, consts))

    # per-atom repeat widths per box half (species blocks are packed:
    # species-0 atoms [0, cap0*P0), species-1 from a0_b)
    assert a0_b == caps[0] * P0

    def sweep_gibbs_b(com, quat, coords, active0, active1, box, sfac,
                      chain_keys, seed, si2s, wc2s, lrc_cross=None):
        C = com.shape[0]
        if not interpret:
            _check_mega_envelope(C, A2, "mega binary Gibbs")
        f32 = jnp.float32

        def aplane(k):
            return jnp.concatenate(
                [coords[:, 0, k, :], coords[:, 1, k, :]],
                axis=1).astype(f32)

        def mplane(arr):                      # (C, 2, M) -> (C, M2)
            return jnp.concatenate(
                [jnp.pad(arr[:, 0].astype(f32),
                         ((0, 0), (0, m_pad - M))),
                 jnp.pad(arr[:, 1].astype(f32),
                         ((0, 0), (0, m_pad - M)))], axis=1)

        act0f = active0.astype(f32)
        act1f = active1.astype(f32)
        actf = jnp.concatenate([act0f, act1f], axis=2)    # (C, 2, M)
        act_halves = []
        for b in range(2):
            seg = jnp.concatenate(
                [jnp.repeat(act0f[:, b], P0, axis=1),
                 jnp.repeat(act1f[:, b], P1, axis=1)], axis=1)
            act_halves.append(jnp.pad(seg, ((0, 0), (0, A_pad - A))))
        act_a = jnp.concatenate(act_halves, axis=1)
        actm = mplane(actf)
        ones = jnp.ones((C, 1), f32)
        planes = [
            aplane(0), aplane(1), aplane(2),
            mplane(com[..., 0]), mplane(com[..., 1]),
            mplane(com[..., 2]),
            mplane(quat[..., 0]), mplane(quat[..., 1]),
            mplane(quat[..., 2]), mplane(quat[..., 3]),
            sfac[:, 0, :, 0].astype(f32), sfac[:, 0, :, 1].astype(f32),
            sfac[:, 1, :, 0].astype(f32), sfac[:, 1, :, 1].astype(f32),
            act_a, actm,
        ]
        box_t = (box.astype(f32),
                 float(params.temperature) * ones,
                 float(params.dr_max) * ones,
                 float(params.dphi_max) * ones)
        stats = jnp.zeros((C, 8), f32)
        seed = jnp.asarray(seed, jnp.int32)
        moves_done = 0
        xacc = []
        xprev = jnp.zeros((C,), f32)
        for s, (statics_s, consts_s) in enumerate(blocks):
            si_eff = si2s[s].astype(f32)
            if lrc_cross is not None:
                # cross-species LJ tail term per box: inserting a
                # species-s molecule into box b adds 2 g_so(box_b) N_o^b
                # — the other species' counts are frozen during this
                # species' call, read LIVE from the folded activity
                # plane (the earlier species call may have moved them)
                o = 1 - s
                actm_live = planes[15]
                n_oth = jnp.stack(
                    [jnp.sum(actm_live[:, b * m_pad + m0s[o]:
                                       b * m_pad + m0s[o] + caps[o]],
                             axis=1) for b in (0, 1)], axis=1)
                si_eff = si_eff + 2.0 * lrc_cross[s].astype(f32) * n_oth
            out = sweep_gibbs_pallas(
                *planes, *box_t,
                si_eff, wc2s[s].astype(f32), stats,
                seed + moves_done, chain_keys.astype(jnp.int32),
                *consts_s, **statics_s)
            planes, stats = list(out[:16]), out[16]
            moves_done += 2 * caps[s] + int(n_exch[s])
            xacc.append(stats[:, 6] - xprev)
            xprev = stats[:, 6]
        (x, y, z, cx, cy, cz, qw, qx, qy, qz,
         sre0, sim0, sre1, sim1, act_o, actm_o) = planes

        def unfold_m(arr):                    # (C, M2) -> (C, 2, M)
            return jnp.stack([arr[:, :M],
                              arr[:, m_pad:m_pad + M]], axis=1)

        com_o = jnp.stack([unfold_m(cx), unfold_m(cy), unfold_m(cz)],
                          axis=-1)
        quat_o = jnp.stack([unfold_m(qw), unfold_m(qx), unfold_m(qy),
                            unfold_m(qz)], axis=-1)

        def unfold_a(arr):                    # (C, A2) -> (C, 2, A_pad)
            return jnp.stack([arr[:, :A_pad], arr[:, A_pad:]], axis=1)

        coords_o = jnp.stack([unfold_a(x), unfold_a(y), unfold_a(z)],
                             axis=2)          # (C, 2, 3, A_pad)
        actm_2 = unfold_m(actm_o) > 0.5       # (C, 2, M)
        active0_o = actm_2[:, :, :caps[0]]
        active1_o = actm_2[:, :, caps[0]:caps[0] + caps[1]]
        sfac_o = jnp.stack(
            [jnp.stack([sre0, sim0], axis=-1),
             jnp.stack([sre1, sim1], axis=-1)], axis=1)   # (C, 2, K, 2)
        d_e = stats[:, 0:2]
        acc = jnp.stack([stats[:, 2], stats[:, 3]] + xacc, axis=1)
        att = jnp.stack(
            [stats[:, 4], stats[:, 5],
             jnp.full((C,), float(n_exch[0]), f32),
             jnp.full((C,), float(n_exch[1]), f32)], axis=1)
        return (com_o, quat_o, coords_o, active0_o, active1_o, sfac_o,
                d_e, acc, att)

    return sweep_gibbs_b


def make_mega_flip_fn(system, params, kvecs, kweights, fugacity_ratio,
                      interpret=False, n_flip=1):
    """In-kernel semigrand identity flips: returns `flips(com, quat,
    coords, active, box, sfac, chain_keys, seed, si2)` running n_flip
    flip attempts in one Pallas call on the SemigrandState layout
    (mc/semigrand.py): com (C, M, 3), quat (C, M, 4), coords
    (C, 3, A_pad), active (C, M) bool, box (C,), sfac (C, K, 2); si2
    (C, 2) per-species self+intra constants.  Composes with the
    per-block sweep_act kernel (make_mega_sweep_fn) for the
    displacement/rotation budget — a flip touches BOTH species'
    templates in one attempt, which the per-block sweep kernel cannot
    express (ops.pallas.flip_kernel).

    Returns (com, quat, coords, active, sfac, d_e (C,), acc (C, 2)
    [flip A->B, flip B->A], att (C, 2))."""
    from metropolismontecarlo_tpu.ops.pallas.flip_kernel import flip_pallas

    slices = system.species_slices
    if len(slices) != 2 or not system.species_uniform:
        raise ValueError("mega flips require exactly two internally "
                         "uniform species blocks")
    if params.cutoff_mode != "site" or params.lj_shift != "none":
        raise ValueError("mega flips require site cutoff and "
                         "lj_shift='none'")
    _, m0_a, m1_a, P0, a0_a = slices[0]
    _, m0_b, m1_b, P1, a0_b = slices[1]
    assert a0_a == 0 and m0_a == 0
    cap_a, cap_b = m1_a - m0_a, m1_b - m0_b
    M, A = system.n_mol, system.n_atoms
    A_pad = system.n_atoms_padded
    m_pad = _round_up(M, 128)
    n_types = system.eps_table.shape[0]
    t_pad = _round_up(n_types, 8)
    tids_np = np.asarray(system.type_ids)
    qs_np = np.asarray(system.charges)
    bodies_np = np.asarray(system.body)
    et = np.asarray(system.eps_table, np.float32)
    st2 = np.asarray(system.sig_table, np.float32) ** 2

    def species_tables(m0, P):
        p_pad = _round_up(max(3 * P, P), 32)
        body_row = np.zeros((1, p_pad), np.float32)
        body_row[0, :3 * P] = bodies_np[m0, :P].reshape(-1)
        qp_row = np.zeros((1, p_pad), np.float32)
        qp_row[0, :P] = qs_np[m0, :P]
        eps_pt = np.zeros((max(P, 8), t_pad), np.float32)
        sig2_pt = np.zeros((max(P, 8), t_pad), np.float32)
        for p in range(P):
            eps_pt[p, :n_types] = et[tids_np[m0, p]]
            sig2_pt[p, :n_types] = st2[tids_np[m0, p]]
        has_lj = tuple(bool(np.any(et[tids_np[m0, p]] != 0.0))
                       for p in range(P))
        has_q = tuple(bool(qs_np[m0, p] != 0.0) for p in range(P))
        return body_row, qp_row, eps_pt, sig2_pt, has_lj, has_q

    body0, qp0, eps0, sig20, has_lj0, has_q0 = species_tables(m0_a, P0)
    body1, qp1, eps1, sig21, has_lj1, has_q1 = species_tables(m0_b, P1)

    tid_row = np.full(A_pad, -1.0, np.float32)
    tid_row[:A] = system.flat(system.type_ids)
    molid_row = np.full(A_pad, -1.0, np.float32)
    molid_row[:A] = system.atom_mol_slot[0]
    q_row = np.zeros(A_pad, np.float32)
    q_row[:A] = system.flat(system.charges)

    if kvecs is not None:
        kx = jnp.asarray(kvecs[:, 0], jnp.float32)
        ky = jnp.asarray(kvecs[:, 1], jnp.float32)
        kz = jnp.asarray(kvecs[:, 2], jnp.float32)
        kw_r = jnp.asarray(kweights, jnp.float32)
        K = len(kweights)
    else:
        kx = ky = kz = kw_r = jnp.zeros((1,), jnp.float32)
        K = 1

    per_chain = 4 * (2 * 3 * A_pad + 2 * 7 * m_pad + (2 * 2 + 1) * K
                     + 2 * (A_pad + m_pad) + 48)
    shared = 4 * (3 * A_pad + 4 * K
                  + max(P0 + P1, 8) * 2 * A_pad)
    budget = 12 * 1024 * 1024 - shared
    cb_fit = max(1, budget // per_chain)
    cb = int(os.environ.get("MMC_MEGA_CB", "0")) \
        or next(b for b in (128, 64, 32, 16, 8, 4, 2, 1) if b <= cb_fit)

    statics = dict(
        cap_a=cap_a, cap_b=cap_b, P0=P0, P1=P1, a0_b=a0_b,
        coulomb=_kernel_coulomb(params), n_types=n_types,
        has_lj0=has_lj0, has_q0=has_q0, has_lj1=has_lj1, has_q1=has_q1,
        rc2=float(params.r_cut**2), qrc2=float(params.qq_cut**2),
        kappa_l=float(params.kappa_L),
        d2_overlap=float(params.d2_overlap),
        ln_xi=float(np.log(fugacity_ratio)), n_flip=int(n_flip),
        cb=cb, interpret=interpret,
    )
    consts = (jnp.asarray(body0), jnp.asarray(qp0), jnp.asarray(body1),
              jnp.asarray(qp1), jnp.asarray(eps0), jnp.asarray(sig20),
              jnp.asarray(eps1), jnp.asarray(sig21),
              jnp.asarray(tid_row), jnp.asarray(molid_row),
              jnp.asarray(q_row), kx, ky, kz, kw_r)

    def flips(com, quat, coords, active, box, sfac, chain_keys, seed,
              si2, lrc3=None):
        C = com.shape[0]
        f32 = jnp.float32
        use_lrc = lrc3 is not None
        if lrc3 is None:
            lrc3 = jnp.zeros((C, 3), f32)
        actf = active.astype(f32)
        act_a = jnp.repeat(actf[:, :cap_a], P0, axis=1)
        act_b = jnp.repeat(actf[:, cap_a:], P1, axis=1)
        act_row = jnp.pad(jnp.concatenate([act_a, act_b], axis=1),
                          ((0, 0), (0, A_pad - A)))
        actm = jnp.pad(actf, ((0, 0), (0, m_pad - M)))

        def mplane(arr):
            return jnp.pad(arr.astype(f32), ((0, 0), (0, m_pad - M)))

        ones = jnp.ones((C, 1), f32)
        out = flip_pallas(
            coords[:, 0, :].astype(f32), coords[:, 1, :].astype(f32),
            coords[:, 2, :].astype(f32),
            mplane(com[..., 0]), mplane(com[..., 1]),
            mplane(com[..., 2]),
            mplane(quat[..., 0]), mplane(quat[..., 1]),
            mplane(quat[..., 2]), mplane(quat[..., 3]),
            sfac[:, :, 0].astype(f32), sfac[:, :, 1].astype(f32),
            act_row, actm,
            box.reshape(C, 1).astype(f32),
            float(params.temperature) * ones,
            si2.astype(f32), lrc3.astype(f32),
            jnp.zeros((C, 8), f32),
            jnp.asarray(seed, jnp.int32),
            chain_keys.astype(jnp.int32), *consts, use_lrc=use_lrc,
            **statics)
        (x, y, z, cx, cy, cz, qw, qx, qy, qz, sre, sim, act_o, actm_o,
         stats) = out
        com_o = jnp.stack([cx[:, :M], cy[:, :M], cz[:, :M]], axis=-1)
        quat_o = jnp.stack([qw[:, :M], qx[:, :M], qy[:, :M],
                            qz[:, :M]], axis=-1)
        coords_o = jnp.stack([x, y, z], axis=1)
        sfac_o = jnp.stack([sre, sim], axis=-1)
        active_o = actm_o[:, :M] > 0.5
        return (com_o, quat_o, coords_o, active_o, sfac_o, stats[:, 0],
                stats[:, 1:3], stats[:, 3:5])

    return flips
