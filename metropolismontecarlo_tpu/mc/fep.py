"""Free-energy perturbation: deletion energies + Bennett acceptance ratio.

Widom insertion (mc/widom.py) estimates mu_ex from one direction only:
ghost insertions into the N-molecule ensemble.  At liquid density the
estimator is dominated by rare low-energy insertions and converges
slowly.  The Bennett acceptance ratio (Bennett, J. Comput. Phys. 22,
245 (1976); Frenkel & Smit ch. 7.2) combines those FORWARD samples with
REVERSE samples — the energies of deleting real molecules from the
(N+1)-molecule ensemble — into the provably minimum-variance two-state
estimator.  The reference has no free-energy machinery at all; this
module extends the beyond-parity Widom capability into a proper FEP
family.

Ensembles and works (all configurational; ideal terms cancel into the
uniform-ghost normalization exactly as in Widom):

  A = N-system x one ideal ghost uniform in V      Z_A = V * Z_N
  B = (N+1)-system                                  Z_B = Z_{N+1}
  beta * mu_ex = -ln(Z_B / Z_A)

  forward work  w_F = beta * dU_insert   (Widom ghosts, sampled in A)
  reverse work  w_R = -beta * dU_delete  (real molecules, sampled in B;
                                          by particle symmetry EVERY
                                          molecule of the species is a
                                          valid reverse sample)

`make_deletion_fn` evaluates dU_delete = U(N+1) - U(N without molecule
m) EXACTLY per the sampled model — the same per-style terms as the
Widom ghosts (LJ + LRC decrement, real/recip/self/intra Ewald with the
carried structure factors, Wolf constants, optional surface dipole) —
so insertion and deletion are reciprocal number-for-number (gated by
tests/test_fep.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from metropolismontecarlo_tpu.mc.widom import make_pose_eval
from metropolismontecarlo_tpu.ops import ewald as ewald_ops
from metropolismontecarlo_tpu.ops import tail as tail_ops
from metropolismontecarlo_tpu.utils.chunking import chunked_vmap
from metropolismontecarlo_tpu.utils.constants import COULOMB_FACTOR


def make_deletion_fn(system, params, kvecs, kweights, dtype=jnp.float32,
                     species=0, chunk=8):
    """Build deletion_du(state) -> (du (C, n_sp), overlap (C, n_sp)):
    the exact energy attributable to each molecule of the species,
    dU_m = U(state) - U(state minus molecule m), for every molecule and
    chain.  overlap mirrors the pair evaluator's hard-core flag (always
    False on configurations the chain itself sampled).

    chunk: chains per scan step (each chunk row holds an
    (n_sp, P, A_pad) pair grid).
    """
    ev = make_pose_eval(system, params, kvecs, kweights, dtype, species)
    _, m0, m1, P, _ = system.species_slices[species]
    n_sp = m1 - m0
    M = system.n_mol
    mol_a0 = jnp.asarray(system.mol_a0)
    use_coul = params.coulomb != "none"
    factor = jnp.asarray(COULOMB_FACTOR, dtype)
    kv = None if kvecs is None else jnp.asarray(kvecs)
    kw = None if kweights is None else jnp.asarray(kweights, dtype)

    # LRC decrement U_lrc(N) - U_lrc(N-1): static type-count vectors
    tm = np.asarray(system.type_ids)[m0, :P]
    counts_np = np.asarray(system.type_counts, np.float64)
    counts_minus_np = counts_np.copy()
    for t in tm:
        counts_minus_np[t] -= 1.0
    counts = jnp.asarray(counts_np, dtype)
    counts_minus = jnp.asarray(counts_minus_np, dtype)
    eps_tab = jnp.asarray(system.eps_table, dtype)
    sig_tab = jnp.asarray(system.sig_table, dtype)
    use_lrc = params.use_lrc and params.lj_shift == "none"

    def lrc_dec(box):
        if not use_lrc:
            return jnp.zeros((), dtype)
        vol = box**3
        return (tail_ops.lrc_energy(counts, eps_tab, sig_tab,
                                    params.r_cut, vol)
                - tail_ops.lrc_energy(counts_minus, eps_tab, sig_tab,
                                      params.r_cut, vol))

    def du_one(m, coords_t, com, box, sfac):
        """Deletion energy of molecule m (global index) in one chain."""
        ra = jax.lax.dynamic_slice_in_dim(coords_t, mol_a0[m], P,
                                          axis=1).T              # (P, 3)
        com_t = com[m]
        du, overlap = ev.pair_energy(com_t, ra, coords_t, com, box,
                                     ev.real, m)
        du = du + lrc_dec(box)
        if use_coul:
            kappa = jnp.asarray(params.kappa_L, dtype) / box
            if params.coulomb == "ewald":
                cf = ewald_ops.cfac_coeffs(kv, kw, kappa, box, dtype)
                s_m = ev.pose_sfac(ra, box)
                # E(S) - E(S - s_m) = -[E(S + (-s_m)) - E(S)]
                du = du - ewald_ops.recip_energy_delta(sfac, -s_m, cf)
                du = du + ev.self_intra(box)
                if params.ewald_surface:
                    com_all = com[jnp.clip(ev.mol_of_atom, 0, M - 1)]
                    m_tot = ewald_ops.surface_dipole(
                        coords_t.T, com_all, ev.charges_flat, box)
                    mu_m = ewald_ops.surface_dipole(
                        ra, com_t[None, :], ev.q_t, box)
                    c_surf = factor * 2.0 * jnp.pi / (3.0 * box**3)
                    m_old = m_tot - mu_m
                    du = du + c_surf * (jnp.sum(m_tot * m_tot)
                                        - jnp.sum(m_old * m_old))
            elif params.coulomb == "wolf":
                du = du + ev.self_intra(box)
                # reference-convention constant: Q^2 - (Q - q_t)^2
                dq2 = ev.q_sys_tot**2 - (ev.q_sys_tot - ev.q_t_tot) ** 2
                du = du + ev.wolf_const_coeff(box) * dq2
        return du, overlap

    mols = jnp.arange(m0, m1, dtype=jnp.int32)

    def deletion_du(state):
        def chain(coords, com, box, sfac):
            f = lambda m: du_one(m, coords, com, box, sfac)  # noqa: E731
            return jax.vmap(f)(mols)

        return chunked_vmap(chain, chunk,
                            state.coords.astype(dtype),
                            state.com.astype(dtype),
                            state.box.astype(dtype),
                            state.sfac.astype(dtype))

    return deletion_du


def _expit(z):
    """Numerically stable logistic 1/(1+exp(-z)) (host NumPy)."""
    return 0.5 * (1.0 + np.tanh(0.5 * z))


def bar_solve(w_f, w_r, tol=1e-12, max_iter=200):
    """Solve Bennett's self-consistent equation for the reduced free-
    energy difference x = beta*(F_B - F_A) given reduced works
    w_f = beta*(U_B - U_A) on A-samples and w_r = beta*(U_A - U_B) on
    B-samples:

        sum_i expit(x - M - w_f_i) = sum_j expit(-x - M' ... )

    i.e. the standard form  sum_F 1/(1+exp(M + w_F - x)) =
    sum_R 1/(1+exp(-M + w_R + x)),  M = ln(n_F/n_R).

    The left side is increasing and the right decreasing in x, so the
    root is unique; solved by bisection (robust to +inf works from
    overlap-vetoed insertions, which contribute zero).
    """
    w_f = np.asarray(w_f, np.float64).ravel()
    w_r = np.asarray(w_r, np.float64).ravel()
    n_f, n_r = w_f.size, w_r.size
    assert n_f > 0 and n_r > 0
    m = np.log(n_f / n_r)

    def g(x):
        lhs = _expit(x - m - w_f)          # 1/(1+exp(M + w_F - x))
        rhs = _expit(m - w_r - x)          # 1/(1+exp(-M + w_R + x))
        return np.sum(lhs) - np.sum(rhs)

    # bracket the root: g is increasing in x
    finite = w_f[np.isfinite(w_f)]
    lo = min(np.min(finite, initial=0.0), np.min(-w_r, initial=0.0)) - 50.0
    hi = max(np.max(finite, initial=0.0), np.max(-w_r, initial=0.0)) + 50.0
    assert g(lo) < 0.0 < g(hi), "BAR root not bracketed (no overlap?)"
    for _ in range(max_iter):
        mid = 0.5 * (lo + hi)
        if g(mid) < 0.0:
            lo = mid
        else:
            hi = mid
        if hi - lo < tol:
            break
    return 0.5 * (lo + hi)


def bar_mu_ex(du_insert, overlap_insert, du_delete, temperature):
    """Excess chemical potential from BAR (energy units of the run).

    du_insert (any shape): Widom ghost insertion energies sampled in the
    N-molecule ensemble (mc/widom.make_widom_fn's widom_du), with
    overlap_insert marking hard-core-vetoed ghosts (infinite work).
    du_delete: per-molecule deletion energies sampled in the
    (N+1)-molecule ensemble (make_deletion_fn).  temperature: kT in the
    same units (per-chain ladders must reweight before pooling).
    """
    beta = 1.0 / float(temperature)
    w_f = np.where(np.asarray(overlap_insert, bool),
                   np.inf, beta * np.asarray(du_insert, np.float64))
    w_r = -beta * np.asarray(du_delete, np.float64)
    return float(temperature) * bar_solve(w_f, w_r)
