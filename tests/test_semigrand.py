"""Semigrand ensemble (identity swaps at fixed total N): exact binomial
composition statistics — ideal AND fully interacting identical species —
plus the Ewald drift invariant through flips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metropolismontecarlo_tpu.mc.semigrand import Semigrand
from metropolismontecarlo_tpu.models.system import RunParams, System
from metropolismontecarlo_tpu.models.water import spce_system


def two_block_lj(cap_a, cap_b, eps_a=1.0, eps_b=1.0, eps_ab=None,
                 sigma=1.0):
    """Monatomic A block + bent-triatomic B block (unequal widths
    exercise the ragged flip bookkeeping)."""
    from metropolismontecarlo_tpu.models.polyatomic import (
        bent_triatomic_body,
    )
    M, P = cap_a + cap_b, 3
    body = np.zeros((M, P, 3))
    body[cap_a:] = bent_triatomic_body()
    masses = np.zeros((M, P))
    masses[:cap_a, 0] = 1.0
    masses[cap_a:] = 1.0
    charges = np.zeros((M, P))
    type_ids = np.zeros((M, P), np.int32)
    type_ids[cap_a:] = 1
    ab = np.sqrt(eps_a * eps_b) if eps_ab is None else eps_ab
    eps_t = np.array([[eps_a, ab], [ab, eps_b]])
    sig_t = np.full((2, 2), sigma)
    return System(n_mol=M, atoms_per_mol=P, body=body, masses=masses,
                  charges=charges, type_ids=type_ids, eps_table=eps_t,
                  sig_table=sig_t, name="sg-lj",
                  species=(("A", cap_a, 1), ("B", cap_b, 3)))


def water_two_blocks(cap_a, cap_b):
    w = spce_system(cap_a + cap_b)
    return System(n_mol=cap_a + cap_b, atoms_per_mol=3, body=w.body,
                  masses=w.masses, charges=w.charges,
                  type_ids=w.type_ids, eps_table=w.eps_table,
                  sig_table=w.sig_table, name="sg-spce",
                  species=(("wA", cap_a, 3), ("wB", cap_b, 3)))


def test_semigrand_ideal_binomial():
    """Both species non-interacting, xi = 3: each of the N molecules is
    independently species B with probability xi/(1+xi) = 3/4 —
    Binomial(N, 3/4) mean and variance in closed form; total N strictly
    conserved through flips."""
    n_tot, xi = 48, 3.0
    sysI = two_block_lj(64, 64, eps_a=0.0, eps_b=0.0, eps_ab=0.0)
    params = RunParams(strict_min_image=False, temperature=1.0, r_cut=2.0,
                       cutoff_mode="site", coulomb="none", p_translate=0.5,
                       dr_max=1.0, dphi_max=1.0, use_lrc=False)
    g = Semigrand(sysI, params, fugacity_ratio=xi, p_flip=0.6)
    st = g.init(jax.random.PRNGKey(0), box=8.0, n_a=24, n_b=24,
                n_chains=192)
    st, _ = g.run_block(st, 1500)
    means, varis = [], []
    for _ in range(6):
        st, stats = g.run_block(st, 400, drift_tol=1e-10)
        means.append(stats["nb_mean"])
        varis.append(stats["nb_var"])
        assert stats["n_tot_mean"] == n_tot
    p = xi / (1.0 + xi)
    assert np.mean(means) == pytest.approx(n_tot * p, rel=0.02), means
    assert np.mean(varis) == pytest.approx(n_tot * p * (1 - p),
                                           rel=0.15), varis


def test_semigrand_identical_species_binomial_with_interactions():
    """A and B physically identical (both SPC/E) with FULL Ewald
    interactions, xi = 2: relabeling cannot change the physics, so the
    composition is EXACTLY Binomial(N, 2/3) at any interaction strength
    — a closed-form statistical anchor for the flip acceptance — while
    the carried energy and structure factors stay drift-exact."""
    n_tot, xi = 12, 2.0
    params = RunParams(temperature=600.0, r_cut=8.0, cutoff_mode="site",
                       coulomb="ewald", use_lrc=False, p_translate=0.5,
                       dr_max=1.0, dphi_max=0.7)
    g = Semigrand(water_two_blocks(20, 20), params, fugacity_ratio=xi,
                  p_flip=0.5, n_orient=4)
    st = g.init(jax.random.PRNGKey(1), box=20.0, n_a=6, n_b=6,
                n_chains=64)
    st, _ = g.run_block(st, 1200)
    means, varis = [], []
    flips = 0.0
    for _ in range(5):
        st, stats = g.run_block(st, 500, drift_tol=1e-9)
        assert stats["sfac_err_max"] < 1e-8, stats
        means.append(stats["nb_mean"])
        varis.append(stats["nb_var"])
        flips += stats["acc_flip_ab"] + stats["acc_flip_ba"]
    assert flips > 0.0
    p = xi / (1.0 + xi)
    assert np.mean(means) == pytest.approx(n_tot * p, rel=0.04), means
    assert np.mean(varis) == pytest.approx(n_tot * p * (1 - p),
                                           rel=0.25), varis


def test_semigrand_interacting_flip_drift():
    """Unequal species (monatomic vs trimer, different LJ): flips change
    the energy landscape for real; the drift invariant must hold."""
    params = RunParams(strict_min_image=False, temperature=3.0, r_cut=2.5,
                       cutoff_mode="site", coulomb="none", p_translate=0.5,
                       dr_max=0.4, dphi_max=1.0, use_lrc=False)
    g = Semigrand(two_block_lj(40, 40, eps_a=1.0, eps_b=0.6), params,
                  fugacity_ratio=1.5, p_flip=0.4, n_orient=4)
    st = g.init(jax.random.PRNGKey(2), box=6.0, n_a=16, n_b=8,
                n_chains=64)
    flips = 0.0
    for _ in range(3):
        st, stats = g.run_block(st, 800, drift_tol=1e-10)
        flips += stats["acc_flip_ab"] + stats["acc_flip_ba"]
        assert stats["n_tot_mean"] == 24
    assert flips > 0.0, stats


def test_semigrand_validation_guards():
    params = RunParams(temperature=300.0, r_cut=5.0, cutoff_mode="site",
                       coulomb="ewald", use_lrc=False)
    with pytest.raises(ValueError, match="two species"):
        Semigrand(spce_system(8), params, fugacity_ratio=1.0)
    g = Semigrand(water_two_blocks(8, 8), params, fugacity_ratio=1.0)
    with pytest.raises(ValueError, match="capacity"):
        g.init(jax.random.PRNGKey(0), box=12.0, n_a=6, n_b=6, n_chains=2)


def test_semigrand_mega_kernel_drift_and_bookkeeping():
    """mega="interpret": displacement/rotation sweeps through the
    species-blocked activity-masked kernel, identity flips on the jnp
    path; carried energy/sfac vs dense recompute, total N conserved."""
    sys2 = water_two_blocks(8, 8)
    params = RunParams(temperature=700.0, r_cut=4.5, cutoff_mode="site",
                       coulomb="ewald", nk=3, ksq_max=9, p_translate=0.5,
                       dr_max=0.3, dphi_max=0.3, use_lrc=False,
                       strict_min_image=False)
    g = Semigrand(sys2, params, fugacity_ratio=2.0, p_flip=0.3,
                  dtype=jnp.float32, mega="interpret")
    st = g.init(jax.random.PRNGKey(0), box=10.0, n_a=5, n_b=3,
                n_chains=2)
    for _ in range(2):
        st, stats = g.run_block(st, 44, drift_tol=2e-3)
        assert stats["sfac_err_max"] < 1e-4, stats
    assert int(np.sum(np.asarray(st.att[:, 0]))) > 0
    assert int(np.sum(np.asarray(st.att[:, 2:]))) > 0
    assert (np.asarray(st.active.sum(axis=1)) == 8).all()


def test_semigrand_mega_full_in_kernel_flips():
    """mega="interpret_full": identity flips run inside the dedicated
    flip kernel (ops.pallas.flip_kernel — both species' templates in
    one call), sweeps through the per-block sweep kernel.  The
    interpret-mode PRNG is degenerate, so this gates the flip path's
    energy/structure-factor/activity bookkeeping; sampled statistics
    validate on real TPU (docs/validation/semigrand_kernel.txt)."""
    sys2 = water_two_blocks(8, 8)
    params = RunParams(temperature=700.0, r_cut=4.5, cutoff_mode="site",
                       coulomb="ewald", nk=3, ksq_max=9, p_translate=0.5,
                       dr_max=0.3, dphi_max=0.3, use_lrc=False,
                       strict_min_image=False)
    g = Semigrand(sys2, params, fugacity_ratio=2.0, p_flip=0.3,
                  dtype=jnp.float32, mega="interpret_full")
    st = g.init(jax.random.PRNGKey(0), box=10.0, n_a=5, n_b=3,
                n_chains=2)
    for _ in range(2):
        st, stats = g.run_block(st, 44, drift_tol=2e-3)
        assert stats["sfac_err_max"] < 1e-4, stats
    assert int(np.sum(np.asarray(st.att[:, 0]))) > 0
    assert int(np.sum(np.asarray(st.att[:, 2:]))) > 0
    assert (np.asarray(st.active.sum(axis=1)) == 8).all()


def test_semigrand_mega_full_ragged_drift():
    """The ragged corner (monatomic A + triatomic B, no charges)
    through the in-kernel flip path: energy bookkeeping exact through
    unequal-width identity swaps."""
    sys2 = two_block_lj(24, 24, eps_a=1.0, eps_b=0.6)
    params = RunParams(strict_min_image=False, temperature=2.0,
                       r_cut=2.5, cutoff_mode="site", coulomb="none",
                       p_translate=0.5, dr_max=0.3, dphi_max=0.5,
                       use_lrc=False)
    g = Semigrand(sys2, params, fugacity_ratio=1.5, p_flip=0.3,
                  dtype=jnp.float32, mega="interpret_full")
    st = g.init(jax.random.PRNGKey(2), box=9.0, n_a=12, n_b=8,
                n_chains=4)
    for _ in range(2):
        st, stats = g.run_block(st, 60, drift_tol=2e-3)
    assert (np.asarray(st.active.sum(axis=1)) == 20).all()


def test_semigrand_mega_full_validates():
    params = RunParams(temperature=700.0, r_cut=4.5, cutoff_mode="site",
                       coulomb="none", use_lrc=False, p_translate=0.5,
                       dr_max=0.3, dphi_max=0.3, strict_min_image=False)
    with pytest.raises(ValueError, match="unbiased"):
        Semigrand(water_two_blocks(8, 8), params, fugacity_ratio=1.0,
                  n_orient=4, dtype=jnp.float32, mega="interpret_full")
    with pytest.raises(ValueError, match="p_flip"):
        Semigrand(water_two_blocks(8, 8), params, fugacity_ratio=1.0,
                  p_flip=0.0, dtype=jnp.float32, mega="interpret_full")


def test_mega_flip_empty_active_set_guard():
    """ADVICE-r4 guard, kernel-level: with ZERO active molecules the
    argmax-of-uniforms pick degenerates to slot 0, and the `smax >= 0`
    term must make acceptance impossible (an accepted flip of an
    inactive slot would CREATE a molecule).  Unreachable through the
    Semigrand app (init requires n_a + n_b >= 1), so this drives
    moves.make_mega_flip_fn directly with an all-inactive chain.  The
    interpret-mode PRNG returns zeros, which makes the log-uniform
    maximally permissive (ln 1e-30 = -69) — acceptance here hinges
    exactly on the guard, not on luck."""
    from metropolismontecarlo_tpu.mc.moves import make_mega_flip_fn

    sys2 = two_block_lj(8, 8)
    params = RunParams(strict_min_image=False, temperature=2.0,
                       r_cut=2.5, cutoff_mode="site", coulomb="none",
                       p_translate=0.5, dr_max=0.3, dphi_max=0.5,
                       use_lrc=False)
    flips = make_mega_flip_fn(sys2, params, None, None,
                              fugacity_ratio=2.0, interpret=True,
                              n_flip=4)
    C, M, A_pad = 2, sys2.n_mol, sys2.n_atoms_padded
    com = jnp.zeros((C, M, 3), jnp.float32)
    quat = jnp.zeros((C, M, 4), jnp.float32).at[..., 0].set(1.0)
    coords = jnp.zeros((C, 3, A_pad), jnp.float32)
    active = jnp.zeros((C, M), bool)
    box = jnp.full((C,), 9.0, jnp.float32)
    sfac = jnp.zeros((C, 1, 2), jnp.float32)
    si2 = jnp.zeros((C, 2), jnp.float32)
    out = flips(com, quat, coords, active, box, sfac,
                jnp.arange(C, dtype=jnp.int32), jnp.zeros((), jnp.int32),
                si2)
    com_o, quat_o, coords_o, active_o, sfac_o, d_e, acc, att = out
    assert not bool(jnp.any(active_o)), "flip created a molecule"
    assert int(np.sum(np.asarray(acc))) == 0
    assert float(np.max(np.abs(np.asarray(d_e)))) == 0.0
    np.testing.assert_array_equal(np.asarray(com_o), np.asarray(com))
