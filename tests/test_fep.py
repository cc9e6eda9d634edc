"""FEP/BAR (mc/fep.py): the BAR solver against closed forms, exact
insertion/deletion reciprocity across coulomb styles, and the
statistical BAR == Widom mu_ex gate on a dense LJ fluid."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metropolismontecarlo_tpu.io.configs import cubic_lattice
from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.mc.fep import bar_mu_ex, bar_solve, make_deletion_fn
from metropolismontecarlo_tpu.mc.widom import make_widom_fn, mu_excess
from metropolismontecarlo_tpu.models.monatomic import lj_system
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_system
from metropolismontecarlo_tpu.ops.quaternions import (
    random_quaternion,
    rotate_vectors,
)

F64 = jnp.float64


def test_bar_solver_identical_states():
    """A == B (all works zero): the free-energy difference is zero even
    with asymmetric sample counts."""
    assert bar_solve(np.zeros(100), np.zeros(37)) == pytest.approx(0.0,
                                                                   abs=1e-9)


def test_bar_solver_gaussian_closed_form():
    """Gaussian work distributions: Crooks fixes the reverse-work
    distribution to N(sigma^2 - m, sigma^2) given forward N(m, sigma^2),
    and the exact answer is dF = m - sigma^2/2."""
    rng = np.random.default_rng(0)
    m, sig = 3.0, 1.5
    w_f = rng.normal(m, sig, 200_000)
    w_r = rng.normal(sig**2 - m, sig, 200_000)
    df = bar_solve(w_f, w_r)
    assert df == pytest.approx(m - sig**2 / 2.0, abs=0.02)


def test_bar_solver_vetoed_insertions():
    """+inf forward works (hard-core vetoes) contribute zero weight but
    still count as attempts: the answer shifts by ln of the effective
    sample fraction relative to dropping them."""
    w_f = np.concatenate([np.zeros(50), np.full(50, np.inf)])
    w_r = np.zeros(100)
    # exact: sum expit(x) over 50 = sum expit(-x) over 100
    #   -> e^x/(1+e^x)*50 = 100/(1+e^x) -> e^x = 2
    assert bar_solve(w_f, w_r) == pytest.approx(np.log(2.0), abs=1e-9)


STYLES = [
    dict(coulomb="ewald"),
    dict(coulomb="ewald", ewald_surface=True),
    dict(coulomb="wolf", wolf_style="ref"),
    dict(coulomb="bare", use_lrc=False),
]


@pytest.mark.parametrize("kw", STYLES, ids=lambda k: "-".join(
    f"{a}={b}" for a, b in k.items()))
def test_insertion_deletion_reciprocity_water(kw):
    """Inserting a ghost water at pose X into the 8-molecule state must
    cost EXACTLY what deleting that molecule from the 9-molecule state
    returns — every per-style term (LJ, LRC, real/recip/self/intra,
    wolf constants, surface dipole) has to match."""
    box, m = 12.0, 8
    params = RunParams(strict_min_image=False, temperature=300.0,
                       r_cut=5.0, cutoff_mode="site", **kw)
    sys8, sys9 = spce_system(m), spce_system(m + 1)
    com8 = jnp.asarray(cubic_lattice(m, box), F64)
    quat8 = random_quaternion(jax.random.PRNGKey(11), (m,), F64)
    com_t = jnp.asarray([3.3, 7.1, 9.2], F64)
    quat_t = random_quaternion(jax.random.PRNGKey(101), (), F64)

    mc8 = MonteCarlo(sys8, params, dtype=F64, pallas=False,
                     recompute_chunk=1)
    body = jnp.asarray(np.asarray(sys8.body), F64)
    coords8 = (com8[:, None, :] + rotate_vectors(quat8, body)).reshape(-1, 3)
    state8 = mc8.init_from_coords(jax.random.PRNGKey(0), coords8, com8,
                                  box=box, n_chains=1)
    widom_du, _ = make_widom_fn(sys8, params, mc8.kvecs, mc8.kweights,
                                dtype=F64, chunk=1)
    du_ins, ovr = widom_du(state8, com_t[None, None, :],
                           quat_t[None, None, :])
    assert not bool(np.asarray(ovr)[0, 0])

    # the 9-molecule state at the SAME pose (state8's rebuilt coords)
    body_t = jnp.asarray(np.asarray(sys9.body)[m], F64)
    ra_t = com_t[None, :] + rotate_vectors(quat_t, body_t)
    coords9 = jnp.concatenate(
        [state8.coords[0, :, : sys8.n_atoms].T, ra_t], axis=0)
    com9 = jnp.concatenate([com8, com_t[None, :]], axis=0)
    mc9 = MonteCarlo(sys9, params, dtype=F64, pallas=False,
                     recompute_chunk=1)
    state9 = mc9.init_from_coords(jax.random.PRNGKey(0), coords9, com9,
                                  box=box, n_chains=1)
    deletion_du = make_deletion_fn(sys9, params, mc9.kvecs, mc9.kweights,
                                   dtype=F64, chunk=1)
    du_del, ovr_del = deletion_du(state9)
    assert du_del.shape == (1, m + 1)
    assert not bool(np.asarray(ovr_del)[0, m])
    assert float(du_del[0, m]) == pytest.approx(float(du_ins[0, 0]),
                                                rel=1e-8)


def test_insertion_deletion_reciprocity_lj():
    """Monatomic P=1 path with tail corrections: the LRC increment of
    insertion equals the LRC decrement of deletion."""
    n, box = 32, 6.0
    params = RunParams(strict_min_image=False, temperature=1.0,
                       r_cut=2.5, coulomb="none", use_lrc=True)
    com_n = jnp.asarray(cubic_lattice(n, box), F64)
    com_t = jnp.asarray([0.71, 2.9, 4.13], F64)
    mc_n = MonteCarlo(lj_system(n), params, dtype=F64, pallas=False,
                      recompute_chunk=1)
    s_n = mc_n.init_state(jax.random.PRNGKey(0), com_n, box=box, n_chains=1)
    widom_du, _ = make_widom_fn(lj_system(n), params, None, None,
                                dtype=F64, chunk=1)
    quat_t = jnp.zeros((1, 1, 4), F64).at[..., 0].set(1.0)
    du_ins, _ = widom_du(s_n, com_t[None, None, :], quat_t)

    com_n1 = jnp.concatenate([com_n, com_t[None, :]], axis=0)
    mc_n1 = MonteCarlo(lj_system(n + 1), params, dtype=F64, pallas=False,
                       recompute_chunk=1)
    s_n1 = mc_n1.init_from_coords(jax.random.PRNGKey(0), com_n1, com_n1,
                                  box=box, n_chains=1)
    deletion_du = make_deletion_fn(lj_system(n + 1), params, None, None,
                                   dtype=F64, chunk=1)
    du_del, _ = deletion_du(s_n1)
    assert float(du_del[0, n]) == pytest.approx(float(du_ins[0, 0]),
                                                rel=1e-10)


def test_bar_matches_widom_dense_lj():
    """Dense LJ fluid (rho* = 0.5, T* = 1.2): mu_ex from BAR (insertions
    into N=64 + deletions from N=65) must agree with the direct Widom
    estimate within combined statistical error."""
    n, t = 64, 1.2
    box = float((n / 0.5) ** (1.0 / 3.0))
    params = RunParams(temperature=t, r_cut=2.4, coulomb="none",
                       use_lrc=True, p_translate=1.0, dr_max=0.35)
    C, n_ins, blocks, steps = 8, 256, 4, 100
    key = jax.random.PRNGKey(42)

    mc_n = MonteCarlo(lj_system(n), params, dtype=F64, recompute_chunk=4)
    st_n = mc_n.init_state(key, cubic_lattice(n, box), box=box, n_chains=C)
    st_n, _ = mc_n.run_block(st_n, 300, adjust=True)
    widom_du, _ = make_widom_fn(lj_system(n), params, None, None,
                                dtype=F64, chunk=4)

    mc_n1 = MonteCarlo(lj_system(n + 1), params, dtype=F64,
                       recompute_chunk=4)
    st_n1 = mc_n1.init_state(key, cubic_lattice(n + 1, box), box=box,
                             n_chains=C)
    st_n1, _ = mc_n1.run_block(st_n1, 300, adjust=True)
    deletion_du = make_deletion_fn(lj_system(n + 1), params, None, None,
                                   dtype=F64, chunk=4)

    du_f, ov_f, du_r, boltz = [], [], [], []
    for b in range(blocks):
        st_n, stats = mc_n.run_block(st_n, steps, adjust=False)
        assert stats["drift_max_rel"] < 1e-10
        k_pos = jax.random.fold_in(jax.random.PRNGKey(7), b)
        u = jax.random.uniform(k_pos, (C, n_ins, 3), F64) \
            * st_n.box[:, None, None]
        qt = jnp.zeros((C, n_ins, 4), F64).at[..., 0].set(1.0)
        du, ov = widom_du(st_n, u, qt)
        du_f.append(np.asarray(du))
        ov_f.append(np.asarray(ov))
        boltz.append(np.where(np.asarray(ov), 0.0,
                              np.exp(-np.asarray(du) / t)))

        st_n1, stats1 = mc_n1.run_block(st_n1, steps, adjust=False)
        assert stats1["drift_max_rel"] < 1e-10
        du_r.append(np.asarray(deletion_du(st_n1)[0]))

    mu_widom = float(mu_excess(jnp.asarray(np.mean(boltz)), t))
    mu_bar = bar_mu_ex(np.concatenate([a.ravel() for a in du_f]),
                       np.concatenate([a.ravel() for a in ov_f]),
                       np.concatenate([a.ravel() for a in du_r]), t)
    # per-block Widom spread as the error scale
    per_block = [-t * np.log(max(np.mean(b), 1e-300)) for b in boltz]
    sem = np.std(per_block) / np.sqrt(len(per_block))
    assert mu_bar == pytest.approx(mu_widom, abs=max(6.0 * sem, 0.15)), \
        (mu_bar, mu_widom, sem)
    assert mu_bar < 0.0  # attractive-dominated at this state point
