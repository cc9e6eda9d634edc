"""MBAR estimator gates (mc/mbar.py) — closed forms, not regressions.

All tests are host-NumPy statistical exactness checks:
  * Gaussian states have analytic reduced free energies,
  * K = 2 MBAR must coincide with Bennett's BAR equation,
  * the harmonic model E = x^2/2 has <E>(T) = T/2 and C = 1/2 at EVERY
    temperature — including temperatures never sampled.
"""

import numpy as np
import pytest

from metropolismontecarlo_tpu.mc.fep import bar_solve
from metropolismontecarlo_tpu.mc.mbar import (
    mbar_solve,
    mbar_weights,
    reweight_temperature,
)


def gaussian_states(sigmas, mus, n, rng):
    """Samples + exact reduced potentials for states with
    u_k(x) = (x - mu_k)^2 / (2 sigma_k^2): Z_k = sqrt(2 pi) sigma_k, so
    f_k - f_0 = -ln(sigma_k / sigma_0) exactly."""
    xs = [rng.normal(m, s, n) for m, s in zip(mus, sigmas)]
    pooled = np.concatenate(xs)
    u_kn = np.stack([(pooled - m) ** 2 / (2 * s**2)
                     for m, s in zip(mus, sigmas)])
    f_exact = -np.log(np.asarray(sigmas) / sigmas[0])
    return pooled, u_kn, f_exact


def test_gaussian_closed_form():
    rng = np.random.default_rng(0)
    sigmas = [1.0, 1.5, 2.5, 4.0]
    mus = [0.0, 0.5, 1.0, 2.0]
    n = 20000
    _, u_kn, f_exact = gaussian_states(sigmas, mus, n, rng)
    f = mbar_solve(u_kn, [n] * 4)
    # MBAR statistical error at n=20k with this overlap is ~1e-2
    np.testing.assert_allclose(f, f_exact, atol=0.05)


def test_two_state_mbar_equals_bar():
    rng = np.random.default_rng(1)
    sigmas, mus, n = [1.0, 2.0], [0.0, 1.0], 4000
    pooled, u_kn, _ = gaussian_states(sigmas, mus, n, rng)
    f = mbar_solve(u_kn, [n, n], tol=1e-13)
    # BAR on the same samples: forward works on state-0 samples,
    # reverse works on state-1 samples
    w_f = (u_kn[1] - u_kn[0])[:n]
    w_r = (u_kn[0] - u_kn[1])[n:]
    x = bar_solve(w_f, w_r)
    # identical estimators (K=2 MBAR stationary equation IS Bennett's),
    # so agreement is to solver tolerance, not statistical error
    assert abs(f[1] - x) < 1e-8


def test_prediction_state_and_inf_works():
    rng = np.random.default_rng(2)
    sigmas, mus, n = [1.0, 2.0, 3.0], [0.0, 0.0, 0.0], 20000
    # the POOL holds samples from states 0 and 1 only; state 2 is a
    # pure prediction state (n_k = 0) evaluated on that pool
    pooled = np.concatenate([rng.normal(mus[k], sigmas[k], n)
                             for k in (0, 1)])
    u_kn = np.stack([(pooled - m) ** 2 / (2 * s**2)
                     for m, s in zip(mus, sigmas)])
    f_exact = -np.log(np.asarray(sigmas) / sigmas[0])
    f = mbar_solve(u_kn, [n, n, 0])
    np.testing.assert_allclose(f, f_exact, atol=0.05)
    # +inf entries (hard-core vetoes) must carry zero weight, not NaN
    u_inf = u_kn.copy()
    u_inf[0, 5] = np.inf
    f2 = mbar_solve(u_inf, [n, n, 0])
    assert np.all(np.isfinite(f2))


def test_target_weights_reproduce_direct_mean():
    rng = np.random.default_rng(3)
    sigmas, mus, n = [1.0, 1.6], [0.0, 0.0], 30000
    pooled, u_kn, _ = gaussian_states(sigmas, mus, n, rng)
    f = mbar_solve(u_kn, [n, n])
    # reweight the POOL into state 1: <x^2> must equal sigma_1^2
    f1, w, ess = mbar_weights(u_kn[1], f, u_kn, [n, n])
    assert abs(f1 - f[1]) < 1e-10
    assert ess > n  # pooled reweighting beats single-state sampling
    x2 = np.sum(w * pooled**2)
    assert abs(x2 - sigmas[1] ** 2) < 4 * sigmas[1] ** 2 / np.sqrt(ess)


def test_temperature_reweighting_harmonic():
    # E = x^2/2 sampled at ladder temps; exact: <E>(T) = T/2, C = 1/2,
    # and the reduced free energy f(T) = -ln sqrt(2 pi T) + const
    rng = np.random.default_rng(4)
    temps = np.asarray([0.8, 1.0, 1.25, 1.6, 2.0])
    s = 40000
    x = rng.normal(0.0, np.sqrt(temps)[:, None], (temps.size, s))
    e = 0.5 * x**2
    targets = np.asarray([0.9, 1.1, 1.4, 1.8])   # between rungs
    out = reweight_temperature(e, temps, targets)
    np.testing.assert_allclose(out["e_mean"], targets / 2, rtol=0.02)
    np.testing.assert_allclose(out["c"], 0.5, rtol=0.05)
    assert np.all(out["ess"] > s)                # interpolation regime
    # free-energy differences: f(T) in MBAR's gauge includes the
    # mixture normalization; differences of -ln Z scaled by beta are
    # model-specific — gate instead on the thermodynamic identity
    # d(f)/d(1/T) = <E> via a secant check between adjacent targets
    db = 1.0 / targets[1] - 1.0 / targets[0]
    secant = (out["f"][1] - out["f"][0]) / db
    mid_e = 0.5 * (out["e_mean"][0] + out["e_mean"][1])
    assert abs(secant - mid_e) < 0.05 * abs(mid_e) + 0.02

    # reweighting AT a rung reproduces that rung's direct average
    at_rung = reweight_temperature(e, temps, temps[2:3])
    direct = e[2].mean()
    sem = e[2].std() / np.sqrt(s)
    assert abs(at_rung["e_mean"][0] - direct) < 6 * sem

    # far extrapolation must announce itself via a collapsing ess
    far = reweight_temperature(e, temps, [8.0])
    assert far["ess"][0] < 0.05 * e.size


def test_activity_pooling_ideal_gas():
    # ideal gas muVT: N ~ Poisson(z V) at every activity; pooled runs
    # at three activities must predict the mean AND the variance (= zV)
    # at a never-sampled activity in between
    rng = np.random.default_rng(6)
    v = 50.0
    zs = np.asarray([0.5, 1.0, 2.0])
    s = 30000
    n_kn = np.stack([rng.poisson(z * v, s) for z in zs])
    from metropolismontecarlo_tpu.mc.mbar import reweight_activity_mbar
    out = reweight_activity_mbar(n_kn, zs, [0.7, 1.5])
    np.testing.assert_allclose(out["n_mean"], np.asarray([0.7, 1.5]) * v,
                               rtol=0.01)
    np.testing.assert_allclose(out["n_var"], np.asarray([0.7, 1.5]) * v,
                               rtol=0.05)
    # Poisson rungs are NARROW (sigma ~ sqrt(zV)), so a between-rung
    # target overlaps only the tails of its neighbors: ESS is a modest
    # fraction of the pool, not ~pool (unlike broad-energy temperature
    # reweighting) — but still orders of magnitude above extrapolation
    assert np.all(out["ess"] > 0.02 * n_kn.size)
    # P(N) rows are normalized distributions
    np.testing.assert_allclose(out["pn"].sum(axis=1), 1.0, atol=1e-12)
    # far extrapolation announces itself
    far = reweight_activity_mbar(n_kn, zs, [20.0])
    assert far["ess"][0] < 0.01 * n_kn.size


def test_activity_k1_equals_histogram_route():
    # a single-run pool IS histogram reweighting: identical estimators,
    # agreement to solver tolerance (not statistical error)
    from metropolismontecarlo_tpu.mc.gcmc import reweight_activity
    from metropolismontecarlo_tpu.mc.mbar import reweight_activity_mbar
    rng = np.random.default_rng(7)
    z0, v, s = 1.0, 30.0, 20000
    n = rng.poisson(z0 * v, s)
    hist = np.bincount(n, minlength=n.max() + 1)
    for z_new in (0.8, 1.3):
        ref = reweight_activity(hist, z0, z_new)
        out = reweight_activity_mbar(n[None, :], [z0], [z_new])
        assert abs(out["n_mean"][0] - ref["n_mean"]) < 1e-9
        assert abs(out["n_var"][0] - ref["n_var"]) < 1e-7


def _exp_molecule_muvt(t, z, v, s, rng):
    """Toy grand-canonical model with closed forms at every (T, z):
    unit single-particle DOS on e in [0, inf) gives q1(T) = T, so
    N ~ Poisson(z V T) and U | N = sum of N Exp(1/T) energies —
    <E> = <N> T."""
    n = rng.poisson(z * v * t, s)
    e = np.asarray([rng.exponential(t, k).sum() for k in n])
    return e, n.astype(np.float64)


def test_joint_muvt_reweighting():
    from metropolismontecarlo_tpu.mc.mbar import reweight_muvt

    rng = np.random.default_rng(8)
    v, s = 30.0, 20000
    states = [(0.8, 1.0), (1.0, 1.0), (1.0, 1.5), (1.25, 1.2)]
    e_kn, n_kn = zip(*[_exp_molecule_muvt(t, z, v, s, rng)
                       for t, z in states])
    temps = [t for t, _ in states]
    zs = [z for _, z in states]
    # targets move T and z JOINTLY, including a never-sampled corner
    targets = [(0.9, 1.2), (1.1, 1.1), (1.0, 1.25)]
    out = reweight_muvt(np.stack(e_kn), np.stack(n_kn), temps, zs,
                        targets)
    exact_n = np.asarray([z * v * t for t, z in targets])
    exact_e = np.asarray([t for t, _ in targets]) * exact_n
    np.testing.assert_allclose(out["n_mean"], exact_n, rtol=0.02)
    np.testing.assert_allclose(out["e_mean"], exact_e, rtol=0.03)
    # Poisson variance of N
    np.testing.assert_allclose(out["n_var"], exact_n, rtol=0.06)
    assert np.all(out["ess"] > 0.05 * s)

    # reweighting AT a sampled state reproduces its direct averages
    at = reweight_muvt(np.stack(e_kn), np.stack(n_kn), temps, zs,
                       [states[2]])
    direct_n = n_kn[2].mean()
    sem = n_kn[2].std() / np.sqrt(s)
    assert abs(at["n_mean"][0] - direct_n) < 6 * sem

    # far corner announces itself
    far = reweight_muvt(np.stack(e_kn), np.stack(n_kn), temps, zs,
                        [(3.0, 5.0)])
    assert far["ess"][0] < 0.01 * 4 * s


def test_unconverged_raises():
    rng = np.random.default_rng(5)
    _, u_kn, _ = gaussian_states([1.0, 2.0], [0.0, 0.0], 100, rng)
    with pytest.raises(RuntimeError):
        mbar_solve(u_kn, [100, 100], max_iter=1)
