"""Distribution gates for the IN-KERNEL Gibbs transfers (round 4) on
real TPU — the gibbs-ensemble analogue of gcmc_kernel_exchange.txt.

Interpret-mode Pallas PRNG returns zeros (docs/validation/README.md,
mega_prng entry), so the CPU tests gate only bookkeeping (drift, sfac,
N conservation); the SAMPLED MEASURE of the in-kernel transfer path
(ops/pallas/gibbs_kernel.py: per-chain direction pick, argmax-of-
uniforms slot selection, Shoemake poses from the on-core PRNG,
log-space acceptance) validates here, against closed forms with no
reference implementation in the loop:

[0] IDEAL single-species Gibbs (eps=0, q=0, fixed volumes): dU == 0,
    so transfer acceptance is min[1, N_s V_d / ((N_d+1) V_s)] and each
    molecule independently occupies box 0 with p = V0/(V0+V1) at
    equilibrium: N_box0 ~ Binomial(N_tot, p) — mean AND variance in
    closed form (Frenkel & Smit ch. 8; same argument as the muVT
    Poisson gate).
[1] IDEAL binary Gibbs: each species partitions as an INDEPENDENT
    Binomial (its own cap/count), and the cross-species covariance of
    (N0_box0, N1_box0) vanishes — gates the per-species kernel calls
    and the threaded activity planes.
[2] SPC/E water 500 K cross-sampler agreement: <N_liq-box> through
    mega="full" vs the round-3 hybrid path (kernel sweeps + jnp
    Rosenbluth transfers, n_orient=1) on the same state point, within
    combined errors; plus the drift/sfac invariants on hardware.

Run: `python docs/validation/run_gibbs_kernel_exchange.py` (TPU).
Writes docs/validation/gibbs_kernel_exchange.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MMC_CACHE", "/tmp/mmc_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from metropolismontecarlo_tpu.mc.gibbs_binary import make_gibbs_binary
from metropolismontecarlo_tpu.mc.gibbs_mol import make_gibbs_mol
from metropolismontecarlo_tpu.models.monatomic import lj_system
from metropolismontecarlo_tpu.models.system import RunParams, System
from metropolismontecarlo_tpu.models.water import spce_system

# MMC_SMOKE=1: CPU plumbing check — interpret-mode kernels (degenerate
# PRNG), tiny step counts, NO statistical gates asserted.
SMOKE = bool(os.environ.get("MMC_SMOKE"))
MEGA_FULL = "interpret_full" if SMOKE else "full"
MEGA_HYB = "interpret" if SMOKE else True
STEPS_EQ = 400 if SMOKE else 3000
LINES = []


def emit(s):
    print(s, flush=True)
    LINES.append(s)


def zgate(name, measured, sem, exact, tol_sig=4.0):
    z = abs(measured - exact) / max(sem, 1e-12)
    ok = z < tol_sig or SMOKE
    emit(f"    {name}: {measured:.4f} +- {sem:.4f} vs exact "
         f"{exact:.4f}  (z = {z:.2f} < {tol_sig})  "
         f"[{'PASS' if ok else 'FAIL'}]")
    return ok


def seg_ideal_single(t0):
    emit("[0] ideal single-species Gibbs: Binomial partition")
    cap, n_tot = 96, 64
    b0, b1 = 8.0, 11.0
    p0 = b0**3 / (b0**3 + b1**3)
    params = RunParams(temperature=1.0, r_cut=2.5, cutoff_mode="site",
                       coulomb="none", p_translate=1.0, dr_max=0.5,
                       p_volume=0.0, use_lrc=False,
                       strict_min_image=False)
    init, run = make_gibbs_mol(lj_system(cap, eps=0.0), params,
                               p_transfer=0.5, dtype=jnp.float32,
                               mega=MEGA_FULL)[:2]
    st = init(jax.random.PRNGKey(1), boxes=(b0, b1),
              n_init=(n_tot // 2, n_tot - n_tot // 2),
              n_chains=64 if SMOKE else 2048)
    st = run(st, STEPS_EQ)                    # equilibrate
    jax.block_until_ready(st.energy)
    emit(f"    equilibrated [{time.time()-t0:.0f} s]")
    samples = []
    for _ in range(4):
        st = run(st, 100 if SMOKE else 800)
        samples.append(np.asarray(st.active[:, 0].sum(axis=1),
                                  np.float64))
    n0 = np.concatenate(samples)              # (4*2048,)
    n_eff = 2048 * 4                          # blocks ~decorrelated
    mean_exact = n_tot * p0
    var_exact = n_tot * p0 * (1 - p0)
    ok = zgate("<N_box0>", n0.mean(), n0.std() / np.sqrt(n_eff),
               mean_exact)
    ok &= zgate("Var[N_box0]", n0.var(),
                n0.var() * np.sqrt(2.0 / n_eff), var_exact)
    assert (np.asarray(st.active.sum(axis=(1, 2))) == n_tot).all(), \
        "total N not conserved"
    emit(f"    N conserved across 2048 chains  [{time.time()-t0:.0f} s]")
    return ok


def seg_ideal_binary(t0):
    emit("[1] ideal binary Gibbs: independent per-species Binomials")
    caps, n_tots = (64, 64), (40, 28)
    b0, b1 = 8.0, 11.0
    p0 = b0**3 / (b0**3 + b1**3)
    M = caps[0] + caps[1]
    body = np.zeros((M, 1, 3))
    sysb = System(n_mol=M, atoms_per_mol=1, body=body,
                  masses=np.ones((M, 1)), charges=np.zeros((M, 1)),
                  type_ids=np.zeros((M, 1), np.int32),
                  eps_table=np.zeros((1, 1)), sig_table=np.ones((1, 1)),
                  name="ideal2",
                  species=(("a", caps[0], 1), ("b", caps[1], 1)))
    params = RunParams(temperature=1.0, r_cut=2.5, cutoff_mode="site",
                       coulomb="none", p_translate=1.0, dr_max=0.5,
                       p_volume=0.0, use_lrc=False,
                       strict_min_image=False)
    init, run = make_gibbs_binary(sysb, params, p_transfer=0.5,
                                  dtype=jnp.float32,
                                  mega=MEGA_FULL)[:2]
    st = init(jax.random.PRNGKey(2), boxes=(b0, b1),
              n_init=np.array([[n_tots[0] // 2,
                                n_tots[0] - n_tots[0] // 2],
                               [n_tots[1] // 2,
                                n_tots[1] - n_tots[1] // 2]]),
              n_chains=64 if SMOKE else 2048)
    st = run(st, STEPS_EQ)
    jax.block_until_ready(st.energy)
    emit(f"    equilibrated [{time.time()-t0:.0f} s]")
    s0, s1 = [], []
    for _ in range(4):
        st = run(st, 100 if SMOKE else 800)
        s0.append(np.asarray(st.active0[:, 0].sum(axis=1), np.float64))
        s1.append(np.asarray(st.active1[:, 0].sum(axis=1), np.float64))
    n0 = np.concatenate(s0)
    n1 = np.concatenate(s1)
    n_eff = len(n0)
    ok = zgate("<N_A,box0>", n0.mean(), n0.std() / np.sqrt(n_eff),
               n_tots[0] * p0)
    ok &= zgate("<N_B,box0>", n1.mean(), n1.std() / np.sqrt(n_eff),
                n_tots[1] * p0)
    ok &= zgate("Var[N_A,box0]", n0.var(),
                n0.var() * np.sqrt(2.0 / n_eff),
                n_tots[0] * p0 * (1 - p0))
    corr = float(np.corrcoef(n0, n1)[0, 1])
    ok_c = abs(corr) < 4.0 / np.sqrt(n_eff) or SMOKE
    emit(f"    corr(N_A, N_B) = {corr:+.4f} (|corr| < "
         f"{4.0/np.sqrt(n_eff):.4f})  [{'PASS' if ok_c else 'FAIL'}]")
    return ok and ok_c


def seg_water_cross(t0):
    emit("[2] SPC/E water 500 K: mega='full' vs hybrid <N_liq>")
    from metropolismontecarlo_tpu.ops.ewald import tune_parameters

    cap = 48
    b_l, b_v = 12.0, 16.0
    r_cut = 5.0
    kl, nk, ksq = tune_parameters(16.5, r_cut, 1e-3)
    params = RunParams(temperature=500.0, r_cut=r_cut,
                       cutoff_mode="site", coulomb="ewald", kappa_L=kl,
                       nk=nk, ksq_max=ksq, p_translate=0.5, dr_max=0.35,
                       dphi_max=0.5, p_volume=0.0, use_lrc=False,
                       strict_min_image=False)
    results = {}
    for label, mega in (("full", MEGA_FULL), ("hybrid", MEGA_HYB)):
        init, run, fe = make_gibbs_mol(spce_system(cap), params,
                                       p_transfer=0.3,
                                       dtype=jnp.float32, n_orient=1,
                                       mega=mega)[:3]
        st = init(jax.random.PRNGKey(7), boxes=(b_l, b_v),
                  n_init=(30, 8), n_chains=16 if SMOKE else 256)
        st = run(st, 400 if SMOKE else 4000)
        jax.block_until_ready(st.energy)
        # block-boundary RESYNC, exactly like MolGibbsEnsemble.
        # run_block: the f32 carried-energy residue scales with the
        # exchange TRAVERSAL (thousands of ~1e3 K transfer deltas per
        # block), not the endpoints — production blocks recompute and
        # resync, so gate the PER-BLOCK residue (and the tight sfac
        # invariant), not an artifact-length accumulation
        drift = sferr = 0.0
        samples = []
        for _ in range(3):
            st = run(st, 150 if SMOKE else 1200)
            e_fresh, sf = fe(st)
            scale = np.maximum(np.abs(np.asarray(e_fresh)), 1.0)
            drift = max(drift,
                        float(np.max(np.abs(np.asarray(e_fresh
                                                       - st.energy))
                                     / scale)))
            sferr = max(sferr,
                        float(np.max(np.abs(np.asarray(sf
                                                       - st.sfac)))))
            st = st._replace(energy=e_fresh, sfac=sf)
            n = np.asarray(st.active.sum(axis=2), np.float64)  # (C, 2)
            samples.append(n.max(axis=1))     # liquid box per chain
        nl = np.concatenate(samples)
        results[label] = (nl.mean(), nl.std() / np.sqrt(len(nl)))
        emit(f"    {label}: <N_liq> = {nl.mean():.3f} +- "
             f"{nl.std()/np.sqrt(len(nl)):.3f}, worst block drift "
             f"{drift:.1e}, sfac {sferr:.1e}  [{time.time()-t0:.0f} s]")
        assert sferr < 1e-3, sferr
        assert drift < 2e-2, drift
    (mf, sf_), (mh, sh) = results["full"], results["hybrid"]
    gap = abs(mf - mh)
    tol = 4.0 * np.hypot(sf_, sh) + 0.02 * mh
    ok = gap < tol or SMOKE
    emit(f"    |gap| = {gap:.3f} < {tol:.3f}  "
         f"[{'PASS' if ok else 'FAIL'}]")
    return ok


def main():
    t0 = time.time()
    dev = jax.devices()[0]
    emit("in-kernel Gibbs transfer validation, "
         f"{dev.device_kind}")
    ok = seg_ideal_single(t0)
    ok &= seg_ideal_binary(t0)
    ok &= seg_water_cross(t0)
    emit(f"total wall: {time.time()-t0:.0f} s")
    emit(f"OVERALL: {'PASS' if ok else 'FAIL'}")
    if not SMOKE:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "gibbs_kernel_exchange.txt")
        with open(path, "w") as f:
            f.write("\n".join(LINES) + "\n")
    assert ok


if __name__ == "__main__":
    main()
