"""In-kernel Widom insertion validation on real TPU.

The round-3 mega kernel can evaluate Widom GHOST insertions inside the
Pallas call (ops/pallas/sweep_kernel.py n_widom: the in-kernel exchange
evaluator with the state writes removed, depositing
sum exp(-beta dU_ins) per chain).  CPU interpret-mode tests pin the
ghost ENERGY to the jnp pose evaluator at a deterministic pose
(tests/test_widom.py::test_widom_mega_kernel_matches_pose_eval_water);
this artifact gates what they cannot — the SAMPLED estimator through
the on-core PRNG's pose measure — and records the throughput case for
the kernel path.

Segments:
  0. NIST golden anchor: the SPC/E reference configuration's Ewald
     energy breakdown on this device (the correctness anchor of
     tests/test_nist_golden.py, re-driven end-to-end here).
  1. KERNEL vs JNP mu_ex: one equilibrated SPC/E NVT trajectory,
     alternating measurement phases — widom_mega (kernel sweeps +
     in-kernel ghosts) and make_widom_fn's widom_sample (jnp ghost
     grid on the same states).  Independent pose streams, same
     stationary ensemble: the two beta*mu_ex estimates must agree
     within combined error bars.
  2. THROUGHPUT: wall time per (sweep + n_g ghosts) on both paths.

Run: `python docs/validation/run_widom_kernel.py` (TPU, ~4 min).
Writes docs/validation/widom_kernel.txt.

Reference counterpart: none (the reference is NVT-only with no
free-energy machinery); the estimator is Widom 1963 / Frenkel & Smit
ch. 7, and dU matches the sampled model exactly (mc/widom.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.mc.widom import make_mega_widom_fn, make_widom_fn
from metropolismontecarlo_tpu.io.configs import cubic_lattice
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_system, spce_from_nist
from metropolismontecarlo_tpu.models.energy import energy_breakdown_jit
from metropolismontecarlo_tpu.ops.ewald import make_kvectors

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "widom_kernel.txt")
NIST = "/root/reference/Ewald/spce_sample_config_periodic1.txt"


def main():
    t_all = time.time()
    dev = jax.devices()[0]
    lines = [f"in-kernel Widom insertion validation, {dev.device_kind}", ""]
    ok = True

    def note(msg):
        print(f"[{time.time() - t_all:7.1f}s] {msg}", flush=True)

    # ---- 0. NIST golden anchor (end-to-end drive) ---------------------
    note("segment 0: NIST golden")
    sys_n, coords_n, com_n, box_n = spce_from_nist(NIST)
    kv_n, kw_n = make_kvectors(5, 27)
    out = energy_breakdown_jit(
        sys_n, RunParams(cutoff_mode="site", coulomb="ewald"),
        coords_n, com_n, box_n, kv_n, kw_n)
    tot = float(out["total"])
    gold = -4.88596e5          # NIST SRSW config 1 (print-precision)
    nist_ok = abs(tot - gold) / abs(gold) < 5e-5
    ok &= nist_ok
    lines += ["[0] NIST golden anchor (config 1)",
              f"    total = {tot:.6e} K  vs  {gold:.6e} K  "
              f"[{'PASS' if nist_ok else 'FAIL'}]", ""]

    # ---- 1. kernel vs jnp Widom mu_ex on one NVT trajectory -----------
    n_mol, box, temp = 96, 16.0, 600.0      # 0.70 g/cc liquid-ish water
    C, n_g = 256, 32
    eq_sweeps, blocks, sweeps_pb = 300, 16, 10
    params = RunParams(temperature=temp, r_cut=6.0, cutoff_mode="site",
                       coulomb="ewald", dr_max=0.35, dphi_max=0.45,
                       p_translate=0.5)
    system = spce_system(n_mol)
    mc = MonteCarlo(system, params, dtype=jnp.float32)
    state = mc.init_state(jax.random.PRNGKey(0), cubic_lattice(n_mol, box),
                          box=box, n_chains=C)
    note("segment 1: equilibrating")
    t0 = time.time()
    state = mc.run_steps(state, eq_sweeps, True)
    state.energy.block_until_ready()
    lines += [f"[1] SPC/E NVT: {n_mol} waters, box {box}, T {temp} K, "
              f"{C} chains ({mc.pallas_mode} path)",
              f"    equilibration: {eq_sweeps} sweeps, "
              f"{time.time() - t0:.1f} s"]

    widom_mega = make_mega_widom_fn(system, params, mc.kvecs, mc.kweights,
                                    n_g)
    _, widom_sample = make_widom_fn(system, params, mc.kvecs, mc.kweights)

    # kernel phase: blocks x sweeps, n_g in-kernel ghosts per sweep
    note("kernel Widom phase")
    # streams are step-seeded inside widom_mega (disjoint from the
    # equilibration sweeps' streams by the shared step counter)
    bk = []
    t0 = time.time()
    for b in range(blocks):
        acc = 0.0
        for s in range(sweeps_pb):
            state, bmean = widom_mega(state)
            acc = acc + bmean
        bk.append(float(jnp.mean(acc)) / sweeps_pb)
    jax.block_until_ready(state.energy)
    t_kernel = time.time() - t0
    bk = np.asarray(bk)

    note("jnp Widom phase")
    # jnp phase: same cadence on the continuing trajectory (stationary
    # ensemble; driver sweeps between samples)
    bj = []
    t0 = time.time()
    for b in range(blocks):
        acc = 0.0
        for s in range(sweeps_pb):
            state = mc.run_steps(state, 1, False)
            acc = acc + widom_sample(state, jax.random.PRNGKey(7_000 + b * sweeps_pb + s), n_g)
        bj.append(float(jnp.mean(acc)) / sweeps_pb)
    jax.block_until_ready(state.energy)
    t_jnp = time.time() - t0
    bj = np.asarray(bj)

    def mu_se(bs):
        m = bs.mean()
        se = bs.std(ddof=1) / np.sqrt(len(bs))
        return -np.log(m), se / m          # delta-method on beta*mu

    mu_k, se_k = mu_se(bk)
    mu_j, se_j = mu_se(bj)
    gap = abs(mu_k - mu_j)
    tol = 3.0 * np.hypot(se_k, se_j)
    mu_ok = bool(gap < tol)
    ok &= mu_ok
    lines += [f"    beta*mu_ex kernel: {mu_k:+.4f} +/- {se_k:.4f}   "
              f"({blocks}x{sweeps_pb} sweeps x {C} chains x {n_g} ghosts)",
              f"    beta*mu_ex jnp:    {mu_j:+.4f} +/- {se_j:.4f}",
              f"    |gap| = {gap:.4f}  <  3*combined = {tol:.4f}  "
              f"[{'PASS' if mu_ok else 'FAIL'}]", ""]

    # ---- 2. throughput -------------------------------------------------
    n_eval = blocks * sweeps_pb * C * n_g
    lines += ["[2] throughput, per (sweep + %d ghosts) x %d chains"
              % (n_g, C),
              f"    kernel path: {t_kernel / (blocks * sweeps_pb) * 1e3:8.1f}"
              f" ms/cycle  ({n_eval / t_kernel:,.0f} ghost evals/s"
              " incl. sweeps)",
              f"    jnp path:    {t_jnp / (blocks * sweeps_pb) * 1e3:8.1f}"
              f" ms/cycle  ({n_eval / t_jnp:,.0f} ghost evals/s"
              " incl. sweeps)",
              f"    speedup: {t_jnp / t_kernel:.1f}x", ""]

    lines += [f"total wall: {time.time() - t_all:.0f} s",
              f"OVERALL: {'PASS' if ok else 'FAIL'}"]
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
