"""In-kernel muVT exchange validation on real TPU (mega="full").

The round-3 mega kernel runs grand-canonical insertions/deletions
INSIDE the Pallas call (ops/pallas/sweep_kernel.py: per-chain dynamic
slot selection by one-hot reductions, Shoemake trial orientations from
the on-core PRNG, log-space acceptance) — this artifact gates the
SAMPLED DISTRIBUTION of that path, which CPU interpret-mode tests
cannot (the interpreter PRNG returns zeros; they gate bookkeeping
only).

Three segments:
  1. IDEAL RIGID ROTOR (eps = q = 0): N must be Poisson(zV) — mean and
     variance/mean, a closed-form anchor straight through the kernel's
     slot selection, Shoemake sampler, and acceptance logic.
  2. SPC/E WATER cross-path: <N> from the fully in-kernel sampler vs
     the hybrid sampler (kernel sweeps + jnp exchange scan, the
     round-2 validated path) at the supercritical state point of
     docs/validation/gcmc_water.txt (T = 1000 K, z = 2.5e-3, box 20,
     capacity 96; the committed two-ensemble artifact measured
     <N> = 27.72 there).  Different exchange implementations, same
     distribution.
  3. THROUGHPUT: cycles/s of both paths at the same configuration —
     the point of the in-kernel path (the jnp exchange scan carried
     ~95% of the hybrid cycle wall time, docs/perf.md).

Run: `python docs/validation/run_gcmc_kernel_exchange.py` (TPU, ~8 min).
Writes docs/validation/gcmc_kernel_exchange.txt.

Reference counterpart: the exchange algorithm extends the reference's
NVT-only hot loop (/root/reference/Ewald/main.jl:490-639) to the muVT
ensemble; the acceptance rules are Frenkel & Smit ch. 5.6.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from metropolismontecarlo_tpu.mc.gcmc_mol import MolGCMC
from metropolismontecarlo_tpu.models.polyatomic import triatomic_system
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_system

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "gcmc_kernel_exchange.txt")


def n_samples(g, st, blocks, steps, drift_tol=2e-2, sfac_tol=1e-4):
    """Per-block chain-mean N samples; gates the tight invariant
    (carried structure factors) every block."""
    out = []
    for _ in range(blocks):
        st, stats = g.run_block(st, steps)
        assert stats["sfac_err_max"] < sfac_tol, stats
        assert stats["drift_max_rel"] < drift_tol, stats
        out.append(stats["n_mean"])
    return st, np.asarray(out)


def main():
    t_all = time.time()
    dev = jax.devices()[0]
    lines = [f"in-kernel muVT exchange validation, {dev.device_kind}",
             ""]
    ok = True

    # ---- 1. ideal rigid rotor: N ~ Poisson(zV) ------------------------
    cap, box, z = 64, 8.0, 0.039     # zV = 19.97, capacity 6 sigma up
    zv = z * box**3
    params = RunParams(temperature=1.5, r_cut=2.5, cutoff_mode="site",
                       coulomb="none", p_translate=0.5, dr_max=1.0,
                       dphi_max=1.0, use_lrc=False,
                       strict_min_image=False)
    g = MolGCMC(triatomic_system(cap, eps=0.0), params, activity=z,
                p_exchange=0.5, dtype=jnp.float32, mega="full")
    st = g.init(jax.random.PRNGKey(3), box=box, n_init=10, n_chains=512)
    apc = cap + max(1, round(cap * 0.5 / 0.5))
    st, _ = g.run_block(st, 10 * apc)                       # equilibrate
    ns = []
    for _ in range(8):
        st, stats = g.run_block(st, 10 * apc, drift_tol=1e-3)
        n = np.asarray(jnp.sum(st.active, axis=1), np.float64)
        ns.append(n)
    ns = np.concatenate(ns)
    mean, var = ns.mean(), ns.var()
    sem = ns.std() / np.sqrt(len(ns) / 4.0)   # ~4 correlated samples
    p1 = abs(mean - zv) < max(4.0 * sem, 0.3) and abs(var / mean - 1.0) < 0.1
    ok &= p1
    lines += [
        "1. ideal rigid rotor through the in-kernel exchange path:",
        f"   z V = {zv:.3f}, capacity {cap}, 512 chains x 8 blocks",
        f"   <N> = {mean:.3f} +/- {sem:.3f} (Poisson mean {zv:.3f}), "
        f"var/mean = {var / mean:.4f} (Poisson: 1)",
        f"   {'PASS' if p1 else 'FAIL'}", ""]
    print(lines[-4], lines[-3], lines[-2], flush=True)

    # ---- 1a. per-chain ACTIVITY LADDER through the kernel --------------
    # three z-rungs in one compiled run: each chain must be Poisson at
    # ITS OWN zV (z enters the kernel as a per-chain column)
    from metropolismontecarlo_tpu.mc.gcmc_mol import make_gcmc_mol

    zs_l = np.array([0.02, 0.04, 0.06])
    C_l = 384
    z_ladder = np.repeat(zs_l, C_l // 3)
    init_l, run_l, _ = make_gcmc_mol(
        triatomic_system(cap, eps=0.0), params, z_ladder, 0.5,
        jnp.float32, mega="full")
    stl = init_l(jax.random.PRNGKey(2), box, 10, C_l)
    stl = run_l(stl, 10 * apc)
    nsl = []
    for _ in range(8):
        stl = run_l(stl, 10 * apc)
        nsl.append(np.asarray(jnp.sum(stl.active, 1), np.float64))
    nsl = np.stack(nsl)
    p1a = True
    lad = []
    for r, zr in enumerate(zs_l):
        sl = nsl[:, r * (C_l // 3):(r + 1) * (C_l // 3)].ravel()
        zv_r = zr * box**3
        sem_r = sl.std() / np.sqrt(len(sl) / 4.0)
        p1a &= abs(sl.mean() - zv_r) < max(4.0 * sem_r, 0.35)
        p1a &= abs(sl.var() / sl.mean() - 1.0) < 0.12
        lad.append(f"z={zr}: <N> {sl.mean():.3f} vs zV {zv_r:.3f} "
                   f"(var/mean {sl.var() / sl.mean():.4f})")
    ok &= p1a
    lines += ["1a. per-chain activity ladder (3 rungs, one compile):",
              "   " + "; ".join(lad),
              f"   {'PASS' if p1a else 'FAIL'}", ""]
    print(lines[-3], lines[-2], flush=True)

    # ---- 1b. binary ideal species: independent Poissons ---------------
    # two species blocks, each with its own in-kernel exchange attempts
    # appended to its own kernel call (global slot ids, block-relative
    # atom columns, threaded activity planes)
    from metropolismontecarlo_tpu.mc.gcmc_binary import BinaryGCMC
    from metropolismontecarlo_tpu.models.system import System

    cap2, box2 = 48, 7.0
    z2 = (0.04, 0.02)
    M2 = 2 * cap2
    sysb = System(
        n_mol=M2, atoms_per_mol=1, body=np.zeros((M2, 1, 3)),
        masses=np.ones((M2, 1)), charges=np.zeros((M2, 1)),
        type_ids=np.concatenate([np.zeros((cap2, 1), np.int32),
                                 np.ones((cap2, 1), np.int32)]),
        eps_table=np.zeros((2, 2)), sig_table=np.ones((2, 2)),
        name="ideal2", species=(("A", cap2, 1), ("B", cap2, 1)))
    gb = BinaryGCMC(sysb, RunParams(
        temperature=1.5, r_cut=2.5, cutoff_mode="site", coulomb="none",
        p_translate=0.5, dr_max=1.0, use_lrc=False,
        strict_min_image=False), activities=z2, p_exchange=0.5,
        dtype=jnp.float32, mega="full")
    stb = gb.init(jax.random.PRNGKey(5), box=box2, n_init=(8, 8),
                  n_chains=512)
    apc2 = M2 + 2 * max(1, round(M2 * 0.5 / 0.5 / 2))
    stb, _ = gb.run_block(stb, 8 * apc2)
    n0s, n1s = [], []
    for _ in range(6):
        stb, _ = gb.run_block(stb, 8 * apc2, drift_tol=1e-3)
        n0s.append(np.asarray(jnp.sum(stb.active0, 1), np.float64))
        n1s.append(np.asarray(jnp.sum(stb.active1, 1), np.float64))
    n0s, n1s = np.concatenate(n0s), np.concatenate(n1s)
    zv0, zv1 = z2[0] * box2**3, z2[1] * box2**3
    cov = np.mean((n0s - n0s.mean()) * (n1s - n1s.mean()))
    p1b = (abs(n0s.mean() - zv0) < 0.35 and abs(n1s.mean() - zv1) < 0.3
           and abs(n0s.var() / n0s.mean() - 1.0) < 0.1
           and abs(n1s.var() / n1s.mean() - 1.0) < 0.1
           and abs(cov) < 0.4)
    ok &= p1b
    lines += [
        "1b. binary ideal species (per-block in-kernel exchanges):",
        f"   <N0> = {n0s.mean():.3f} (zV {zv0:.3f}), var/mean = "
        f"{n0s.var() / n0s.mean():.4f}; <N1> = {n1s.mean():.3f} "
        f"(zV {zv1:.3f}), var/mean = {n1s.var() / n1s.mean():.4f}; "
        f"cov = {cov:+.4f} (independent: 0)",
        f"   {'PASS' if p1b else 'FAIL'}", ""]
    print(lines[-3], lines[-2], flush=True)

    # ---- 2. SPC/E water: in-kernel vs hybrid exchanges ----------------
    T, box, z, cap = 1000.0, 20.0, 2.5e-3, 96
    params = RunParams(temperature=T, r_cut=10.0, cutoff_mode="site",
                       coulomb="ewald", p_translate=0.5, dr_max=0.6,
                       dphi_max=0.8, use_lrc=False, strict_min_image=False)
    apc = cap + max(1, round(cap * 0.4 / 0.6))
    res = {}
    for name, mode in (("kernel", "full"), ("hybrid", True)):
        g = MolGCMC(spce_system(cap), params, activity=z, p_exchange=0.4,
                    dtype=jnp.float32, mega=mode)
        st = g.init(jax.random.PRNGKey(7), box=box, n_init=24,
                    n_chains=256)
        st, _ = g.run_block(st, 20 * apc)                   # equilibrate
        t0 = time.time()
        st, trace = n_samples(g, st, blocks=16, steps=15 * apc)
        dt = time.time() - t0
        sem = trace.std(ddof=1) / np.sqrt(len(trace))
        res[name] = (trace.mean(), sem, 16 * 15 / dt, st)
        lines += [f"2. SPC/E {name}: <N> = {trace.mean():.3f} +/- "
                  f"{sem:.3f}, trace "
                  + " ".join(f"{v:.2f}" for v in trace)]
        print(lines[-1], flush=True)
    dn = res["kernel"][0] - res["hybrid"][0]
    tol = 4.0 * np.hypot(res["kernel"][1], res["hybrid"][1])
    p2 = abs(dn) < max(tol, 0.5)
    # absolute anchor: the committed two-ensemble artifact measured
    # <N> = 27.72 at this state point (gcmc_water.txt)
    p2b = abs(res["kernel"][0] - 27.72) < 1.5
    ok &= p2 and p2b
    lines += [
        f"   kernel - hybrid = {dn:+.3f} (tol {max(tol, 0.5):.3f}): "
        f"{'PASS' if p2 else 'FAIL'}",
        f"   vs committed gcmc_water.txt <N> = 27.72: "
        f"{res['kernel'][0] - 27.72:+.3f} (tol 1.5): "
        f"{'PASS' if p2b else 'FAIL'}", ""]
    print(lines[-3], lines[-2], flush=True)

    # ---- 3. throughput -------------------------------------------------
    sk, sh = res["kernel"][2], res["hybrid"][2]
    lines += [
        "3. throughput at the same configuration (256 chains, cap 96):",
        f"   in-kernel {sk:.2f} blocks/s vs hybrid {sh:.2f} blocks/s "
        f"= {sk / sh:.1f}x", ""]
    print(lines[-2], flush=True)

    lines += [f"RESULT: {'PASS' if ok else 'FAIL'}",
              f"wall time: {time.time() - t_all:.0f} s"]
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-2:]))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
