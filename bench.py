"""Headline benchmark: SPC/E 750-water Ewald NVT MC sweeps/sec (aggregate
over parallel chains) vs the reference's ~2.8 sweeps/s serial-Julia figure
(`Ewald/readme.md:28`; BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Variants via BENCH_CONFIG: spce (default) | wolf | lj | triatomic |
npt | mixture — the other BASELINE.json configurations — plus gcmc and
tmmc (molecular muVT water through the activity-masked mega kernel;
sweep-equivalents/s = displacement+exchange attempts normalized by the
slot capacity, comparable to the NVT sweeps/s), gibbs (two-box
molecular Gibbs water; mega="full" runs transfers in-kernel on the
round-4 both-boxes-in-one-row layout, BENCH_MEGA=hybrid the round-3
folded-sweep + jnp-transfer path) and semigrand (two-species water,
identity flips in-kernel via the flip kernel).  BENCH_CHAINS and
BENCH_STEPS control scale.  The JSON line records every knob that
affects the number (config/chains/steps/dtype), so each record in
docs/perf.md reproduces by copy-pasting one command; "first_call_s"
records the COLD-START wall of the warmup call (compile + first
execution — ~10-25 s for the mega="full" exchange kernels on a cold
Mosaic cache, 1-2 s warm; the minutes-long first-invocation walls
observed in round 3 were axon-tunnel DEVICE ACQUISITION, which happens
before this timer — see docs/perf.md cold-start section).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache (same default as the validation runners):
# first_call_s records the true cold compile wall only on a fresh
# cache; warm re-invocations recompile nothing.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MMC_CACHE", "/tmp/mmc_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metropolismontecarlo_tpu.io.configs import cubic_lattice
from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.models.system import RunParams

BASELINE_SWEEPS_PER_SEC = 2.8  # serial Julia, 1 CPU core
REF = "/root/reference"


def _setup(config, n_chains):
    key = jax.random.PRNGKey(0)
    if config in ("spce", "wolf"):
        from metropolismontecarlo_tpu.models.water import spce_from_nist
        system, coords, com, box = spce_from_nist(
            os.path.join(REF, "Ewald", "coord750.txt"))
        params = RunParams(temperature=298.15, r_cut=10.0, cutoff_mode="site",
                           coulomb="ewald" if config == "spce" else "wolf",
                           p_translate=0.5, dr_max=0.3, dphi_max=0.3)
        mc = MonteCarlo(system, params, dtype=jnp.float32, recompute_chunk="auto")
        state = mc.init_from_coords(key, coords, com, box, n_chains=n_chains)
        label = f"SPC/E 750-water {params.coulomb.capitalize()} NVT"
    elif config == "lj":
        from metropolismontecarlo_tpu.models.monatomic import (
            lj_box_for_density, lj_system)
        n = 256
        box = lj_box_for_density(n, 0.75)
        params = RunParams(temperature=1.0, r_cut=2.5, cutoff_mode="site",
                           coulomb="none", p_translate=1.0, dr_max=box / 30)
        mc = MonteCarlo(lj_system(n), params, dtype=jnp.float32)
        state = mc.init_state(key, cubic_lattice(n, box), box=box,
                              n_chains=n_chains)
        label = "256-atom LJ fluid NVT"
    elif config == "triatomic":
        from metropolismontecarlo_tpu.io.configs import read_cnf
        from metropolismontecarlo_tpu.models.polyatomic import (
            mossa_params, triatomic_system)
        com, quat, box = read_cnf(os.path.join(REF, "Poly", "cnf_input.inp"))
        params = mossa_params()
        mc = MonteCarlo(triatomic_system(256), params, dtype=jnp.float32)
        state = mc.init_state(key, (com + box / 2.0) % box, quat=quat,
                              box=box, n_chains=n_chains)
        label = "256-triatomic Mossa LJ NVT"
    elif config == "npt":
        # BASELINE config #4: SPC/E NPT with volume-change moves + full
        # recompute (the reference's volumeChange.jl path — dead
        # pseudocode there, implemented for real here), 1 bar
        from metropolismontecarlo_tpu.models.water import spce_from_nist
        system, coords, com, box = spce_from_nist(
            os.path.join(REF, "Ewald", "coord750.txt"))
        p_bar = 1.0e5 / 1.380649e-23 * 1e-30      # 1 bar in K/A^3
        params = RunParams(temperature=298.15, r_cut=10.0,
                           cutoff_mode="site", coulomb="ewald",
                           p_translate=0.5, dr_max=0.3, dphi_max=0.3,
                           pressure=p_bar, p_volume=0.05, dv_max=0.01)
        mc = MonteCarlo(system, params, dtype=jnp.float32, recompute_chunk="auto")
        state = mc.init_from_coords(key, coords, com, box, n_chains=n_chains)
        label = "SPC/E 750-water Ewald NPT (1 bar)"
    elif config == "mixture":
        from metropolismontecarlo_tpu.io.topology import read_top
        from metropolismontecarlo_tpu.models.from_topology import (
            system_from_topology, templates_from_pdbs)
        top = read_top(os.path.join(REF, "topol.top"))
        templates = templates_from_pdbs(top, {
            "MEA_DUMMY": os.path.join(REF, "mea.pdb"),
            "SOL": os.path.join(REF, "tip3p.pdb")})
        system = system_from_topology(
            top, templates, molecules=[("MEA_DUMMY", 100), ("SOL", 1900)])
        params = RunParams(temperature=298.15, r_cut=10.0, cutoff_mode="site",
                           coulomb="ewald", p_translate=0.5, dr_max=0.25,
                           dphi_max=0.25)
        box = (system.n_mol / 0.004) ** (1.0 / 3.0)
        mc = MonteCarlo(system, params, dtype=jnp.float32,
                        recompute_chunk="auto")
        state = mc.init_state(key, cubic_lattice(system.n_mol, box),
                              box=box, n_chains=n_chains)
        label = "MEA+TIP3P 2000-molecule Ewald NVT"
    else:
        raise SystemExit(f"unknown BENCH_CONFIG {config!r}")
    return mc, state, label


def _setup_muvt(config, n_chains):
    """Molecular muVT water through the mega kernel (gcmc) or its TMMC
    flat-histogram variant (tmmc).  One timed unit = one CYCLE of cap
    displacement/rotation attempts + x_per exchange attempts;
    sweep-equivalents = (cap + x_per) / cap per cycle, so the number is
    comparable to the NVT sweeps/s records.  BENCH_MEGA selects the
    composition: "full" (default; exchanges run IN-KERNEL —
    ops/pallas/sweep_kernel.py n_exch, validated by
    docs/validation/gcmc_kernel_exchange.txt) or "hybrid" (kernel
    sweeps + the jnp exchange scan, the round-2 path)."""
    from metropolismontecarlo_tpu.mc.gcmc_mol import make_gcmc_mol
    from metropolismontecarlo_tpu.models.water import spce_system

    mega_mode = os.environ.get("BENCH_MEGA", "full")
    mega = {"full": "full", "hybrid": True}[mega_mode]
    cap, box, px = 128, 16.0, 0.3
    system = spce_system(cap)
    params = RunParams(temperature=500.0, r_cut=6.0, cutoff_mode="site",
                       coulomb="ewald", nk=5, ksq_max=27, p_translate=0.5,
                       dr_max=0.4, dphi_max=0.4, use_lrc=False,
                       strict_min_image=False)
    tmmc = config == "tmmc"
    init, run_steps, _ = make_gcmc_mol(
        system, params, activity=2.2e-4, p_exchange=px,
        dtype=jnp.float32, mega=mega, tmmc=tmmc)
    state = init(jax.random.PRNGKey(0), box=box, n_init=cap // 2,
                 n_chains=n_chains)
    x_per = max(1, int(round(cap * px / (1.0 - px))))
    sweeps_per_cycle = (cap + x_per) / cap
    attempts_per_cycle = cap + x_per
    label = (f"SPC/E muVT{' TMMC' if tmmc else ''} cap-{cap} "
             f"{mega_mode}-mega-kernel, z=2.2e-4, p_exchange={px}")

    if tmmc:
        eta = jnp.zeros(cap + 1, jnp.float32)

        def run(state, n_cycles):
            state, cmat, uhist = run_steps(state, eta,
                                           n_cycles * attempts_per_cycle)
            return state
    else:
        def run(state, n_cycles):
            return run_steps(state, n_cycles * attempts_per_cycle)

    return run, state, label, sweeps_per_cycle


def _setup_gibbs(n_chains):
    """Two-box molecular Gibbs water.  One timed unit = one CYCLE of
    [2*cap displacement/rotation attempts + x_per transfer attempts];
    sweep-equivalents = (2*cap + x_per) / cap per cycle (cap = per-box
    slot capacity), comparable to the muVT records.  BENCH_MEGA:
    "full" (default; transfers IN-KERNEL on the both-boxes-in-one-row
    layout, ops/pallas/gibbs_kernel.py) or "hybrid" (round-3 path:
    folded kernel sweeps + the jnp transfer scan)."""
    from metropolismontecarlo_tpu.mc.gibbs_mol import make_gibbs_mol
    from metropolismontecarlo_tpu.models.water import spce_system
    from metropolismontecarlo_tpu.ops.ewald import tune_parameters

    mega_mode = os.environ.get("BENCH_MEGA", "full")
    mega = {"full": "full", "hybrid": True}[mega_mode]
    cap, px = 128, 0.3
    n_l, n_v = (2 * cap) // 3, cap // 6
    box_l = (n_l / 0.0267) ** (1.0 / 3.0)     # ~0.80 g/cc
    box_v = 18.0                              # dense vapor: K stays
    # modest (tuned Ewald K grows ~ (kappa*L)^3; the 0.015 g/cc
    # artifact box would need K ~ 6000)
    r_cut = min(7.5, 0.45 * box_l)
    # tune at the largest volume-exchange-reachable box, (V_l+V_v)^(1/3)
    # (one box absorbing all volume) — the box-consistency bound the
    # repo documents for truncated multi-box models; 1.15*box_v = 20.7 A
    # was marginally UNDER that bound (20.8 A)
    box_max = (box_l**3 + box_v**3) ** (1.0 / 3.0)
    kl, nk, ksq = tune_parameters(box_max, r_cut, 1e-3)
    params = RunParams(temperature=450.0, r_cut=r_cut, cutoff_mode="site",
                       coulomb="ewald", kappa_L=kl, nk=nk, ksq_max=ksq,
                       p_translate=0.5, dr_max=0.3, dphi_max=0.4,
                       p_volume=0.002, use_lrc=False,
                       strict_min_image=False)
    init, run_steps = make_gibbs_mol(
        spce_system(cap), params, dv_max=0.03, p_transfer=px,
        dtype=jnp.float32, mega=mega)[:2]
    state = init(jax.random.PRNGKey(0), boxes=(box_l, box_v),
                 n_init=(n_l, n_v), n_chains=n_chains)
    x_per = max(1, int(round(2 * cap * px / (1.0 - px))))
    attempts_per_cycle = 2 * cap + x_per
    label = (f"SPC/E Gibbs cap-{cap}x2 {mega_mode}-mega-kernel, "
             f"p_transfer={px}")

    def run(state, n_cycles):
        return run_steps(state, n_cycles * attempts_per_cycle)

    return run, state, label, attempts_per_cycle / cap


def _setup_semigrand(n_chains):
    """Two-species semigrand water (identical SPC/E blocks, fugacity
    ratio 2).  One timed unit = one CYCLE of [M displacement/rotation
    attempts + x_per identity-flip attempts] (M = total slot capacity);
    sweep-equivalents = (M + x_per) / M per cycle.  BENCH_MEGA: "full"
    (default; flips IN-KERNEL — ops/pallas/flip_kernel.py) or "hybrid"
    (round-3 path: kernel sweeps + the jnp flip scan, n_orient=1)."""
    from metropolismontecarlo_tpu.mc.semigrand import make_semigrand
    from metropolismontecarlo_tpu.models.system import System
    from metropolismontecarlo_tpu.models.water import spce_system

    mega_mode = os.environ.get("BENCH_MEGA", "full")
    mega = {"full": "full", "hybrid": True}[mega_mode]
    cap, px = 64, 0.3
    w = spce_system(2 * cap)
    system = System(n_mol=2 * cap, atoms_per_mol=3, body=w.body,
                    masses=w.masses, charges=w.charges,
                    type_ids=w.type_ids, eps_table=w.eps_table,
                    sig_table=w.sig_table, name="sg-spce",
                    species=(("wA", cap, 3), ("wB", cap, 3)))
    params = RunParams(temperature=600.0, r_cut=8.0, cutoff_mode="site",
                       coulomb="ewald", use_lrc=False, p_translate=0.5,
                       dr_max=1.0, dphi_max=0.7, strict_min_image=False)
    init, run_steps = make_semigrand(
        system, params, fugacity_ratio=2.0, p_flip=px,
        dtype=jnp.float32, mega=mega)[:2]
    state = init(jax.random.PRNGKey(0), box=20.0, n_a=32, n_b=32,
                 n_chains=n_chains)
    M = 2 * cap
    x_per = max(1, int(round(M * px / (1.0 - px))))
    attempts_per_cycle = M + x_per
    label = (f"SPC/E semigrand cap-{cap}+{cap} {mega_mode}-mega-kernel, "
             f"xi=2, p_flip={px}")

    def run(state, n_cycles):
        return run_steps(state, n_cycles * attempts_per_cycle)

    return run, state, label, attempts_per_cycle / M


def main():
    config = os.environ.get("BENCH_CONFIG", "spce")
    default_chains = {"mixture": 256, "gcmc": 1024, "tmmc": 1024,
                      "gibbs": 1024, "semigrand": 1024}.get(config, 2048)
    n_chains = int(os.environ.get("BENCH_CHAINS", str(default_chains)))
    # npt: the timed window must cover one full volume-attempt period
    # (round(1/p_volume) = 20 sweeps) or the O(A^2) volume recompute is
    # never paid and the number is NVT in disguise.  lj: per-call launch
    # overhead dominates 2-step windows on a 70k+ sweeps/s config — time
    # a 50-sweep window (the steady-state regime users actually run).
    # exchange-cycle configs: 16 cycles puts the timed window at
    # ~0.4-2 s — the 4-cycle (~0.1 s) windows showed +-(5-10)%
    # run-to-run variance (docs/perf.md cold-start section)
    default_steps = {"npt": 20, "lj": 50, "triatomic": 20, "gcmc": 16,
                     "tmmc": 16, "gibbs": 16,
                     "semigrand": 16}.get(config, 2)
    n_steps = int(os.environ.get("BENCH_STEPS", str(default_steps)))

    if config == "gibbs":
        run, state, label, sweeps_per_unit = _setup_gibbs(n_chains)
    elif config == "semigrand":
        run, state, label, sweeps_per_unit = _setup_semigrand(n_chains)
    elif config in ("gcmc", "tmmc"):
        run, state, label, sweeps_per_unit = _setup_muvt(config, n_chains)
    else:
        mc, state, label = _setup(config, n_chains)
        sweeps_per_unit = 1.0

        def run(state, n_steps):
            return mc.run_steps(state, n_steps, False)

    # warmup & compile (same static n_steps as the timed call); its
    # wall is the compile + first-execution cost (first_call_s) — the
    # per-process device-acquisition wall (up to minutes, tunnel-state
    # dependent) is paid earlier, at the first device op
    t_c0 = time.perf_counter()
    warm = run(state, n_steps)
    jax.block_until_ready(warm.energy)
    first_call_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    state = run(state, n_steps)
    jax.block_until_ready(state.energy)
    dt = time.perf_counter() - t0

    sweeps_per_sec = n_chains * n_steps * sweeps_per_unit / dt
    rec = {
        "metric": f"MC sweeps/sec/chip ({label}, {n_chains} chains, f32)",
        "value": round(sweeps_per_sec, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_sec / BASELINE_SWEEPS_PER_SEC, 1),
        "config": config,
        "chains": n_chains,
        "steps": n_steps,
        "dtype": "float32",
        "first_call_s": round(first_call_s, 1),
        "command": (f"BENCH_CONFIG={config} BENCH_CHAINS={n_chains} "
                    f"BENCH_STEPS={n_steps} python bench.py"),
    }
    if config in ("gcmc", "tmmc", "gibbs", "semigrand"):
        mega_mode = os.environ.get("BENCH_MEGA", "full")
        rec["mega"] = mega_mode
        rec["command"] = (f"BENCH_CONFIG={config} BENCH_MEGA={mega_mode} "
                          f"BENCH_CHAINS={n_chains} BENCH_STEPS={n_steps} "
                          "python bench.py")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
