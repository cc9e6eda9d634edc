"""Headline benchmark: SPC/E 750-water Ewald NVT MC sweeps/sec (aggregate
over parallel chains) vs the reference's ~2.8 sweeps/s serial-Julia figure
(`Ewald/readme.md:28`; BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_from_nist

BASELINE_SWEEPS_PER_SEC = 2.8  # serial Julia, 1 CPU core


def main():
    n_chains = int(os.environ.get("BENCH_CHAINS", "512"))
    n_steps = int(os.environ.get("BENCH_STEPS", "2"))
    path = "/root/reference/Ewald/coord750.txt"
    if not os.path.exists(path):
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "coord750.txt")

    system, coords, com, box = spce_from_nist(path)
    params = RunParams(
        temperature=298.15, r_cut=10.0, cutoff_mode="site", coulomb="ewald",
        p_translate=0.5, dr_max=0.3, dphi_max=0.3,
    )
    mc = MonteCarlo(system, params, dtype=jnp.float32, recompute_chunk=4)
    state = mc.init_from_coords(jax.random.PRNGKey(0), coords, com, box,
                                n_chains=n_chains)

    # warmup & compile (same static n_steps as the timed call)
    warm = mc.run_steps(state, n_steps, False)
    jax.block_until_ready(warm.energy)

    t0 = time.perf_counter()
    state = mc.run_steps(state, n_steps, False)
    jax.block_until_ready(state.energy)
    dt = time.perf_counter() - t0

    sweeps_per_sec = n_chains * n_steps / dt
    print(json.dumps({
        "metric": "MC sweeps/sec/chip (SPC/E 750-water Ewald NVT, "
                  f"{n_chains} chains, f32)",
        "value": round(sweeps_per_sec, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_sec / BASELINE_SWEEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
