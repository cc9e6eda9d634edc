"""Mega-path checkpoint/resume determinism on TPU.

The CPU suite proves exact-trajectory resume for the jax.random paths
(tests/test_io_observables.py); the mega kernel's on-core PRNG cannot
be exercised on CPU (interpreter PRNG returns zeros), so this script is
the evidence that its (step counter, chain key) seeding is resume-
stable on real hardware: 3 sweeps + checkpoint + 3 sweeps must equal 6
straight sweeps BITWISE in coords/energy/acceptance/structure factors.

Run: `python docs/validation/run_resume_mega.py` (TPU, ~2 min).
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp

from metropolismontecarlo_tpu.io.checkpoint import load_state, save_state
from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_from_nist


def main():
    sys_, coords, com, box = spce_from_nist(
        "/root/reference/Ewald/spce_sample_config_periodic1.txt")
    params = RunParams(temperature=298.15, r_cut=10.0, cutoff_mode="site",
                       coulomb="ewald", p_translate=0.5, dr_max=0.3,
                       dphi_max=0.3)
    mc = MonteCarlo(sys_, params, pallas="mega")
    st0 = mc.init_from_coords(jax.random.PRNGKey(3), coords, com, box,
                              n_chains=16)
    straight = mc.run_steps(st0, 6)
    jax.block_until_ready(straight.energy)
    mid = mc.run_steps(st0, 3)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck.npz")
        save_state(p, mid)
        out = load_state(p)
    mid2 = out[0] if isinstance(out, tuple) else out
    resumed = mc.run_steps(mid2, 3)
    jax.block_until_ready(resumed.energy)
    same = {f: bool(jnp.all(getattr(straight, f) == getattr(resumed, f)))
            for f in ("coords", "energy", "acc", "sfac")}
    print("mega resume determinism:", same)
    assert all(same.values()), same
    print("PASS: resume reproduces the straight mega trajectory bitwise")


if __name__ == "__main__":
    main()
