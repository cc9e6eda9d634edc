"""Semigrand flip-acceptance validation on real TPU: the interacting-
identical-species Binomial closed form.

Two species blocks that are PHYSICALLY IDENTICAL (both SPC/E water,
full Ewald) sampled semigrand at fugacity ratio xi: relabeling cannot
change the physics, so the composition is EXACTLY

    N_B ~ Binomial(N_tot, xi / (1 + xi))

at ANY interaction strength — mean and variance in closed form with no
reference implementation in the loop.  This validates the identity-flip
acceptance rule (incl. the Rosenbluth orientational bias and the
carried structure-factor updates) on the compiled TPU path in f32.

Run: `python docs/validation/run_semigrand_binomial.py` (TPU, ~4 min).
Writes docs/validation/semigrand_binomial.txt.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from metropolismontecarlo_tpu.mc.semigrand import Semigrand
from metropolismontecarlo_tpu.models.system import RunParams, System
from metropolismontecarlo_tpu.models.water import spce_system

N_TOT, XI = 16, 2.0
CAPS = 24
N_CHAINS = 256
EQUIL_BLOCKS, PROD_BLOCKS, STEPS = 3, 8, 1200


def water_two_blocks(cap_a, cap_b):
    w = spce_system(cap_a + cap_b)
    return System(n_mol=cap_a + cap_b, atoms_per_mol=3, body=w.body,
                  masses=w.masses, charges=w.charges,
                  type_ids=w.type_ids, eps_table=w.eps_table,
                  sig_table=w.sig_table, name="sg-spce",
                  species=(("wA", cap_a, 3), ("wB", cap_b, 3)))


def main():
    dev = jax.devices()[0]
    params = RunParams(temperature=600.0, r_cut=8.0, cutoff_mode="site",
                       coulomb="ewald", use_lrc=False, p_translate=0.5,
                       dr_max=1.0, dphi_max=0.7)
    g = Semigrand(water_two_blocks(CAPS, CAPS), params,
                  fugacity_ratio=XI, p_flip=0.5, dtype=jnp.float32,
                  n_orient=4)
    st = g.init(jax.random.PRNGKey(3), box=20.0, n_a=8, n_b=8,
                n_chains=N_CHAINS)
    t0 = time.time()
    for _ in range(EQUIL_BLOCKS):
        st, stats = g.run_block(st, STEPS)
    means, varis, worst = [], [], 0.0
    for b in range(PROD_BLOCKS):
        st, stats = g.run_block(st, STEPS)
        worst = max(worst, stats["drift_max_rel"])
        assert stats["drift_max_rel"] < 1e-4, stats
        means.append(stats["nb_mean"])
        varis.append(stats["nb_var"])
        print(f"prod {b}: <N_B> {stats['nb_mean']:.3f} "
              f"var {stats['nb_var']:.3f} "
              f"accAB {stats['acc_flip_ab']:.3f} "
              f"drift {stats['drift_max_rel']:.1e}")
    p = XI / (1.0 + XI)
    mean, var = float(np.mean(means)), float(np.mean(varis))
    sem = float(np.std(means) / np.sqrt(len(means)))
    ok = abs(mean - N_TOT * p) < max(0.03 * N_TOT * p, 5 * sem) \
        and abs(var - N_TOT * p * (1 - p)) < 0.2 * N_TOT * p * (1 - p)
    lines = [
        "semigrand identity-flip validation: interacting identical species",
        f"device: {dev.device_kind}, f32, n_orient = 4",
        f"system: 2 x SPC/E blocks, N_tot = {N_TOT}, box 20 A, 600 K, "
        f"full Ewald, xi = {XI}, {N_CHAINS} chains",
        f"measured <N_B> = {mean:.3f} +- {sem:.3f}, var = {var:.3f}",
        f"closed form Binomial(N, xi/(1+xi)): mean {N_TOT * p:.3f}, "
        f"var {N_TOT * p * (1 - p):.3f}",
        f"worst block drift: {worst:.2e}",
        f"wall: {time.time() - t0:.0f} s",
        f"RESULT: {'PASS' if ok else 'FAIL'}",
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "semigrand_binomial.txt")
    with open(path, "w") as f:
        f.write(out)
    assert ok, out


if __name__ == "__main__":
    main()
