"""Semigrand flip-acceptance validation on real TPU: the interacting-
identical-species Binomial closed form.

Two species blocks that are PHYSICALLY IDENTICAL (both SPC/E water,
full Ewald) sampled semigrand at fugacity ratio xi: relabeling cannot
change the physics, so the composition is EXACTLY

    N_B ~ Binomial(N_tot, xi / (1 + xi))

at ANY interaction strength — mean and variance in closed form with no
reference implementation in the loop.  This validates the identity-flip
acceptance rule (incl. the Rosenbluth orientational bias and the
carried structure-factor updates) on the compiled TPU path in f32 —
BOTH the jnp flip path (n_orient=4 Rosenbluth) and, since round 4, the
fully IN-KERNEL flip path (mega="full", ops/pallas/flip_kernel.py)
against the same closed form.

Run: `python docs/validation/run_semigrand_binomial.py` (TPU, ~6 min).
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
    p = XI / (1.0 + XI)
    t0 = time.time()
    lines = [
        "semigrand identity-flip validation: interacting identical species",
        f"device: {dev.device_kind}, f32",
        f"system: 2 x SPC/E blocks, N_tot = {N_TOT}, box 20 A, 600 K, "
        f"full Ewald, xi = {XI}",
        f"closed form Binomial(N, xi/(1+xi)): mean {N_TOT * p:.3f}, "
        f"var {N_TOT * p * (1 - p):.3f}",
    ]
    all_ok = True
    for seg, (mega, n_or, chains) in (
            ("jnp Rosenbluth n_orient=4", (None, 4, N_CHAINS)),
            ("IN-KERNEL flips (mega='full')", ("full", 1, N_CHAINS)),
    ):
        g = Semigrand(water_two_blocks(CAPS, CAPS), params,
                      fugacity_ratio=XI, p_flip=0.5, dtype=jnp.float32,
                      n_orient=n_or, mega=mega)
        st = g.init(jax.random.PRNGKey(3), box=20.0, n_a=8, n_b=8,
                    n_chains=chains)
        for _ in range(EQUIL_BLOCKS):
            st, stats = g.run_block(st, STEPS)
        means, varis, worst = [], [], 0.0
        for b in range(PROD_BLOCKS):
            st, stats = g.run_block(st, STEPS)
            worst = max(worst, stats["drift_max_rel"])
            assert stats["drift_max_rel"] < 2e-3, stats
            means.append(stats["nb_mean"])
            varis.append(stats["nb_var"])
            print(f"[{seg}] prod {b}: <N_B> {stats['nb_mean']:.3f} "
                  f"var {stats['nb_var']:.3f} "
                  f"accAB {stats['acc_flip_ab']:.3f} "
                  f"drift {stats['drift_max_rel']:.1e}", flush=True)
        mean, var = float(np.mean(means)), float(np.mean(varis))
        sem = float(np.std(means) / np.sqrt(len(means)))
        ok = abs(mean - N_TOT * p) < max(0.03 * N_TOT * p, 5 * sem) \
            and abs(var - N_TOT * p * (1 - p)) < 0.2 * N_TOT * p * (1 - p)
        all_ok = all_ok and ok
        lines += [
            f"[{seg}] measured <N_B> = {mean:.3f} +- {sem:.3f}, "
            f"var = {var:.3f}, worst drift {worst:.2e} "
            f"[{'PASS' if ok else 'FAIL'}]",
        ]
    lines += [
        f"wall: {time.time() - t0:.0f} s",
        f"RESULT: {'PASS' if all_ok else 'FAIL'}",
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "semigrand_binomial.txt")
    with open(path, "w") as f:
        f.write(out)
    assert all_ok, out


if __name__ == "__main__":
    main()
