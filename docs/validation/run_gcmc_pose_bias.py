"""Cavity (pose) bias vs orientational bias in dense-phase molecular
GCMC (TPU).

At dense packing the bottleneck of molecular muVT is FINDING A CAVITY:
k trial orientations at one uniform position (orientational bias) all
fail together when the position lands inside a core, while k full
uniform poses (bias="pose") probe k independent positions.  This
artifact measures the insertion acceptance of the three samplers —
unbiased, orientation-biased k=8, pose-biased k=8 — at an identical
dense SPC/E state point, and gates EXACTNESS by the <N> agreement of
all three (bias may only change acceptance, never the ensemble).

Run: `python docs/validation/run_gcmc_pose_bias.py` (TPU, ~6 min).
Writes docs/validation/gcmc_pose_bias.txt.
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
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_system

T = 500.0                 # liquid branch: z > ~2e-4/A^3 condenses here
BOX = 14.0
Z = 5.0e-4                # A^-3
CAP = 128
N_INIT = 76               # ~0.83 g/cc, the 500 K liquid density
N_CHAINS = int(os.environ.get("POSE_CHAINS", 256))
EQUIL_STEPS = int(os.environ.get("POSE_EQUIL", 6000))
PROD_BLOCKS = int(os.environ.get("POSE_PROD", 6))
BLOCK_STEPS = 2000


SEEDS = {"unbiased": 101, "orient-k8": 202, "pose-k8": 303}


def run_sampler(label, n_orient, bias):
    params = RunParams(temperature=T, r_cut=6.0, cutoff_mode="site",
                       coulomb="ewald", nk=5, ksq_max=27, p_translate=0.5,
                       dr_max=0.4, dphi_max=0.6, use_lrc=False)
    g = MolGCMC(spce_system(CAP), params, activity=Z, p_exchange=0.5,
                dtype=jnp.float32, n_orient=n_orient, bias=bias)
    st = g.init(jax.random.PRNGKey(SEEDS[label]), box=BOX,
                n_init=N_INIT, n_chains=N_CHAINS)
    st, _ = g.run_block(st, EQUIL_STEPS)
    ns, acc_i, acc_d, worst = [], [], [], 0.0
    for _ in range(PROD_BLOCKS):
        st, stats = g.run_block(st, BLOCK_STEPS)
        ns.append(stats["n_mean"])
        acc_i.append(stats["acc_insert"])
        acc_d.append(stats["acc_delete"])
        worst = max(worst, stats["drift_max_rel"])
        assert stats["full_frac"] == 0.0, stats
    return (float(np.mean(ns)), float(np.std(ns) / np.sqrt(len(ns))),
            float(np.mean(acc_i)), float(np.mean(acc_d)), worst)


def main():
    dev = jax.devices()[0]
    t0 = time.time()
    rows, res = [], {}
    for label, k, bias in (("unbiased", 1, "orientation"),
                           ("orient-k8", 8, "orientation"),
                           ("pose-k8", 8, "pose")):
        res[label] = run_sampler(label, k, bias)
        n, sem, ai, ad, dr = res[label]
        rows.append(f"{label:10s}  <N> = {n:7.3f} +- {sem:.3f}   "
                    f"accI {ai:.4f}  accD {ad:.4f}  drift {dr:.1e}")
        print(rows[-1], flush=True)

    n_ref, sem_ref = res["unbiased"][0], res["unbiased"][1]
    tol = 5.0 * np.sqrt(sum(r[1] ** 2 for r in res.values()))
    same_n = all(abs(r[0] - n_ref) < max(tol, 0.02 * n_ref)
                 for r in res.values())
    gain = res["pose-k8"][2] / max(res["orient-k8"][2], 1e-12)
    ok = same_n and gain > 1.2 and all(r[4] < 1e-4 for r in res.values())
    lines = [
        "Cavity (pose) bias vs orientational bias: dense SPC/E muVT (TPU)",
        f"device: {dev.device_kind}, {N_CHAINS} chains, T = {T} K, "
        f"box = {BOX} A, z = {Z} A^-3, cap {CAP}",
        f"protocol: equil {EQUIL_STEPS} + {PROD_BLOCKS}x{BLOCK_STEPS} "
        "steps/chain per sampler",
    ] + rows + [
        f"pose/orientation insertion-acceptance gain: {gain:.2f}x",
        "exactness: all three samplers agree on <N> "
        f"({'yes' if same_n else 'NO'})",
        f"wall: {time.time() - t0:.0f} s",
        f"RESULT: {'PASS' if ok else 'FAIL'}",
    ]
    out = "\n".join(lines) + "\n"
    print(out)
    if os.environ.get("POSE_SMOKE"):
        return
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "gcmc_pose_bias.txt")
    with open(path, "w") as f:
        f.write(out)
    assert ok, out


if __name__ == "__main__":
    main()
