"""On-TPU statistical validation of the mega kernel's on-core PRNG.

The whole-sweep mega kernel draws randomness from the TPU core's PRNG
(pltpu.prng_random_bits), a different stream from the jax.random-based
paths.  Interpreter-mode PRNG returns zeros, so CPU tests only validate
the kernel's energy bookkeeping — this script closes that blind spot by
running the absolute sampler check (two-particle Boltzmann distribution,
tests/test_mc.py::test_two_particle_boltzmann_distribution) against the
COMPILED mega path on a real TPU chip:

  for two LJ particles the pair-distance density is analytic,
  p(r) dr ~ r^2 exp(-u(r)/T) dr for r < L/2.  The sampled histogram must
  match it — validating proposal uniformity, acceptance logic, and RNG
  quality end-to-end with no reference implementation in the loop.

Also compares mega-path acceptance against the jax.random (pure-jnp)
path on the same protocol: different streams, same statistics.

Run:  python docs/validation/run_mega_boltzmann.py
Writes docs/validation/mega_prng_boltzmann.txt (the committed artifact).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metropolismontecarlo_tpu.mc.driver import MonteCarlo  # noqa: E402
from metropolismontecarlo_tpu.models.monatomic import lj_system  # noqa: E402
from metropolismontecarlo_tpu.models.system import RunParams  # noqa: E402

T, BOX, RC = 1.2, 8.0, 3.9
N_CHAINS, N_ROUNDS, SWEEP_GAP = 512, 80, 5
LO, HI, NB = 0.85, 3.6, 40


def sample_histogram(pallas_mode):
    system = lj_system(2)
    params = RunParams(temperature=T, r_cut=RC, cutoff_mode="site",
                       coulomb="none", p_translate=1.0, dr_max=1.2,
                       use_lrc=False)
    mc = MonteCarlo(system, params, dtype=jnp.float32, recompute_chunk=8,
                    pallas=pallas_mode)
    com0 = np.array([[2.0, 2.0, 2.0], [4.0, 4.0, 4.0]])
    state = mc.init_state(jax.random.PRNGKey(20), com0, box=BOX,
                          n_chains=N_CHAINS)
    state = mc.run_steps(state, 100, False)  # decorrelate
    hist = np.zeros(NB)
    edges = None
    for _ in range(N_ROUNDS):
        state = mc.run_steps(state, SWEEP_GAP, False)
        d = np.asarray(state.com[:, 0] - state.com[:, 1])
        d = d - BOX * np.round(d / BOX)
        r = np.linalg.norm(d, axis=1)
        h, edges = np.histogram(r, bins=NB, range=(LO, HI))
        hist += h
    att = np.asarray(state.att).sum()
    acc = np.asarray(state.acc).sum() / max(att, 1)
    return hist, edges, float(acc), mc.pallas_mode


def main():
    backend = jax.default_backend()
    if backend != "tpu":
        raise SystemExit(f"this validation must run on TPU (got {backend!r})"
                         " — the interpreter PRNG returns zeros")

    hist, edges, acc_mega, mode = sample_histogram("mega")
    assert mode == "mega", mode
    _, _, acc_jnp, _ = sample_histogram(False)

    centers = 0.5 * (edges[1:] + edges[:-1])

    def u(r):
        return np.where(r < RC, 4.0 * (r**-12 - r**-6), 0.0)

    p_exact = centers**2 * np.exp(-u(centers) / T)
    p_exact /= p_exact.sum()
    n_tot = hist.sum()
    p_meas = hist / n_tot
    sigma = np.sqrt(np.maximum(p_exact * n_tot, 1.0)) / n_tot
    z = (p_meas - p_exact) / sigma
    chi2_per_bin = float(np.mean(z**2))
    peak_off = int(abs(np.argmax(p_meas) - np.argmax(p_exact)))
    # correlated samples across the 5-sweep gap inflate chi2; same bound
    # as the CI test
    ok = chi2_per_bin < 9.0 and peak_off <= 3 and abs(acc_mega - acc_jnp) < 0.02

    lines = [
        "Mega-kernel on-core PRNG: two-particle Boltzmann validation",
        f"device: {jax.devices()[0].device_kind}, backend: {backend}",
        f"protocol: {N_CHAINS} chains x {N_ROUNDS} rounds x {SWEEP_GAP} "
        f"sweeps, T={T}, box={BOX}, rc={RC}, f32, mega path",
        f"samples: {int(n_tot)}",
        f"chi2/bin vs analytic p(r) ~ r^2 exp(-u/T): {chi2_per_bin:.3f} "
        "(bound 9.0, Poisson errors, correlated samples)",
        f"max |z|: {float(np.abs(z).max()):.2f}",
        f"peak-bin offset: {peak_off} (bound 3)",
        f"acceptance: mega {acc_mega:.4f} vs jax.random {acc_jnp:.4f} "
        "(bound |diff| < 0.02)",
        f"RESULT: {'PASS' if ok else 'FAIL'}",
        "",
        "bin_center  p_measured  p_exact  z",
    ]
    for c, pm, pe, zz in zip(centers, p_meas, p_exact, z):
        lines.append(f"{c:10.4f}  {pm:.6f}  {pe:.6f}  {zz:+.2f}")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mega_prng_boltzmann.txt")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:9]))
    print(f"wrote {out}")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
