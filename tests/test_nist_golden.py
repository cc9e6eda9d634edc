"""THE correctness gate: SPC/E energy components vs the NIST Standard
Reference Simulation Website reference calculations, evaluated on the
sample configurations shipped with the reference repo
(`Ewald/spce_sample_config_periodic{1..4}.txt`; the reference's own
validation strategy, `Ewald/main.jl:231-239`).

Conventions (established empirically in round 1 and required by NIST):
site-site spherical cutoff at 10 A for both LJ and real-space Ewald,
kappa = 5.6/L, integer k-vectors with 0 < |k|^2 < 27, standard LJ tail
corrections, intramolecular Ewald correction with minimum image.

Golden values are quoted to 6 significant figures, so the pass tolerance
is 1e-5 relative (half-ULP of the printed values is up to ~5e-6).
"""

import os

import jax.numpy as jnp
import pytest

from metropolismontecarlo_tpu.models.energy import energy_breakdown_jit
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_from_nist
from metropolismontecarlo_tpu.ops.ewald import make_kvectors

GOLD = {
    1: dict(disp=9.95387e04, lrc=-8.23715e02, coul_real=-5.58889e05,
            coul_fourier=6.27009e03, coul_self=-2.84469e06,
            coul_intra=2.80999e06, total=-4.88604e05),
    2: dict(disp=1.93712e05, lrc=-3.29486e03, coul_real=-1.19295e06,
            coul_fourier=6.03495e03, coul_self=-5.68938e06,
            coul_intra=5.61998e06, total=-1.06590e06),
    3: dict(disp=3.54344e05, lrc=-7.41343e03, coul_real=-1.96297e06,
            coul_fourier=5.24461e03, coul_self=-8.53407e06,
            coul_intra=8.42998e06, total=-1.71488e06),
    4: dict(disp=4.48593e05, lrc=-1.37286e04, coul_real=-3.57226e06,
            coul_fourier=7.58785e03, coul_self=-1.42235e07,
            coul_intra=1.41483e07, total=-3.20501e06),
}

PARAMS = RunParams(r_cut=10.0, cutoff_mode="site", coulomb="ewald",
                   kappa_L=5.6, nk=5, ksq_max=27, use_lrc=True)


@pytest.mark.parametrize("config", [1, 2, 3, 4])
def test_spce_nist_energy_components(reference_dir, config):
    path = os.path.join(
        reference_dir, "Ewald", f"spce_sample_config_periodic{config}.txt"
    )
    system, coords, com, box = spce_from_nist(path)
    kv, kw = make_kvectors(PARAMS.nk, PARAMS.ksq_max, strict=True)
    out = energy_breakdown_jit(
        system, PARAMS,
        jnp.asarray(coords, jnp.float64),
        jnp.asarray(com, jnp.float64),
        jnp.asarray(box, jnp.float64),
        kvecs=kv, kweights=kw,
    )
    for key, gold in GOLD[config].items():
        got = float(out[key])
        rel = abs(got - gold) / abs(gold)
        # Components: 1e-5 covers the half-ULP of 6-significant-figure
        # golden values (<= 7e-6).  The published totals inherit the SUM of
        # the component roundings (config 4's self term is printed exactly
        # at a half-ULP boundary, contributing ~40 K alone), hence 2.5e-5.
        tol = 2.5e-5 if key == "total" else 1e-5
        assert rel < tol, f"config {config} {key}: got {got:.7e}, want {gold:.6e} (rel {rel:.2e})"


def test_coord750_matches_config4(reference_dir):
    """coord750.txt is the same 750-water system (`Ewald/coord750.txt:1-2`)."""
    path = os.path.join(reference_dir, "Ewald", "coord750.txt")
    system, coords, com, box = spce_from_nist(path)
    kv, kw = make_kvectors(PARAMS.nk, PARAMS.ksq_max, strict=True)
    out = energy_breakdown_jit(
        system, PARAMS,
        jnp.asarray(coords, jnp.float64),
        jnp.asarray(com, jnp.float64),
        jnp.asarray(box, jnp.float64),
        kvecs=kv, kweights=kw,
    )
    assert system.n_mol == 750
    assert abs(float(out["total"]) - GOLD[4]["total"]) / abs(GOLD[4]["total"]) < 2.5e-5


def test_exact_component_scaling(reference_dir):
    """Stronger-than-golden identities: E_self is exactly linear in
    kappa*N and E_lrc exactly N^2/V, so config 4 relates to config 1 by
    exact factors (5x and 50/3 x) — a roundoff-free cross-check."""
    kv, kw = make_kvectors(PARAMS.nk, PARAMS.ksq_max, strict=True)
    outs = {}
    for c in (1, 4):
        path = os.path.join(
            reference_dir, "Ewald", f"spce_sample_config_periodic{c}.txt"
        )
        system, coords, com, box = spce_from_nist(path)
        outs[c] = energy_breakdown_jit(
            system, PARAMS,
            jnp.asarray(coords, jnp.float64),
            jnp.asarray(com, jnp.float64),
            jnp.asarray(box, jnp.float64),
            kvecs=kv, kweights=kw,
        )
    self1, self4 = float(outs[1]["coul_self"]), float(outs[4]["coul_self"])
    assert abs(self4 - 5.0 * self1) / abs(self4) < 1e-12
    lrc1, lrc4 = float(outs[1]["lrc"]), float(outs[4]["lrc"])
    assert abs(lrc4 - (50.0 / 3.0) * lrc1) / abs(lrc4) < 1e-12


def test_tiled_recompute_matches_dense(reference_dir):
    """The row-tiled large-system energy path must agree with the dense
    path to roundoff (validated transitively against NIST)."""
    import jax.numpy as jnp
    from metropolismontecarlo_tpu.models.energy import _energy_breakdown_tiled

    path = os.path.join(reference_dir, "Ewald", "spce_sample_config_periodic2.txt")
    system, coords, com, box = spce_from_nist(path)
    kv, kw = make_kvectors(PARAMS.nk, PARAMS.ksq_max, strict=True)
    args = (jnp.asarray(coords, jnp.float64), jnp.asarray(com, jnp.float64),
            jnp.asarray(box, jnp.float64))
    # every coulomb/wolf-style branch: the tile scan re-derives the pair
    # energy AND exact-virial terms inline — this cross-check is what
    # keeps the two copies of the physics from diverging
    import dataclasses
    variants = [PARAMS,
                dataclasses.replace(PARAMS, coulomb="wolf",
                                    wolf_style="pairwise"),
                dataclasses.replace(PARAMS, coulomb="wolf",
                                    wolf_style="reference"),
                dataclasses.replace(PARAMS, coulomb="bare")]
    for prm in variants:
        dense = energy_breakdown_jit(system, prm, *args, kvecs=kv,
                                     kweights=kw)
        tiled = _energy_breakdown_tiled(system, prm, *args, kv, kw)
        for k in ("disp", "lrc", "coul_real", "coul_fourier", "coul_self",
                  "coul_intra", "total", "w", "w_ref"):
            a, b = float(dense[k]), float(tiled[k])
            assert abs(a - b) <= 1e-9 * max(abs(a), 1.0), (
                prm.coulomb, prm.wolf_style, k, a, b)


def test_tuned_parameters_kappa_invariance(reference_dir):
    """ops/ewald.tune_parameters: the TOTAL Coulomb energy (real +
    fourier + self + intra) is kappa-independent once both truncations
    sit below the target tolerance, so tuned parameter sets at very
    different r_cut/kappa/nk must agree on it — an absolute,
    convention-free accuracy gate (the reference's hardcoded kappa =
    5.6/L, nk = 5 has no error control at all)."""
    import dataclasses

    from metropolismontecarlo_tpu.ops.ewald import tune_parameters

    path = os.path.join(reference_dir, "Ewald",
                        "spce_sample_config_periodic1.txt")
    system, coords, com, box = spce_from_nist(path)
    args = (jnp.asarray(coords, jnp.float64), jnp.asarray(com, jnp.float64),
            jnp.asarray(box, jnp.float64))

    def coul_total(r_cut, tol):
        kappa_l, nk, ksq = tune_parameters(box, r_cut, tol)
        prm = dataclasses.replace(PARAMS, r_cut=r_cut, kappa_L=kappa_l,
                                  nk=nk, ksq_max=ksq)
        kv, kw = make_kvectors(nk, ksq, strict=True)
        out = energy_breakdown_jit(system, prm, *args, kvecs=kv, kweights=kw)
        return sum(float(out[k]) for k in
                   ("coul_real", "coul_fourier", "coul_self", "coul_intra"))

    e_ref = coul_total(8.5, 1e-8)          # tightest: the anchor
    e_a = coul_total(10.0, 1e-6)
    e_b = coul_total(7.0, 1e-6)
    scale = abs(e_ref)
    assert abs(e_a - e_ref) / scale < 2e-6, (e_a, e_ref)
    assert abs(e_b - e_ref) / scale < 2e-6, (e_b, e_ref)
    # and the looser pair agrees with each other at the same level
    assert abs(e_a - e_b) / scale < 2e-6, (e_a, e_b)
    # monotone: tightening the tolerance at fixed r_cut converges
    e_c = coul_total(10.0, 1e-4)
    assert abs(e_a - e_ref) <= abs(e_c - e_ref) + 1e-9 * scale
