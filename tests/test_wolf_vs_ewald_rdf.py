"""Physics cross-check: SPC/E water O-O RDF from Wolf summation vs full
Ewald must agree — the reference's own validation
(`Ewald/SPC_E water RDF - Wolf & Ewald.png`, `Ewald/readme.md:30-32`).

Small system (64 waters) and short runs keep this CPU-friendly; the
comparison is coarse (binned RDF within 0.25 everywhere + matching first
peak) but catches any electrostatics-level disagreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metropolismontecarlo_tpu.io.configs import cubic_lattice
from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_system
from metropolismontecarlo_tpu.observables import RDFAccumulator


def _run_rdf(coulomb, seed):
    n_mol = 64
    # ~0.995 g/cc
    box = (n_mol / 0.0332) ** (1.0 / 3.0)
    system = spce_system(n_mol)
    params = RunParams(temperature=400.0, r_cut=6.0, cutoff_mode="site",
                       coulomb=coulomb, nk=4, ksq_max=16, p_translate=0.5,
                       dr_max=0.25, dphi_max=0.3)
    mc = MonteCarlo(system, params, dtype=jnp.float32, recompute_chunk=8)
    state = mc.init_state(jax.random.PRNGKey(seed), cubic_lattice(n_mol, box),
                          box=box, n_chains=16)
    state = mc.quench(state, 10)
    state, _ = mc.run_block(state, 40, adjust=True)   # equilibrate
    rdf = RDFAccumulator(system, 0, 0, r_max=box / 2, n_bins=30)
    for _ in range(6):
        state = mc.run_steps(state, 15, False)
        rdf.update(state)
    return rdf.result()


@pytest.mark.slow
def test_wolf_and_ewald_agree_on_water_structure():
    r, g_ewald = _run_rdf("ewald", seed=0)
    _, g_wolf = _run_rdf("wolf", seed=1)
    # first O-O peak near 2.6-2.9 A in both, with g>1.5
    pk_e = r[np.argmax(g_ewald)]
    pk_w = r[np.argmax(g_wolf)]
    assert 2.3 < pk_e < 3.3, pk_e
    assert abs(pk_e - pk_w) < 0.4, (pk_e, pk_w)
    assert g_ewald.max() > 1.5 and g_wolf.max() > 1.5
    # overall structural agreement
    sel = r > 2.2  # below first peak both are ~0
    assert np.max(np.abs(g_ewald[sel] - g_wolf[sel])) < 0.45, (
        np.max(np.abs(g_ewald[sel] - g_wolf[sel])))
