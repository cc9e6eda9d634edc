"""Topology front-end tests: golden parses of the reference's GROMACS
files (water.top, topol.top, tip3p.pdb, mea.pdb), mixed-species system
assembly, and an MC smoke test on the mixture (BASELINE config #5 in
miniature)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metropolismontecarlo_tpu.io.pdb import read_pdb
from metropolismontecarlo_tpu.io.topology import read_top
from metropolismontecarlo_tpu.io.configs import cubic_lattice
from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.models.from_topology import (
    system_from_topology,
    templates_from_pdbs,
)
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.utils.constants import KJ_PER_MOL_TO_K


def test_parse_water_top(reference_dir):
    top = read_top(os.path.join(reference_dir, "water.top"))
    assert top.defaults["comb_rule"] == 2
    assert top.defaults["fudge_qq"] == pytest.approx(0.8333)
    assert "O1" in top.atom_types and "H" in top.atom_types
    assert top.atom_types["O1"].sigma_nm == pytest.approx(0.315061)
    assert top.atom_types["O1"].epsilon_kj == pytest.approx(0.6364)
    wat = top.mol_types["WAT"]
    assert [a[0] for a in wat.atoms] == ["O1", "H", "H"]
    assert [a[1] for a in wat.atoms] == pytest.approx([-0.834, 0.417, 0.417])
    # the #ifndef FLEXIBLE branch must pick settles+exclusions, not bonds
    assert wat.settles and wat.exclusions and not wat.bonds
    assert top.molecules == [("WAT", 1000)]


def test_parse_topol_top_mea(reference_dir):
    top = read_top(os.path.join(reference_dir, "topol.top"))
    mea = top.mol_types["MEA_DUMMY"]
    assert len(mea.atoms) == 11
    # net charge ~ 0 for the active (uncommented) charge set
    assert sum(a[1] for a in mea.atoms) == pytest.approx(0.0, abs=1e-4)
    assert len(mea.bonds) > 0 and len(mea.angles) > 0 and len(mea.dihedrals) > 0
    sol = top.mol_types["SOL"]
    assert len(sol.atoms) == 3 and sol.settles
    assert ("MEA_DUMMY", 1) in top.molecules and ("SOL", 1000) in top.molecules


def test_parse_pdb_templates(reference_dir):
    tip3p = read_pdb(os.path.join(reference_dir, "tip3p.pdb"))
    assert tip3p["coords"].shape == (3, 3)
    # O-H bond lengths ~0.96-1.0 A in the template
    d = np.linalg.norm(tip3p["coords"][1:] - tip3p["coords"][0], axis=1)
    assert np.all((d > 0.9) & (d < 1.1))
    mea = read_pdb(os.path.join(reference_dir, "mea.pdb"))
    assert mea["coords"].shape == (11, 3)
    assert mea["box"] is not None and mea["box"][0] == pytest.approx(28.65)


def _mixed_system(reference_dir, n_mea=2, n_sol=12):
    top = read_top(os.path.join(reference_dir, "topol.top"))
    templates = templates_from_pdbs(top, {
        "MEA_DUMMY": os.path.join(reference_dir, "mea.pdb"),
        "SOL": os.path.join(reference_dir, "tip3p.pdb"),
    })
    return system_from_topology(
        top, templates, molecules=[("MEA_DUMMY", n_mea), ("SOL", n_sol)],
        name="mea_tip3p",
    )


def test_mixed_system_assembly(reference_dir):
    system = _mixed_system(reference_dir)
    assert system.n_mol == 14 and system.atoms_per_mol == 11
    # padding: SOL molecules have 8 zero-mass slots
    assert np.sum(system.masses[2] > 0) == 3
    assert np.sum(system.masses[0] > 0) == 11
    # charges: neutral overall, SOL rows match tip3p
    assert system.charges.sum() == pytest.approx(0.0, abs=1e-3)
    assert system.charges[2][:3] == pytest.approx([-0.834, 0.417, 0.417])
    # epsilon conversion kJ/mol -> K (O1: 0.6364 kJ/mol)
    o1 = system.type_ids[2][0]
    assert system.eps_table[o1, o1] == pytest.approx(0.6364 * KJ_PER_MOL_TO_K)
    # padded slots interact with nothing
    pad = system.type_ids[2][-1]
    assert np.all(system.eps_table[pad] == 0.0)


def test_mixed_species_mc_drift(reference_dir):
    """BASELINE config #5 in miniature: MEA + TIP3P, Ewald NVT — padded
    slots must contribute exactly zero and deltas must match recompute."""
    system = _mixed_system(reference_dir)
    params = RunParams(temperature=300.0, r_cut=6.0, cutoff_mode="site",
                       coulomb="ewald", nk=3, ksq_max=9, p_translate=0.5,
                       dr_max=0.3, dphi_max=0.3)
    mc = MonteCarlo(system, params, dtype=jnp.float64, recompute_chunk=4)
    state = mc.init_state(jax.random.PRNGKey(0),
                          cubic_lattice(system.n_mol, 14.0), box=14.0,
                          n_chains=4)
    state = mc.quench(state, n_steps=5)
    state, metrics = mc.run_block(state, n_steps=10, adjust=False)
    assert metrics["drift_max_rel"] < 1e-10
    assert np.isfinite(metrics["energy_mean"])
    assert metrics["acc_trans"] > 0.01


def test_neighbor_list_path_drift(reference_dir):
    """Verlet neighbor-list move path: accumulated deltas must still match
    the exact full recompute (which is list-free), proving no in-range
    pair is ever missed by the lists."""
    system = _mixed_system(reference_dir, n_mea=2, n_sol=12)
    params = RunParams(temperature=300.0, r_cut=6.0, cutoff_mode="site",
                       coulomb="ewald", nk=3, ksq_max=9, p_translate=0.5,
                       dr_max=0.3, dphi_max=0.3,
                       nlist_width=13, nlist_skin=2.0)
    mc = MonteCarlo(system, params, dtype=jnp.float64, recompute_chunk=4)
    state = mc.init_state(jax.random.PRNGKey(0),
                          cubic_lattice(system.n_mol, 14.0), box=14.0,
                          n_chains=4)
    state = mc.quench(state, 5)
    state, metrics = mc.run_block(state, n_steps=10, adjust=False)
    assert metrics["drift_max_rel"] < 1e-10, metrics["drift_max_rel"]
    assert metrics["acc_trans"] > 0.01


def test_neighbor_list_overflow_detected(reference_dir):
    """Too-small nlist_width must be caught by the block-boundary check,
    not silently drop interactions."""
    system = _mixed_system(reference_dir, n_mea=2, n_sol=12)
    params = RunParams(temperature=300.0, r_cut=6.0, cutoff_mode="site",
                       coulomb="ewald", nk=3, ksq_max=9, p_translate=0.5,
                       dr_max=0.3, dphi_max=0.3,
                       nlist_width=4, nlist_skin=2.0)
    mc = MonteCarlo(system, params, dtype=jnp.float64, recompute_chunk=4)
    state = mc.init_state(jax.random.PRNGKey(0),
                          cubic_lattice(system.n_mol, 14.0), box=14.0,
                          n_chains=4)
    with pytest.raises(RuntimeError, match="neighbor-list overflow"):
        mc.run_block(state, n_steps=2, adjust=False)
