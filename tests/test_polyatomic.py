"""Rigid triatomic (Poly generation) tests: CNF start, cut-and-shifted
potential continuity, quench, drift."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metropolismontecarlo_tpu.io.configs import cubic_lattice, read_cnf
from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.models.polyatomic import (
    bent_triatomic_body,
    mossa_params,
    triatomic_system,
)
from metropolismontecarlo_tpu.ops.lj import lj_pair_terms


def test_body_frame_geometry():
    b = bent_triatomic_body(75.0)
    # COM at origin (equal masses)
    np.testing.assert_allclose(b.mean(0), 0.0, atol=1e-15)
    # bond lengths: site 0-1 and 1-2 distance = 1 (unit bonds)
    assert np.linalg.norm(b[0] - b[1]) == pytest.approx(1.0)
    assert np.linalg.norm(b[2] - b[1]) == pytest.approx(1.0)
    # bond angle 75 deg at the apex
    v1, v2 = b[0] - b[1], b[2] - b[1]
    cos = v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert np.degrees(np.arccos(cos)) == pytest.approx(75.0)


def test_force_shifted_potential_vanishes_at_cutoff():
    rc = 2.612
    d2 = jnp.asarray([rc**2 * (1 - 1e-9), 1.0])
    pot, _ = lj_pair_terms(d2, jnp.ones(2), jnp.ones(2), rc, shift="linear")
    assert abs(float(pot[0])) < 1e-7  # continuous at r_cut
    # and du/dr ~ 0 at cutoff: finite difference
    eps = 1e-5
    d2b = jnp.asarray([(rc - eps) ** 2, (rc - 2 * eps) ** 2])
    p, _ = lj_pair_terms(d2b, jnp.ones(2), jnp.ones(2), rc, shift="linear")
    slope = (float(p[0]) - float(p[1])) / eps
    assert abs(slope) < 1e-3


def test_cnf_start_and_drift(reference_dir):
    path = os.path.join(reference_dir, "Poly", "cnf_input.inp")
    com, quat, box = read_cnf(path)
    assert com.shape == (256, 3) and quat.shape == (256, 4)
    # quaternions in the file are unit-norm
    np.testing.assert_allclose(np.linalg.norm(quat, axis=1), 1.0, atol=1e-6)

    system = triatomic_system(256)
    params = mossa_params(temperature=0.6)
    mc = MonteCarlo(system, params, dtype=jnp.float64, recompute_chunk=4)
    # CNF coords can be negative (A&T convention: box centered at origin);
    # shift into [0, box)
    state = mc.init_state(jax.random.PRNGKey(0),
                          (com + box / 2.0) % box, quat=quat, box=box,
                          n_chains=4)
    assert bool(jnp.all(jnp.isfinite(state.energy)))
    state, metrics = mc.run_block(state, n_steps=5, adjust=False)
    assert metrics["drift_max_rel"] < 1e-10
    assert metrics["acc_trans"] > 0.0 and metrics["acc_rot"] > 0.0


def test_quench_lowers_energy():
    system = triatomic_system(27)
    params = mossa_params(strict_min_image=False, temperature=2.0, dr_max=0.3, dphi_max=0.5)
    box = (27 / 0.3) ** (1 / 3)
    mc = MonteCarlo(system, params, dtype=jnp.float64, recompute_chunk=4)
    state = mc.init_state(jax.random.PRNGKey(1), cubic_lattice(27, box),
                          box=box, n_chains=4)
    e0 = np.asarray(state.energy)
    state = mc.quench(state, n_steps=10)
    e1 = np.asarray(state.energy)
    assert np.all(e1 <= e0 + 1e-9)
    assert np.mean(e1) < np.mean(e0)


def test_neighbor_list_with_linear_shift_drift():
    """Regression: the neighbor-list pair path must apply the Mossa force
    shift consistently with the full recompute."""
    system = triatomic_system(27)
    params = mossa_params(strict_min_image=False, temperature=1.0, dr_max=0.2, dphi_max=0.3,
                          nlist_width=26, nlist_skin=1.0)
    box = (27 / 0.25) ** (1 / 3)
    mc = MonteCarlo(system, params, dtype=jnp.float64, recompute_chunk=4)
    state = mc.init_state(jax.random.PRNGKey(3), cubic_lattice(27, box),
                          box=box, n_chains=4)
    state, m = mc.run_block(state, n_steps=10, adjust=False)
    assert m["drift_max_rel"] < 1e-10, m["drift_max_rel"]


def test_tiled_recompute_linear_shift_matches_dense():
    """Regression: the large-system tiled recompute applies the force
    shift (compare against the dense path on the same configuration)."""
    import numpy as np
    from metropolismontecarlo_tpu.models.energy import (
        _energy_breakdown_tiled,
        energy_breakdown,
    )

    system = triatomic_system(27)
    params = mossa_params(strict_min_image=False, )
    box = (27 / 0.25) ** (1 / 3)
    mc = MonteCarlo(system, params, dtype=jnp.float64, recompute_chunk=4)
    state = mc.init_state(jax.random.PRNGKey(4), cubic_lattice(27, box),
                          box=box, n_chains=4)
    coords = state.coords[0][:, : system.n_atoms].T
    dense = energy_breakdown(system, params, coords, state.com[0],
                             state.box[0])
    tiled = _energy_breakdown_tiled(system, params, coords, state.com[0],
                                    state.box[0], None, None, row_block=32)
    assert abs(float(dense["disp"]) - float(tiled["disp"])) < 1e-9
