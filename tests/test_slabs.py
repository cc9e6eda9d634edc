"""Sorted-slab windows: TPU-native sparsity for the mega path.

Every chain keeps the largest species block z-sorted so each move's
pair scan reads a static 128-aligned lane window (+ ghost halo for
periodic wrap) instead of all atom lanes — the lane-oriented re-design
of the reference's neighbor-list TODO (`Ewald/readme.md:21`,
`Ewald/energy.jl:254` COM prefilter).

Covered here (CPU): the resort is an exact energy-invariant relabeling;
the static windows cover every z-neighborhood whenever the carried
coverage counter stays within W (the safety contract the driver checks
at block boundaries); the interpret-mode mega kernel keeps the drift
invariant with windows + ghosts active.  On-TPU throughput/drift are
validated by bench.py and docs/validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metropolismontecarlo_tpu.io.configs import cubic_lattice
from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.mc.moves import (
    make_slab_resort_fn,
    slab_config,
    slab_window_starts,
)
from metropolismontecarlo_tpu.models.monatomic import lj_system
from metropolismontecarlo_tpu.models.system import RunParams


def _lj_setup(n, box, r_cut=3.0, slab_mode="force", n_chains=4, seed=7,
              sweeps=0):
    system = lj_system(n)
    params = RunParams(temperature=1.5, r_cut=r_cut, cutoff_mode="site",
                       coulomb="none", p_translate=1.0, dr_max=0.4,
                       use_lrc=False, slab_mode=slab_mode, slab_skin=1.0)
    mc = MonteCarlo(system, params, dtype=jnp.float64, pallas=False)
    com0 = cubic_lattice(n, box)
    state = mc.init_state(jax.random.PRNGKey(seed), com0, box=box,
                          n_chains=n_chains)
    if sweeps:
        state = mc.run_steps(state, sweeps, False)  # decorrelate lattice
    return system, params, mc, state


def test_slab_config_gates():
    system = lj_system(512)
    base = dict(temperature=1.5, r_cut=3.0, cutoff_mode="site",
                coulomb="none", p_translate=1.0, use_lrc=False)
    # no box hint / NPT / off-mode / tiny box -> None
    p = RunParams(dr_max=0.4, **base)
    assert slab_config(system, p, None) is None
    assert slab_config(system, RunParams(dr_max=0.4, pressure=1.0,
                                         p_volume=0.1, **base), 25.0) is None
    assert slab_config(system, RunParams(dr_max=0.4, slab_mode="off",
                                         **base), 25.0) is None
    assert slab_config(system, p, 7.0) is None          # frac >= 1
    cfg = slab_config(system, RunParams(dr_max=0.4, slab_mode="force",
                                        **base), 25.0)
    assert cfg is not None and cfg["W"] % 128 == 0 \
        and cfg["W"] <= cfg["A_blk"]
    # forcing with a staleness-unsafe step size must refuse loudly
    with pytest.raises(ValueError):
        slab_config(system, RunParams(dr_max=5.0, slab_mode="force",
                                      **base), 25.0)


def test_slab_resort_energy_invariant():
    """The per-chain z-resort is a relabeling of identical molecules:
    the recomputed total energy must be unchanged (f64)."""
    system, params, mc, state = _lj_setup(512, 25.0, sweeps=3)
    cfg = slab_config(system, params, 25.0,
                      np.asarray(state.com[0, :, 2]))
    resort = make_slab_resort_fn(system, params, cfg)
    e0, w0, _ = mc.full_energy(state)
    state2 = resort(state)
    e1, w1, _ = mc.full_energy(state2)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), rtol=1e-10)
    # sorted: z ascending within the block, in every chain
    z = np.asarray(state2.com[:, :, 2]) % 25.0
    assert (np.diff(z, axis=1) >= 0).all()


def test_slab_window_coverage():
    """Safety contract: whenever the coverage counter stays <= W, every
    molecule within r_half in (periodic) z lies inside the mover's
    static window — directly, or via its ghost twin."""
    box = 25.0
    system, params, mc, state = _lj_setup(512, box, sweeps=3)
    cfg = slab_config(system, params, box, np.asarray(state.com[0, :, 2]))
    W, A_blk, a0_w, P_w = cfg["W"], cfg["A_blk"], cfg["a0"], cfg["P"]
    A = cfg["A"]
    resort = make_slab_resort_fn(system, params, cfg)
    state = state._replace(nbr_needed=jnp.zeros_like(state.nbr_needed))
    state = resort(state)
    needed = int(jnp.max(state.nbr_needed))
    assert 128 < needed <= W, (needed, W)   # sized with real headroom
    wstarts = slab_window_starts(system, cfg)
    z = np.asarray(state.com[:, :, 2]) % box
    r_half = cfg["r_half"]
    for c in range(z.shape[0]):
        for m in range(system.n_mol):
            dz = np.abs(z[c] - z[c, m])
            dz = np.minimum(dz, box - dz)
            nbrs = np.nonzero(dz < r_half - 1e-9)[0]
            wb = wstarts[m]
            for j in nbrs:
                gcol = a0_w + (j - cfg["m0"]) * P_w
                in_real = (wb <= gcol < wb + W) and gcol >= a0_w
                cj = gcol - a0_w
                in_ghost = cj < W and (wb <= A + cj < wb + W)
                assert in_real or in_ghost, (c, m, j, wb, gcol)


def _stratified_com(n, box, side=26):
    """xy grid + scrambled stratified z: exactly uniform z-occupancy (so
    windows come out well under the block) and no close pairs."""
    i = np.arange(n)
    com = np.stack([
        (i % side + 0.5) * box / side,
        (i // side + 0.5) * box / side,
        ((i * 997) % n + 0.5) * box / n,
    ], axis=1)
    return com


def test_slab_window_overflow_guard():
    """A too-small forced window must be caught by the coverage counter
    (lattice starts clump molecules into z-planes)."""
    system, params, mc, state = _lj_setup(512, 25.0)
    cfg = slab_config(system, params, 25.0)
    cfg = dict(cfg, W=256)
    resort = make_slab_resort_fn(system, params, cfg)
    state = resort(state)
    assert int(jnp.max(state.nbr_needed)) > 256


@pytest.mark.slow
def test_slab_mega_interpret_drift():
    """In-kernel: interpret-mode mega sweep with sorted-slab windows
    SMALLER than the block (W=512 < A_blk=640) — windowed reads, ghost
    halo reads AND in-sweep ghost-twin writes must keep the energy
    bookkeeping drift-free."""
    n, box = 640, 32.0
    system = lj_system(n)
    params = RunParams(temperature=1.5, r_cut=3.0, cutoff_mode="site",
                       coulomb="none", p_translate=1.0, dr_max=0.4,
                       use_lrc=False, slab_mode="force", slab_skin=1.0)
    mc = MonteCarlo(system, params, dtype=jnp.float32,
                    pallas="mega_interpret", recompute_chunk=2)
    state = mc.init_state(jax.random.PRNGKey(11), _stratified_com(n, box),
                          box=box, n_chains=2)
    assert mc._slab_cfg is not None
    assert mc._slab_cfg["W"] < mc._slab_cfg["A_blk"], mc._slab_cfg
    state, m = mc.run_block(state, 2, adjust=False)
    assert m["drift_max_rel"] < 5e-5, m["drift_max_rel"]
    assert np.isfinite(m["energy_mean"])


def test_retune_slabs_mid_run_keeps_drift():
    """retune_slabs after some sweeps (the CLI's equil->production hook):
    the rebuilt windows must stay drift-exact, and the coverage counter
    resets for the new width."""
    n, box = 640, 32.0
    system = lj_system(n)
    params = RunParams(temperature=1.5, r_cut=3.0, cutoff_mode="site",
                       coulomb="none", p_translate=1.0, dr_max=0.4,
                       use_lrc=False, slab_mode="force", slab_skin=1.0)
    mc = MonteCarlo(system, params, dtype=jnp.float32,
                    pallas="mega_interpret", recompute_chunk=2)
    state = mc.init_state(jax.random.PRNGKey(13), _stratified_com(n, box),
                          box=box, n_chains=2)
    state, m = mc.run_block(state, 1, adjust=False)
    w_before = mc._slab_cfg["W"]
    state = mc.retune_slabs(state)
    assert mc._slab_cfg is not None     # still profitable post-equil
    assert int(jnp.max(state.nbr_needed)) == 0   # counter reset
    state, m = mc.run_block(state, 2, adjust=False)
    assert m["drift_max_rel"] < 5e-5, (w_before, mc._slab_cfg["W"],
                                       m["drift_max_rel"])
