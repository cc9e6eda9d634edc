"""Bisect the 4096-chain mega-kernel device fault (VERDICT r3 item 4).

RESOLVED (round 4): the fault DID NOT REPRODUCE.  Probe matrix all
PASS — control2048 4900 sweeps/s, c2048cb32 (grid 64) 4877, w375c8192
(10.5M chain-lanes) 16709, c4096cb32 4951, c4096 (the exact round-3
faulting config, auto cb=64) 4978.  Conclusion: transient
device/tunnel flakiness, not a kernel defect; the hard envelope
refusal in mc/moves.py became a warning (_check_mega_envelope,
MMC_MEGA_STRICT=1 restores the raise).  Keep this probe for future
regressions.

Known state (round 3): the whole-sweep kernel hard-faults ("TPU device
error" on the first sweep) at C=4096 chains on the 750-water system
(C*A_plane ~ 9.4e6 chain-lanes), while 2048x2304 water and 4096x256 LJ
both run; the per-launch VMEM model says every block fits, so the
fault is NOT block-local VMEM.  The guard at mc/moves.py:884-899
refuses C*A_plane > 2048*2432 empirically.

This probe runs ONE configuration per invocation (a fault wedges the
TPU tunnel for many minutes — never loop configs in-process):

    MMC_PROBE=<name> python scripts/probe_mega_envelope.py

Configs bisect the (C, A_plane, cb) space between the known-good and
known-bad corners.  Each run health-checks the device with a tiny op
first, times two sweeps, and prints PASS/fault diagnostics.  Results
table lives in docs/perf.md (mega-kernel envelope section).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

PROBES = {
    # name: (n_waters, n_chains, cb or None=auto)
    "control2048": (750, 2048, None),     # known good (the flagship)
    "c4096": (750, 4096, None),           # known bad (round-3 fault)
    "c4096cb32": (750, 4096, 32),         # VERDICT suggestion: smaller cb
    "c4096cb16": (750, 4096, 16),
    "c3072": (750, 3072, None),           # 7.1e6 chain-lanes
    "c2560": (750, 2560, None),           # 5.9e6
    # DISCRIMINATORS: c2048cb32 runs the SAME grid length (64) as the
    # faulting c4096/cb-auto=64 but at the validated size — if it
    # faults, the mechanism is grid-step count, not total plane size;
    # w375c4096 halves the system at the same C; w375c8192 reproduces
    # the 9.4e6 chain-lane product with half-size planes.
    "c2048cb32": (750, 2048, 32),         # grid 64 at validated size
    "w375c4096": (375, 4096, None),       # 4.7e6 chain-lanes, C=4096
    "w375c8192": (375, 8192, None),       # 9.4e6 again, half-size system
}


def main():
    name = os.environ.get("MMC_PROBE", "c4096cb32")
    n_w, n_chains, cb = PROBES[name]
    if cb:
        os.environ["MMC_MEGA_CB"] = str(cb)
    # (pre-resolution this needed MMC_MEGA_UNSAFE; the guard is now a
    # warning)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MMC_CACHE", "/tmp/mmc_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from metropolismontecarlo_tpu.io.configs import cubic_lattice
    from metropolismontecarlo_tpu.mc.driver import MonteCarlo
    from metropolismontecarlo_tpu.models.system import RunParams
    from metropolismontecarlo_tpu.models.water import spce_system

    t0 = time.time()
    dev = jax.devices()[0]
    x = jnp.ones((128, 128))
    assert float((x @ x).sum()) == 128.0 * 128 * 128
    print(f"[{time.time()-t0:5.1f}s] device healthy: {dev.device_kind}",
          flush=True)

    system = spce_system(n_w)
    box = (n_w / 0.0334) ** (1.0 / 3.0)
    params = RunParams(temperature=298.15, r_cut=min(10.0, 0.45 * box),
                       cutoff_mode="site", coulomb="ewald",
                       p_translate=0.5, dr_max=0.25, dphi_max=0.25)
    mc = MonteCarlo(system, params, dtype=jnp.float32, pallas="mega")
    assert mc.pallas_mode == "mega", mc.pallas_mode
    state = mc.init_state(jax.random.PRNGKey(0),
                          cubic_lattice(n_w, box), box=box,
                          n_chains=n_chains)
    a_plane = state.coords.shape[-1]
    print(f"[{time.time()-t0:5.1f}s] probe {name}: C={n_chains} "
          f"A_plane={a_plane} ({n_chains*a_plane/1e6:.1f}M chain-lanes) "
          f"cb={cb or 'auto'}", flush=True)
    try:
        state = mc.run_steps(state, 2, False)
        jax.block_until_ready(state.energy)
        print(f"[{time.time()-t0:5.1f}s] 2 sweeps OK "
              f"(E mean {float(jnp.mean(state.energy)):.1f} K)",
              flush=True)
        t1 = time.time()
        state = mc.run_steps(state, 2, False)
        jax.block_until_ready(state.energy)
        dt = time.time() - t1
        print(f"RESULT {name}: PASS  {n_chains * 2 / dt:.0f} sweeps/s "
              f"({dt:.2f} s / 2 sweeps)", flush=True)
    except Exception as e:  # noqa: BLE001 - we want the raw device error
        print(f"RESULT {name}: FAULT after {time.time()-t0:.1f}s\n"
              f"{type(e).__name__}: {e}", flush=True)
        raise


if __name__ == "__main__":
    main()
