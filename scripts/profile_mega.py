"""Capture a real TPU profile of the whole-sweep mega kernel
(VERDICT r3 stretch item 8): quantify where device time goes and what
the compute-unit utilization is, replacing the analytic flop-estimate
justification of "the sweep kernel is VPU/fma-bound" in docs/perf.md.

Runs the flagship config (750-water SPC/E Ewald NVT, 2048 chains,
auto cb=64) for a few profiled sweeps under jax.profiler.trace, then
post-processes the xplane protobuf with the tensorboard profile
plugin's converters (op_profile + overview_page) and prints a compact
summary table.

Run: `python scripts/profile_mega.py` (TPU).  Raw trace lands under
/tmp/mmc_profile; the summary is printed (and pasted into
docs/perf.md).
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("MMC_CACHE", "/tmp/mmc_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from metropolismontecarlo_tpu.io.configs import cubic_lattice
from metropolismontecarlo_tpu.mc.driver import MonteCarlo
from metropolismontecarlo_tpu.models.system import RunParams
from metropolismontecarlo_tpu.models.water import spce_system

LOGDIR = "/tmp/mmc_profile"


def main():
    t0 = time.time()
    dev = jax.devices()[0]
    print(f"[{time.time()-t0:5.1f}s] device: {dev.device_kind}",
          flush=True)
    n_w, n_chains = 750, 2048
    box = (n_w / 0.0334) ** (1.0 / 3.0)
    params = RunParams(temperature=298.15, r_cut=10.0,
                       cutoff_mode="site", coulomb="ewald",
                       p_translate=0.5, dr_max=0.25, dphi_max=0.25)
    mc = MonteCarlo(spce_system(n_w), params, dtype=jnp.float32,
                    pallas="mega")
    state = mc.init_state(jax.random.PRNGKey(0),
                          cubic_lattice(n_w, box), box=box,
                          n_chains=n_chains)
    # warm up (compile outside the trace)
    state = mc.run_steps(state, 2, False)
    jax.block_until_ready(state.energy)
    print(f"[{time.time()-t0:5.1f}s] warm; tracing 4 sweeps", flush=True)

    with jax.profiler.trace(LOGDIR):
        state = mc.run_steps(state, 4, False)
        jax.block_until_ready(state.energy)
    print(f"[{time.time()-t0:5.1f}s] trace captured", flush=True)

    xplanes = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"),
                        recursive=True)
    assert xplanes, f"no xplane under {LOGDIR}"
    xplane = max(xplanes, key=os.path.getmtime)
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    params_d = {"graph_viewer_options": {}}
    for tool in ("overview_page", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplane], tool, params_d)
        except Exception as e:  # noqa: BLE001
            print(f"-- {tool}: converter failed: {e}")
            continue
        out = os.path.join(LOGDIR, f"{tool}.json")
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        with open(out, "w") as f:
            f.write(data)
        print(f"-- {tool}: wrote {out} ({len(data)} bytes)")
        if tool == "op_profile":
            try:
                d = json.loads(data)
            except Exception:
                continue

            def walk(node, depth=0, rows=None):
                rows = rows if rows is not None else []
                m = node.get("metrics", {})
                name = node.get("name", "?")
                if m and depth <= 2:
                    rows.append((name, m.get("time", 0.0),
                                 m.get("flops", 0.0)))
                for ch in node.get("children", []):
                    walk(ch, depth + 1, rows)
                return rows

            root = d.get("byProgram") or d.get("byCategory") or {}
            rows = walk(root)
            rows.sort(key=lambda r: -r[1])
            print("top op-profile nodes (name, time-frac, flop-frac):")
            for name, tfrac, ffrac in rows[:12]:
                print(f"    {name[:60]:60s} {tfrac:8.4f} {ffrac:8.4f}")
    print(f"[{time.time()-t0:5.1f}s] done", flush=True)


if __name__ == "__main__":
    main()
