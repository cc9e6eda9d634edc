"""bf16 vs f32 VPU elementwise-fma throughput probe (TPU).

Round-4's captured profile shows the flagship sweep kernel is VPU
fma-bound (99.89% kernel residency, MXU 0%, HBM ~0) — the round-2
"other levers" list flags bf16 pair math as the last untried >= 1.5x
candidate.  Whether it CAN pay hinges on one hardware question: does
the VPU retire bf16 elementwise fmas faster than f32?

MEASURED (v5e, round 5): NO.  f32 3.48 us / bf16 3.46 us per
512x1024-element iteration of the pair-loop op mix (mul/add/rsqrt/
select) — x1.01, EQUAL retire rate (upconvert-and-execute at f32
rate; there is no VPU bf16 packing on this op mix).  The rate implies
~2.3 TFLOP/s at ~15 ops/elem — the same arithmetic class the sweep
kernel's profile shows, so the probe measures the right unit.
Conclusion: a bf16 pair-math kernel variant cannot beat f32 on v5e
(it would only add convert ops and precision risk); the round-2
"bf16 pair math" lever is closed as a measured negative result
(docs/perf.md).

Measurement notes (important on THIS box): `block_until_ready` through
the axon tunnel is NOT a reliable completion barrier for small queued
dispatches — un-fetched timings here returned implied rates 100x over
VPU speed-of-light.  A host value fetch (`float(...)`) is a hard
barrier but adds the ~29 ms tunnel RTT, so the probe times TWO chain
lengths and reports the DELTA per iteration (RTT and launch overhead
cancel).  bench.py's long in-call scans are unaffected (its numbers
are validated against xprof wall times).

Run on TPU: python scripts/probe_bf16_vpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

SHAPE = (512, 1024)
N_LO, N_HI = 256, 4096
REPS = 5


def make_run(n_iter, dtype):
    """Chain of dependent steps mimicking the pair-loop body."""
    def body(c, _):
        x, y, z = c
        d2 = x * x + y * y + z * z + jnp.asarray(1e-4, dtype)
        inv = jax.lax.rsqrt(d2)
        s2 = jnp.asarray(1.21, dtype) * inv * inv
        s6 = s2 * s2 * s2
        pot = jnp.asarray(4.0, dtype) * (s6 * s6 - s6)
        sel = jnp.where(d2 < jnp.asarray(6.25, dtype), pot,
                        jnp.zeros((), dtype))
        x = x + jnp.asarray(1e-6, dtype) * sel
        y = y - jnp.asarray(1e-6, dtype) * sel
        z = z + jnp.asarray(5e-7, dtype) * sel
        return (x, y, z), None

    @jax.jit
    def run(x, y, z):
        (x, y, z), _ = jax.lax.scan(body, (x, y, z), None,
                                    length=n_iter)
        return jnp.sum(x) + jnp.sum(y) + jnp.sum(z)

    return run


def timed(run, args):
    float(run(*args))                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(run(*args))                   # host fetch = hard barrier
    return (time.perf_counter() - t0) / REPS


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}, shape {SHAPE}, "
          f"delta {N_LO} -> {N_HI} iters")
    k = jax.random.PRNGKey(0)
    x32 = jax.random.uniform(k, SHAPE, jnp.float32) * 4.0
    per_iter = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        args = [a.astype(dtype) for a in (x32, x32 + 0.3, x32 + 0.7)]
        t_lo = timed(make_run(N_LO, dtype), args)
        t_hi = timed(make_run(N_HI, dtype), args)
        us = (t_hi - t_lo) / (N_HI - N_LO) * 1e6
        per_iter[dtype.__name__] = us
        rate = SHAPE[0] * SHAPE[1] / (us * 1e-6) / 1e12
        print(f"{dtype.__name__:9s}: lo {t_lo*1e3:7.2f} ms  hi "
              f"{t_hi*1e3:7.2f} ms  -> {us:.2f} us/iter  "
              f"(~{rate * 15:.1f} TFLOP/s at ~15 ops/elem)")
    r = per_iter["float32"] / per_iter["bfloat16"]
    print(f"bf16 speedup over f32: x{r:.2f} "
          f"({'bf16 WINS' if r > 1.1 else 'no gain — lever closed'})")


if __name__ == "__main__":
    main()
