"""bf16 vs f32 VPU elementwise-fma throughput probe (TPU).

Round-4's captured profile shows the flagship sweep kernel is VPU
fma-bound (99.89% kernel residency, MXU 0%, HBM ~0) — the round-2
"other levers" list flags bf16 pair math as the last untried >= 1.5x
candidate.  Whether it CAN pay hinges on one hardware question: does
the VPU retire bf16 elementwise fmas faster than f32?  (On the MXU
bf16 is 1x-vs-f32-emulation; on the VPU the published picture is
upconvert-and-execute-at-f32-rate, i.e. NO packing gain — but measure,
don't assume.)

This probe times a long chain of dependent fused fmas + the actual mix
the pair loop uses (mul/add/rsqrt/select) on arrays sized to sit in
VMEM after fusion, in f32 vs bf16, via plain jitted XLA (what Mosaic
lowers to as well).  If the bf16/f32 ratio is ~1.0, the kernel
experiment is a measured dead end and docs/perf.md records the
negative result; if it approaches 2x, the pair loop is worth a bf16
variant.

Run on TPU: python scripts/probe_bf16_vpu.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp


def bench(dtype, n_iter=64, shape=(512, 1024)):
    """Chain of dependent fma-ish steps mimicking the pair loop body:
    dx*dx+dy*dy+dz*dz, rsqrt, sigma^2/d2 powers, where-selects."""
    def body(c, _):
        x, y, z = c
        d2 = x * x + y * y + z * z + jnp.asarray(1e-4, dtype)
        inv = jax.lax.rsqrt(d2)
        s2 = jnp.asarray(1.21, dtype) * inv * inv
        s6 = s2 * s2 * s2
        pot = jnp.asarray(4.0, dtype) * (s6 * s6 - s6)
        sel = jnp.where(d2 < jnp.asarray(6.25, dtype), pot,
                        jnp.zeros((), dtype))
        # feed back so iterations are dependent (no ILP collapse)
        x = x + jnp.asarray(1e-6, dtype) * sel
        y = y - jnp.asarray(1e-6, dtype) * sel
        z = z + jnp.asarray(5e-7, dtype) * sel
        return (x, y, z), None

    @jax.jit
    def run(x, y, z):
        (x, y, z), _ = jax.lax.scan(body, (x, y, z), None, length=n_iter)
        return x + y + z

    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, shape, jnp.float32) * 4.0
    args = [a.astype(dtype) for a in (x, x + 0.3, x + 0.7)]
    out = run(*args)
    jax.block_until_ready(out)                  # compile + warm
    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = run(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_rep
    # ~18 "ops" per element per iteration (counting rsqrt as several)
    elems = shape[0] * shape[1] * n_iter
    return dt, elems / dt / 1e9


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    for shape in ((512, 1024), (2048, 2304)):
        t32, g32 = bench(jnp.float32, shape=shape)
        tb, gb = bench(jnp.bfloat16, shape=shape)
        print(f"shape {shape}: f32 {t32*1e3:.3f} ms ({g32:.1f} Gelem/s)"
              f"  bf16 {tb*1e3:.3f} ms ({gb:.1f} Gelem/s)"
              f"  speedup x{t32/tb:.2f}")


if __name__ == "__main__":
    main()
