"""Profiling/tracing helpers (aux-subsystem parity: the reference uses ad
hoc @time/@btime lines, `Ewald/main.jl:158,440`, `Ewald/testRecipricol.jl`;
here: jax.profiler traces + a steady-state throughput timer)."""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def throughput(fn, *args, warmup=1, iters=3):
    """Steady-state wall time of a jitted step: returns seconds/call.
    Blocks on the first leaf of the result."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def sweeps_per_sec(mc, state, n_steps=1):
    """Aggregate MC sweeps/second across all chains (the headline metric,
    vs the reference's ~2.8 sweeps/s serial figure, `Ewald/readme.md:28`)."""
    import functools

    f = functools.partial(mc.run_steps, n_steps=n_steps, adjust=False)
    dt = throughput(f, state)
    return state.com.shape[0] * n_steps / dt
