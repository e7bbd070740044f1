"""Honest wall-clock timing for TPU benchmarks.

The tunneled 'axon' TPU relay makes naive timing lie in both directions:
``block_until_ready`` does not reliably await execution (async-queue timing
understates), while per-call host fetches add a fixed round-trip that
overstates.  The methodology used by every benchmark in this repo:

* iterations are CHAINED through a data dependency and execution is forced
  by a host fetch of a scalar reduced from the final result;
* per-iteration time is the SLOPE between two chain lengths, which cancels
  the relay's fixed round-trip latency;
* a known-FLOPs bf16 matmul chain is timed first (``calibrate``) — if that
  calibration is off, nothing else can be trusted either.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# bf16 peak FLOP/s by device kind; used only for MFU sanity reporting.
PEAK_FLOPS = {"tpu v5 lite": 197e12, "tpu v5": 459e12, "tpu v4": 275e12}


def chip_peak() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12


def diag(**rec) -> None:
    """One diagnostic JSON record to stderr."""
    print(json.dumps(rec), file=sys.stderr, flush=True)


def timeit(run_chain, k: int) -> float:
    t0 = time.perf_counter()
    run_chain(k)
    return time.perf_counter() - t0


def slope_time(run_chain, k1: int = 20, k2: int = 60, repeats: int = 3):
    """Per-iteration wall time as the slope between two chain lengths.

    ``run_chain(k)`` must execute k data-dependent iterations and block on
    a host fetch of the final result.  The fetch + relay round-trip is a
    fixed cost that cancels in the difference.

    The shared tunneled chip shows minutes-scale load swings (2x observed),
    so the (k1, k2) samples are INTERLEAVED and the minimum per chain
    length is taken across repeats: contention only ever adds time, and
    interleaving keeps a load shift between the k1 phase and the k2 phase
    from corrupting the slope.  If every window was contended such that
    t(k2) <= t(k1), fall back to the conservative average t(k2)/k2
    (includes the fixed round-trip — overstates, never understates).
    """
    t1s, t2s = [], []
    for _ in range(repeats):
        t1s.append(timeit(run_chain, k1))
        t2s.append(timeit(run_chain, k2))
    t1, t2 = min(t1s), min(t2s)
    if t2 <= t1:
        return t2 / k2
    return (t2 - t1) / (k2 - k1)


def calibrate(n: int = 4096) -> float:
    """Time a known-FLOPs bf16 matmul chain; return measured/peak."""
    x = jax.device_put(jnp.full((n, n), 1e-3, jnp.bfloat16))
    w = jax.device_put(jnp.full((n, n), 1e-3, jnp.bfloat16))
    mm = jax.jit(lambda a, b: jnp.dot(a, b))
    red = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(red(mm(x, w)))  # compile + warm

    def chain(k):
        y = x
        for _ in range(k):
            y = mm(y, w)
        float(red(y))

    dt = slope_time(chain, 20, 60)
    frac = 2 * n**3 / dt / chip_peak()
    diag(record="calibration", matmul_n=n, ms=round(dt * 1e3, 4),
         fraction_of_peak=round(frac, 3))
    return frac


def device_chain(step):
    """Warmed ``chain(k)`` running ``step(s: f32 scalar) -> f32 scalar``
    as one dynamic-trip-count on-device ``fori_loop`` program (one
    compile, k passed at runtime): zero host dispatch inside the chain —
    required for kernels faster than the ~0.1 ms per-call dispatch/relay
    floor, and the building block callers interleave via ``bench_pair``-
    style harnesses."""
    @jax.jit
    def run_k(k):
        return jax.lax.fori_loop(
            0, k, lambda _, s: step(s), jnp.float32(0.0)
        )

    float(run_k(jnp.int32(3)))  # compile + warm

    def chain(k):
        float(run_k(jnp.int32(k)))

    return chain


def scalar_chain_time(step, k1: int = 10, k2: int = 30,
                      repeats: int = 3, on_device: bool = False) -> float:
    """Slope-time a ``step(s: f32 scalar) -> f32 scalar``.

    The scalar carry forces each iteration to depend on the previous one,
    so the chain cannot overlap with itself; the final ``float()`` forces
    full execution.

    ``on_device=True`` uses ``device_chain`` (see there).
    """
    if on_device:
        chain = device_chain(step)
    else:
        s = step(jnp.float32(0.0))  # warm/compile
        float(s)

        def chain(k):
            s = jnp.float32(0.0)
            for _ in range(k):
                s = step(s)
            float(s)

    return slope_time(chain, k1, k2, repeats)


def step_flops(step, *args) -> float | None:
    """XLA cost_analysis FLOPs of a jitted callable, or None."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None
