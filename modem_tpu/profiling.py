"""Tracing / roofline accounting (SURVEY.md section 5: the reference has no
timers or counters anywhere; here throughput and roofline utilization are
first-class outputs).

Notes for this environment: the TPU sits behind an async tunnel whose
``block_until_ready`` can report completion before remote execution finishes.
:func:`measure` therefore times a device-side ``lax.scan`` over repetitions
and fetches a derived scalar — the same methodology as ``bench.py``.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context; open the result with Perfetto/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class Measurement:
    seconds_per_call: float            # best (min) over the timing passes
    samples_per_s: float
    flops_per_s: float | None
    bytes_per_s: float | None
    #: per-pass seconds_per_call for every timing pass (len == passes)
    all_seconds: tuple = ()

    @property
    def spread(self) -> float:
        """(max - min) / min over the timing passes — the run-to-run
        variability of this device (~±15% is normal here)."""
        if len(self.all_seconds) < 2:
            return 0.0
        return (max(self.all_seconds) - min(self.all_seconds)) / min(
            self.all_seconds
        )

    @property
    def median_seconds_per_call(self) -> float:
        s = sorted(self.all_seconds) or [self.seconds_per_call]
        return s[len(s) // 2]

    def summary(self) -> str:
        parts = [f"{self.seconds_per_call * 1e3:.3f} ms/call",
                 f"{self.samples_per_s / 1e9:.3f} Gsamp/s"]
        if self.flops_per_s is not None:
            parts.append(f"{self.flops_per_s / 1e12:.3f} TFLOP/s")
        if self.bytes_per_s is not None:
            parts.append(f"{self.bytes_per_s / 1e9:.1f} GB/s")
        if len(self.all_seconds) >= 2:
            parts.append(f"spread {self.spread * 100:.0f}%")
        return "  ".join(parts)


@dataclasses.dataclass(frozen=True)
class MarginalMeasurement:
    """Floor-free throughput: rate from the SLOPE between two work scales.

    This device adds a fixed dispatch/fetch floor (~31 ms measured) to
    every jitted invocation, so a single-size measurement of anything
    cheaper than several floors reports the floor, not the op (this is
    how round 1 under-reported every number 3-10x — see BENCH.md).
    ``marginal_samples_per_s`` cancels the floor by construction;
    ``floor_seconds`` is the extrapolated zero-work intercept.
    """

    marginal_samples_per_s: float
    floor_seconds: float
    small: Measurement
    large: Measurement

    def summary(self) -> str:
        return (f"{self.marginal_samples_per_s / 1e9:.3f} Gsamp/s marginal"
                f"  (floor {self.floor_seconds * 1e3:.1f} ms; small/large "
                f"spreads {self.small.spread * 100:.0f}%/"
                f"{self.large.spread * 100:.0f}%)")


def measure_marginal(
    fn,
    args_small: tuple,
    args_large: tuple,
    samples_per_call: int,
    passes: int = 5,
) -> MarginalMeasurement:
    """Floor-free :func:`measure`: time ``fn`` at two repetition scales
    (``args_small``/``args_large``: same per-rep shapes, different leading
    rep counts) and report the marginal rate between them.
    """
    r1 = jax.tree_util.tree_leaves(args_small)[0].shape[0]
    r2 = jax.tree_util.tree_leaves(args_large)[0].shape[0]
    if r2 <= r1:
        raise ValueError("args_large must have more reps than args_small")
    m1 = measure(fn, args_small, samples_per_call, passes=passes)
    m2 = measure(fn, args_large, samples_per_call, passes=passes)
    t1 = m1.seconds_per_call * r1  # best total wall per pass
    t2 = m2.seconds_per_call * r2
    slope = (r2 - r1) * samples_per_call / max(t2 - t1, 1e-12)
    floor = max(t1 - r1 * samples_per_call / slope, 0.0)
    return MarginalMeasurement(
        marginal_samples_per_s=slope, floor_seconds=floor,
        small=m1, large=m2,
    )


def measure(
    fn,
    args_per_rep: tuple,
    samples_per_call: int,
    flops_per_call: int | None = None,
    bytes_per_call: int | None = None,
    passes: int = 5,
) -> Measurement:
    """Time ``fn`` with the device-side repetition loop.

    ``args_per_rep``: a tuple of arrays each with a leading repetition axis —
    the loop body scans over *distinct* inputs, so XLA cannot hoist the call
    out of the loop (a constant-args loop would be loop-invariant and measure
    nothing). ``fn`` must return an array (its sum becomes the checksum).

    ``passes`` timing passes are taken (>= 5 by default; this device varies
    ±15% run-to-run); the headline number is the best pass and every pass is
    recorded in ``all_seconds`` so callers can report the spread.
    """
    reps = jax.tree_util.tree_leaves(args_per_rep)[0].shape[0]

    def run(a):
        def body(carry, blk):
            out = fn(*blk)
            return carry + jnp.sum(out).astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), a)
        return acc

    jitted = jax.jit(run)
    jitted(args_per_rep).block_until_ready()  # compile
    float(jitted(args_per_rep))               # absorb first-sync anomaly
    times = []
    for _ in range(max(passes, 2)):
        t0 = time.perf_counter()
        float(jitted(args_per_rep))
        times.append((time.perf_counter() - t0) / reps)
    best = min(times)
    return Measurement(
        seconds_per_call=best,
        samples_per_s=samples_per_call / best,
        flops_per_s=None if flops_per_call is None else flops_per_call / best,
        bytes_per_s=None if bytes_per_call is None else bytes_per_call / best,
        all_seconds=tuple(times),
    )
