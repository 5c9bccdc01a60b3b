"""Robust device timing.

The driver's TPU is reached through a tunnel where per-dispatch
``block_until_ready`` is unreliable (it can return before execution and a
host roundtrip costs tens of ms).  So instead of the reference's
cudaEvent-per-rep pattern (cuda_utilities.cpp:135-191) we time ONE dispatch
of a jitted ``lax.fori_loop`` that chains ``iters`` applications of the op
through a data dependency (B is perturbed by eps*C[0,0] each step so nothing
hoists out of the loop), then force completion with a device_get.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_timed_loop(fn: Callable, iters: int):
    """Jitted loop running C = fn(B) ``iters`` times, serialized."""

    @jax.jit
    def loop(B):
        def body(_, carry):
            C = fn(carry)
            eps = jnp.asarray(1e-38, dtype=carry.dtype)
            return carry * (1 + eps * C[(0,) * C.ndim].astype(carry.dtype))

        return jax.lax.fori_loop(0, iters, body, B)

    return loop


def time_op(
    fn: Callable,
    B: jax.Array,
    warmup: int = 1,
    reps: int = 5,
    inner_iters: int = 10,
) -> tuple[float, float, np.ndarray]:
    """Returns (avg_seconds_per_call, std_seconds, last_output_sample).

    ``reps`` outer measurements of an ``inner_iters``-deep serialized loop;
    avg/std computed over the per-iteration times of the outer reps
    (mirrors the reference's warmup/reps protocol, cuda_multiply.cpp:180-185).
    """
    loop = make_timed_loop(fn, inner_iters)
    out = loop(B)
    np.asarray(out)  # compile + settle
    for _ in range(max(warmup - 1, 0)):
        np.asarray(loop(B))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(B)
        np.asarray(out)  # device_get forces real completion through tunnels
        times.append((time.perf_counter() - t0) / inner_iters)
    times = np.asarray(times)
    return float(times.mean()), float(times.std()), out


def time_fn_once(fn: Callable, *args) -> tuple[float, object]:
    """Wall time of one call incl. transfers (for host-side phases)."""
    t0 = time.perf_counter()
    out = fn(*args)
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    return time.perf_counter() - t0, out
