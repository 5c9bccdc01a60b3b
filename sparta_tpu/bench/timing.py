"""Robust device timing.

The driver's TPU is reached through a tunnel where a dispatch+sync carries a
large fixed overhead (~100ms) and per-dispatch ``block_until_ready`` can
return early.  So instead of the reference's cudaEvent-per-rep pattern
(cuda_utilities.cpp:135-191):

1. the op runs inside a jitted ``lax.fori_loop`` with a TRACED trip count
   (one compile, any depth), iterations chained through a data dependency
   (B perturbed by eps*C[0,0]) so nothing hoists or overlaps;
2. per-iteration time is measured DIFFERENTIALLY: time(deep loop) minus
   time(shallow loop) over the iteration delta, cancelling the fixed
   dispatch/transfer overhead exactly;
3. loop depth is auto-calibrated so each measurement runs ~target_time of
   real device work.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def make_timed_loop(fn: Callable, example_B):
    """(B, n) -> scalar checksum, running C = fn(B) n times, serialized.

    ``fn``'s closed-over device arrays are hoisted out of the jaxpr
    (``make_jaxpr(fn).consts``) and passed as EXPLICIT jit arguments:
    captured arrays otherwise lower into the HLO as giant dense literals
    (a 276 MB ELL vals tensor produced a 552 MB program), and the tunnel's
    remote-compile service rejects the request body (HTTP 413).  As
    arguments they ride the normal transfer path instead.
    """
    closed = jax.make_jaxpr(fn)(example_B)
    consts = closed.consts

    def pure(B, *consts):
        out = jax.core.eval_jaxpr(closed.jaxpr, list(consts), B)
        return out[0] if len(out) == 1 else out

    @jax.jit
    def loop(B, n, *consts):
        def body(_, carry):
            C = pure(carry, *consts)
            if isinstance(C, (tuple, list)):
                C = sum(jnp.sum(c.astype(jnp.float32)) for c in C)
            # depend on a FULL reduction of C: reading a single element
            # would let XLA slice the computation down to the one value
            # actually used (e.g. a [M,K]@[K,N] matmul becomes one dot
            # product) and time a fraction of the op. The bump must be
            # computed at RUNTIME (chk * tiny, cast to the carry dtype):
            # a compile-time epsilon constant-folds to 0 for integer
            # carries and the whole loop body gets DCE'd.
            chk = jnp.mean(C.astype(jnp.float32))
            bump = (chk * jnp.float32(1e-38)).astype(carry.dtype)
            return carry + bump

        out = jax.lax.fori_loop(0, n, body, B, unroll=False)
        # return a SCALAR checksum, not the carry: syncing transfers the
        # result through the ~30MB/s tunnel, and a B-sized transfer (~1s
        # for a 34MB operand) would swamp every timing below it
        return jnp.mean(out.astype(jnp.float32))

    return lambda B, n: loop(B, n, *consts)


def time_op(
    fn: Callable,
    B: jax.Array,
    warmup: int = 1,
    reps: int = 5,
    inner_iters: int | None = None,
    target_time: float = 0.4,
) -> tuple[float, float, object]:
    """Returns (avg_seconds_per_call, std_seconds, last_output).

    ``inner_iters`` pins the deep-loop depth explicitly; default is
    auto-calibration toward ``target_time`` seconds of device work.
    """
    loop = make_timed_loop(fn, B)

    def run(n) -> float:
        t0 = time.perf_counter()
        out = loop(B, n)
        np.asarray(out)  # device_get forces completion through the tunnel
        return time.perf_counter() - t0

    run(2)  # compile + settle
    for _ in range(max(warmup - 1, 0)):
        run(2)

    if inner_iters:
        n_big = max(inner_iters, 2)
    else:
        # progressive depth ladder: climb until one dispatch covers
        # target_time of wall clock. This bounds the worst single dispatch
        # at ~8x target_time — extrapolating a depth from a per-op estimate
        # is unsafe (a noisy estimate of a slow op once produced a
        # multi-minute dispatch, which the TPU worker watchdog kills).
        n_big = 2
        for n in (2, 8, 64, 512, 4096, 20000):
            n_big = n
            if run(n) >= target_time:
                break
    n_small = max(n_big // 8, 1)

    def measure() -> tuple[float, np.ndarray]:
        # tunnel noise is purely ADDITIVE (a hiccup can only inflate a
        # wall-clock measurement), so min() over repeats converges on the
        # true time for each depth; the difference of minima is far more
        # robust than the median of per-pair differences
        ts = [run(n_small) for _ in range(reps)]
        tb = [run(n_big) for _ in range(reps)]
        per = (min(tb) - min(ts)) / (n_big - n_small)
        pairs = np.asarray(
            [(b - s) / (n_big - n_small) for s, b in zip(ts, tb)]
        )
        return per, pairs

    per, pairs = measure()
    # a non-positive estimate means even the minima are noise-dominated;
    # deepen the loop and remeasure rather than report a bogus ~0 time
    for _ in range(2):
        if per > 0:
            break
        n_big = min(n_big * 8, 200000)
        n_small = max(n_big // 8, 1)
        per, pairs = measure()
    if per <= 0:
        # persistent even with a deep loop: the device/tunnel is unhealthy
        # (a degraded worker serves erratic latencies). Fail loudly so
        # callers retry in a fresh process instead of recording ~0 ms.
        raise RuntimeError(
            "non-positive differential time after deepening retries — "
            "device measurement unreliable"
        )
    return float(per), float(pairs.std()), None


def time_fn_once(fn: Callable, *args) -> tuple[float, object]:
    """Wall time of one call incl. transfers (for host-side phases)."""
    t0 = time.perf_counter()
    out = fn(*args)
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    return time.perf_counter() - t0, out
