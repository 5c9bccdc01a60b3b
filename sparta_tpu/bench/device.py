"""Device health helpers for the tunneled TPU.

The tunnel drops intermittently and a kernel fault kills the worker (it
self-recovers in ~1-5 min). This is the single implementation of the
probe-until-healthy loop that bench.py / sweeps / ad-hoc scripts share.
"""
from __future__ import annotations

import subprocess
import sys
import time


def ensure_cpu_backend() -> None:
    """Honor JAX_PLATFORMS=cpu despite the image's sitecustomize, which
    force-registers the TPU tunnel backend in every process. Call after
    ``import jax`` and before any backend initialization."""
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def wait_for_device(
    max_wait: float = 600.0,
    poll: float = 20.0,
    subprocess_probe: bool = False,
) -> bool:
    """Probe with a tiny matmul until the device answers or max_wait passes.

    ``subprocess_probe=True`` probes from a fresh python process — required
    when the CURRENT process's client may be poisoned by a worker crash
    (a fresh client is also what the retry will use)."""
    deadline = time.time() + max_wait
    while True:
        if subprocess_probe:
            try:
                # bound each attempt by the REMAINING budget (min 30 s so a
                # short max_wait still allows one real attempt incl. the
                # 20-40 s first compile; max 300 s) — a fixed long timeout
                # would let a hanging tunnel blow way past max_wait
                att = min(300.0, max(30.0, deadline - time.time()))
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp;"
                     "x = jnp.ones((128, 128)); float((x @ x)[0, 0])"],
                    capture_output=True, timeout=att,
                )
                ok = r.returncode == 0
            except subprocess.TimeoutExpired:
                ok = False
        else:
            try:
                import jax.numpy as jnp

                x = jnp.ones((128, 128))
                float((x @ x)[0, 0])
                ok = True
            except Exception:  # noqa: BLE001 — any client error means "down"
                ok = False
        if ok:
            return True
        if time.time() >= deadline:
            return False
        time.sleep(poll)


def require_device(max_wait: float = 1200.0, poll: float = 30.0) -> None:
    """Bounded device gate for TPU bench scripts.

    On a non-CPU drive, probe from a SUBPROCESS before this process
    initializes its backend — a down-but-connecting tunnel hangs in-process
    backend init indefinitely, before any error path can run — and exit
    with a clear message if the device never answers.  On an explicit
    JAX_PLATFORMS=cpu drive this honors the CPU backend and returns."""
    import os

    ensure_cpu_backend()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return
    if not wait_for_device(max_wait=max_wait, poll=poll,
                           subprocess_probe=True):
        raise SystemExit(
            f"device unreachable (tunnel down after {max_wait:.0f}s probe)")
