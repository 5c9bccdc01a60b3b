"""Persistent hardware-measurement queue for the tunneled TPU.

Round-3 lesson (VERDICT r3 "what's missing" #1): the tunnel died mid-round
and every hardware number queued behind it was lost.  This runner makes
tunnel time fully unattended: it loops until the device answers, then runs
the round's measurement jobs in priority order, re-probing between jobs and
retrying each one through outages.  Progress and per-job status go to
``results/hw_queue_status.json`` (provenance-stamped) and the log; each
job's stdout/stderr are kept under ``results/hw_logs/``.

Usage:
    python scripts/hw_queue.py [--only job1,job2] [--max-hours 11]
    (designed to run detached: nohup/setsid + output redirect)

Jobs are skipped when their ``done`` marker exists so the queue is
idempotent across restarts.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

LOGDIR = ROOT / "results" / "hw_logs"
STATUS = ROOT / "results" / "hw_queue_status.json"

# (name, argv, timeout_s, retries) — r5 priority order per VERDICT r4
# item 1: the SHORT, blocking-question jobs run FIRST (r4's failure was
# sequencing — a 37-min job ate the window): headline gate, the 43%-MFU
# knobs cells, the ring-kernel Mosaic compile gate, the gather-rate
# calibration grid, then models/attention, then the long campaigns.
# plan_audit runs AFTER gather_probe2 so a recalibrated fine.py (edited
# between jobs; each job is a fresh subprocess) is what gets audited.
JOBS = [
    ("bench_headline", [sys.executable, "bench.py"], 2400, 3),
    ("knobs_probe", [sys.executable, "scripts/knobs_probe.py"], 3600, 2),
    ("ring_kernel_probe", [sys.executable, "scripts/ring_kernel_probe.py"],
     2400, 2),
    ("gather_probe2", [sys.executable, "scripts/gather_probe2.py"], 2400, 2),
    ("fine_probe2", [sys.executable, "scripts/fine_probe2.py"], 3600, 2),
    ("budget_probe", [sys.executable, "scripts/budget_probe.py"], 3600, 2),
    ("attention_bench", [sys.executable, "scripts/attention_bench.py"], 3600, 2),
    ("decode_bench", [sys.executable, "scripts/decode_bench.py"], 2400, 2),
    ("inference_bench", [sys.executable, "scripts/inference_bench.py"],
     2400, 2),
    ("plan_audit", [sys.executable, "scripts/plan_audit.py"], 7200, 2),
    ("fine_bench", [sys.executable, "scripts/fine_bench.py"], 3600, 2),
    ("realworld_fine",
     [sys.executable, "scripts/realworld_campaign.py", "--skip-parity",
      "--autotune"], 10800, 2),
    ("campaign_suite", [sys.executable, "scripts/campaign.py"], 10800, 1),
    ("bench_headline_final", [sys.executable, "bench.py"], 2400, 2),
    # r5c additions (run with --only; the r5-main jobs above are done)
    ("attn2_probe", [sys.executable, "scripts/attn2_probe.py"], 2400, 2),
    ("train_bench", [sys.executable, "scripts/train_bench.py"], 3600, 3),
]


def log(*a):
    print(time.strftime("[%H:%M:%S]"), *a, file=sys.stderr, flush=True)


def write_status(status: dict) -> None:
    # plain json, NO provenance stamp: provenance() imports jax, and
    # in-process backend init can hang forever on a down-but-connecting
    # tunnel — the queue process must never touch the backend itself
    STATUS.parent.mkdir(parents=True, exist_ok=True)
    STATUS.write_text(json.dumps(
        {**status, "_note": "queue status, host-side only"}, indent=1))


def wait_for_tunnel(deadline: float) -> bool:
    from sparta_tpu.bench.device import wait_for_device

    while time.time() < deadline:
        budget = min(600.0, max(60.0, deadline - time.time()))
        if wait_for_device(max_wait=budget, poll=30, subprocess_probe=True):
            return True
        log("tunnel still down; re-probing")
    return False


def run_job(name: str, argv: list[str], timeout: int, retries: int,
            deadline: float, status: dict) -> bool:
    done_marker = LOGDIR / f"{name}.done"
    if done_marker.exists():
        log(f"{name}: already done, skipping")
        status[name] = {"state": "done(cached)"}
        return True
    for attempt in range(retries):
        if not wait_for_tunnel(deadline):
            status[name] = {"state": "aborted: out of time waiting for tunnel"}
            write_status(status)
            return False
        log(f"{name}: attempt {attempt+1}/{retries} — {' '.join(argv[1:])}")
        status[name] = {"state": f"running (attempt {attempt+1})"}
        write_status(status)
        out_f = LOGDIR / f"{name}.out"
        err_f = LOGDIR / f"{name}.err"
        t0 = time.time()
        try:
            with open(out_f, "ab") as fo, open(err_f, "ab") as fe:
                fo.write(f"\n=== attempt {attempt+1} ===\n".encode())
                r = subprocess.run(argv, cwd=ROOT, stdout=fo, stderr=fe,
                                   timeout=timeout)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = -1
            log(f"{name}: TIMED OUT after {timeout}s")
        dt = time.time() - t0
        if rc == 0:
            done_marker.write_text(f"{dt:.0f}s")
            status[name] = {"state": "done", "seconds": round(dt)}
            write_status(status)
            log(f"{name}: DONE in {dt:.0f}s")
            return True
        log(f"{name}: rc={rc} after {dt:.0f}s "
            f"(tail: {err_f.read_text()[-300:] if err_f.exists() else '?'})")
        status[name] = {"state": f"failed rc={rc} (attempt {attempt+1})"}
        write_status(status)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--max-hours", type=float, default=11.0)
    args = ap.parse_args()
    LOGDIR.mkdir(parents=True, exist_ok=True)
    deadline = time.time() + args.max_hours * 3600
    only = set(args.only.split(",")) if args.only else None
    status: dict = {"queue_started": time.strftime("%Y-%m-%dT%H:%M:%S")}
    write_status(status)
    for name, argv, timeout, retries in JOBS:
        if only and name not in only:
            continue
        if time.time() >= deadline:
            log("queue deadline reached")
            break
        run_job(name, argv, timeout, retries, deadline, status)
    status["queue_finished"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    write_status(status)
    log("queue finished")


if __name__ == "__main__":
    main()
