"""Experiment sweeps with idempotent resume.

TPU-native equivalent of the reference's SLURM sweep layer
(src/scripts/run_blocking_experiments*.sh, run_multiplication_experiments_
fixed_cluster.sh): a sweep is a grid over {matrix, tau, block sizes, algo,
backend}; each cell runs as one experiment whose output file is keyed by a
config hash — existing outputs are skipped, so an interrupted sweep resumes
for free (the reference's skip-if-output-exists pattern,
run_blocking_experiments_cluster.sh:59-65).
"""
from __future__ import annotations

import dataclasses
import hashlib
import itertools
import json
from pathlib import Path

from ..cli import Config
from .runner import run_experiment

# named flag bundles from the reference sweep scripts
# (run_multiplication_experiments_fixed_cluster.sh:14-20)
EXPERIMENT_BUNDLES = {
    "BCSR_reord": dict(force_fixed_size=True, blocking_algo=5, multiplication_algo=6),
    "BCSR_no_reord": dict(force_fixed_size=True, blocking_algo=2, multiplication_algo=6),
    "CSR": dict(multiplication_algo=2),
    "GEMM": dict(multiplication_algo=1),
    "BELLPACK_no_block": dict(force_fixed_size=True, blocking_algo=2,
                              multiplication_algo=3),
    "BELLPACK_blocked": dict(force_fixed_size=True, blocking_algo=5,
                             multiplication_algo=3),
    "PALLAS_blocked": dict(force_fixed_size=True, blocking_algo=5,
                           multiplication_algo=8),
    "PALLAS_int8": dict(force_fixed_size=True, blocking_algo=5,
                        multiplication_algo=8, dtype="int8"),
}


def config_hash(cfg: Config) -> str:
    """Stable cell key: hash only fields that differ from the Config default,
    so adding new defaults-only fields to Config keeps old cell hashes (and
    cached sweep results) valid."""
    payload = {}
    for f in dataclasses.fields(cfg):
        if f.name in ("outfile", "verbose"):
            continue
        v = getattr(cfg, f.name)
        if f.default is not dataclasses.MISSING and v == f.default:
            continue
        payload[f.name] = v
    return hashlib.sha1(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


def _extract_error_line(stderr: str) -> str:
    """Surface the actual exception line from a failed cell's stderr — not
    JAX's traceback-filter notice, which is the literal last line on any
    jax error."""
    lines = (stderr or "").strip().splitlines() or ["?"]
    return next(
        (ln for ln in reversed(lines)
         if ("Error" in ln or "Exception" in ln)
         and "JAX_TRACEBACK_FILTERING" not in ln),
        " | ".join(lines[-3:]),
    )


def _run_cell_isolated(cfg: Config, timeout: int = 1800) -> dict:
    """Run one experiment in a fresh subprocess.

    Isolation matters on the tunneled TPU: a kernel fault or a degraded
    worker poisons every subsequent measurement in the same process, so each
    cell gets a fresh client; between attempts we probe until the device
    answers (the worker self-recovers in ~1-5 min after a crash)."""
    import subprocess
    import sys
    import time

    from ..cli import config_to_argv

    argv = config_to_argv(dataclasses.replace(cfg, verbose=0))
    err = "?"
    for attempt in range(3):
        try:
            r = subprocess.run(
                [sys.executable, "-m", "sparta_tpu.cli", *argv],
                capture_output=True, text=True, timeout=timeout,
            )
            result_json = Path(str(cfg.outfile) + ".json")
            if r.returncode == 0 and result_json.exists():
                return json.loads(result_json.read_text())
            err = _extract_error_line(r.stderr)
        except subprocess.TimeoutExpired:
            err = f"cell timed out after {timeout}s"
        if attempt < 2:  # wait for the device to come back
            from .device import wait_for_device

            wait_for_device(subprocess_probe=True)
    raise RuntimeError(f"cell failed after retries: {err[:300]}")


def run_sweep(
    matrices: list[str],
    grid: dict,
    out_dir: str | Path,
    base: Config | None = None,
    resume: bool = True,
    on_result=None,
    isolate: bool = False,
) -> list[dict]:
    """grid: {field_name: [values...]}.  Returns result rows (loaded from
    disk for skipped cells).  ``isolate`` runs each cell in its own
    subprocess (recommended on the real TPU; see _run_cell_isolated)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = []
    keys = list(grid)
    for matrix in matrices:
        for combo in itertools.product(*(grid[k] for k in keys)):
            cfg = dataclasses.replace(base or Config())
            cfg.filename = str(matrix)
            for k, v in zip(keys, combo):
                setattr(cfg, k, v)
            h = config_hash(cfg)
            cell = out_dir / f"{Path(str(matrix)).stem}_{h}.json"
            cfg.outfile = str(out_dir / f"{Path(str(matrix)).stem}_{h}.csv")
            if resume and cell.exists():
                results.append(json.loads(cell.read_text()))
                continue
            if isolate:
                row = _run_cell_isolated(cfg)
            else:
                row = run_experiment(cfg)
            row = {k: (v if not hasattr(v, "item") else v.item())
                   for k, v in row.items()}
            cell.write_text(json.dumps(row, default=float))
            results.append(row)
            if on_result:
                on_result(row)
    return results


def collect_csvs(out_dir: str | Path, dest: str | Path) -> int:
    """Concatenate per-run 2-line CSVs into one table (reference
    collect_experiments.sh / utils/collect_*.sh).

    Cells written by different framework versions can carry different
    EXTRA column tails; rows are merged BY NAME (first file's order,
    new fields appended; missing values empty) so schemas never
    misalign silently."""
    import csv as csvmod

    out_dir = Path(out_dir)
    rows: list[dict] = []
    fields: list[str] = []
    for f in sorted(out_dir.glob("*.csv")):
        lines = f.read_text().strip().splitlines()
        if len(lines) < 2:
            continue
        for r in csvmod.DictReader(lines):
            rows.append(r)
            for k in r:
                if k not in fields:
                    fields.append(k)
    if not fields:
        return 0
    with open(dest, "w", newline="") as fh:
        w = csvmod.DictWriter(fh, fieldnames=fields, restval="")
        w.writeheader()
        w.writerows(rows)
    return len(rows)
