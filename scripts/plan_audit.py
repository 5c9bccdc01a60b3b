"""Model-vs-measured audit of the csr_spmm_auto candidate table across
the campaign matrices (VERDICT r3 weak #4 / next-round #6).

Runs ``tools plan --audit`` per matrix: every non-disqualified candidate
is built and timed, mispicks >1.5x are flagged, and each audit lands in
``results/plan_audit_<stem>.json`` (provenance-stamped; CPU runs reroute
to *_cpu.json).  Matrices: the reference's real-world graphs that have a
canonical .el under results/realworld_v5e/matrices (written by the
campaign) plus synthetic rmat17/fem/planted at campaign scale.

Usage: python scripts/plan_audit.py [--quick] [--b-cols 2048]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--b-cols", type=int, default=2048)
    args = ap.parse_args()

    from sparta_tpu.bench.device import require_device

    require_device()

    from sparta_tpu import tools
    from sparta_tpu.datasets import stencil_csr
    from sparta_tpu.formats import random_block_csr
    from sparta_tpu.formats.csr import rmat_csr

    tmp = Path("results/plan_audit_matrices")
    tmp.mkdir(parents=True, exist_ok=True)
    targets: list[Path] = []

    rw = ROOT / "results/realworld_v5e/matrices"
    wanted = ("ia-wikiquote-user-edits-nodup", "social_location",
              "wiki-Vote", "ca-HepPh_r", "bcsstk18_r")
    for name in wanted[: 2 if args.quick else None]:
        p = rw / f"{name}.el"
        if p.exists():
            targets.append(p)
        else:
            log(f"skip {name}: no canonical .el (campaign not run yet)")

    if not args.quick:
        synth = {
            "rmat17_ef8": lambda: rmat_csr(17, edge_factor=8, seed=1),
            "rmat13_ef8": lambda: rmat_csr(13, edge_factor=8, seed=4),
            "fem_2d_8100": lambda: stencil_csr((90, 90), pattern="box",
                                               seed=5),
            "planted_10240": lambda: random_block_csr(
                10240, 10240, block=128, block_density=0.08,
                intra_density=0.13, seed=7),
        }
        for name, build in synth.items():
            p = tmp / f"{name}.el"
            if not p.exists():
                build().save_to_edgelist(p)
            targets.append(p)

    n = args.b_cols
    for p in targets:
        log(f"=== audit {p.stem} (b_cols={n})")
        try:
            tools.main(["plan", str(p), "--audit", "-c", str(n)])
        except SystemExit:
            pass
        except Exception as e:  # noqa: BLE001 — continue the sweep
            log(f"{p.stem}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
