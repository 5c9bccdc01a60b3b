"""Per-host partitioned reordering: quality degradation vs global reorder.

Measures the BASELINE north-star "per-host reordering" tradeoff: each host
clusters only its own row range (parallel/multihost.py::partitioned_reorder),
so clusters cannot span part boundaries.  This sweeps n_parts over the
reference's shipped real-world graphs + the planted-block synthetic and
reports VBR_nzblocks_count / VBR_nzcount relative to the global (1-part)
reorder.  Output feeds the table in docs/DESIGN.md.

Usage: python scripts/partition_quality.py [--block 128] [--tau 0.1]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=128)
    ap.add_argument("--tau", type=float, default=0.1)
    ap.add_argument("--parts", default="1,2,4,8")
    ap.add_argument("--out", default="results/realworld_v5e/partition_quality.csv")
    args = ap.parse_args()

    from sparta_tpu.datasets import reference_graphs
    from sparta_tpu.definitions import BlockingType
    from sparta_tpu.formats import random_block_csr, read_edgelist
    from sparta_tpu.parallel import partitioned_reorder
    from sparta_tpu.reorder import BlockingEngine
    from sparta_tpu.utils import get_fixed_size_grouping

    mats = {
        "planted_block": random_block_csr(
            10240, 10240, block=128, block_density=0.08, intra_density=0.13,
            seed=7),
    }
    for name, p in reference_graphs().items():
        if name == "wiki-Vote_r":
            continue  # duplicate of wiki-Vote
        mats[name] = read_edgelist(p, pattern_only=True)

    parts_list = [int(p) for p in args.parts.split(",")]
    rows_out = []
    for name, m in mats.items():
        base = None
        for n_parts in parts_list:
            eng = BlockingEngine(
                tau=args.tau, col_block_size=args.block,
                row_block_size=args.block,
                blocking_algo=BlockingType.iterative_clocked,
            )
            t0 = time.time()
            if n_parts == 1:
                g = eng.get_grouping(m)
            else:
                g = partitioned_reorder(m, eng, n_parts=n_parts)
            dt = time.time() - t0
            # score with fixed blocks (what the SpMM actually runs)
            scorer = BlockingEngine(
                col_block_size=args.block, row_block_size=args.block,
                blocking_algo=BlockingType.fixed_size,
            )
            scorer.grouping_result = get_fixed_size_grouping(g, args.block)
            scorer.collect_blocking_info(m)
            row = dict(
                matrix=name, n_parts=n_parts,
                VBR_nzblocks_count=scorer.VBR_nzblocks_count,
                VBR_nzcount=scorer.VBR_nzcount, reorder_s=round(dt, 2),
            )
            if n_parts == parts_list[0]:
                base = row
            row["nzblocks_vs_global"] = round(
                row["VBR_nzblocks_count"] / base["VBR_nzblocks_count"], 4)
            row["nzcount_vs_global"] = round(
                row["VBR_nzcount"] / base["VBR_nzcount"], 4)
            rows_out.append(row)
            print(row, file=sys.stderr, flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    cols = list(rows_out[0])
    with open(out, "w") as f:
        f.write(",".join(cols) + "\n")
        for r in rows_out:
            f.write(",".join(str(r[c]) for c in cols) + "\n")
    print(json.dumps(rows_out[-1]))


if __name__ == "__main__":
    main()
