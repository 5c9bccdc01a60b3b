"""Multi-chip scaling benchmark: nnz/s at 1..N devices.

Measures the BASELINE.md scaling target (>=80% nnz/s efficiency beyond one
host) for the three sharded SpMM layouts.  Runs on whatever devices exist —
a real pod slice, or a virtual CPU mesh for logic validation:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/scaling_bench.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    from sparta_tpu.bench.device import ensure_cpu_backend

    ensure_cpu_backend()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sparta_tpu.bench.timing import time_op
    from sparta_tpu.formats import bell_from_csr, random_block_csr
    from sparta_tpu.parallel import make_mesh, shard_bell_rowwise, spmm_ring
    from sparta_tpu.ops import pad_b_for_bell, bell_spmm_xla

    n_dev = jax.device_count()
    print(f"devices: {n_dev}", file=sys.stderr)
    size = 8192 if jax.default_backend() != "cpu" else 1024
    m = random_block_csr(size, size, block=128, block_density=0.1,
                         intra_density=0.3, seed=3)
    bell = bell_from_csr(m, None, block_row_size=128)
    N = 1024 if jax.default_backend() != "cpu" else 256
    rows = []
    for nd in [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]:
        mesh = make_mesh(nd)
        dev = shard_bell_rowwise(bell, mesh)
        B = jax.device_put(
            pad_b_for_bell(np.random.default_rng(0).standard_normal(
                (bell.shape[1], N)).astype(np.float32), bell),
            NamedSharding(mesh, P()),
        )
        avg, std, _ = time_op(lambda b: bell_spmm_xla(dev, b), B, reps=3, target_time=0.15)
        nnz_s = m.nnz / avg
        rows.append({"devices": nd, "layout": "row_sharded", "ms": avg * 1e3,
                     "nnz_per_s": nnz_s})
        print(rows[-1], file=sys.stderr)
    base = rows[0]["nnz_per_s"]
    for r in rows:
        r["efficiency"] = r["nnz_per_s"] / (base * r["devices"])
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
