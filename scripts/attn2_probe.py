"""Hardware probe for the v2 chunked flash attention forward.

Compares, at the attention_bench config (h=16, d=64, window=4 causal,
global_blocks=1, bf16):
  - the XLA batched-einsum forward (the r5 measured winner),
  - the v1 one-tile-per-step fused kernel (the r5 measured loser),
  - the v2 chunked wide-dot kernel (this probe's subject),
and checks v2 against the XLA forward numerically at every T first.

Writes results/attn2_probe.json.  Usage: python scripts/attn2_probe.py
[--quick] [--Ts 2048,4096,8192]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparta_tpu.bench.results import write_result  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--Ts", default="2048,4096,8192")
    ap.add_argument("--out", default="results/attn2_probe.json")
    args = ap.parse_args()

    import jax

    from sparta_tpu.bench.device import require_device

    require_device()
    import jax.numpy as jnp

    from sparta_tpu.bench.timing import time_op
    from sparta_tpu.ops.attention import (
        block_sparse_attention,
        build_block_mask,
    )
    from sparta_tpu.ops.attention_pallas import _pallas_forward

    log(f"devices: {jax.devices()}")
    H, D, W = 16, 64, 4
    Ts = (512,) if args.quick else tuple(
        int(t) for t in args.Ts.split(","))
    rng = np.random.default_rng(0)
    out = {"heads": H, "d_head": D, "window": W, "dtype": "bfloat16"}

    for T in Ts:
        mask = build_block_mask(T, T, 128, window=W, causal=True,
                                global_blocks=1)
        q, k, v = (jnp.asarray(rng.standard_normal((H, T, D)),
                               dtype=jnp.bfloat16) for _ in range(3))
        row = {"n_blocks": mask.n_blocks, "density": round(mask.density, 4)}
        fl = 2 * 2 * H * mask.n_blocks * 128 * 128 * D

        # numeric gate: v2 vs the XLA forward (bf16 tolerance)
        ref = np.asarray(block_sparse_attention(
            q, k, v, mask, impl="xla"), dtype=np.float32)
        got = np.asarray(_pallas_forward(
            q, k, v, mask, 1.0 / np.sqrt(D), version=2), dtype=np.float32)
        err = float(np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9))
        row["v2_rel_err"] = err
        log(f"T={T}: v2 vs xla rel_err {err:.2e}")
        assert err < 2e-2, f"v2 mismatch at T={T}: {err}"

        def cell(tag, fn):
            try:
                avg, std, _ = time_op(fn, q, reps=3)
                log(f"T={T} {tag:9}: {avg*1e3:8.3f} ms "
                    f"({fl/avg/1e12:6.2f} TF/s, std {std*1e3:.3f})")
                row[tag] = {"ms": round(avg * 1e3, 3),
                            "tflops": round(fl / avg / 1e12, 2)}
                return avg
            except Exception as e:  # noqa: BLE001
                log(f"T={T} {tag:9}: FAILED {type(e).__name__}: "
                    f"{str(e)[:200]}")
                row[tag] = {"error": str(e)[:200]}
                return None

        sc = 1.0 / np.sqrt(D)
        t_x = cell("xla", lambda x: block_sparse_attention(
            x, k, v, mask, impl="xla"))
        t_1 = cell("pallas_v1", lambda x: _pallas_forward(
            x, k, v, mask, sc, version=1))
        t_2 = cell("pallas_v2", lambda x: _pallas_forward(
            x, k, v, mask, sc, version=2))
        for r in (2, 4):
            if mask.nbr % r == 0:
                cell(f"v2_rows{r}", lambda x, r=r: _pallas_forward(
                    x, k, v, mask, sc, version=2, rows=r))
        if t_x and t_2:
            row["v2_vs_xla"] = round(t_x / t_2, 2)
            log(f"T={T} v2 speedup vs xla: {row['v2_vs_xla']}x")
        if t_1 and t_2:
            row["v2_vs_v1"] = round(t_1 / t_2, 2)

        # training step (fwd+bwd) with the v2 kernels end-to-end vs the
        # r5 production hybrid (XLA fwd + v1 flash bwd)
        from sparta_tpu.ops.attention_pallas import (
            block_sparse_attention_hybrid,
            block_sparse_attention_pallas,
        )

        def g(fn):
            gr = jax.jit(jax.grad(
                lambda x, kk, vv: fn(x, kk, vv).astype(jnp.float32).sum(),
                argnums=(0, 1, 2)))
            return lambda x: gr(x, k, v)[0]

        # numeric gate on the full grads
        gref = jax.grad(lambda x: block_sparse_attention(
            x, k, v, mask, impl="xla").astype(jnp.float32).sum())(q)
        gv2 = jax.grad(lambda x: block_sparse_attention_pallas(
            x, k, v, mask, None, "pallas").astype(jnp.float32).sum())(q)
        gerr = float(jnp.max(jnp.abs(gref.astype(jnp.float32)
                                     - gv2.astype(jnp.float32))) /
                     (jnp.max(jnp.abs(gref.astype(jnp.float32))) + 1e-9))
        row["grad_v2_rel_err"] = gerr
        log(f"T={T}: v2 grad rel_err {gerr:.2e}")

        t_gh = cell("grad_hybrid", g(
            lambda x, kk, vv: block_sparse_attention_hybrid(
                x, kk, vv, mask)))
        t_g2 = cell("grad_v2", g(
            lambda x, kk, vv: block_sparse_attention_pallas(
                x, kk, vv, mask, None, "pallas")))
        if t_gh and t_g2:
            row["grad_v2_vs_hybrid"] = round(t_gh / t_g2, 2)
            log(f"T={T} grad v2 vs hybrid: {row['grad_v2_vs_hybrid']}x")
        out[f"T{T}"] = row
        write_result(args.out, out, quick=args.quick, hw_only=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
