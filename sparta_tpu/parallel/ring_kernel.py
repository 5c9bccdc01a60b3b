"""Fused ring SpMM kernels: compute/communication overlap inside ONE
Pallas kernel.

``spmm_ring`` / ``spmm_colsplit_reduce_scatter`` (parallel/spmm.py) leave
the overlap of ICI transfers and MXU compute to the XLA scheduler (one
collective per rotation / one big ``psum_scatter`` at the end).  The two
kernels here fuse the whole ring:

- ``spmm_ring_pallas`` — row-sharded A, column-sharded B: every device
  keeps its A row stripe resident in VMEM and, per step, multiplies the B
  shard it currently holds while the SAME shard is already streaming to
  the left neighbor via `pltpu.make_async_remote_copy`.
- ``spmm_reduce_scatter_pallas`` — column-split A, row-sharded B: each
  step computes this device's partial product for the NEXT row stripe
  while the previous accumulated stripe is still in flight, then adds and
  forwards — a compute-fused ring reduce-scatter.

Guaranteed overlap, no XLA scheduling boundary, one kernel launch for the
whole multi-chip product.

Slot safety uses a credit protocol (the standard ring flow control): the
receiver signals one credit to its sender (right neighbor) whenever a
double-buffer slot becomes free — a send may only start after taking a
credit, so a fast sender can never overwrite a slot its lagging receiver
is still reading.  Credits are exactly balanced (1 initial + one per
completed step), so all semaphores drain to zero by kernel exit.

Layout contract (mirrors ``spmm_ring``): A row-sharded (BellDevice arrays,
ELL), B column-sharded ``P(None, axis)``; output C row-sharded
``P(axis, None)``.  Resident-A variant: the local vals and two B-shard
slots must fit VMEM (the regime where the ring pays — B too big to
replicate, A stripe small enough to stay resident).

Runs in interpret mode on the virtual CPU mesh (tested bit-true against
the ppermute ring and the scipy oracle) and compiles for real ICI rings
unchanged.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.device import BellDevice


def _ring_kernel(nb_ref, cols_ref, vals_ref, b_ref, out_ref,
                 bslots, acc, send_sem, recv_sem, out_sem, cap_sem,
                 *, n: int, axis: str, nbr: int, bh: int, bw: int,
                 n_chunk: int, use_credits: bool, use_barrier: bool):
    # use_credits=False only in interpret mode: the simulator does not
    # implement remote semaphore_signal, and its deterministic serialized
    # schedule cannot race a sender past a lagging receiver; compiled
    # kernels ALWAYS run the credit protocol.  use_barrier mirrors the
    # host-side collective_id setting: Mosaic requires kernels compiled
    # with a collective_id to synchronize through the global barrier
    # semaphore (r5 hardware gate, results/hw_logs/ring_kernel_probe.err:
    # "collective_id has to be unspecified or None when not using a
    # custom barrier"), and the neighbor barrier is the right startup
    # sync for RDMA anyway — no remote write can land before its target
    # kernel is resident.
    me = lax.axis_index(axis)
    left = lax.rem(me - 1 + n, n)
    right = lax.rem(me + 1, n)

    # local B shard into slot 0; the right neighbor's first send targets
    # slot 1 (never read before its recv), so grant one initial credit
    bslots[0] = b_ref[:].astype(bslots.dtype)
    if use_barrier:
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right)
        pltpu.semaphore_wait(barrier, 2)
    if use_credits and n > 1:
        # n == 1 never sends: an unconsumed initial credit would leave the
        # semaphore non-zero at kernel exit
        pltpu.semaphore_signal(cap_sem, inc=1, device_id=right)
    if use_barrier and n == 1:
        # exercise_collective compile gate at n=1: run the credit
        # signal/wait pair against self so the collective body (remote
        # semaphore ops + barrier + collective_id) meets the REAL Mosaic
        # compiler on one chip, with every semaphore drained at exit
        pltpu.semaphore_signal(cap_sem, inc=1, device_id=right)
        pltpu.semaphore_wait(cap_sem, 1)

    def step(s, _):
        cur = lax.rem(s, 2)
        nxt = lax.rem(s + 1, 2)

        @pl.when(s < n - 1)
        def _():
            # flow control: the left neighbor's slot `nxt` must be free
            if use_credits:
                pltpu.semaphore_wait(cap_sem, 1)
            pltpu.make_async_remote_copy(
                src_ref=bslots.at[cur], dst_ref=bslots.at[nxt],
                send_sem=send_sem.at[cur], recv_sem=recv_sem.at[nxt],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).start()

        # the shard in `cur` originated at device (me + s) % n: its C
        # column stripe starts there
        origin = lax.rem(me + s, n)

        def row(i, _):
            acc[...] = jnp.zeros_like(acc)

            def blk(k, _):
                c = cols_ref[i, k]
                a = vals_ref[i, k]
                btile = bslots[cur, pl.ds(c * bw, bw), :]
                acc[...] += jax.lax.dot_general(
                    a, btile, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0

            lax.fori_loop(0, nb_ref[i], blk, 0)
            cp = pltpu.make_async_copy(
                acc, out_ref.at[pl.ds(i * bh, bh),
                                pl.ds(origin * n_chunk, n_chunk)],
                out_sem)
            cp.start()
            cp.wait()
            return 0

        lax.fori_loop(0, nbr, row, 0)

        @pl.when(s < n - 1)
        def _():
            pltpu.make_async_remote_copy(
                src_ref=bslots.at[cur], dst_ref=bslots.at[nxt],
                send_sem=send_sem.at[cur], recv_sem=recv_sem.at[nxt],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL,
            ).wait()

        if use_credits:
            @pl.when(s < n - 2)
            def _():
                # slot cur is now free (compute done, send drained): one
                # more credit for the sender.  Credits balance: 1 initial
                # + (n-2) here == the sender's (n-1) waits.
                pltpu.semaphore_signal(cap_sem, inc=1, device_id=right)

        return 0

    lax.fori_loop(0, n, step, 0)


def spmm_ring_pallas(bell_dev: BellDevice, B: jax.Array, mesh: Mesh,
                     axis: str = "x", interpret: bool | None = None,
                     use_credits: bool | None = None,
                     exercise_collective: bool = False) -> jax.Array:
    """Row-sharded A x column-sharded B through the fused ring kernel.

    Same contract as ``spmm_ring``: ``bell_dev`` row-sharded on ``axis``,
    ``B [K, N]`` sharded over N, returns C ``[M, N]`` row-sharded.  N must
    divide by the ring size; the local vals + 2 B slots must fit VMEM.

    ``use_credits`` None keeps the default (credits everywhere except the
    interpret simulator, which refuses remote semaphore signals — see
    tests/test_ring_protocol.py where the override pins that status).
    ``exercise_collective`` forces the collective body (barrier +
    collective_id + credit semaphore ops, self-targeted and balanced) at
    n == 1 — the single-chip Mosaic compile gate
    (scripts/ring_kernel_probe.py)."""
    n = mesh.shape[axis]
    N = B.shape[1]
    if N % n:
        raise ValueError(f"N={N} not divisible by ring size {n}")
    n_chunk = N // n
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if use_credits is None:
        use_credits = not interpret
    # Mosaic pairs collective_id with mandatory custom-barrier use; both
    # ride together: every compiled multi-device kernel, plus the n=1
    # compile-gate when exercised.  Interpret mode can't remote-signal.
    use_barrier = (n > 1 and not interpret) or exercise_collective

    def local(ci, nb, v, b_local):
        nbr, max_nb, bh, bw = v.shape
        Kp = b_local.shape[0]
        kern = functools.partial(
            _ring_kernel, n=n, axis=axis, nbr=nbr, bh=bh, bw=bw,
            n_chunk=n_chunk, use_credits=use_credits,
            use_barrier=use_barrier)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nbr * bh, N), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # nb_row
                pl.BlockSpec(memory_space=pltpu.SMEM),   # cols_idx
                pl.BlockSpec(memory_space=pltpu.VMEM),   # vals (resident A)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # local B shard
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, Kp, n_chunk), v.dtype),   # ring slots
                pltpu.VMEM((bh, n_chunk), jnp.float32),  # fp32 accumulator
                pltpu.SemaphoreType.DMA((2,)),           # send
                pltpu.SemaphoreType.DMA((2,)),           # recv
                pltpu.SemaphoreType.DMA,                 # out write
                pltpu.SemaphoreType.REGULAR,             # credits
            ],
            interpret=interpret,
            # the default 16 MB SCOPED vmem limit is what the compiler
            # charges ANY-space outputs against — the r5 n=1 compile
            # gate found the [nbr*bh, N] f32 output landing on that
            # stack (ring_kernel_probe.err: "16.50M and limit 16.00M").
            # v5e VMEM is 128 MB; raise the cap so resident-A + slots +
            # output fit (the multi-chip regime divides all of them by n)
            compiler_params=pltpu.CompilerParams(
                collective_id=7 if use_barrier else None,
                vmem_limit_bytes=112 * 1024 * 1024,
                has_side_effects=True),
        )(nb.astype(jnp.int32), ci.astype(jnp.int32), v, b_local)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis, None, None, None),
                  P(None, axis)),
        out_specs=P(axis, None),
        check_vma=False,
    )(bell_dev.cols_idx, bell_dev.nb_row, bell_dev.vals, B)


def _rs_kernel(nb_ref, cols_ref, vals_ref, b_ref, out_ref,
               slots, pbuf, acc, send_sem, recv_sem, out_sem, cap_sem,
               *, n: int, axis: str, nbr_loc: int, bh: int, bw: int,
               use_credits: bool, use_barrier: bool):
    """Compute-fused ring reduce-scatter (see spmm_reduce_scatter_pallas).

    Per step s, this device's partial product for row stripe
    j = (me+1+s) % n is computed into ``pbuf`` WHILE the previous step's
    accumulated chunk is still in flight over ICI; the incoming chunk is
    then waited on, ``pbuf`` added, and the sum forwarded left.  After
    n-1 hops stripe ``me`` has collected every device's contribution and
    lands here — the fused form of ``psum_scatter``.
    """
    me = lax.axis_index(axis)
    left = lax.rem(me - 1 + n, n)
    right = lax.rem(me + 1, n)
    if use_barrier:
        # see _ring_kernel: collective_id mandates barrier use, and the
        # startup sync is needed before any RDMA/credit signal anyway
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right)
        pltpu.semaphore_wait(barrier, 2)
    if use_credits and n > 1:
        # n == 1 never sends: an unconsumed initial credit would leave the
        # semaphore non-zero at kernel exit
        pltpu.semaphore_signal(cap_sem, inc=1, device_id=right)
    if use_barrier and n == 1:
        # exercise_collective compile gate (see _ring_kernel)
        pltpu.semaphore_signal(cap_sem, inc=1, device_id=right)
        pltpu.semaphore_wait(cap_sem, 1)

    def rdma(s):
        cur = lax.rem(s, 2)
        nxt = lax.rem(s + 1, 2)
        return pltpu.make_async_remote_copy(
            src_ref=slots.at[cur], dst_ref=slots.at[nxt],
            send_sem=send_sem.at[cur], recv_sem=recv_sem.at[nxt],
            device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL)

    def step(s, _):
        cur = lax.rem(s, 2)
        j = lax.rem(me + 1 + s, n)     # stripe accumulated this step

        # my contribution to stripe j — overlaps the in-flight transfer
        def row(i, _):
            acc[...] = jnp.zeros_like(acc)
            gi = j * nbr_loc + i

            def blk(k, _):
                c = cols_ref[gi, k]
                btile = b_ref[pl.ds(c * bw, bw), :]
                acc[...] += jax.lax.dot_general(
                    vals_ref[gi, k], btile, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0

            lax.fori_loop(0, nb_ref[gi], blk, 0)
            pbuf[pl.ds(i * bh, bh), :] = acc[...]
            return 0

        lax.fori_loop(0, nbr_loc, row, 0)

        @pl.when(s > 0)
        def _():
            rdma(s - 1).wait()
            slots[cur] += pbuf[...]

        @pl.when(s == 0)
        def _():
            slots[cur] = pbuf[...]

        @pl.when(s < n - 1)
        def _():
            if use_credits:
                pltpu.semaphore_wait(cap_sem, 1)
            rdma(s).start()

        if use_credits:
            @pl.when(s < n - 2)
            def _():
                pltpu.semaphore_signal(cap_sem, inc=1, device_id=right)

        return 0

    lax.fori_loop(0, n, step, 0)
    # stripe `me`, fully reduced, sits in the final step's slot (every
    # rdma was waited inside its successor step before accumulation)
    last = (n - 1) % 2
    cp = pltpu.make_async_copy(slots.at[last], out_ref, out_sem)
    cp.start()
    cp.wait()


def spmm_reduce_scatter_pallas(cols_idx, nb_row, vals, B, mesh: Mesh,
                               axis: str = "x",
                               interpret: bool | None = None,
                               use_credits: bool | None = None,
                               exercise_collective: bool = False
                               ) -> jax.Array:
    """Column-split A x row-sharded B with a COMPUTE-FUSED ring
    reduce-scatter, all inside one Pallas kernel per device.

    Same layout contract as ``spmm_colsplit_reduce_scatter``:
    cols_idx [P, nbr, w] / nb_row [P, nbr] / vals [P, nbr, w, bh, bw]
    (each device's K-slice sub-BELL from ``split_bell_cols``, block rows
    padded to a multiple of the ring size via ``pad_block_rows``) and
    B [P, k_part*bw, N].  Returns C [M, N] row-sharded.  Each step's
    partial-product compute overlaps the previous accumulated chunk's ICI
    transfer; flow control as in ``spmm_ring_pallas``.
    """
    n = mesh.shape[axis]
    nbr = cols_idx.shape[1]
    if nbr % n:
        raise ValueError(f"block rows {nbr} not a multiple of ring size "
                         f"{n}; pad_block_rows first")
    nbr_loc = nbr // n
    N = B.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if use_credits is None:
        use_credits = not interpret
    use_barrier = (n > 1 and not interpret) or exercise_collective

    def local(ci, nb, v, b):
        ci, nb, v, b = ci[0], nb[0], v[0], b[0]
        _, _, bh, bw = v.shape
        kern = functools.partial(
            _rs_kernel, n=n, axis=axis, nbr_loc=nbr_loc, bh=bh, bw=bw,
            use_credits=use_credits, use_barrier=use_barrier)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nbr_loc * bh, N), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),   # nb_row
                pl.BlockSpec(memory_space=pltpu.SMEM),   # cols_idx
                pl.BlockSpec(memory_space=pltpu.VMEM),   # vals (K-slice)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # local B rows
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, nbr_loc * bh, N), jnp.float32),  # ring slots
                pltpu.VMEM((nbr_loc * bh, N), jnp.float32),     # my partial
                pltpu.VMEM((bh, N), jnp.float32),               # row acc
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.REGULAR,
            ],
            interpret=interpret,
            # see spmm_ring_pallas: ANY-space outputs charge the scoped
            # vmem stack; raise the cap above the 16 MB default
            compiler_params=pltpu.CompilerParams(
                collective_id=8 if use_barrier else None,
                vmem_limit_bytes=112 * 1024 * 1024,
                has_side_effects=True),
        )(nb.astype(jnp.int32), ci.astype(jnp.int32), v, b)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None),
                  P(axis, None, None, None, None), P(axis, None, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )(cols_idx, nb_row, vals, B).reshape(-1, N)
