"""True multi-process jax.distributed test (2 CPU processes over localhost).

Validates the multi-host bring-up path (parallel/multihost.py) the way a
pod slice would use it: both processes call initialize_multihost with a
coordinator address, build a global mesh spanning both processes, and run a
collective over a process-sharded global array.
"""
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
# one device per process (conftest exports 8 virtual devices via XLA_FLAGS,
# which the subprocess would inherit -> 16 global devices)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from sparta_tpu.parallel.multihost import initialize_multihost
initialize_multihost(coordinator_address=sys.argv[1], num_processes=2,
                     process_id=int(sys.argv[2]))
assert jax.process_count() == 2, jax.process_count()
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()), ("x",))
local = np.full((4, 8), int(sys.argv[2]) + 1.0, np.float32)
glob = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("x")), local, (8, 8))
total = jax.jit(lambda a: a.sum(),
                out_shardings=NamedSharding(mesh, P()))(glob)
print("SUM", float(total), flush=True)
"""


def test_two_process_distributed_init():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    src = WORKER.format(repo=str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", src, addr, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err[-2000:]
        outs.append(out)
    # sum over the global array: 4*8*1 + 4*8*2 = 96 on both processes
    for out in outs:
        assert "SUM 96.0" in out, out
