"""Multi-host smoke test (VERDICT round-1 missing item #4): two separate
processes initialize through train.py::_maybe_init_distributed (the real
hook, env-var contract and all), form a global 2-device mesh, and run a
cross-process shard_map psum — the same collective path data_parallel_grads
rides on a pod. CPU platform, loopback coordinator."""

import os
import socket
import subprocess
import sys

_WORKER = r"""
import os, sys
proc_id, port = sys.argv[1], sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = proc_id
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

from train import _maybe_init_distributed
assert _maybe_init_distributed() is True
assert jax.process_count() == 2
assert jax.device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from interactron_tpu.parallel.mesh import make_mesh

mesh = make_mesh(jax.devices(), dp=2, tp=1)
local = jnp.full((1, 4), float(proc_id) + 1.0)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), np.asarray(local), (2, 4)
)

@jax.jit
def summed(x):
    return jax.shard_map(
        lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
        in_specs=P("dp"), out_specs=P(),
    )(x)

out = summed(garr)
print("PSUM_RESULT", float(out.addressable_data(0)[0, 0]), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_hook(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))})
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        # psum over dp of [1.0, 2.0] rows = 3.0 everywhere
        assert "PSUM_RESULT 3.0" in out, f"proc {i} output:\n{out}"
