"""Two-process distributed test for parallel/distributed.py.

The reference's multi-node path (net/communicator.h file averaging) was
never tested; ours is: two real OS processes initialize jax.distributed
over localhost, build a global mesh spanning both hosts' CPU devices,
assemble a global batch with make_array_from_process_local_data, and
reduce over the data axis.  Every process must see the same global sum,
and host_shard must partition the dataset disjointly."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# must be set BEFORE jax init in a fresh interpreter (run with -I so the
# axon sitecustomize is skipped)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, sys.argv[3])
import jax
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=pid,
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from eesen_tpu.parallel.mesh import make_mesh
from eesen_tpu.parallel.distributed import (
    global_batch, host_shard, is_coordinator,
)

assert jax.process_count() == 2
assert jax.device_count() == 8
assert jax.local_device_count() == 4

# host_shard: disjoint round-robin split
items = list(range(10))
mine = host_shard(items)
assert mine == items[pid::2], mine

mesh = make_mesh()          # 8-way data axis over both processes
assert mesh.devices.size == 8

# each process contributes 4 local rows -> global batch of 8
local = {
    "feats": np.full((4, 3, 2), float(pid + 1), np.float32),
    "feat_lengths": np.full((4,), 3, np.int32),
    "labels": np.zeros((4, 5), np.int32),
    "label_lengths": np.full((4,), 5, np.int32),
}
gb = global_batch(local, mesh)
assert gb["feats"].shape == (8, 3, 2), gb["feats"].shape

@jax.jit
def total(x):
    return jnp.sum(x)

s = float(total(gb["feats"]))
# 4 rows of 1.0 + 4 rows of 2.0, each row 3*2 elements
expected = (4 * 1.0 + 4 * 2.0) * 6
assert abs(s - expected) < 1e-5, (s, expected)
print(f"proc{pid} OK sum={s} coordinator={is_coordinator()}", flush=True)
'''


@pytest.mark.slow
def test_two_process_global_batch(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # keep workers off the TPU
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-I", str(script), str(i), str(port),
             os.path.dirname(os.path.dirname(os.path.abspath(__file__)))],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out
    assert "coordinator=True" in outs[0]
    assert "coordinator=False" in outs[1]
