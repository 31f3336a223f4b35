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


WORKER_STEP = r'''
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
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
from eesen_tpu.parallel.distributed import global_batch
from eesen_tpu.parallel.sharding import shard_state
from eesen_tpu.models.model import AcousticModelConfig
from eesen_tpu.training.optim import OptimizerConfig
from eesen_tpu.training.trainer import (
    create_train_state, make_shard_map_train_step, make_train_step,
)

mesh = make_mesh()          # 8-way data axis over both processes
cfg = AcousticModelConfig(
    input_dim=8, cell_dim=8, num_layers=1, num_targets=6,
    compute_dtype=jnp.float32,
)
state, tx = create_train_state(jax.random.PRNGKey(0), cfg,
                               OptimizerConfig(momentum=0.9))
state = shard_state(state, mesh)

# per-process local rows -> one global batch spanning both hosts
rng = np.random.default_rng(100 + pid)
local = {
    "feats": rng.standard_normal((4, 24, 8)).astype(np.float32),
    "feat_lengths": np.full((4,), 24, np.int32),
    "labels": rng.integers(1, 6, size=(4, 4)).astype(np.int32),
    "label_lengths": np.full((4,), 4, np.int32),
}
gb = global_batch(local, mesh)

# REAL jit train step across the 2-process mesh
step = make_train_step(cfg, tx)
state, metrics = step(state, gb, jax.random.PRNGKey(1), jnp.float32(1e-3))
loss = float(metrics["loss"])           # replicated scalar: fetchable
assert np.isfinite(loss)

# manual-DP shard_map step across the same mesh
step_sm = make_shard_map_train_step(cfg, tx, mesh)
state, m2 = step_sm(state, gb, jax.random.PRNGKey(2), jnp.float32(1e-3))
loss_sm = float(m2["loss"])
assert np.isfinite(loss_sm)

# sharded decode across the 2-process mesh on a real TLG
from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.beam import (
    BeamSearchConfig, DeviceGraph, make_sharded_beam_decoder,
)
from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
from eesen_tpu.decoder.graph_compile import compile_graph
from eesen_tpu.recipes.lm import estimate_bigram_arpa
from eesen_tpu.recipes.synth_corpus import SynthConfig, make_lexicon

scfg = SynthConfig(num_phones=10, num_words=40)
srng = np.random.default_rng(5)                  # same on both processes
lexicon = make_lexicon(scfg, srng)
vocab = [w for w, _ in lexicon]
sents = [[vocab[int(j)] for j in srng.integers(0, len(vocab), 5)]
         for _ in range(300)]
arpa = estimate_bigram_arpa(sents, vocab=vocab)
units = [f"p{i:02d}" for i in range(scfg.num_phones)]
lang = compile_lang(lexicon, units, dict_type="phn")
tlg = build_tlg(lang.t_fst,
                build_lg(lang.l_fst, arpa_to_fst(arpa, lang.words)))
cg = compile_graph(tlg, max_degree=8, build_closure=True)

dec = make_sharded_beam_decoder(
    cg, BeamSearchConfig(beam=16.0, max_active=32), mesh)
t_dec, v_dec = 12, 1 + scfg.num_phones
lrng = np.random.default_rng(7 + pid)
ll_local = np.log(lrng.dirichlet(
    np.ones(v_dec), size=(4, t_dec)).astype(np.float32))
sh = NamedSharding(mesh, P("data"))
ll_g = jax.make_array_from_process_local_data(sh, ll_local)
lens_g = jax.make_array_from_process_local_data(
    sh, np.full((4,), t_dec, np.int32))
out = dec(ll_g, lens_g, DeviceGraph.put(cg))
score = float(jax.jit(
    lambda x: jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0))
)(out.scores))
assert np.isfinite(score)
print(f"proc{pid} STEP OK loss={loss:.6f} sm={loss_sm:.6f} "
      f"decode_score={score:.4f} graph={cg.num_states}", flush=True)
'''


@pytest.mark.slow
def test_two_process_train_step_and_sharded_decode(tmp_path):
    """One REAL jitted train step + one shard_map train step + one
    sharded beam decode, all across a 2-process x 4-device mesh; both
    processes must agree on the (replicated) loss and decode score."""
    import re

    script = tmp_path / "worker_step.py"
    script.write_text(WORKER_STEP)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
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
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    vals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        m = re.search(
            r"STEP OK loss=([\d.e+-]+) sm=([\d.e+-]+) "
            r"decode_score=([\d.e+-]+)", out)
        assert m, out
        vals.append(tuple(float(x) for x in m.groups()))
    # replicated results must be identical across processes
    assert vals[0] == pytest.approx(vals[1], rel=1e-6), vals
