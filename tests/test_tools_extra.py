"""Net tools CLI + profiler tests."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.io.kaldi_io import write_ark
from eesen_tpu.models.model import AcousticModelConfig, init_model
from eesen_tpu.tools.cli import main
from eesen_tpu.utils.profile import Profiler


def _save_model(path, seed=0):
    cfg = AcousticModelConfig(
        input_dim=6, cell_dim=4, num_layers=1, num_targets=5,
        compute_dtype=jnp.float32,
    )
    params = init_model(jax.random.PRNGKey(seed), cfg)
    with open(path, "wb") as f:
        pickle.dump(
            {"params": jax.tree_util.tree_map(np.asarray, params),
             "config": cfg}, f,
        )
    return params, cfg


def test_model_info(tmp_path, capsys):
    path = str(tmp_path / "m.pkl")
    _save_model(path)
    assert main(["model-info", path]) == 0
    out = capsys.readouterr().out
    assert "cell-dim 4" in out and "num-params" in out


def test_net_average(tmp_path):
    p1 = str(tmp_path / "m1.pkl")
    p2 = str(tmp_path / "m2.pkl")
    params1, _ = _save_model(p1, seed=1)
    params2, _ = _save_model(p2, seed=2)
    out = str(tmp_path / "avg.pkl")
    assert main(["net-average", out, p1, p2]) == 0
    with open(out, "rb") as f:
        avg = pickle.load(f)["params"]
    l1 = jax.tree_util.tree_leaves(params1)
    l2 = jax.tree_util.tree_leaves(params2)
    la = jax.tree_util.tree_leaves(avg)
    for a, b, c in zip(l1, l2, la):
        np.testing.assert_allclose(
            np.asarray(c), (np.asarray(a) + np.asarray(b)) / 2, rtol=1e-6
        )


def test_net_copy_roundtrip(tmp_path):
    pkl = str(tmp_path / "m.pkl")
    nnet = str(tmp_path / "m.nnet")
    back = str(tmp_path / "m2.pkl")
    params, _ = _save_model(pkl)
    assert main(["net-copy", pkl, nnet]) == 0
    assert main(["net-copy", nnet, back]) == 0
    with open(back, "rb") as f:
        p2 = pickle.load(f)["params"]
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_align_cli(tmp_path):
    pkl = str(tmp_path / "m.pkl")
    _save_model(pkl)
    rng = np.random.default_rng(0)
    feats = {"u1": rng.standard_normal((12, 6)).astype(np.float32)}
    labels = {"u1": np.array([1, 2], dtype=np.int32)}
    write_ark(str(tmp_path / "f.ark"), feats.items())
    write_ark(str(tmp_path / "l.ark"), labels.items())
    out = str(tmp_path / "ali.txt")
    assert main([
        "align", pkl, f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/l.ark", out,
    ]) == 0
    line = open(out).read().strip()
    assert line.startswith("u1 ")
    segs = line.split()[1:]
    assert [s.split(":")[0] for s in segs] == ["1", "2"]


def test_profiler():
    p = Profiler()
    with p.track("op_a"):
        pass
    with p.track("op_a"):
        pass
    with p.track("op_b"):
        pass
    assert p.counts["op_a"] == 2
    report = p.print_profile()
    assert "op_a" in report and "op_b" in report
    p.reset()
    assert not p.totals


def test_net_change_model(tmp_path):
    """net-change-model rewrites dropout hyperparameters, not weights."""
    src = str(tmp_path / "m.pkl")
    dst = str(tmp_path / "m2.pkl")
    params, cfg = _save_model(src)
    assert main([
        "net-change-model", src, dst,
        "--forwarddrop", "0.2", "--recurrentdrop", "0.3",
        "--rnndrop", "--forwardstep", "true", "--twiddleforward", "true",
    ]) == 0
    with open(dst, "rb") as f:
        blob = pickle.load(f)
    c2 = blob["config"]
    assert c2.forward_dropout == 0.2
    assert c2.recurrent_dropout == 0.3
    assert c2.recurrent_dropout_mode == "rnndrop"
    assert c2.forward_step_dropout is True
    assert c2.twiddle is True
    assert c2.cell_dim == cfg.cell_dim
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(blob["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
