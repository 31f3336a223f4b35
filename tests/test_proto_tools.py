"""nnet.proto parse/emit + the round of fstbin/netbin tools added for
full CLI parity (fst-rm-symbols, fst-prop-final, fst-rand,
fsts-to-transcripts, net-initialize, model-topo)."""

import contextlib
import io
import pickle
import random
import types

import numpy as np
import pytest

from eesen_tpu.decoder.fst import (
    Fst, propagate_final, rand_fst, rm_symbols, shortest_path,
)
from eesen_tpu.models.model import AcousticModelConfig
from eesen_tpu.models.proto import emit_nnet_proto, parse_nnet_proto
from eesen_tpu.tools.cli import main


def run_cli(args):
    """In-process CLI invocation (subprocesses would re-init jax)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        try:
            code = main(args)
        except SystemExit as e:   # argparse errors
            code = e.code
    return types.SimpleNamespace(
        returncode=code or 0, stdout=buf.getvalue(), stderr="",
    )


# ----------------------------------------------------------------------
# proto
# ----------------------------------------------------------------------

LIBRISPEECH_PROTO = """<Nnet>
<BiLstmParallel> <InputDim> 360 <CellDim> 640 <ParamRange> 0.1 <LearnRateCoef> 1.0 <MaxGrad> 50.0 <FgateBias> 1.0 <ForwardDropoutFactor> 0.2 <ForwardSequenceDropout> T <RecurrentDropoutFactor> 0.2 <RecurrentSequenceDropout> T <NoMemLossDropout> T <TwiddleForward> T
<BiLstmParallel> <InputDim> 640 <CellDim> 640 <ParamRange> 0.1 <LearnRateCoef> 1.0 <MaxGrad> 50.0 <FgateBias> 1.0 <ForwardDropoutFactor> 0.2 <ForwardSequenceDropout> T <RecurrentDropoutFactor> 0.2 <RecurrentSequenceDropout> T <NoMemLossDropout> T <TwiddleForward> T
<AffineTransform> <InputDim> 640 <OutputDim> 44 <ParamRange> 0.1
<Softmax> <InputDim> 44 <OutputDim> 44
</Nnet>
"""


def test_parse_librispeech_proto():
    """The exact proto shipped by the reference's librispeech recipe
    (asr_egs/librispeech/config/nnet.proto.nml_seq_fw_seq_tw) parses to
    the 4x640-style config (here trimmed to 2 layers)."""
    cfg = parse_nnet_proto(LIBRISPEECH_PROTO)
    assert cfg.input_dim == 360
    assert cfg.cell_dim == 320          # CellDim is 2x per-direction
    assert cfg.num_layers == 2
    assert cfg.num_targets == 44
    assert cfg.fgate_bias == 1.0
    assert cfg.forward_dropout == 0.2
    assert cfg.recurrent_dropout == 0.2
    assert not cfg.forward_step_dropout     # SequenceDropout T
    assert not cfg.recurrent_step_dropout
    assert cfg.recurrent_dropout_mode == "no_mem_loss"
    assert cfg.twiddle


def test_proto_roundtrip():
    cfg = AcousticModelConfig(
        input_dim=120, cell_dim=320, num_layers=4, num_targets=72,
        fgate_bias=1.0, forward_dropout=0.1, recurrent_dropout=0.2,
        recurrent_dropout_mode="rnndrop", twiddle=True,
    )
    cfg2 = parse_nnet_proto(emit_nnet_proto(cfg))
    for field in ("input_dim", "cell_dim", "num_layers", "num_targets",
                  "param_range", "fgate_bias", "forward_dropout",
                  "recurrent_dropout", "forward_step_dropout",
                  "recurrent_step_dropout", "recurrent_dropout_mode",
                  "twiddle"):
        assert getattr(cfg, field) == getattr(cfg2, field), field


def test_proto_rejects_projection_stack():
    bad = """<Nnet>
<BiLstmParallel> <InputDim> 120 <CellDim> 640 <ParamRange> 0.1
<AffineTransform> <InputDim> 640 <OutputDim> 300 <ParamRange> 0.1
<AffineTransform> <InputDim> 300 <OutputDim> 72 <ParamRange> 0.1
<Softmax> <InputDim> 72 <OutputDim> 72
</Nnet>"""
    with pytest.raises(NotImplementedError):
        parse_nnet_proto(bad)


# ----------------------------------------------------------------------
# fst ops
# ----------------------------------------------------------------------

def test_rm_symbols():
    f = Fst.from_text("0 1 5 7 1.0\n0 1 3 5\n1 2 5 3\n2\n")
    g = rm_symbols(f, [5])
    ils = sorted(a.ilabel for arcs in g.arcs for a in arcs)
    assert ils == [0, 0, 3]
    g2 = rm_symbols(f, [5], from_output=True)
    ols = sorted(a.olabel for arcs in g2.arcs for a in arcs)
    assert ols == [0, 3, 7]
    # original untouched
    assert sorted(a.ilabel for arcs in f.arcs for a in arcs) == [3, 5, 5]


def test_propagate_final_chain():
    # 0 -phi(1.0)-> 1 -phi(2.0)-> 2(final 0.5); 0 and 1 become final
    f = Fst.from_text("0 1 10 10 1.0\n1 2 10 10 2.0\n2 0.5\n")
    g = propagate_final(f, 10)
    assert g.final_weight(2) == 0.5
    assert abs(g.final_weight(1) - 2.5) < 1e-9
    assert abs(g.final_weight(0) - 3.5) < 1e-9
    # non-phi labels do not propagate
    h = propagate_final(f, 11)
    assert not h.is_final(0) and not h.is_final(1)


def test_propagate_final_keeps_better_existing():
    f = Fst.from_text("0 1 10 10 5.0\n1 0.0\n0 0.5\n")
    g = propagate_final(f, 10)
    assert g.final_weight(0) == 0.5     # existing 0.5 beats 5.0 via phi


def test_rand_fst_properties():
    rng = random.Random(1)
    for _ in range(20):
        f = rand_fst(rng, n_states=10, n_arcs=20)
        assert f.start == 0
        assert f.finals
        # acyclic: arcs strictly forward
        for s in range(f.num_states):
            for a in f.arcs[s]:
                assert a.nextstate > s
        f.paths()   # must terminate


# ----------------------------------------------------------------------
# CLI round trips
# ----------------------------------------------------------------------

def test_cli_net_initialize_and_model_topo(tmp_path):
    proto = tmp_path / "nnet.proto"
    r = run_cli([
        "model-topo", "--input-feat-dim", "40", "--lstm-layer-num", "2",
        "--lstm-cell-dim", "64", "--target-num", "30",
        "--fgate-bias-init", "1.0", "--out", str(proto),
    ])
    assert r.returncode == 0, r.stderr
    text = proto.read_text()
    assert "<BiLstmParallel> <InputDim> 40 <CellDim> 128" in text

    model = tmp_path / "model.pkl"
    r = run_cli(["net-initialize", str(proto), str(model)])
    assert r.returncode == 0, r.stderr
    with open(model, "rb") as f:
        blob = pickle.load(f)
    cfg = blob["config"]
    assert cfg.input_dim == 40 and cfg.cell_dim == 64
    assert cfg.num_layers == 2 and cfg.num_targets == 30
    assert cfg.fgate_bias == 1.0
    # params drawn uniformly within +-param_range (biases may be offset
    # by fgate_bias)
    w = np.asarray(blob["params"]["layers"][0]["fw"]["w_gifo_x"])
    assert np.abs(w).max() <= cfg.param_range + 1e-6
    assert np.abs(w).std() > 0


def test_cli_fst_tools(tmp_path):
    lst = tmp_path / "disambig.list"
    lst.write_text("3\n4\n")
    fst_in = tmp_path / "in.fst"
    fst_in.write_text("0 1 3 1\n1 2 2 4\n2\n")
    r = run_cli(["fst-rm-symbols", str(lst), str(fst_in)])
    assert r.returncode == 0, r.stderr
    assert "0 1 0 1" in r.stdout

    r = run_cli(["fst-prop-final", "7",  str(fst_in)])
    assert r.returncode == 0, r.stderr

    r = run_cli(["fst-rand", "--seed", "3"])
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip()


def test_cli_fsts_to_transcripts(tmp_path):
    f1 = Fst.from_text("0 1 1 11 0.5\n1 2 2 12\n2\n")
    f2 = Fst.from_text("0 1 5 15\n1\n")
    ark = tmp_path / "fsts.ark"
    with open(ark, "w") as f:
        for key, fst in [("utt1", f1), ("utt2", f2)]:
            f.write(key + "\n" + fst.to_text() + "\n")
    r = run_cli(["fsts-to-transcripts", str(ark)])
    assert r.returncode == 0, r.stderr
    lines = dict(
        (l.split()[0], l.split()[1:]) for l in r.stdout.splitlines()
    )
    assert lines["utt1"] == ["11", "12"]
    assert lines["utt2"] == ["15"]
    # input side
    r = run_cli(["fsts-to-transcripts", "--output-side", "false", str(ark)])
    lines = dict(
        (l.split()[0], l.split()[1:]) for l in r.stdout.splitlines()
    )
    assert lines["utt1"] == ["1", "2"]


def test_shortest_path_sanity():
    f = Fst.from_text("0 1 1 11 1.0\n0 1 2 22 0.5\n1\n")
    il, ol, w = shortest_path(f)
    assert ol == [22] and abs(w - 0.5) < 1e-9
