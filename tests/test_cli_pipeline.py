"""Shell-driveable pipeline test: the full toy recipe via CLI commands
only — train -> net-output-extract -> latgen (+lattice archive) ->
lattice tools -> compute-wer.  The reference's equivalent is
steps/train_ctc_parallel.sh + steps/decode_ctc_lat.sh + local/score.sh
chaining netbin/decoderbin binaries."""

import pickle

import numpy as np
import pytest

from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
from eesen_tpu.decoder.graph_compile import compile_graph
from eesen_tpu.io.kaldi_io import write_ark
from eesen_tpu.tools.cli import main

from tests.test_ctc_graph import ARPA, LEXICON, UNITS

V = len(UNITS) + 1   # blank + units


def _synth_utt(rng, labels, t_per=3, noise=0.3):
    """Features whose frame t 'is' its label: one-hot + noise, with blank
    frames between labels — trivially separable for a tiny model."""
    frames = []
    for lab in labels:
        for _ in range(t_per):
            v = np.zeros(V + 3, np.float32)
            v[lab] = 4.0
            frames.append(v)
        v = np.zeros(V + 3, np.float32)
        v[0] = 4.0
        frames.append(v)
    x = np.stack(frames)
    return x + rng.standard_normal(x.shape).astype(np.float32) * noise


@pytest.mark.slow
def test_cli_train_decode_score(tmp_path):
    rng = np.random.default_rng(0)
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    # network label space: 0 = blank, unit k = tokens.txt id - 1
    # (the tid-1 shift, decodable-matrix.h:47-54)
    unit_ids = {u: lang.tokens[u] - 1 for u in UNITS}

    # word sequences using the test lexicon
    words_of = dict(LEXICON)
    vocab = [w for w, _ in LEXICON if w != "<UNK>"]
    utts, texts = {}, {}
    for i in range(12):
        ws = [vocab[int(j)] for j in rng.integers(0, len(vocab), 2)]
        labs = [unit_ids[p] for w in ws for p in words_of[w]]
        utts[f"u{i:02d}"] = _synth_utt(rng, labs)
        texts[f"u{i:02d}"] = ws
    lab_arrays = {
        k: np.asarray(
            [unit_ids[p] for w in texts[k] for p in words_of[w]], np.int32
        )
        for k in utts
    }

    keys = sorted(utts)
    tr, cv = keys[:9], keys[9:]
    for name, ks in [("tr", tr), ("cv", cv)]:
        write_ark(str(tmp_path / f"{name}_f.ark"),
                  ((k, utts[k]) for k in ks))
        write_ark(str(tmp_path / f"{name}_l.ark"),
                  ((k, lab_arrays[k]) for k in ks))

    model = str(tmp_path / "model.pkl")
    counts = str(tmp_path / "label.counts")
    rc = main([
        "train",
        f"ark:{tmp_path}/tr_f.ark", f"ark:{tmp_path}/tr_l.ark",
        f"ark:{tmp_path}/cv_f.ark", f"ark:{tmp_path}/cv_l.ark",
        model,
        "--num-targets", str(V), "--cell-dim", "24", "--num-layers", "1",
        "--optimizer", "adagrad", "--learn-rate", "0.02",
        "--max-iters", "8", "--min-iters", "6",
        "--num-sequence", "9", "--report-step", "1000",
        "--label-counts", counts,
    ])
    assert rc == 0
    with open(model, "rb") as f:
        blob = pickle.load(f)
    assert blob["config"].num_targets == V
    assert np.loadtxt(counts).shape == (V,)

    # graph
    g_fst = arpa_to_fst(ARPA, lang.words)
    tlg = build_tlg(lang.t_fst, build_lg(lang.l_fst, g_fst))
    graph = compile_graph(tlg, max_degree=8)
    gpath = str(tmp_path / "tlg.pkl")
    with open(gpath, "wb") as f:
        pickle.dump(graph, f)
    wpath = str(tmp_path / "words.txt")
    lang.words.write(wpath)

    # posteriors -> decode with lattices
    post = str(tmp_path / "post.ark")
    assert main([
        "net-output-extract", model, f"ark:{tmp_path}/cv_f.ark",
        f"ark:{post}",
    ]) == 0
    hyp = str(tmp_path / "hyp.txt")
    lat_ark = str(tmp_path / "lat.ark")
    assert main([
        "latgen", "--acoustic-scale", "0.9", "--beam", "20",
        "--max-active", "256", "--words", wpath,
        "--lattice-ark", lat_ark, "--binary",
        gpath, f"ark:{post}", hyp,
    ]) == 0
    hyps = {l.split()[0]: l.split()[1:] for l in open(hyp) if l.split()}
    assert set(hyps) == set(cv)

    # blank-skip (phone-synchronous) decode must reproduce the same
    # hypotheses on these blank-separated posteriors
    hyp_s = str(tmp_path / "hyp_skip.txt")
    assert main([
        "latgen", "--acoustic-scale", "0.9", "--beam", "20",
        "--max-active", "256", "--words", wpath,
        "--blank-skip", "0.9",
        gpath, f"ark:{post}", hyp_s,
    ]) == 0
    hyps_s = {l.split()[0]: l.split()[1:] for l in open(hyp_s) if l.split()}
    assert hyps_s == hyps

    # streaming (chunked, carried-state) decode must be identical to the
    # offline decode
    hyp_st = str(tmp_path / "hyp_stream.txt")
    assert main([
        "latgen", "--acoustic-scale", "0.9", "--beam", "20",
        "--max-active", "256", "--words", wpath,
        "--streaming", "--chunk-frames", "16",
        gpath, f"ark:{post}", hyp_st,
    ]) == 0
    hyps_st = {
        l.split()[0]: l.split()[1:] for l in open(hyp_st) if l.split()
    }
    assert hyps_st == hyps

    # WER of the direct decode
    ref = str(tmp_path / "ref.txt")
    with open(ref, "w") as f:
        for k in cv:
            f.write(f"{k} {' '.join(texts[k])}\n")
    assert main(["compute-wer", ref, hyp]) == 0

    # dense (beam-free) decode must reproduce the wide-beam hypotheses
    graph_clo = compile_graph(tlg, max_degree=8, build_closure=True)
    gpath_clo = str(tmp_path / "tlg_clo.pkl")
    with open(gpath_clo, "wb") as f:
        pickle.dump(graph_clo, f)
    hyp_d = str(tmp_path / "hyp_dense.txt")
    assert main([
        "decode-faster", "--acoustic-scale", "0.9", "--words", wpath,
        gpath_clo, f"ark:{post}", hyp_d,
    ]) == 0
    hyps_d = {l.split()[0]: l.split()[1:] for l in open(hyp_d) if l.split()}
    assert hyps_d == hyps

    # lattice tool chain: copy(binary->text) -> scale -> best-path,
    # which must reproduce the decode hypotheses at acwt 0.9
    lat_txt = str(tmp_path / "lat_text.ark")
    assert main(["lattice-copy", lat_ark, lat_txt]) == 0
    bp = str(tmp_path / "bp.txt")
    assert main([
        "lattice-best-path", lat_txt, "--out", bp, "--words", wpath,
        "--acoustic-scale", "0.9",
    ]) == 0
    bps = {l.split()[0]: l.split()[1:] for l in open(bp) if l.split()}
    assert bps == hyps

    # nbest + ctm run
    assert main([
        "lattice-to-nbest", lat_txt, "--n", "3", "--words", wpath,
        "--out", str(tmp_path / "nbest.txt"),
    ]) == 0
    assert main([
        "lattice-to-ctm-conf", lat_txt, "--words", wpath,
        "--out", str(tmp_path / "ctm.txt"),
    ]) == 0
    nbest_lines = open(str(tmp_path / "nbest.txt")).read().splitlines()
    assert any(l.startswith(f"{cv[0]}-1 ") for l in nbest_lines)
