"""Decoder cross-validation at STRESS-CORPUS scale against the compiled
reference latgen-faster + compute-wer.

This is the round-5 parity battery the zero-egress environment allows
in place of recipe WER reproduction: the trained stress acoustic
model's REAL posteriors for >= 300 eval utterances are written to a
Kaldi archive, the exact compiled search automaton (2.9M-state trigram
TLG, post degree-cap) is serialized as an OpenFst binary, and BOTH
decoders — the reference's LatticeFasterDecoder (decoderbin/
latgen-faster.cc, built from source via tools/refbuild) and our batched
TPU beam search — decode the identical inputs.  Outputs: per-utterance
best-path word agreement, and compute-wer (reference binary) vs
compute_wer (ours) on both hypothesis sets.

Usage (after examples/stress_recipe.py has populated WORKDIR):
  PYTHONPATH=/root/repo:/root/.axon_site python examples/ref_crossval.py \
      /tmp/stress_aug --utts 300 --out /tmp/ref_crossval
"""

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/stress_aug")
    ap.add_argument("--out", default="/tmp/ref_crossval")
    ap.add_argument("--utts", type=int, default=300)
    ap.add_argument("--eval", type=int, default=300,
                    help="must match the stress run's --eval")
    ap.add_argument("--train-utts", type=int, default=4000,
                    help="must match the stress run's --utts")
    ap.add_argument("--cv", type=int, default=150)
    ap.add_argument("--ref-bin", default="/tmp/ref_build/bin")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--acwt", type=float, default=0.9)
    ap.add_argument("--cpu", action="store_true",
                    help="run the forward+decode on CPU (the whole "
                         "crossval is CPU-feasible: ~3 s/utt decode)")
    ap.add_argument("--max-active", type=int, default=512,
                    help="our search's active-set width K; raising it "
                         "should shrink disagreements caused purely by "
                         "pruning-width differences vs latgen's 7000")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: F401

    import pickle

    from stress_recipe import (
        HOMOPHONES, OOV_WORDS, VOCAB, build_text_process,
        sample_sentences,
    )

    from eesen_tpu.decoder.beam import BeamSearchConfig, traceback
    from eesen_tpu.decoder.graph_compile import CompiledGraph
    from eesen_tpu.decoder.lattice_io import write_compiled_graph_binary
    from eesen_tpu.decoder.score import compute_wer
    from eesen_tpu.frontend.features import (
        FbankOptions, FrameOptions, MelOptions,
    )
    from eesen_tpu.frontend.pipeline import FeaturePipelineConfig
    from eesen_tpu.io import kaldi_io
    from eesen_tpu.models.model import AcousticModelConfig
    from eesen_tpu.recipes.config import RecipeConfig
    from eesen_tpu.recipes.run import RecipeRun
    from eesen_tpu.training.batching import BatchConfig
    from eesen_tpu.training.optim import OptimizerConfig
    from eesen_tpu.training.schedule import NewbobConfig

    # ---- re-derive the corpus text/lexicon state (same seeds as
    # stress_recipe.py main) ----
    lex_path = os.path.join(args.workdir, "lexicon.pkl")
    with open(lex_path, "rb") as f:
        synth_lexicon, decode_lexicon, oov_words = pickle.load(f)
    word_list = [w for w, _ in decode_lexicon]
    num_phones = 40

    succ, slot_p = build_text_process(VOCAB, np.random.default_rng(11))

    def to_words(sents):
        return [[word_list[int(j)] for j in s] for s in sents]

    trng = np.random.default_rng(12)
    _tr = to_words(sample_sentences(args.train_utts, succ, slot_p, VOCAB,
                                    trng))
    _cv = to_words(sample_sentences(args.cv, succ, slot_p, VOCAB, trng))
    ev_texts_l = to_words(sample_sentences(args.eval, succ, slot_p,
                                           VOCAB, trng))
    for sent in ev_texts_l:
        for i in range(len(sent)):
            if trng.random() < 0.025:
                sent[i] = oov_words[int(trng.integers(0, len(oov_words)))]
    num_speakers = 64
    ev_texts = {}
    for i, ws in enumerate(ev_texts_l):
        spk = f"spk{i % num_speakers:03d}"
        ev_texts[f"{spk}_ev{i:06d}"] = ws

    # ---- recipe objects (config mirrors stress_recipe.py) ----
    cfg = RecipeConfig(
        name="stress20k", dict_type="phn",
        fbank=FbankOptions(
            frame_opts=FrameOptions(dither=1.0),
            mel_opts=MelOptions(num_bins=40),
        ),
        pipeline=FeaturePipelineConfig(norm_vars=True, delta_order=2),
        model=AcousticModelConfig(
            input_dim=120, cell_dim=320, num_layers=4, num_targets=-1,
        ),
        optimizer=OptimizerConfig(algorithm="rmsprop", max_grad=50.0),
        newbob=NewbobConfig(learn_rate=5e-4, max_iters=10, min_iters=4),
        batch=BatchConfig(num_sequence=128, frame_limit=80000,
                          time_quant=128),
        decode=BeamSearchConfig(beam=17.0, max_active=args.max_active,
                                funnel_mult=2,
                                acoustic_scale=args.acwt,
                                lattice_beam=8.0, blank_skip=0.0),
        blank_skip_guard=0,
    )
    units = [f"p{i:02d}" for i in range(num_phones)]
    lex_full = list(decode_lexicon) + [("<UNK>", (units[0],))]
    run = RecipeRun(cfg, os.path.join(args.workdir, "exp"), lex_full,
                    units)
    run.build_lang()
    run.load_model()
    run.graph = CompiledGraph.load(os.path.join(args.workdir, "tlg.npz"))
    print(f"graph: {run.graph.num_states} states, "
          f"{run.graph.num_emit_arcs + run.graph.num_eps_arcs} arcs",
          flush=True)

    z = np.load(os.path.join(args.workdir, "feats.npz"),
                allow_pickle=True)
    keys = sorted(ev_texts)[: args.utts]
    feats = {k: np.asarray(z[k], np.float32) for k in keys}
    refs = {k: ev_texts[k] for k in keys}
    print(f"{len(keys)} eval utterances", flush=True)

    # ---- our decode (full search, no blank-skip) + posterior dump ----
    t0 = time.time()
    ll_ark = os.path.join(args.out, "ll.ark")
    our_words = {}
    items = []
    for chunk, lp, lens, out in run._run_search(
        feats, keys, cfg.decode, args.batch
    ):
        lp_np = np.asarray(lp, np.float32)
        for j, k in enumerate(chunk):
            items.append((k, lp_np[j, : int(lens[j])]))
        for k, (wids, cost) in zip(
            chunk, traceback(out, lens, run.graph.final_weight)
        ):
            our_words[k] = list(wids)
    kaldi_io.write_ark(ll_ark, sorted(items))
    print(f"our decode + posterior dump in {time.time()-t0:.0f}s",
          flush=True)

    # ---- serialize the exact compiled automaton for the reference ----
    t0 = time.time()
    fst_path = os.path.join(args.out, "tlg.fst")
    with open(fst_path, "wb") as f:
        write_compiled_graph_binary(run.graph, f)
    print(f"OpenFst serialization in {time.time()-t0:.0f}s "
          f"({os.path.getsize(fst_path)/1e6:.0f} MB)", flush=True)

    # ---- reference decode ----
    t0 = time.time()
    words_ark = os.path.join(args.out, "ref_words.ark")
    lat_ark = os.path.join(args.out, "ref_lat.ark")
    r = subprocess.run(
        [os.path.join(args.ref_bin, "latgen-faster"),
         f"--acoustic-scale={args.acwt}", "--beam=17.0",
         "--max-active=7000", "--lattice-beam=8.0",
         fst_path, f"ark:{ll_ark}", f"ark:{lat_ark}",
         f"ark:{words_ark}"],
        capture_output=True, text=True, timeout=7200,
    )
    if r.returncode != 0:
        print("latgen-faster FAILED:", r.stderr[-3000:], flush=True)
        sys.exit(1)
    print(f"reference latgen-faster in {time.time()-t0:.0f}s",
          flush=True)
    for line in r.stderr.splitlines()[-3:]:
        print("  ", line, flush=True)
    ref_words = {k: list(v) for k, v in kaldi_io.read_ark(words_ark)}

    # ---- compare ----
    sym = run.lang.words.sym
    agree = sum(
        1 for k in keys if our_words.get(k) == ref_words.get(k)
    )
    mismatches = [k for k in keys
                  if our_words.get(k) != ref_words.get(k)]
    our_hyps = {k: [sym(w) for w in our_words[k]] for k in keys}
    ref_hyps = {k: [sym(w) for w in ref_words.get(k, [])] for k in keys}

    ours_wer = compute_wer(refs, our_hyps)
    ref_on_ours = compute_wer(refs, ref_hyps)

    # reference compute-wer on the reference hyps
    ref_txt = os.path.join(args.out, "ref.txt")
    hyp_txt = os.path.join(args.out, "ref_hyp.txt")
    with open(ref_txt, "w") as f:
        for k in keys:
            f.write(f"{k} {' '.join(refs[k])}\n")
    with open(hyp_txt, "w") as f:
        for k in keys:
            f.write(f"{k} {' '.join(ref_hyps[k])}\n")
    rw = subprocess.run(
        [os.path.join(args.ref_bin, "compute-wer"), "--text",
         "--mode=present", f"ark:{ref_txt}", f"ark:{hyp_txt}"],
        capture_output=True, text=True, timeout=600,
    )
    wer_line = next((l for l in rw.stdout.splitlines()
                     if l.startswith("%WER")), "?")

    res = {
        "utts": len(keys),
        "best_path_agree": agree,
        "mismatched_keys": mismatches[:20],
        "our_wer": round(ours_wer.wer, 2),
        "ref_hyp_wer_by_us": round(ref_on_ours.wer, 2),
        "ref_compute_wer_line": wer_line,
        "graph_states": int(run.graph.num_states),
    }
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("CROSSVAL_RESULT", json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
