"""Hard synthetic stress run: 20k-word vocabulary, trigram LM, LM-scale
TLG, noise/speaker/rate variability, homophones and OOVs in eval.

The hardest available proxy for real-corpus validation (zero egress, no
LDC/OpenSLR data): where the flagship synth run (examples/synth_recipe.py)
is a 2 h / 500-word sanity pipeline, this run stresses exactly the parts
that run was too easy to exercise (round-2 verdict):

- ~20 h of audio, 64 speakers, per-utterance SNR drawn from [8, 25] dB;
- 20,000-word lexicon with 400 HOMOPHONE pairs (identical prons, distinct
  words — disambig symbols + the LM must separate them);
- eval utterances contain ~2.5% OOV tokens (synthesized from real prons
  but absent from the lexicon/LM — unrecognizable by construction);
- text follows a class-conditioned Markov process so the trigram LM has
  genuine predictive power over the bigram/unigram (acwt actually moves);
- trigram LM (estimate_ngram_arpa) at LM scale -> multi-million-state
  TLG via the native one-call build; the compiled graph is cached as
  .npz for bench.py's LM-scale decode bench;
- parity checks the easy corpus could not stress: acwt sweep (lattice
  rescale) == direct re-decode, blank-skip == full decode on hard
  content, plus the automatic blank-skip guard.

Reference pipeline shape: asr_egs/wsj/run_ctc_phn.sh:21-97.

Usage: python examples/stress_recipe.py [workdir] [--utts N] [--eval N]
"""

import argparse
import dataclasses
import json
import multiprocessing
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from eesen_tpu.decoder.beam import BeamSearchConfig
from eesen_tpu.decoder.graph_compile import CompiledGraph
from eesen_tpu.decoder.score import compute_wer
from eesen_tpu.frontend.features import FbankOptions, FrameOptions, MelOptions
from eesen_tpu.frontend.pipeline import FeaturePipelineConfig
from eesen_tpu.models.model import AcousticModelConfig
from eesen_tpu.recipes.config import RecipeConfig
from eesen_tpu.recipes.lm import estimate_ngram_arpa
from eesen_tpu.recipes.run import RecipeRun
from eesen_tpu.recipes.synth_corpus import (
    SynthConfig, generate_corpus_from_texts, make_lexicon, make_phones,
)
from eesen_tpu.training.batching import BatchConfig
from eesen_tpu.training.optim import OptimizerConfig
from eesen_tpu.training.schedule import NewbobConfig

BENCH_GRAPH_CACHE = "/tmp/eesen_bench_cache/tlg_stress.npz"

VOCAB = 20000
HOMOPHONES = 400
OOV_WORDS = 200
CLASSES = 4
FANOUT = 40


# ---------------------------------------------------------------------
# text process: class-conditioned Markov chains over the vocabulary
# ---------------------------------------------------------------------

def build_text_process(n_words: int, rng: np.random.Generator):
    """successors[c][w] = FANOUT candidate next-words given previous word
    w and previous-previous CLASS c (w2 % CLASSES) — a genuinely
    second-order process, so a trigram LM beats a bigram."""
    succ = rng.integers(
        0, n_words, size=(CLASSES, n_words, FANOUT), dtype=np.int32
    )
    # Zipf weights over the successor slots (shared across contexts)
    w = (np.arange(1, FANOUT + 1, dtype=np.float64)) ** -1.1
    w /= w.sum()
    return succ, w


def sample_sentences(
    n_sents: int, succ, slot_p, n_words: int, rng: np.random.Generator,
    min_w: int = 4, max_w: int = 10,
) -> list:
    lens = rng.integers(min_w, max_w + 1, size=n_sents)
    slots = rng.choice(FANOUT, size=int(lens.sum()), p=slot_p)
    out = []
    pos = 0
    for n in lens:
        sent = np.empty(n, np.int32)
        prev = int(rng.integers(0, n_words))
        prev2 = int(rng.integers(0, n_words))
        for i in range(n):
            c = prev2 % CLASSES
            w = int(succ[c, prev, slots[pos]])
            pos += 1
            sent[i] = w
            prev2, prev = prev, w
        out.append(sent)
    return out


# ---------------------------------------------------------------------
# parallel synthesis (2 host cores)
# ---------------------------------------------------------------------

_G = {}


def _synth_init(scfg, lexicon, phones_tbl, snr_range):
    _G["args"] = (scfg, lexicon, phones_tbl, snr_range)


def _synth_chunk(payload):
    seed, texts, utt2spk = payload
    scfg, lexicon, phones_tbl, snr_range = _G["args"]
    waves = generate_corpus_from_texts(
        scfg, texts, utt2spk, lexicon, phones_tbl,
        snr_range=snr_range, seed=seed,
    )
    return {k: v.astype(np.int16) for k, v in waves.items()}


def synth_parallel(scfg, texts, utt2spk, lexicon, phones_tbl, snr_range,
                   procs=2, chunk=400):
    keys = sorted(texts)
    payloads = [
        (1000 + i, {k: texts[k] for k in keys[i:i + chunk]},
         {k: utt2spk[k] for k in keys[i:i + chunk]})
        for i in range(0, len(keys), chunk)
    ]
    waves = {}
    with multiprocessing.Pool(
        procs, initializer=_synth_init,
        initargs=(scfg, lexicon, phones_tbl, snr_range),
    ) as pool:
        for i, part in enumerate(pool.imap_unordered(_synth_chunk,
                                                     payloads)):
            waves.update(part)
            if (i + 1) % 10 == 0:
                print(f"  synth {len(waves)}/{len(keys)} utts", flush=True)
    return waves


def run_augment_ab(
    args, cfg, run_ctl, all_waves, tr_texts, tr_spk, cv_texts,
    ev_texts, ev_spk, labels, cv_f, ev_f, hist_ctl,
):
    """End-to-end augmentation A/B (round-3 verdict item: the 9-view
    flow had only ever been unit-tested, never trained through).

    run_ctl already holds the CONTROL model (stage C: canonical features
    only) and the LM-scale graph.  This trains a second model through
    the reference's 9-view VTLN x frame-rate rotation
    (run_nml_seq_fw_seq_tw.sh:92-150, train_ctc_parallel_mult.sh:205 via
    recipes/augment.py) and decodes BOTH models on (a) the matched
    canonical eval view and (b) a warp/rate-MISMATCHED eval view
    (frame shift 12 ms, VTLN warp 1.12 — outside both training sets but
    inside the augmentation span), recording the 2x2 WER table.
    Recommended scale: --utts 3000-6000 (9-view features are 9x the
    feature cost)."""
    from eesen_tpu.recipes.augment import LIBRISPEECH_ROTATION, AugmentTag

    class MemData:
        def __init__(self, waves, texts, utt2spk):
            self.wav_scp = waves
            self.text = texts
            self.utt2spk = utt2spk

    tr_waves = {k: all_waves[k].astype(np.float32) for k in tr_texts}
    d_tr = MemData(tr_waves, tr_texts, tr_spk)

    # 9-view features of the train set (canonical-view CMVN)
    t0 = time.time()
    aug_cache = os.path.join(args.workdir, "augfeats.npz")
    if os.path.exists(aug_cache):
        z = np.load(aug_cache, allow_pickle=True)
        tagged = {t: dict(z[t].item()) for t in z.files}
        print(f"aug features loaded from cache ({time.time()-t0:.0f}s)",
              flush=True)
    else:
        tagged = run_ctl.compute_augmented_features(d_tr)
        np.savez(aug_cache, **{t: np.array(fe, dtype=object)
                               for t, fe in tagged.items()})
        print(f"aug features (9 views x {len(tr_texts)} utts) in "
              f"{time.time()-t0:.0f}s", flush=True)

    # augmented model: fresh run dir, same lang/graph.  CRITICAL detail
    # from the reference: the multi-view recipe passes
    # --halving-after-epoch 386 (run_nml_seq_fw_seq_tw.sh:22,140) —
    # newbob's annealing/patience is effectively DISABLED, because cv
    # accuracy oscillates +-30 points with the epoch's training view
    # and would otherwise fire spuriously mid-rotation (the round-5
    # first A/B attempt died exactly this way at epoch 7/10).  Train a
    # fixed 2x rotation budget at constant LR instead.
    rotation = [t for t in LIBRISPEECH_ROTATION if t in tagged]
    aug_cfg = dataclasses.replace(
        cfg,
        newbob=dataclasses.replace(
            cfg.newbob,
            max_iters=2 * len(rotation),
            min_iters=2 * len(rotation),
            halving_after_epoch=10**6,
        ),
    )
    run_aug = RecipeRun(
        aug_cfg, os.path.join(args.workdir, "exp_aug"),
        run_ctl.lexicon, run_ctl.units,
    )
    run_aug.lang = run_ctl.lang
    run_aug.graph = run_ctl.graph
    canon = tagged.get("10_1") or next(iter(tagged.values()))
    t0 = time.time()
    hist_aug = run_aug.train(
        canon, {k: labels[k] for k in tr_texts},
        cv_f, {k: labels[k] for k in cv_texts},
        epochs_batches_repeat=args.epoch_repeat,
        tagged_feats=tagged,
        tag_order=rotation,
    )
    print(f"augmented train in {time.time()-t0:.0f}s", flush=True)
    for e in sorted(hist_aug):
        print(f"  epoch {e}: tag train {hist_aug[e]['train_acc']:.2f}% "
              f"cv {hist_aug[e]['cv_acc']:.2f}%", flush=True)

    # mismatched eval view: 12 ms shift + warp 1.12
    ev_waves = {k: all_waves[k].astype(np.float32) for k in ev_texts}
    d_ev = MemData(ev_waves, ev_texts, ev_spk)
    t0 = time.time()
    mis_tags = run_ctl.compute_augmented_features(
        d_ev, tags=[AugmentTag(12.0, 1.12)],
    )
    ev_mis = next(iter(mis_tags.values()))
    print(f"mismatched eval features in {time.time()-t0:.0f}s", flush=True)

    if args.aug_eval > 0:
        keep = set(sorted(ev_f)[:args.aug_eval])
        ev_f = {k: v for k, v in ev_f.items() if k in keep}
        ev_mis = {k: v for k, v in ev_mis.items() if k in keep}
    refs = {k: ev_texts[k] for k in ev_f}
    table = {}
    for mname, r in (("control", run_ctl), ("augmented", run_aug)):
        for vname, fe in (("matched", ev_f), ("mismatched", ev_mis)):
            t0 = time.time()
            stats, _ = r.decode(fe, refs)
            table[f"{mname}_{vname}"] = round(stats.wer, 2)
            print(f"  {mname} on {vname}: {stats.report()} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    res = {
        "utts": args.utts,
        "rotation": [t for t in LIBRISPEECH_ROTATION if t in tagged],
        # a resumed-complete control run trains zero epochs -> {} history
        "control_final_cv_acc": (
            hist_ctl[max(hist_ctl)]["cv_acc"] if hist_ctl else None
        ),
        "augmented_final_cv_acc": (
            hist_aug[max(hist_aug)]["cv_acc"] if hist_aug else None
        ),
        "wer": table,
        "mismatch_view": "shift 12ms, vtln warp 1.12",
        "hard": bool(args.hard),
    }
    with open(os.path.join(args.workdir, "augment_results.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("AUGMENT_RESULT", json.dumps(res), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/stress_recipe")
    ap.add_argument("--utts", type=int, default=24000)
    ap.add_argument("--cv", type=int, default=150)
    ap.add_argument("--eval", type=int, default=300)
    ap.add_argument("--lm-sents", type=int, default=200000)
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument(
        "--hard", action="store_true",
        help="stress-v2 acoustics: confusable phone inventory, channel "
             "simulation, rate extremes, SNR 2-18 dB — drives the "
             "acoustic model itself below ~95%% token accuracy so the "
             "sweep/lattice/blank-skip parity battery runs under real "
             "AM uncertainty",
    )
    ap.add_argument(
        "--epoch-repeat", type=int, default=1,
        help="repeat the training batches N times per newbob epoch — "
             "REQUIRED for small --utts runs (a 4,000-utt --hard run at "
             "repeat=1 never leaves 0%% accuracy before newbob's "
             "patience runs out; the 24,000-utt run converges because "
             "each epoch simply has 6x the batches)",
    )
    ap.add_argument(
        "--aug-eval", type=int, default=0,
        help="with --augment: decode only the first N eval utts in the "
             "2x2 table (0 = all) — trims the 4-pass decode cost "
             "without touching the cached corpus",
    )
    ap.add_argument(
        "--stop-after", choices=["synth", "feats"], default=None,
        help="stop after the named (CPU-only) stage — lets synthesis "
             "run concurrently with TPU work and the run resume later "
             "from the caches",
    )
    ap.add_argument(
        "--augment", action="store_true",
        help="A/B the 9-view VTLN x frame-rate augmentation rotation "
             "(recipes/augment.py) against a clean-trained control, "
             "scoring both on matched AND warp-mismatched eval features",
    )
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    os.makedirs(os.path.dirname(BENCH_GRAPH_CACHE), exist_ok=True)
    t_all = time.time()

    if args.hard:
        # stress-v2: overlapping phone classes (10 base templates x 4
        # variants), per-utterance channel tilt/band-limit, wider
        # speaking-rate spread, shorter phones, lower SNR
        scfg = SynthConfig(
            num_phones=40, num_words=VOCAB + OOV_WORDS, num_speakers=64,
            snr_db=15.0, seed=3, confusable_groups=10, channel_sim=True,
            rate_range=(0.7, 1.45), phone_dur_ms=(40, 110),
        )
        snr_range = (2.0, 18.0)
    else:
        scfg = SynthConfig(
            num_phones=40, num_words=VOCAB + OOV_WORDS, num_speakers=64,
            snr_db=15.0, seed=3,
        )
        snr_range = (8.0, 25.0)
    rng = np.random.default_rng(scfg.seed)
    phones_tbl = make_phones(scfg, rng)
    lex_path = os.path.join(args.workdir, "lexicon.pkl")
    if os.path.exists(lex_path):
        with open(lex_path, "rb") as f:
            synth_lexicon, decode_lexicon, oov_words = pickle.load(f)
    else:
        full = make_lexicon(scfg, rng)       # VOCAB + OOV unique prons
        # homophones: clone prons of 400 random words onto 400 others
        # (within the decode vocab)
        idx = rng.choice(VOCAB, size=2 * HOMOPHONES, replace=False)
        full = list(full)
        for a, b in zip(idx[:HOMOPHONES], idx[HOMOPHONES:]):
            full[b] = (full[b][0], full[a][1])
        synth_lexicon = full                      # all words synthesizable
        decode_lexicon = full[:VOCAB]             # OOV words NOT in lexicon
        oov_words = [w for w, _ in full[VOCAB:]]
        with open(lex_path, "wb") as f:
            pickle.dump((synth_lexicon, decode_lexicon, oov_words), f)
    word_list = [w for w, _ in decode_lexicon]
    print(f"lexicon: {len(decode_lexicon)} decode words "
          f"({HOMOPHONES} homophone pairs), {len(oov_words)} OOV synth "
          f"words", flush=True)

    # ---- texts ----
    succ, slot_p = build_text_process(VOCAB, np.random.default_rng(11))

    def to_words(sents):
        return [[word_list[int(j)] for j in s] for s in sents]

    trng = np.random.default_rng(12)
    tr_texts_l = to_words(sample_sentences(
        args.utts, succ, slot_p, VOCAB, trng))
    cv_texts_l = to_words(sample_sentences(
        args.cv, succ, slot_p, VOCAB, trng))
    ev_texts_l = to_words(sample_sentences(
        args.eval, succ, slot_p, VOCAB, trng))
    # OOV injection into eval: ~2.5% of tokens replaced by OOV words
    n_oov = 0
    for sent in ev_texts_l:
        for i in range(len(sent)):
            if trng.random() < 0.025:
                sent[i] = oov_words[int(trng.integers(0, len(oov_words)))]
                n_oov += 1
    total_ev = sum(len(s) for s in ev_texts_l)
    print(f"eval OOV tokens: {n_oov}/{total_ev} "
          f"({100.0 * n_oov / total_ev:.2f}%) -> WER floor "
          f"{100.0 * n_oov / total_ev:.2f}%", flush=True)

    def mk_utts(texts_l, prefix):
        texts, utt2spk = {}, {}
        for i, ws in enumerate(texts_l):
            spk = f"spk{i % scfg.num_speakers:03d}"
            utt = f"{spk}_{prefix}{i:06d}"
            texts[utt] = ws
            utt2spk[utt] = spk
        return texts, utt2spk

    tr_texts, tr_spk = mk_utts(tr_texts_l, "tr")
    cv_texts, cv_spk = mk_utts(cv_texts_l, "cv")
    ev_texts, ev_spk = mk_utts(ev_texts_l, "ev")

    # ---- stage A: synthesis (cached) ----
    wav_cache = os.path.join(args.workdir, "waves.npz")
    t0 = time.time()
    if os.path.exists(wav_cache):
        z = np.load(wav_cache)
        all_waves = {k: z[k] for k in z.files}
        print(f"waves loaded from cache ({time.time()-t0:.0f}s)",
              flush=True)
    else:
        all_texts = {**tr_texts, **cv_texts, **ev_texts}
        all_spk = {**tr_spk, **cv_spk, **ev_spk}
        all_waves = synth_parallel(
            scfg, all_texts, all_spk, synth_lexicon, phones_tbl,
            snr_range=snr_range,
        )
        np.savez(wav_cache, **all_waves)
        print(f"synthesized {len(all_waves)} utts in "
              f"{time.time()-t0:.0f}s", flush=True)
    hours = sum(len(w) for w in all_waves.values()) / 16000 / 3600
    print(f"total audio: {hours:.2f} h", flush=True)
    if args.stop_after == "synth":
        print("stopping after synthesis (--stop-after)", flush=True)
        return

    # ---- recipe ----
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
        decode=BeamSearchConfig(beam=17.0, max_active=512, funnel_mult=2,
                                acoustic_scale=0.9, lattice_beam=8.0,
                                blank_skip=0.98),
        blank_skip_guard=6,
    )
    units = [f"p{i:02d}" for i in range(scfg.num_phones)]
    lex_full = decode_lexicon + [("<UNK>", (units[0],))]
    run = RecipeRun(cfg, os.path.join(args.workdir, "exp"), lex_full, units)
    run.build_lang()

    class MemData:
        def __init__(self, waves, texts, utt2spk):
            self.wav_scp = waves
            self.text = texts
            self.utt2spk = utt2spk

    # ---- stage B: features (cached) ----
    feat_cache = os.path.join(args.workdir, "feats.npz")
    t0 = time.time()
    if os.path.exists(feat_cache):
        z = np.load(feat_cache, allow_pickle=True)
        feats = {k: z[k] for k in z.files}
        print(f"features loaded from cache ({time.time()-t0:.0f}s)",
              flush=True)
    else:
        all_texts = {**tr_texts, **cv_texts, **ev_texts}
        all_spk = {**tr_spk, **cv_spk, **ev_spk}
        d = MemData(
            {k: w.astype(np.float32) for k, w in all_waves.items()},
            all_texts, all_spk,
        )
        feats = run.compute_features(d)
        np.savez(feat_cache,
                 **{k: v.astype(np.float32) for k, v in feats.items()})
        print(f"features in {time.time()-t0:.0f}s", flush=True)
    if args.stop_after == "feats":
        print("stopping after features (--stop-after)", flush=True)
        return
    labels = run.prep_labels(MemData({}, {**tr_texts, **cv_texts}, {}))

    tr_f = {k: feats[k] for k in tr_texts}
    cv_f = {k: feats[k] for k in cv_texts}
    ev_f = {k: feats[k] for k in ev_texts}

    # ---- stage C: train (orbax-resumable inside) ----
    t0 = time.time()
    hist = run.train(
        tr_f, {k: labels[k] for k in tr_texts},
        cv_f, {k: labels[k] for k in cv_texts},
        epochs_batches_repeat=args.epoch_repeat,
    )
    print(f"train in {time.time()-t0:.0f}s", flush=True)
    for e in sorted(hist):
        print(f"  epoch {e}: train {hist[e]['train_acc']:.2f}% "
              f"cv {hist[e]['cv_acc']:.2f}%", flush=True)

    # ---- stage D: trigram LM + LM-scale TLG (cached as npz) ----
    graph_cache = os.path.join(args.workdir, "tlg.npz")
    arpa_path = os.path.join(args.workdir, "lm.arpa.gz")
    import gzip
    if not os.path.exists(arpa_path):
        t0 = time.time()
        lm_sents = to_words(sample_sentences(
            args.lm_sents, succ, slot_p, VOCAB,
            np.random.default_rng(13)))
        # pruned trigram (count >= 2 at orders 2-3), the reference's
        # "tgpr" shape (asr_egs/wsj run_ctc_phn.sh tgpr decode)
        arpa = estimate_ngram_arpa(
            lm_sents + list(tr_texts.values()), order=3,
            vocab=word_list, min_counts=(1, 2, 2),
        )
        print(f"LM estimated in {time.time()-t0:.0f}s "
              f"({len(arpa.splitlines())} lines)", flush=True)
        with gzip.open(arpa_path, "wt") as f:
            f.write(arpa)
    t0 = time.time()
    if os.path.exists(graph_cache):
        run.graph = CompiledGraph.load(graph_cache)
        print(f"graph loaded from cache ({time.time()-t0:.0f}s)",
              flush=True)
    else:
        with gzip.open(arpa_path, "rt") as f:
            arpa = f.read()
        from eesen_tpu.decoder.arpa import arpa_to_fst
        from eesen_tpu.decoder.ctc_graph import build_full_compiled
        t0 = time.time()
        g = arpa_to_fst(arpa, run.lang.words)
        print(f"G fst in {time.time()-t0:.0f}s: {g.num_states} states "
              f"{g.num_arcs} arcs", flush=True)
        t0 = time.time()
        run.graph = build_full_compiled(
            run.lang.t_fst, run.lang.l_fst, g, build_closure=True,
        )
        print(f"TLG in {time.time()-t0:.0f}s", flush=True)
        run.graph.save(graph_cache)
    g = run.graph
    print(f"TLG: {g.num_states} states, "
          f"{g.num_emit_arcs + g.num_eps_arcs} arcs", flush=True)
    # share with bench.py (LM-scale decode bench): graph + pron rows so
    # the bench can synthesize realistic converged-CTC posteriors whose
    # token paths exist in this graph
    if not os.path.exists(BENCH_GRAPH_CACHE):
        g.save(BENCH_GRAPH_CACHE)
        prng = np.random.default_rng(5)
        pick = prng.choice(len(decode_lexicon), size=512, replace=False)
        max_pron = max(len(p) for _, p in decode_lexicon)
        prons = np.full((512, max_pron), -1, np.int32)
        for r, i in enumerate(pick):
            for c, u in enumerate(decode_lexicon[int(i)][1]):
                prons[r, c] = run.lang.tokens[u]
        np.savez(BENCH_GRAPH_CACHE.replace(".npz", "_meta.npz"),
                 prons=prons, num_tokens=len(units))

    if args.augment:
        run_augment_ab(
            args, cfg, run, all_waves, tr_texts, tr_spk, cv_texts,
            ev_texts, ev_spk, labels, cv_f, ev_f, hist,
        )
        return

    # ---- stage E: decode + parity evidence ----
    refs = {k: ev_texts[k] for k in ev_f}

    # E1: guarded sweep (decode once, rescale per acwt)
    t0 = time.time()
    sweep = run.score_sweep(ev_f, refs)
    sweep_s = time.time() - t0
    best_acwt, best = min(sweep.items(), key=lambda kv: kv[1].wer)
    for acwt in sorted(sweep):
        print(f"  acwt {acwt}: {sweep[acwt].report()}", flush=True)
    print(f"decode+sweep in {sweep_s:.0f}s; best acwt {best_acwt} "
          f"-> {best.wer:.2f}%", flush=True)

    # E2a: sweep == direct re-decode AT THE DECODE ACWT (the exact-parity
    # invariant: the lattice provably contains the best path of the
    # search it came from; at other acwts the sweep is a lattice
    # approximation, bounded by lattice_beam — same as the reference's
    # decode-once + lattice-scale scoring, local/score.sh:44-55)
    dec_acwt = cfg.decode.acoustic_scale
    t0 = time.time()
    direct, _ = run.decode(ev_f, refs, acoustic_scale=dec_acwt)
    print(f"direct decode at decode acwt {dec_acwt}: {direct.report()} "
          f"({time.time()-t0:.0f}s)", flush=True)
    parity_sweep = abs(direct.wer - sweep[dec_acwt].wer) < 1e-9

    # E2b: the lattice-approximation gap at the swept best acwt — a
    # direct search at best_acwt may find paths the dec_acwt-pruned
    # lattice lost; record the gap (hard content exercises it)
    t0 = time.time()
    alt_acwt = best_acwt
    direct_alt, _ = run.decode(ev_f, refs, acoustic_scale=alt_acwt)
    print(f"direct decode at best acwt {alt_acwt}: "
          f"{direct_alt.report()} ({time.time()-t0:.0f}s)", flush=True)

    # E3: blank-skip vs full decode on the whole eval set
    t0 = time.time()
    full_cfg = dataclasses.replace(cfg.decode, blank_skip=0.0)
    run.cfg = dataclasses.replace(cfg, decode=full_cfg)
    full_stats, full_hyps = run.decode(ev_f, refs)
    run.cfg = cfg
    skip_stats, skip_hyps = run.decode(ev_f, refs)
    n_diff = sum(
        1 for k in full_hyps if full_hyps[k] != skip_hyps.get(k)
    )
    print(f"blank-skip parity: full {full_stats.wer:.2f}% vs skip "
          f"{skip_stats.wer:.2f}%; {n_diff}/{len(full_hyps)} utts differ "
          f"({time.time()-t0:.0f}s)", flush=True)

    # E4: const-arpa trie at LM scale — build/load time + memory, and
    # rescoring parity with the G-fst LmAutomaton on real lattices
    # (reference: src/lm/const-arpa-lm.h:32,202)
    const_arpa_res = {}
    arpa_path = os.path.join(args.workdir, "lm.arpa.gz")
    if os.path.exists(arpa_path):
        import gzip
        from eesen_tpu.decoder.arpa import arpa_to_fst
        from eesen_tpu.decoder.const_arpa import ConstArpa
        from eesen_tpu.decoder.rescore import LmAutomaton, rescore_lattice

        with gzip.open(arpa_path, "rt") as f:
            arpa = f.read()
        t0 = time.time()
        trie = ConstArpa.from_arpa(arpa, run.lang.words)
        build_s = time.time() - t0
        trie_path = os.path.join(args.workdir, "lm_const.npz")
        trie.save(trie_path)
        t0 = time.time()
        trie = ConstArpa.load(trie_path, mmap=True)
        load_s = time.time() - t0
        t0 = time.time()
        g_fst = arpa_to_fst(arpa, run.lang.words)
        auto = LmAutomaton(g_fst, backoff_ilabel=run.lang.words["#0"])
        gfst_s = time.time() - t0
        sample = sorted(ev_f)[:10]
        lats = run.decode_lattices({k: ev_f[k] for k in sample})
        from eesen_tpu.decoder.clat import compact_to_lattice
        n_match = 0
        t_trie = t_auto = 0.0
        for k in sample:
            lat = compact_to_lattice(lats[k].scaled(best_acwt))
            t0 = time.time()
            ra = rescore_lattice(lat, auto, lm_scale_new=0.5)
            t_auto += time.time() - t0
            t0 = time.time()
            rt = rescore_lattice(lat, trie, lm_scale_new=0.5)
            t_trie += time.time() - t0
            pa, pt = ra.best_path(), rt.best_path()
            if pa[1] == pt[1] and abs(pa[2] - pt[2]) < 1e-3:
                n_match += 1
        const_arpa_res = {
            "ngrams": trie.num_ngrams,
            "bytes": trie.bytes(),
            "build_s": round(build_s, 1),
            "mmap_load_s": round(load_s, 3),
            "gfst_automaton_s": round(gfst_s, 1),
            "rescore_parity": f"{n_match}/{len(sample)}",
            "rescore_s_per_utt_trie": round(t_trie / len(sample), 3),
            "rescore_s_per_utt_gfst": round(t_auto / len(sample), 3),
        }
        print("const-arpa:", json.dumps(const_arpa_res), flush=True)

    res = {
        "const_arpa": const_arpa_res,
        "corpus": {
            "hours": round(hours, 2), "vocab": VOCAB,
            "homophone_pairs": HOMOPHONES,
            "oov_tokens_pct": round(100.0 * n_oov / total_ev, 2),
            "speakers": scfg.num_speakers, "snr_db": list(snr_range),
            "hard": bool(args.hard),
            "train_utts": args.utts, "eval_utts": args.eval,
        },
        "graph": {
            "states": g.num_states,
            "arcs": g.num_emit_arcs + g.num_eps_arcs,
            "lm_order": 3,
        },
        # empty when training was resume-skipped (schedule complete)
        "final_cv_acc": (
            hist[max(hist)]["cv_acc"] if hist else None
        ),
        "sweep": {str(a): round(s.wer, 2) for a, s in sweep.items()},
        "best_acwt": best_acwt, "wer": best.wer,
        "wer_report": best.report(),
        "direct_decode_acwt": dec_acwt, "direct_wer": direct.wer,
        "sweep_equals_direct": bool(parity_sweep),
        "direct_at_best_acwt": {
            "acwt": alt_acwt, "wer": direct_alt.wer,
            "sweep_wer": sweep[alt_acwt].wer,
        },
        "blank_skip_wer": skip_stats.wer, "full_wer": full_stats.wer,
        "blank_skip_diff_utts": n_diff,
        "decode_sweep_s": round(sweep_s, 1),
        "total_s": round(time.time() - t_all, 1),
    }
    with open(os.path.join(args.workdir, "results.json"), "w") as f:
        json.dump(res, f, indent=2)
    print("RESULT", json.dumps(res), flush=True)
    write_results_md(res, sweep)


def write_results_md(res, sweep):
    """Append/replace the stress-corpus section of RESULTS.md (the v2
    --hard run writes its own section so both records coexist)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "RESULTS.md")
    hard = res["corpus"].get("hard")
    marker = "## Stress corpus v2" if hard else "## Stress corpus"
    head = ""
    if os.path.exists(path):
        head = open(path).read().split(marker)[0].rstrip() + "\n\n"
    c, g = res["corpus"], res["graph"]
    snr = c["snr_db"]
    hard_line = (
        " Stress-v2 acoustics: 10 confusable phone templates x 4 "
        "variants, per-utterance channel tilt/band-limit, speaking "
        "rates 0.7-1.45x." if hard else ""
    )
    lines = [
        marker + " (20k-word vocabulary, trigram LM, LM-scale TLG)",
        "",
        "The hard proxy for real-corpus validation "
        "(examples/stress_recipe.py):",
        f"{c['hours']} h audio, {c['speakers']} speakers, per-utterance "
        f"SNR {snr[0]:g}-{snr[1]:g} dB, {c['vocab']}-word lexicon with "
        f"{c['homophone_pairs']} homophone pairs, {c['oov_tokens_pct']}% "
        "OOV tokens in eval (unrecognizable by construction — the WER "
        "floor), class-conditioned Markov text so the trigram LM has "
        "genuine predictive power." + hard_line,
        "",
        f"- TLG: **{g['states']:,} states / {g['arcs']:,} arcs** "
        "(order-3 LM, native one-call build)",
        f"- final cv token accuracy: {res['final_cv_acc']:.2f}%",
        "",
        "| acwt | WER |",
        "|---|---|",
    ]
    for acwt in sorted(sweep):
        mark = " **(best)**" if acwt == res["best_acwt"] else ""
        lines.append(f"| {acwt} | {sweep[acwt].wer:.2f}%{mark} |")
    lines += [
        "",
        f"Best: **{res['wer']:.2f}% WER** at acwt {res['best_acwt']} "
        f"({res['wer_report']}).",
        "",
        "Parity evidence on hard content:",
        f"- sweep (lattice rescale) == direct re-decode at the decode "
        f"acwt {res['direct_decode_acwt']}: "
        f"{'EXACT' if res['sweep_equals_direct'] else 'MISMATCH'} "
        f"({res['direct_wer']:.2f}%)",
        f"- lattice-approximation gap at the swept best acwt "
        f"{res['direct_at_best_acwt']['acwt']}: direct search "
        f"{res['direct_at_best_acwt']['wer']:.2f}% vs swept "
        f"{res['direct_at_best_acwt']['sweep_wer']:.2f}% (the sweep "
        "explores only paths the decode-acwt search kept — bounded by "
        "lattice_beam, same property as the reference's decode-once "
        "scoring)",
        f"- blank-skip {res['blank_skip_wer']:.2f}% vs full decode "
        f"{res['full_wer']:.2f}% WER; {res['blank_skip_diff_utts']} of "
        f"{c['eval_utts']} utterances differ",
    ]
    ca = res.get("const_arpa")
    if ca:
        lines += [
            f"- const-arpa trie at LM scale: {ca['ngrams']:,} ngrams, "
            f"{ca['bytes']/2**20:.0f} MiB, build {ca['build_s']}s, mmap "
            f"load {ca['mmap_load_s']}s (G-fst automaton build "
            f"{ca['gfst_automaton_s']}s); rescore best-path parity "
            f"{ca['rescore_parity']} at "
            f"{ca['rescore_s_per_utt_trie']}s/utt "
            f"(G-fst {ca['rescore_s_per_utt_gfst']}s/utt)",
        ]
    lines += [
        "",
        "Reproduce: `python examples/stress_recipe.py /tmp/stress_full`",
        "",
    ]
    with open(path, "w") as f:
        f.write(head + "\n".join(lines))
    print("wrote RESULTS.md stress section", flush=True)


if __name__ == "__main__":
    main()
