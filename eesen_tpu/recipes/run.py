"""End-to-end recipe driver: data dirs + lexicon + LM -> trained model + WER.

The Python equivalent of the reference's per-corpus run_ctc_*.sh four-stage
pipeline (reference: asr_egs/wsj/run_ctc_phn.sh:21-97):
  1. lang build (tokens/words/T/L) + label prep
  2. features (fbank -> per-speaker CMVN -> pipeline)
  3. CTC training with the newbob schedule
  4. TLG build + batched TPU decode + acwt-sweep scoring

Each stage is a method so partial runs / resumes are natural; everything
lives under `work_dir`.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.beam import (
    BeamSearchConfig, DeviceGraph, make_beam_decoder, traceback,
)
from eesen_tpu.decoder.ctc_graph import Lang, build_tlg, compile_lang
from eesen_tpu.decoder import fst_native as fnat
from eesen_tpu.decoder.fst import arcsort
from eesen_tpu.decoder.graph_compile import CompiledGraph, compile_graph
from eesen_tpu.decoder.score import WerStats, compute_wer
from eesen_tpu.frontend.features import fbank, num_frames
from eesen_tpu.frontend.pipeline import FeaturePipeline, speaker_cmvn_stats
from eesen_tpu.io.datadir import DataDir
from eesen_tpu.io.wave import read_wav
from eesen_tpu.models.model import apply_model
from eesen_tpu.models.priors import (
    ClassPriorOptions, compute_log_priors, counts_from_labels,
    subtract_priors,
)
from eesen_tpu.recipes.config import RecipeConfig
from eesen_tpu.recipes.labels import lexicon_numbers, prep_ctc_trans
from eesen_tpu.training.batching import BatchConfig, Utterance, make_batches
from eesen_tpu.training.trainer import Trainer, TrainerConfig
from eesen_tpu.utils.logging import get_logger

log = get_logger("recipes.run")


class RecipeRun:
    def __init__(
        self,
        cfg: RecipeConfig,
        work_dir: str,
        lexicon: List[Tuple[str, Tuple[str, ...]]],
        units: List[str],
        mesh=None,
    ):
        self.cfg = cfg
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.lexicon = lexicon
        self.units = units
        self.mesh = mesh
        self.lang: Optional[Lang] = None
        self.trainer: Optional[Trainer] = None
        self.graph: Optional[CompiledGraph] = None
        self.log_priors: Optional[np.ndarray] = None
        self.params = None            # decode-ready model parameters
        self.model_cfg = None

    # ---- stage 1: lang + labels ----
    def build_lang(self) -> Lang:
        path = os.path.join(self.work_dir, "lang.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                self.lang = pickle.load(f)
        else:
            self.lang = compile_lang(
                self.lexicon, self.units, dict_type=self.cfg.dict_type
            )
            with open(path, "wb") as f:
                pickle.dump(self.lang, f)
        return self.lang

    def prep_labels(
        self, data: DataDir, unk: str = "<UNK>"
    ) -> Dict[str, np.ndarray]:
        assert self.lang is not None
        lex_num = lexicon_numbers(self.lexicon, self.lang.tokens)
        space = "<SPACE>" if self.cfg.dict_type == "char" else ""
        return prep_ctc_trans(lex_num, data.text, unk, space)

    # ---- stage 2: features ----
    def compute_features(
        self, data: DataDir, dither_seed: Optional[int] = 0
    ) -> Dict[str, np.ndarray]:
        """wav.scp -> pipeline features, with per-speaker CMVN."""
        raw = self._raw_fbank(data, dither_seed)
        cmvn = speaker_cmvn_stats(raw, data.utt2spk)
        pipe = FeaturePipeline(self.cfg.pipeline, cmvn, data.utt2spk)
        return {k: pipe(k, v) for k, v in raw.items()}

    def compute_augmented_features(
        self,
        data: DataDir,
        tags=None,
        dither_seed: Optional[int] = 0,
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Per-tag pipeline features for the multi-view augmentation flow
        (reference: make_fbank_mult.sh over fbconf-{8,10,11} x
        --vtln-warp {0.8,1.0,1.2}).  CMVN stats come from the canonical
        10_1.0 view only and are applied to every view
        (compute_cmvn_stats_mult.sh --tag 10_1.0).  Returns
        {tag_name: {utt: feats}}."""
        from eesen_tpu.recipes.augment import base_tag, librispeech_tags

        tags = tags or librispeech_tags()
        base = base_tag(tags)
        raw_by_tag = {
            t.name: self._raw_fbank(
                data, dither_seed,
                frame_shift_ms=t.frame_shift_ms, vtln_warp=t.vtln_warp,
            )
            for t in tags
        }
        cmvn = speaker_cmvn_stats(raw_by_tag[base.name], data.utt2spk)
        pipe = FeaturePipeline(self.cfg.pipeline, cmvn, data.utt2spk)
        return {
            name: {k: pipe(k, v) for k, v in raw.items()}
            for name, raw in raw_by_tag.items()
        }

    def _raw_fbank(
        self,
        data: DataDir,
        dither_seed: Optional[int] = 0,
        frame_shift_ms: Optional[float] = None,
        vtln_warp: float = 1.0,
    ) -> Dict[str, np.ndarray]:
        raw: Dict[str, np.ndarray] = {}
        opts = self.cfg.fbank
        if frame_shift_ms is not None:
            opts = dataclasses.replace(
                opts, frame_opts=dataclasses.replace(
                    opts.frame_opts, frame_shift_ms=frame_shift_ms,
                ),
            )
        fb = jax.jit(jax.vmap(lambda w: fbank(w, opts,
                                              vtln_warp=vtln_warp)))
        fbd = jax.jit(
            jax.vmap(lambda w, r: fbank(w, opts, vtln_warp=vtln_warp,
                                        dither_rng=r))
        )
        rng = (
            jax.random.PRNGKey(dither_seed) if dither_seed is not None
            else None
        )
        # pad waves to ONE shape bucket and batch utterances per device
        # call: the per-call host<->device round trip dominates at
        # corpus scale (measured ~1 s/utt unbatched over the axon tunnel)
        waves = {}
        for k, src in data.wav_scp.items():
            if isinstance(src, np.ndarray):   # in-memory corpora
                waves[k] = src
            else:
                w, sr = read_wav(src)
                waves[k] = w[0]
        if not waves:
            return {}
        max_n = max(len(w) for w in waves.values())
        bucket = 1 << max(int(np.ceil(np.log2(max(max_n, 1024)))), 10)
        keys = sorted(waves)
        # big chunks: the per-call host<->device round trip costs ~0.5 s
        # over the axon tunnel regardless of payload, so fewer, larger
        # batches win (64 x 8 s f32 waves = ~33 MB/call, well under limits)
        fbatch = 64
        for i in range(0, len(keys), fbatch):
            chunk = keys[i : i + fbatch]
            wp = np.zeros((fbatch, bucket), np.float32)
            for j, k in enumerate(chunk):
                wp[j, : len(waves[k])] = waves[k]
            if rng is not None and opts.frame_opts.dither != 0.0:
                rng, sub = jax.random.split(rng)
                out = np.asarray(
                    fbd(jnp.asarray(wp), jax.random.split(sub, fbatch))
                )
            else:
                out = np.asarray(fb(jnp.asarray(wp)))
            for j, k in enumerate(chunk):
                nf = num_frames(len(waves[k]), opts.frame_opts)
                raw[k] = out[j, :nf]
        return raw

    # ---- stage 3: training ----
    def train(
        self,
        train_feats: Dict[str, np.ndarray],
        train_labels: Dict[str, np.ndarray],
        cv_feats: Dict[str, np.ndarray],
        cv_labels: Dict[str, np.ndarray],
        epochs_batches_repeat: int = 1,
        tagged_feats: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
        tag_order: Optional[List[str]] = None,
    ) -> Dict:
        """With tagged_feats (from compute_augmented_features), each
        newbob epoch trains on ONE augmented feature view, rotating
        through tag_order (default: the reference's LibriSpeech list) —
        steps/train_ctc_parallel_mult.sh:205; train_feats then serves as
        the canonical view for the final epochs and CV stays on the
        canonical features."""
        assert self.lang is not None
        num_targets = len(self.units) + 1   # blank + units
        model_cfg = dataclasses.replace(
            self.cfg.model, num_targets=num_targets
        )
        tcfg = TrainerConfig(
            model=model_cfg,
            optimizer=self.cfg.optimizer,
            newbob=self.cfg.newbob,
            checkpoint_dir=os.path.join(self.work_dir, "ckpt"),
        )
        self.trainer = Trainer(tcfg, mesh=self.mesh)

        def mk(feats, labels):
            utts = [
                Utterance(k, feats[k], labels[k])
                for k in sorted(feats)
                if k in labels and len(labels[k]) > 0
            ]
            return utts

        tr_utts, cv_utts = mk(train_feats, train_labels), mk(cv_feats, cv_labels)

        if tagged_feats:
            from eesen_tpu.recipes.augment import (
                LIBRISPEECH_ROTATION, rotation_tag,
            )
            order = tag_order or [
                t for t in LIBRISPEECH_ROTATION if t in tagged_feats
            ]
            utts_by_tag = {
                tag: mk(fe, train_labels) for tag, fe in tagged_feats.items()
            }

            def train_iter(epoch):
                tag = rotation_tag(order, epoch)
                log.info("epoch %d: augmentation tag %s", epoch, tag)
                for _ in range(epochs_batches_repeat):
                    yield from make_batches(utts_by_tag[tag], self.cfg.batch)
        else:
            def train_iter():
                for _ in range(epochs_batches_repeat):
                    yield from make_batches(tr_utts, self.cfg.batch)

        def cv_iter():
            yield from make_batches(cv_utts, self.cfg.batch)

        history = self.trainer.fit(train_iter, cv_iter)
        # priors from the training labels (train_ctc_parallel.sh:119-120)
        counts = counts_from_labels(
            [train_labels[u.key] for u in tr_utts], num_targets
        )
        self.log_priors = compute_log_priors(counts, ClassPriorOptions())
        self.params = self.trainer.state.params
        self.model_cfg = model_cfg
        with open(os.path.join(self.work_dir, "model.pkl"), "wb") as f:
            pickle.dump(
                {"params": self.trainer.state.params, "config": model_cfg,
                 "log_priors": self.log_priors},
                f,
            )
        return history

    def load_model(self, path: Optional[str] = None) -> None:
        """Load decode-ready parameters from a saved model.pkl — decoding
        needs no live Trainer (the reference's net-output-extract reads
        any nnet file: netbin/net-output-extract.cc:73)."""
        path = path or os.path.join(self.work_dir, "model.pkl")
        with open(path, "rb") as f:
            d = pickle.load(f)
        self.params = d["params"]
        self.model_cfg = d["config"]
        self.log_priors = d.get("log_priors")

    # ---- stage 4: graph + decode + score ----
    def build_graph(self, arpa_path_or_text: str) -> CompiledGraph:
        assert self.lang is not None
        path = os.path.join(self.work_dir, "tlg.pkl")
        if os.path.exists(path):
            with open(path, "rb") as f:
                self.graph = pickle.load(f)
            return self.graph
        from eesen_tpu.decoder.ctc_graph import build_full_compiled

        g = arpa_to_fst(arpa_path_or_text, self.lang.words)
        self.graph = build_full_compiled(
            self.lang.t_fst, self.lang.l_fst, g, build_closure=True
        )
        with open(path, "wb") as f:
            pickle.dump(self.graph, f)
        return self.graph

    def _decode_params(self):
        if self.params is None and self.trainer is not None:
            self.params = self.trainer.state.params
            self.model_cfg = self.trainer.cfg.model
        if self.params is None:
            self.load_model()
        assert self.params is not None and self.model_cfg is not None
        return self.params, self.model_cfg

    def _posteriors(
        self,
        feats: Dict[str, np.ndarray],
        chunk: List[str],
        time_bucket: int = 128,
        batch_pad: int = 0,
    ) -> Tuple[jnp.ndarray, np.ndarray]:
        """Model posteriors for a chunk, shape-bucketed: T is rounded up
        to `time_bucket` and B padded to `batch_pad` (zero rows, length
        0) so every chunk of a decode pass reuses ONE compiled forward
        program — each distinct shape costs a multi-minute remote
        compile on the tunnel platform."""
        params, model_cfg = self._decode_params()
        t_max = max(feats[k].shape[0] for k in chunk)
        if time_bucket > 1:
            t_max = -(-t_max // time_bucket) * time_bucket
        b = max(len(chunk), batch_pad)
        dim = feats[chunk[0]].shape[1]
        arr = np.zeros((b, t_max, dim), np.float32)
        lens = np.zeros(b, np.int32)
        for j, k in enumerate(chunk):
            arr[j, : len(feats[k])] = feats[k]
            lens[j] = len(feats[k])
        logits = apply_model(
            params, jnp.asarray(arr), jnp.asarray(lens), model_cfg,
        )
        lp = jax.nn.log_softmax(logits, axis=-1)
        if self.log_priors is not None:
            lp = subtract_priors(lp, self.log_priors)
        return lp, lens

    def _run_search(self, feats, keys, cfg, batch_size):
        """Batched beam search over `keys`; yields (chunk, lp, lens, out).
        With cfg.blank_skip > 0, blank-dominated runs are merged into
        run-summed frames first (decoder/frame_skip.py) and lp/lens are
        the COMPACTED posteriors the search actually saw (path costs
        match the full decode — see frame_skip).  Retries a chunk once
        with doubled olabel capacity when the per-frame word-emission
        buffer overflowed (the silent-truncation hazard the overflow
        counter exists to catch)."""
        from eesen_tpu.decoder.frame_skip import compact_blank_frames

        decoder = make_beam_decoder(self.graph, cfg)
        dg = DeviceGraph.put(self.graph)
        # length-sorted chunks: similar-length utterances share a shape
        # bucket, so the whole pass reuses one or two compiled programs
        keys = sorted(keys, key=lambda k: (-feats[k].shape[0], k))
        for i in range(0, len(keys), batch_size):
            chunk = keys[i : i + batch_size]
            lp, lens = self._posteriors(
                feats, chunk, batch_pad=batch_size
            )
            if cfg.blank_skip > 0.0:
                cf = compact_blank_frames(
                    lp, lens, cfg.blank_skip,
                    bucket=cfg.blank_skip_bucket,
                )
                lp = cf.loglikes
                lens = np.asarray(cf.lengths)
            out = decoder(lp, jnp.asarray(lens), dg)
            n_over = int(np.asarray(out.overflow).sum())
            if n_over > 0:
                log.warning(
                    "beam search dropped %d olabels (max_olabels=%d); "
                    "re-decoding chunk with doubled capacity",
                    n_over, cfg.max_olabels,
                )
                wide = dataclasses.replace(
                    cfg, max_olabels=cfg.max_olabels * 2
                )
                out = make_beam_decoder(self.graph, wide)(
                    lp, jnp.asarray(lens), dg
                )
            yield chunk, lp, lens, out

    def decode(
        self,
        feats: Dict[str, np.ndarray],
        refs: Dict[str, List[str]],
        acoustic_scale: Optional[float] = None,
        batch_size: int = 8,
    ) -> Tuple[WerStats, Dict[str, List[str]]]:
        """Best-path decode -> WER.  Works from a live Trainer OR from the
        saved model.pkl (load_model)."""
        assert self.graph is not None and self.lang is not None
        cfg = self.cfg.decode
        if acoustic_scale is not None:
            cfg = dataclasses.replace(cfg, acoustic_scale=acoustic_scale)
        words = self.lang.words
        hyps: Dict[str, List[str]] = {}
        for chunk, lp, lens, out in self._run_search(
            feats, sorted(feats), cfg, batch_size
        ):
            # zip: the batch may carry padded zero-length rows past chunk
            for k, (wids, cost) in zip(
                chunk, traceback(out, lens, self.graph.final_weight)
            ):
                hyps[k] = [words.sym(w) for w in wids]
        stats = compute_wer(refs, hyps)
        return stats, hyps

    def check_blank_skip_parity(
        self,
        feats: Dict[str, np.ndarray],
        sample: Optional[int] = None,
        batch_size: int = 8,
        seed: int = 0,
    ) -> Tuple[bool, Dict[str, object]]:
        """Decode a random sample of utterances both WITH and WITHOUT
        blank-run merging and compare best-path word sequences.

        Blank-run merging is exact only when each merged blank run
        carries at most one label transition (frame_skip.py docstring);
        this guard validates that premise on the actual decode content
        before a scoring pass trusts the skipping results.  Returns
        (ok, {"checked": keys, "mismatched": keys})."""
        cfg = self.cfg.decode
        if cfg.blank_skip <= 0.0 or not feats:
            return True, {"checked": [], "mismatched": []}
        keys = sorted(feats)
        n = min(sample or self.cfg.blank_skip_guard or 4, len(keys))
        rng = np.random.default_rng(seed)
        pick = sorted(
            keys[i] for i in rng.choice(len(keys), size=n, replace=False)
        )
        sub = {k: feats[k] for k in pick}

        def best_words(c):
            hyps = {}
            for chunk, lp, lens, out in self._run_search(
                sub, pick, c, batch_size
            ):
                for k, (wids, _) in zip(
                    chunk, traceback(out, lens, self.graph.final_weight)
                ):
                    hyps[k] = wids
            return hyps

        skip = best_words(cfg)
        full = best_words(dataclasses.replace(cfg, blank_skip=0.0))
        mismatched = sorted(k for k in pick if skip.get(k) != full.get(k))
        return not mismatched, {"checked": pick, "mismatched": mismatched}

    def decode_lattices(
        self,
        feats: Dict[str, np.ndarray],
        batch_size: int = 8,
        lattice_beam: Optional[float] = None,
        keep_tokens: int = 64,
        decode_cfg: Optional[BeamSearchConfig] = None,
    ) -> Dict[str, object]:
        """Decode ONCE and return determinized CompactLattices with
        UNSCALED acoustic costs, ready for acwt sweeps/rescoring without
        re-decoding (reference: DecodeUtteranceLatticeFaster decodes,
        determinizes in the pair semiring, unscales by 1/acwt, writes —
        decoder-wrappers.cc:87-107; scoring then sweeps by lattice-scale,
        local/score.sh:44-55).

        With cfg.blank_skip > 0 the lattices span the COMPACTED frame
        axis (each blank run merged into one run-summed frame); path
        costs, word sequences and acwt sweeps match the full decode
        (frame_skip.py docstring), but per-frame CTM timings refer to
        kept frames only."""
        from eesen_tpu.decoder.clat import determinize_lattice_pruned
        from eesen_tpu.decoder.lattice import lattice_from_beam

        assert self.graph is not None
        base = decode_cfg if decode_cfg is not None else self.cfg.decode
        lbeam = (
            lattice_beam if lattice_beam is not None
            else (base.lattice_beam or 8.0)
        )
        cfg = dataclasses.replace(base, lattice_beam=lbeam)
        acwt = cfg.acoustic_scale
        lats: Dict[str, object] = {}
        for chunk, lp, lens, out in self._run_search(
            feats, sorted(feats), cfg, batch_size
        ):
            ll = np.asarray(lp)
            for j, k in enumerate(chunk):
                raw = lattice_from_beam(
                    out, j, int(lens[j]), self.graph, ll[j],
                    acwt, keep_tokens=keep_tokens,
                )
                # lattice_beam applies in the search-cost domain (the
                # raw lattice's acoustics are scaled by acwt, like the
                # reference's in-decoder costs)
                raw.prune(lbeam)
                clat = determinize_lattice_pruned(raw, lattice_beam=lbeam)
                # store with unscaled acoustics for later sweeps
                lats[k] = clat.scaled(1.0 / acwt if acwt else 1.0)
        return lats

    def score_sweep(
        self,
        feats,
        refs,
        acwts: Optional[Tuple[float, ...]] = None,
        word_ins_penalty: float = 0.0,
        batch_size: int = 8,
    ) -> Dict[float, WerStats]:
        """Per-acwt WER from ONE decode pass: lattices are generated once
        and rescaled per acwt (local/score.sh:44-55 lattice-scale |
        lattice-best-path | compute-wer)."""
        assert self.lang is not None
        words = self.lang.words
        dcfg = self.cfg.decode
        if dcfg.blank_skip > 0.0 and self.cfg.blank_skip_guard > 0:
            # cache the verdict per eval set: repeated sweeps (acwt
            # tuning re-runs, rescoring passes) pay the double decode
            # once per RecipeRun
            guard_key = (tuple(sorted(feats)), dcfg.blank_skip)
            cached = getattr(self, "_guard_cache", {}).get(guard_key)
            if cached is not None:
                ok, info = cached
            else:
                ok, info = self.check_blank_skip_parity(
                    feats, batch_size=batch_size
                )
                if not hasattr(self, "_guard_cache"):
                    self._guard_cache = {}
                self._guard_cache[guard_key] = (ok, info)
            if ok:
                log.info(
                    "blank-skip parity guard: %d/%d sampled utterances "
                    "word-identical to the full decode",
                    len(info["checked"]), len(info["checked"]),
                )
            else:
                log.warning(
                    "blank-skip parity guard FAILED on %s — falling back "
                    "to the full (non-skipping) decode for this pass",
                    info["mismatched"],
                )
                dcfg = dataclasses.replace(dcfg, blank_skip=0.0)
        lats = self.decode_lattices(
            feats, batch_size=batch_size, decode_cfg=dcfg
        )
        out: Dict[float, WerStats] = {}
        for acwt in acwts or self.cfg.acwt_sweep:
            hyps: Dict[str, List[str]] = {}
            for k, clat in lats.items():
                sc = clat.scaled(acwt)
                if word_ins_penalty:
                    sc.add_penalty(word_ins_penalty)
                _, wids, _ = sc.best_path()
                hyps[k] = [words.sym(w) for w in wids]
            stats = compute_wer(refs, hyps)
            log.info("acwt %.2f: %s", acwt, stats.report())
            out[acwt] = stats
        return out
