"""Benchmark: CTC training + WFST decode throughput on the flagship WSJ
config.

Measures audio-seconds of speech processed per wall-clock second per chip
for the full jitted train step (BiLSTM fwd + CTC + bwd + update) — the
north-star metric from BASELINE.json — plus the decode metrics (ms/frame
and audio-s/s/chip, full and blank-skip) on the largest available TLG:
the LM-scale (multi-million-state) trigram graph cached by
examples/stress_recipe.py when present, else a ~330k-state bigram graph
built inline.  The reference never published throughput (it logged
per-run "fps" only, src/netbin/train-ctc-parallel.cc:251), so
vs_baseline is reported against a nominal 2015-GPU estimate of ~3000
frames/sec (=30 audio-sec/s) for the same 4x320 BiLSTM workload.

Wall-clock discipline (the round-3 record lost its decode metrics to an
uncached remote compile of the train step): the DECODE section runs
FIRST whenever the LM-scale graph cache exists, both sections load
ahead-of-time serialized executables (utils/aot_cache.py) prepared by
`python bench.py --prep` instead of paying the remote-compile service
cost (~minutes per program on this platform), live compiles are
attempted only while the remaining budget (EESEN_BENCH_DEADLINE seconds
from process start, default 560 to fit a 590 s driver timeout) can
absorb them, and every skipped sub-bench records a reason key instead of
silently dropping its metrics.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time

_T0 = time.time()
_DEADLINE = _T0 + float(os.environ.get("EESEN_BENCH_DEADLINE", "560"))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BIG_GRAPH_CACHE = "/tmp/eesen_bench_cache/tlg_stress.npz"
PREP = "--prep" in sys.argv

# decode shapes (fixed: the AOT fingerprint covers them)
DEC_B, DEC_T = 8, 512
TRAIN_T, TRAIN_L = 768, 100


def _left() -> float:
    return _DEADLINE - time.time()


def main():
    result = {}
    decode_first = os.path.exists(BIG_GRAPH_CACHE)
    sections = (
        [bench_decode, bench_train] if decode_first
        else [bench_train, bench_decode]
    )
    for section in sections:
        try:
            result.update(section())
        except Exception as e:  # noqa: BLE001 - record, don't lose the rest
            result[f"{section.__name__}_error"] = (
                f"{type(e).__name__}: {e}"[:200]
            )
    if "value" not in result and "decode_ms_per_frame" in result:
        # train skipped: promote decode to the headline metric
        result = dict(
            metric="wfst_decode_audio_sec_per_sec_per_chip",
            value=result.get("decode_audio_sec_per_sec_per_chip"),
            unit="audio-s/s/chip",
            vs_baseline=None,
            **result,
        )
    print(json.dumps(result))


# ---------------------------------------------------------------------
# train section
# ---------------------------------------------------------------------

def _train_setup(bsz: int):
    """(jitted_step, example_args, fingerprint) for the flagship config."""
    import eesen_tpu.models.bilstm as bilstm_mod
    import eesen_tpu.models.model as model_mod
    import eesen_tpu.ops.ctc as ctc_mod
    import eesen_tpu.ops.lstm_pallas as lstm_mod
    import eesen_tpu.training.trainer as trainer_mod
    from eesen_tpu.models.model import AcousticModelConfig
    from eesen_tpu.training.optim import OptimizerConfig
    from eesen_tpu.training.trainer import create_train_state, make_train_step
    from eesen_tpu.utils import aot_cache

    cfg = AcousticModelConfig(
        input_dim=120, cell_dim=320, num_layers=4, num_targets=72,
        compute_dtype=jnp.bfloat16,
    )
    opt = OptimizerConfig(algorithm="sgd", momentum=0.9, max_grad=50.0)
    state, tx = create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = make_train_step(cfg, tx, donate=True)

    rng = np.random.default_rng(0)
    batch = {
        "feats": jnp.asarray(
            rng.standard_normal(
                (bsz, TRAIN_T, cfg.input_dim)).astype(np.float32)
        ),
        "feat_lengths": jnp.asarray(np.full((bsz,), TRAIN_T, np.int32)),
        "labels": jnp.asarray(
            rng.integers(1, cfg.num_targets,
                         size=(bsz, TRAIN_L)).astype(np.int32)
        ),
        "label_lengths": jnp.asarray(np.full((bsz,), TRAIN_L, np.int32)),
    }
    args = (state, batch, jax.random.PRNGKey(1), jnp.float32(4e-5))
    fp = aot_cache.fingerprint(
        "train", cfg, opt, bsz, TRAIN_T, TRAIN_L,
        aot_cache.source_hash(
            [trainer_mod, model_mod, bilstm_mod, ctc_mod, lstm_mod]
        ),
    )
    return step, args, fp


def _time_train(compiled, args, n_steps: int = 10) -> float:
    """Seconds per step over n_steps chained (donated) steps."""
    state, batch, key, lr = args
    import jax.random as jrandom

    for _ in range(2):   # warm (first run pays device/tunnel init)
        key, sk = jrandom.split(key)
        state, metrics = compiled(state, batch, sk, lr)
    float(metrics["loss"])  # hard barrier (device round-trip)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, sk = jrandom.split(key)
        state, metrics = compiled(state, batch, sk, lr)
    # Fetch a scalar that depends on the last step; the chained donated
    # state makes step N depend on N-1, so this barriers the whole loop.
    # (block_until_ready alone can return early for donation-aliased
    # buffers under the axon remote platform.)
    float(metrics["loss"])
    return (time.perf_counter() - t0) / n_steps


def bench_train():
    from eesen_tpu.utils import aot_cache

    # B=128 fills the 128 MXU rows in the recurrent GEMM (B=32 used 32 of
    # 128 -> 22% MFU; B=128 measures ~36%).  Per-chip batch 128 is the
    # data-parallel equivalence of the reference's multi-GPU averaging.
    plan = [(128, 450.0), (32, 150.0)]  # (bsz, live-compile budget needed)
    res = {}
    if PREP:
        # prep compiles EVERY plan entry (the b=32 fallback exists
        # precisely for short-budget runs; it needs a cached executable
        # too, not just b=128)
        for bsz, _need in plan:
            step, args, fp = _train_setup(bsz)
            compiled, cached = aot_cache.load_or_compile(
                f"train_b{bsz}", fp, step, args
            )
            res[f"train_b{bsz}_prepped"] = bool(compiled is not None)
    for bsz, need in plan:
        step, args, fp = _train_setup(bsz)
        compiled, cached = aot_cache.load_or_compile(
            f"train_b{bsz}", fp, None, args
        )
        if compiled is None:
            if _left() > need:
                compiled, cached = aot_cache.load_or_compile(
                    f"train_b{bsz}", fp, step, args
                )
            else:
                res[f"train_b{bsz}_skipped_reason"] = (
                    f"no AOT executable and <{int(need)}s budget left"
                )
                continue
        sec_per_step = _time_train(compiled, args)
        audio_sec_per_sec = bsz * TRAIN_T * 0.010 / sec_per_step
        n_chips = jax.device_count()
        value = audio_sec_per_sec / n_chips
        baseline = 30.0  # nominal 2015 GPU (~3000 fps)
        res.update({
            "metric": "ctc_train_audio_sec_per_sec_per_chip",
            "value": round(value, 2),
            "unit": "audio-s/s/chip",
            "vs_baseline": round(value / baseline, 2),
            "train_batch": bsz,
            "train_aot": bool(cached),
        })
        return res
    res.setdefault(
        "train_skipped_reason",
        "no AOT executable and insufficient budget for any live compile",
    )
    return res


# ---------------------------------------------------------------------
# decode section
# ---------------------------------------------------------------------

def _load_big_graph():
    """(graph, prons, num_tokens) from the stress-recipe cache, or None."""
    from eesen_tpu.decoder.graph_compile import CompiledGraph

    meta_path = BIG_GRAPH_CACHE.replace(".npz", "_meta.npz")
    if not (os.path.exists(BIG_GRAPH_CACHE) and os.path.exists(meta_path)):
        return None
    g = CompiledGraph.load(BIG_GRAPH_CACHE)
    z = np.load(meta_path)
    return g, z["prons"], int(z["num_tokens"])


def _build_medium_graph():
    """~330k-state bigram TLG built inline (the round-2 bench graph)."""
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
    from eesen_tpu.decoder.graph_compile import compile_graph
    from eesen_tpu.recipes.lm import estimate_bigram_arpa
    from eesen_tpu.recipes.synth_corpus import SynthConfig, make_lexicon

    scfg = SynthConfig(num_phones=40, num_words=2000)
    rng = np.random.default_rng(7)
    lex = make_lexicon(scfg, rng)
    vocab = [w for w, _ in lex]
    sents = [
        [vocab[int(j)] for j in rng.integers(0, len(vocab),
                                             int(rng.integers(4, 12)))]
        for _ in range(20000)
    ]
    arpa = estimate_bigram_arpa(sents, vocab=vocab)
    units = [f"p{i:02d}" for i in range(scfg.num_phones)]
    lang = compile_lang(lex, units, dict_type="phn")
    fst = build_tlg(lang.t_fst, build_lg(lang.l_fst, arpa_to_fst(
        arpa, lang.words)))
    g = compile_graph(fst, max_degree=8, build_closure=True)
    max_pron = max(len(p) for _, p in lex)
    prons = np.full((512, max_pron), -1, np.int32)
    pick = rng.choice(len(lex), size=512, replace=False)
    for r, i in enumerate(pick):
        for c, u in enumerate(lex[int(i)][1]):
            prons[r, c] = lang.tokens[u]
    return g, prons, len(units)


def _synth_posteriors(prons, num_tokens, b, t, rng):
    """Realistic converged-CTC posteriors: token paths from real prons,
    1-2 spike frames per phone followed by 3-8 saturated blank frames
    (a trained model's blank rate is 70-90%), so the blank-skip
    production path is measured on representative content."""
    v = 1 + num_tokens
    ll = np.zeros((b, t, v), np.float32)
    for i in range(b):
        frames = []
        while len(frames) < t:
            row = prons[int(rng.integers(0, len(prons)))]
            for tok in row[row > 0]:
                col = int(tok) - 1
                for _ in range(int(rng.integers(1, 3))):
                    x = rng.standard_normal(v).astype(np.float32) * 0.4
                    x[col] += 7.0
                    frames.append(x)
                for _ in range(int(rng.integers(3, 9))):
                    x = rng.standard_normal(v).astype(np.float32) * 0.4
                    x[0] += 12.0
                    frames.append(x)
        ll[i] = np.stack(frames)[:t]
    return ll - np.log(np.exp(ll).sum(-1, keepdims=True))


def _decode_cfg():
    from eesen_tpu.decoder.beam import BeamSearchConfig

    return BeamSearchConfig(
        beam=16.0, max_active=512, funnel_mult=2, acoustic_scale=0.9,
    )


def _decode_fp(tag, graph, cfg, b, t, v):
    import eesen_tpu.decoder.beam as beam_mod
    import eesen_tpu.decoder.frame_skip as fs_mod
    import eesen_tpu.ops.beam_pallas as bp_mod
    from eesen_tpu.utils import aot_cache

    gsig = (graph.num_states, graph.num_emit_arcs, graph.num_eps_arcs,
            graph.max_emit_degree, graph.has_closure, graph.start)
    return aot_cache.fingerprint(
        tag, gsig, cfg, b, t, v,
        aot_cache.source_hash([beam_mod, fs_mod, bp_mod]),
    )


def _time_decode(run_fn, barrier_fn, reps: int = 3) -> float:
    run_fn()  # warm (first run pays device init / transfers)
    barrier_fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        barrier_fn(run_fn())
        best = min(best, time.perf_counter() - t0)
    return best


def bench_decode():
    """WFST beam decode throughput; prefers the LM-scale cached graph.

    Mirrors the reference's latgen-faster decode loop
    (src/decoder/lattice-faster-decoder.cc ProcessEmitting) as the
    batched TPU search with the fused Pallas recombination kernel."""
    from eesen_tpu.decoder.beam import DeviceGraph, make_beam_decoder
    from eesen_tpu.decoder.frame_skip import compact_blank_frames
    from eesen_tpu.utils import aot_cache

    res = {}
    big = _load_big_graph()
    if big is not None:
        g, prons, num_tokens = big
        graph_kind = "lm_scale_trigram"
    else:
        if not PREP and _left() < 500:
            return {"decode_skipped_reason":
                    "no cached LM-scale graph and <500s budget to build "
                    "+ compile inline"}
        g, prons, num_tokens = _build_medium_graph()
        graph_kind = "medium_bigram_inline"

    cfg = _decode_cfg()
    b, t = DEC_B, DEC_T
    rng = np.random.default_rng(7)
    ll = _synth_posteriors(prons, num_tokens, b, t, rng)
    v = ll.shape[-1]
    ll_d = jnp.asarray(ll)
    lens = jnp.full((b,), t, jnp.int32)
    dg = DeviceGraph.put(g)

    fp = _decode_fp("decfull", g, cfg, b, t, v)
    dec_jit = make_beam_decoder(g, cfg)
    args = (ll_d, lens, dg)
    compiled, cached = aot_cache.load_or_compile("dec_full", fp, None, args)
    if compiled is None:
        if PREP or _left() > 500:
            compiled, cached = aot_cache.load_or_compile(
                "dec_full", fp, dec_jit, args
            )
        else:
            return {"decode_skipped_reason":
                    "no AOT executable and <500s budget for the first "
                    "beam compile", "decode_graph_kind": graph_kind}

    def run():
        return compiled(ll_d, lens, dg)

    def barrier(out=None):
        if out is not None:
            float(jnp.sum(out.scores[-1]))  # scalar fetch barrier
        return out

    best = _time_decode(run, lambda o=None: barrier(o))
    ms_frame = best / t * 1000
    res.update({
        "decode_ms_per_frame": round(ms_frame, 2),
        "decode_audio_sec_per_sec_per_chip": round(0.010 * b * t / best, 1),
        "decode_graph_states": g.num_states,
        "decode_graph_arcs": g.num_emit_arcs + g.num_eps_arcs,
        "decode_graph_kind": graph_kind,
        "decode_aot": bool(cached),
    })

    # production path: blank-frame skipping (decoder/frame_skip.py).
    # compact_blank_frames is itself jitted; its compile is seconds, the
    # compacted-shape search program is the costly one — AOT it too.
    if not PREP and _left() < 45:
        res["decode_skip_skipped_reason"] = "<45s budget left"
        return res
    cf = compact_blank_frames(ll_d, lens, 0.98, 0.9, bucket=64)
    t_skip = cf.loglikes.shape[1]
    fp_s = _decode_fp("decskip", g, cfg, b, t_skip, v)
    args_s = (cf.loglikes, cf.lengths, dg)
    compiled_s, cached_s = aot_cache.load_or_compile(
        "dec_skip", fp_s, None, args_s
    )
    if compiled_s is None:
        # a beam-shaped program has already been built or loaded in this
        # process; a second shape compiles in seconds on a warm service,
        # but budget for the cold case when nothing is cached
        if PREP or _left() > 120:
            compiled_s, cached_s = aot_cache.load_or_compile(
                "dec_skip", fp_s, make_beam_decoder(g, cfg), args_s
            )
        else:
            res["decode_skip_skipped_reason"] = (
                "no AOT executable and <120s budget left"
            )
            return res

    def skip_pass():
        cf2 = compact_blank_frames(ll_d, lens, 0.98, 0.9, bucket=64)
        o = compiled_s(cf2.loglikes, cf2.lengths, dg)
        float(jnp.sum(o.scores[-1]))

    best_s = _time_decode(skip_pass, lambda o=None: None)
    res["decode_skip_audio_sec_per_sec_per_chip"] = round(
        0.010 * b * t / best_s, 1)
    res["decode_skip_kept_frames"] = int(np.asarray(cf.lengths).mean())
    res["decode_skip_aot"] = bool(cached_s)
    return res


if __name__ == "__main__":
    main()
