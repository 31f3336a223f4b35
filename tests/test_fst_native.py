"""Cross-validate the native C++ WFST ops against the Python reference
implementations on random FSTs and on the real TLG build."""

import random

import pytest

from eesen_tpu.decoder import fst as pyfst
from eesen_tpu.decoder import fst_native as nat
from tests.test_fst import (
    assert_equivalent, language, linear_fst, random_acyclic_fst,
)

pytestmark = pytest.mark.skipif(
    not nat.native_available(), reason="no C++ toolchain"
)


def test_pack_roundtrip():
    f = pyfst.Fst.from_text("0 1 1 2 0.5\n1 2 3 4\n2 0.25\n")
    g = nat.unpack_fst(nat.pack_fst(f))
    assert_equivalent(f, g)
    assert g.start == f.start


@pytest.mark.parametrize("seed", range(10))
def test_native_compose_matches_python(seed):
    rng = random.Random(seed)
    a = random_acyclic_fst(rng, eps_prob=0.3)
    b = random_acyclic_fst(rng, eps_prob=0.2)
    if a.num_states == 0 or b.num_states == 0:
        return
    py = pyfst.compose(a, b)
    cc = nat.compose(a, b)
    if py.num_states == 0:
        assert cc.num_states == 0
        return
    assert_equivalent(py, cc)


@pytest.mark.parametrize("seed", range(10))
def test_native_rmeps_matches_python(seed):
    rng = random.Random(50 + seed)
    f = random_acyclic_fst(rng, eps_prob=0.4)
    if f.num_states == 0:
        return
    assert_equivalent(pyfst.rm_epsilon(f), nat.rm_epsilon(f))


@pytest.mark.parametrize("seed", range(10))
def test_native_determinize_matches_python(seed):
    rng = random.Random(100 + seed)
    f = pyfst.Fst()
    root = f.add_state()
    f.set_start(root)
    seen = set()
    for _ in range(rng.randrange(2, 6)):
        n = rng.randrange(1, 4)
        ils = tuple(rng.randrange(1, 4) for _ in range(n))
        if ils in seen:
            continue
        seen.add(ils)
        ols = tuple(rng.randrange(1, 4) for _ in range(n))
        s = root
        for i, (a, b) in enumerate(zip(ils, ols)):
            ns = f.add_state()
            f.add_arc(s, pyfst.Arc(a, b, round(rng.uniform(0, 1), 3), ns))
            s = ns
        f.set_final(s, 0.0)
    py = pyfst.determinize_star(f)
    cc = nat.determinize_star(f)
    assert_equivalent(f, cc)
    assert_equivalent(py, cc)
    for arcs in cc.arcs:
        non_eps = [a.ilabel for a in arcs if a.ilabel != pyfst.EPS]
        assert len(non_eps) == len(set(non_eps))


@pytest.mark.parametrize("seed", range(6))
def test_native_minimize_matches_python(seed):
    rng = random.Random(200 + seed)
    f = random_acyclic_fst(rng, eps_prob=0.0)
    if f.num_states == 0:
        return
    d = pyfst.determinize_star(f)
    m_py = pyfst.minimize_encoded(d)
    m_cc = nat.minimize_encoded(d)
    assert m_cc.num_states == m_py.num_states
    assert_equivalent(m_py, m_cc)


def test_native_full_tlg_build():
    """The whole LG build through the native ops gives the same decode as
    the Python build."""
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.ctc_graph import build_tlg, compile_lang
    from eesen_tpu.decoder.fst import connect, compose, shortest_path, arcsort
    from tests.test_ctc_graph import ARPA, LEXICON, UNITS, frames_fst

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    lg_native = arcsort(
        nat.minimize_encoded(
            nat.determinize_star(nat.compose(lang.l_fst, g), "log")
        ),
        "ilabel",
    )
    tlg = build_tlg(lang.t_fst, lg_native)
    frames = ["a", "a", "<blk>", "b", "b", "<blk>", "b", "a"]
    f = frames_fst(lang.tokens, frames)
    c = connect(compose(f, tlg))
    assert c.num_states > 0
    _, ol, _ = shortest_path(c)
    assert [lang.words.sym(o) for o in ol] == ["ab", "ba"]


# ---------------------------------------------------------------------------
# native graph compilation (fstlib_compile_graph)
# ---------------------------------------------------------------------------

def _compiled_equal(a, b):
    import numpy as np
    assert a.num_states == b.num_states
    assert a.start == b.start
    assert a.max_emit_degree == b.max_emit_degree
    assert a.max_eps_degree == b.max_eps_degree
    assert a.eps_depth == b.eps_depth
    assert a.max_closure_degree == b.max_closure_degree
    for name in ("emit_offsets", "emit_ilabel", "emit_olabel", "emit_dst",
                 "eps_offsets", "eps_olabel", "eps_dst", "hub_src",
                 "hub_offsets"):
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )
    for name in ("emit_weight", "eps_weight", "final_weight"):
        np.testing.assert_allclose(
            getattr(a, name), getattr(b, name), err_msg=name,
            rtol=0, atol=0,
        )
    if a.hub_packed is not None or b.hub_packed is not None:
        np.testing.assert_array_equal(a.hub_packed, b.hub_packed)
    assert (a.closure_offsets is None) == (b.closure_offsets is None)
    if a.closure_offsets is not None:
        np.testing.assert_array_equal(a.closure_offsets, b.closure_offsets)
        np.testing.assert_array_equal(a.closure_packed, b.closure_packed)


@pytest.mark.parametrize("seed,max_degree,hub,closure", [
    (0, 4, 0, False), (1, 3, 0, True), (2, 4, 3, True),
    (3, 2, 0, True), (4, 8, 2, False), (5, 5, 4, True),
])
def test_native_compile_graph_matches_python(seed, max_degree, hub, closure):
    from eesen_tpu.decoder.graph_compile import compile_graph

    rng = random.Random(300 + seed)
    f = random_acyclic_fst(rng)
    if f.num_states == 0 or f.start is None:
        return
    py = compile_graph(f, max_degree=max_degree, hub_threshold=hub,
                       build_closure=closure, backend="python")
    cc = compile_graph(f, max_degree=max_degree, hub_threshold=hub,
                       build_closure=closure, backend="native")
    _compiled_equal(py, cc)


def test_native_compile_graph_tlg():
    """Native compilation of the real test TLG must be bit-identical to
    Python's (same decode tables)."""
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.ctc_graph import build_lg, build_tlg, compile_lang
    from eesen_tpu.decoder.graph_compile import compile_graph
    from tests.test_ctc_graph import ARPA, LEXICON, UNITS

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    tlg = build_tlg(lang.t_fst,
                    build_lg(lang.l_fst, arpa_to_fst(ARPA, lang.words)))
    py = compile_graph(tlg, max_degree=8, hub_threshold=4,
                       build_closure=True, backend="python")
    cc = compile_graph(tlg, max_degree=8, hub_threshold=4,
                       build_closure=True, backend="native")
    _compiled_equal(py, cc)


def test_fused_build_lg_matches_stepwise():
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.ctc_graph import build_tlg, compile_lang
    from eesen_tpu.decoder.fst import arcsort, connect, compose, shortest_path
    from tests.test_ctc_graph import ARPA, LEXICON, UNITS, frames_fst

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    fused = nat.build_lg_fused(lang.l_fst, g)
    assert fused is not None
    step = arcsort(
        nat.minimize_encoded(
            nat.determinize_star(nat.compose(lang.l_fst, g), "log")
        ),
        "ilabel",
    )
    assert fused.num_states == step.num_states
    assert fused.num_arcs == step.num_arcs
    # LG is cyclic (LM loops): verify by decoding through both TLGs
    frames = ["a", "a", "<blk>", "b", "b", "<blk>", "b", "a"]
    f = frames_fst(lang.tokens, frames)
    for lg in (fused, step):
        c = connect(compose(f, build_tlg(lang.t_fst, lg)))
        _, ol, w = shortest_path(c)
        assert [lang.words.sym(o) for o in ol] == ["ab", "ba"]


def test_build_tlg_compiled_matches_separate():
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.ctc_graph import (
        build_lg, build_tlg, build_tlg_compiled, compile_lang,
    )
    from eesen_tpu.decoder.graph_compile import compile_graph
    from tests.test_ctc_graph import ARPA, LEXICON, UNITS
    from tests.test_fst_native import _compiled_equal  # self-import ok

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    lg = build_lg(lang.l_fst, arpa_to_fst(ARPA, lang.words))
    fused = build_tlg_compiled(lang.t_fst, lg, max_degree=8,
                               hub_threshold=4, build_closure=True)
    sep = compile_graph(build_tlg(lang.t_fst, lg), max_degree=8,
                        hub_threshold=4, build_closure=True)
    _compiled_equal(fused, sep)


@pytest.mark.slow
def test_asan_property_suite():
    """Build csrc/fstlib_test.cpp with ASan+UBSan and run it — the
    native-code memory-safety gate (the reference's `make valgrind`,
    reference: src/Makefile:86-93).  Exercises every C-ABI entry point
    on randomized + adversarial FSTs, including the eps-cycle-with-
    output and empty-composition inputs that once crashed."""
    import os
    import subprocess
    import tempfile

    src = os.path.join(os.path.dirname(nat._SRC), "fstlib_test.cpp")
    with tempfile.TemporaryDirectory() as d:
        exe = os.path.join(d, "fstlib_test")
        try:
            subprocess.run(
                ["g++", "-g", "-O1", "-std=c++17",
                 "-fsanitize=address,undefined",
                 "-I", os.path.dirname(nat._SRC), src, "-o", exe],
                check=True, capture_output=True, timeout=300,
            )
        except (OSError, subprocess.CalledProcessError) as e:
            pytest.skip(f"sanitizer toolchain unavailable: {e}")
        r = subprocess.run(
            [exe], capture_output=True, text=True, timeout=300,
            env={**os.environ, "UBSAN_OPTIONS": "halt_on_error=1"},
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "all rounds passed" in r.stdout
