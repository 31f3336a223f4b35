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
