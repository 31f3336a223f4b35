"""Minimal n-gram LM estimation -> ARPA text.

The reference recipes shell out to external toolkits for LM training and
only consume the resulting ARPA file (e.g. asr_egs/wsj/run_ctc_phn.sh uses
the pre-built pruned trigram; swbd/local trains with srilm).  For
self-contained pipeline runs (and tests) this module provides an
absolute-discount interpolated bigram estimator producing a normalized
ARPA model that decoder/arpa.py can compile directly.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Tuple

import math

BOS, EOS = "<s>", "</s>"


def estimate_bigram_arpa(
    sentences: Iterable[List[str]],
    discount: float = 0.5,
    vocab: List[str] | None = None,
) -> str:
    """Absolute-discounting interpolated bigram, Katz-style backoff weights.

    Every word in `vocab` (default: observed words) gets a unigram entry;
    probabilities are properly normalized so arpa_to_fst produces a
    stochastic G."""
    uni = Counter()
    bi = Counter()
    nsent = 0
    for sent in sentences:
        nsent += 1
        prev = BOS
        for w in sent:
            uni[w] += 1
            bi[(prev, w)] += 1
            prev = w
        uni[EOS] += 1
        bi[(prev, EOS)] += 1

    words = sorted(set(vocab or []) | set(uni))
    if EOS in words:
        words.remove(EOS)

    total = sum(uni.values())
    v = len(words) + 1  # + </s>
    # unigram probs with add-smoothing for unseen vocab entries
    p_uni: Dict[str, float] = {}
    for w in words + [EOS]:
        p_uni[w] = (uni.get(w, 0) + 0.5) / (total + 0.5 * v)

    # bigram contexts: BOS and every seen word
    ctx_count = Counter()
    for (a, _), c in bi.items():
        ctx_count[a] += c

    lines = ["\\data\\", f"ngram 1={len(words) + 2}", f"ngram 2={len(bi)}",
             "", "\\1-grams:"]

    def bow(ctx: str) -> float:
        """Backoff weight: mass discounted from seen bigrams, normalized by
        the unigram mass of unseen continuations."""
        n = ctx_count.get(ctx, 0)
        if n == 0:
            return 1.0
        seen = [w for (a, w) in bi if a == ctx]
        reserved = discount * len(seen) / n
        denom = 1.0 - sum(p_uni[w] for w in seen)
        if denom <= 1e-10:
            return 1e-10
        return reserved / denom

    bi_by_ctx: Dict[str, List[Tuple[str, int]]] = {}
    for (a, w), c in bi.items():
        bi_by_ctx.setdefault(a, []).append((w, c))

    def log10(x: float) -> float:
        return math.log10(max(x, 1e-99))

    lines.append(f"-99\t{BOS}\t{log10(bow(BOS)):.6f}")
    lines.append(f"{log10(p_uni[EOS]):.6f}\t{EOS}")
    for w in words:
        b = bow(w)
        lines.append(f"{log10(p_uni[w]):.6f}\t{w}\t{log10(b):.6f}")

    lines += ["", "\\2-grams:"]
    for a in sorted(bi_by_ctx):
        n = ctx_count[a]
        for w, c in sorted(bi_by_ctx[a]):
            p = (c - discount) / n
            lines.append(f"{log10(p):.6f}\t{a}\t{w}")
    lines += ["", "\\end\\", ""]
    return "\n".join(lines)
