"""Property-based parity: the C4/Gopher Column projections must agree with
straightforward per-document Python reference implementations on arbitrary
line/word-structured inputs (hypothesis-generated)."""

from __future__ import annotations

import re

WORDS = [
    "the", "and", "of", "to", "be", "that", "have", "with",  # gopher-required
    "alpha", "beta", "gamma", "scan", "x1", "#", "...", "-", "a", "zz",
    "sentence.", "end!", "ok?", "trail...", "item…",
]


def _py_c4(text: str, min_words: int = 5, min_sent: int = 3):
    lines = text.split("\n")
    kept = [
        ln.strip()
        for ln in lines
        if re.search(r'[.!?"]\s*$', ln.strip())
        and (0 if not ln.strip() else len(re.split(r"\s+", ln.strip()))) >= min_words
    ]
    kept_text = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", kept_text))
    keep = n_sent >= min_sent and "lorem ipsum" not in text.lower() and "{" not in text
    return kept_text, len(lines), len(kept), n_sent, keep


def _py_gopher(text: str):
    stripped = text.strip()
    words = re.split(r"\s+", stripped) if stripped else []
    n_words = len(words)
    nw = max(n_words, 1)
    mean_wlen = sum(len(w) for w in words) / nw
    n_hash = text.count("#")
    t_nouni = text.replace("…", "")
    t_noell = re.sub(r"\.\.\.", "", text).replace("…", "")
    n_ell = (len(t_nouni) - len(t_noell)) // 3 + (len(text) - len(t_nouni))
    symbol_ratio = (n_hash + n_ell) / nw
    lines = text.split("\n")
    nl = max(len(lines), 1)
    bullet_frac = sum(bool(re.match(r"^[-*•]", ln.strip())) for ln in lines) / nl
    ellipsis_frac = sum(bool(re.search(r"(\.\.\.|…)$", ln.strip())) for ln in lines) / nl
    alpha_frac = sum(bool(re.search(r"[A-Za-z]", w)) for w in words) / nw
    lower_words = {re.sub(r"[^A-Za-z]", "", w).lower() for w in words}
    stop_hits = sum(
        1 for s in ["the", "be", "to", "of", "and", "that", "have", "with"] if s in lower_words
    )
    keep = (
        50 <= n_words <= 100_000
        and 3.0 <= mean_wlen <= 10.0
        and symbol_ratio <= 0.1
        and bullet_frac <= 0.9
        and ellipsis_frac <= 0.3
        and alpha_frac >= 0.8
        and stop_hits >= 2
    )
    return n_words, round(mean_wlen, 6), round(symbol_ratio, 6), round(bullet_frac, 6), \
        round(ellipsis_frac, 6), round(alpha_frac, 6), stop_hits, keep


def _doc_strategy():
    from hypothesis import strategies as st

    line = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join)
    return st.lists(line, min_size=1, max_size=6).map("\n".join)


def test_c4_matches_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jsonschema_spark.operators.heuristics import c4_line_filter

    @settings(max_examples=8, deadline=None)
    @given(docs=st.lists(_doc_strategy(), min_size=1, max_size=8))
    def check(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "id bigint, text string")
        got = {r["id"]: r for r in c4_line_filter(df, "id", "text").collect()}
        for i, text in enumerate(docs):
            kept_text, n_lines, n_kept, n_sent, keep = _py_c4(text)
            r = got[i]
            assert (
                r["text"], r["n_lines"], r["n_lines_kept"], r["n_sentences"], r["keep"]
            ) == (kept_text, n_lines, n_kept, n_sent, keep), f"doc {i}: {text!r}"

    check()


def test_gopher_matches_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from jsonschema_spark.operators.heuristics import gopher_quality

    @settings(max_examples=8, deadline=None)
    @given(docs=st.lists(_doc_strategy(), min_size=1, max_size=8))
    def check(docs):
        df = spark.createDataFrame(list(enumerate(docs)), "id bigint, text string")
        got = {r["id"]: r for r in gopher_quality(df, "id", "text").collect()}
        for i, text in enumerate(docs):
            exp = _py_gopher(text)
            r = got[i]
            act = (r["n_words"], r["mean_word_len"], r["symbol_ratio"], r["bullet_frac"],
                   r["ellipsis_frac"], r["alpha_frac"], r["stop_hits"], r["keep"])
            for a, e in zip(act, exp):
                if isinstance(e, float):
                    assert abs(a - e) < 1e-9, f"doc {i}: {act} != {exp} :: {text!r}"
                else:
                    assert a == e, f"doc {i}: {act} != {exp} :: {text!r}"

    check()
