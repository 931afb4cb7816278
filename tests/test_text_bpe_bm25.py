"""BPE merge-loop and BM25 retrieval: pure-Python mirrors + plan gates.

The oracle-parity tests already pin both queries against DuckDB; these
tests pin them against an INDEPENDENT pure-Python implementation (the
reference algorithm written the naive way), plus hand-checkable toy
cases and physical-plan shape.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from etl_validator_github_spark.contract import load
from etl_validator_github_spark.plans.session import explain_str
from etl_validator_github_spark.scale.text import (
    BM25_B,
    BM25_K1,
    BM25_QUERIES,
    BM25_TOP_K,
    BPE_MERGES,
    bm25_topk,
    bpe_train,
    bpe_word_freqs,
)


# ---------------------------------------------------------------------------
# Pure-Python BPE (Sennrich 2016, naive tuple-based implementation —
# structurally nothing like the delimited-string Spark version).
# ---------------------------------------------------------------------------

def bpe_python(word_freqs: dict[str, int], n_merges: int):
    segs = {w: tuple(w) for w in word_freqs}
    log = []
    for it in range(1, n_merges + 1):
        pc: Counter = Counter()
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        # max count; ties break on the DELIMITED pair string ascending,
        # matching the engine-side ORDER BY pair ASC.
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], f"|{kv[0][0]}||{kv[0][1]}|")
        )
        merged = a + b
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = tuple(out)
        total = sum(f * len(segs[w]) for w, f in word_freqs.items())
        log.append((it, a, b, merged, cnt, total))
    return log, segs


def test_bpe_toy_known_merges(spark):
    """Sennrich's canonical example: es → est → lo."""
    rows = [("low " * 5).split() * 1, ("lower " * 2).split(),
            ("newest " * 6).split(), ("widest " * 3).split()]
    docs = spark.createDataFrame(
        [(i, " ".join(r)) for i, r in enumerate(rows)], "doc_id long, text string"
    )
    got = [tuple(r) for r in bpe_train(docs, 3).orderBy("iter").collect()]
    assert got == [
        (1, "e", "s", "es", 9, 70),
        (2, "es", "t", "est", 9, 61),
        (3, "l", "o", "lo", 7, 54),
    ]


def test_bpe_fixture_matches_python_mirror(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    freqs = {r["word"]: r["freq"] for r in bpe_word_freqs(docs).collect()}
    expected, _ = bpe_python(freqs, BPE_MERGES)
    got = [tuple(r) for r in bpe_train(docs).orderBy("iter").collect()]
    assert got == expected


def test_bpe_merge_is_greedy_left_to_right(spark):
    """'aaa' under merge (a,a) must segment as (aa, a), not (a, aa)."""
    docs = spark.createDataFrame([(0, "aaa aaa aa")], "doc_id long, text string")
    got = [tuple(r) for r in bpe_train(docs, 1).orderBy("iter").collect()]
    py_log, segs = bpe_python({"aaa": 2, "aa": 1}, 1)
    assert got == py_log
    # greedy non-overlapping: 'aaa' → (aa, a), never (a, aa); total
    # symbols = 2 words × 2 syms + 1 word × 1 sym = 5
    assert segs["aaa"] == ("aa", "a")
    assert got[0][5] == 5


def test_bpe_plan_has_no_cartesian_product(spark, sf_dir):
    p = explain_str(bpe_train(load(spark, sf_dir, "documents")))
    assert "CartesianProduct" not in p


def test_bpe_segment_matches_python_mirror(spark, sf_dir):
    """Applying the learned merges: per-doc piece counts equal the
    naive Python segmentation summed over each doc's tokens."""
    from etl_validator_github_spark.scale.text import bpe_segment_stats

    docs = load(spark, sf_dir, "documents")
    freqs = {r["word"]: r["freq"] for r in bpe_word_freqs(docs).collect()}
    _, segs = bpe_python(freqs, BPE_MERGES)
    exp = {}
    for r in docs.select("doc_id", "text").collect():
        toks = r["text"].split(" ")
        n_pieces = sum(len(segs[w]) for w in toks)
        exp[r["doc_id"]] = (len(toks), n_pieces,
                            (1000 * n_pieces) // len(toks))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_pieces"],
                      r["pieces_per_token_milli"])
        for r in bpe_segment_stats(docs).collect()
    }
    assert got == exp
    assert all(v[1] >= v[0] for v in got.values())  # pieces ≥ tokens
    # the merges actually compressed something vs character-level
    chars = {r["doc_id"]: sum(len(w) for w in r["text"].split(" "))
             for r in docs.select("doc_id", "text").collect()}
    assert any(got[d][1] < chars[d] for d in got)


# ---------------------------------------------------------------------------
# Pure-Python BM25 mirror (same formula, naive loops). Scores use the
# same op order; libm log may differ from the JVM's by 1 ulp, so scores
# compare within a 2-micro tolerance while the kept doc SET per query
# is compared exactly.
# ---------------------------------------------------------------------------

def bm25_python(docs_rows, queries=BM25_QUERIES, k=BM25_TOP_K):
    toks = {d: t.split(" ") for d, t in docs_rows}
    n_docs = len(toks)
    total_tokens = sum(len(t) for t in toks.values())
    avgdl = float(total_tokens) / n_docs
    out = {}
    for qid, qtext in queries:
        scores = {}
        nmatch = {}
        for term in qtext.split():
            df = sum(1 for t in toks.values() if term in t)
            if df == 0:
                continue
            idf = math.log(1.0 + (float(n_docs - df) + 0.5) / (float(df) + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if tf == 0:
                    continue
                dl = len(t)
                denom = float(tf) + BM25_K1 * (
                    (1.0 - BM25_B) + BM25_B * (float(dl) / avgdl)
                )
                contrib = idf * ((float(tf) * (BM25_K1 + 1.0)) / denom)
                scores[d] = scores.get(d, 0) + math.floor(contrib * 1e6 + 0.5)
                nmatch[d] = nmatch.get(d, 0) + 1
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, nmatch[d], s) for d, s in ranked]
    return out


def test_bm25_fixture_matches_python_mirror(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    expected = bm25_python(rows)
    got = bm25_topk(docs).orderBy("query_id", "rnk").collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(expected)
    for qid, exp in expected.items():
        rows_q = by_q[qid]
        assert [r["doc_id"] for r in rows_q] == [d for d, _, _ in exp]
        assert [r["n_terms"] for r in rows_q] == [n for _, n, _ in exp]
        for r, (_, _, s) in zip(rows_q, exp):
            assert abs(r["score_micro"] - s) <= 2, (qid, r, s)
        assert [r["rnk"] for r in rows_q] == list(range(1, len(exp) + 1))


def test_bm25_oov_query_term_is_harmless(spark, sf_dir):
    """Query 3 carries 'zzz' (not in the vocab): it must still return
    top-k rows scored from its in-vocab terms only."""
    got = bm25_topk(load(spark, sf_dir, "documents"))
    q3 = got.filter(F.col("query_id") == 3)
    assert q3.count() == BM25_TOP_K
    assert q3.agg(F.max("n_terms")).first()[0] <= 2  # fast, scan only


def test_bm25_plan_shape(spark, sf_dir):
    """One corpus shuffle (postings tf); query set, df and the 1-row
    stats fold all broadcast; no CartesianProduct; the only
    BNLJ is the documented 1-row stats broadcast fold."""
    p = explain_str(bm25_topk(load(spark, sf_dir, "documents")))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    # formatted explain names each operator twice (tree + details):
    # exactly ONE BNLJ instance — the 1-row stats broadcast fold.
    assert p.count("BroadcastNestedLoopJoin") <= 2


# ---------------------------------------------------------------------------
# Bigram LM quality scoring (CCNet-style) — pure-Python mirror with
# every branch (seen / backoff / OOV) non-vacuous on hand data. The
# fixture parity test covers seen+backoff; src0 spans the fixture's
# whole unigram vocab, so OOV only fires here.
# ---------------------------------------------------------------------------

def _bigram_python(rows):
    """rows: (doc_id, text, source) → {doc_id: (n, backoff, oov, nll)}."""
    from etl_validator_github_spark.scale.text import (
        BIGRAM_BACKOFF_BITS,
        BIGRAM_OOV_BITS,
        BIGRAM_REF_SOURCE,
    )

    fl2 = lambda x: len(bin(x)) - 3  # '0b1…' → floor(log2 x)
    uni, big = Counter(), Counter()
    for _, text, src in rows:
        if src != BIGRAM_REF_SOURCE:
            continue
        toks = text.split(" ")
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n_ref = sum(uni.values())
    exp = {}
    for did, text, _ in rows:
        toks = text.split(" ")
        if len(toks) < 2:
            continue
        n = backoff = oov = s = 0
        for w1, w2 in zip(toks, toks[1:]):
            n += 1
            if (w1, w2) in big:
                bits = fl2(big[(w1, w2)]) - fl2(uni[w1])
            elif w2 in uni:
                bits = fl2(uni[w2]) - fl2(n_ref) - BIGRAM_BACKOFF_BITS
                backoff += 1
            else:
                bits = -fl2(n_ref) - BIGRAM_OOV_BITS
                oov += 1
            s += -bits
        exp[did] = (n, backoff, oov, (1000 * s) // n)
    return exp


def test_bigram_lm_all_branches_match_python_mirror(spark):
    from etl_validator_github_spark.scale.text import bigram_lm_score

    rows = [
        (0, "a b a c", "src0"),      # the reference doc
        (1, "a b x y", "web"),       # seen + two OOV transitions
        (2, "c b", "web"),           # pure backoff (c b unseen, b known)
        (3, "a", "web"),             # single token: no transitions
    ]
    docs = spark.createDataFrame(
        rows, "doc_id: long, text: string, source: string")
    got = {
        r.doc_id: (r.n_transitions, r.n_backoff, r.n_oov, r.nll_bits_milli)
        for r in bigram_lm_score(docs).collect()
    }
    exp = _bigram_python(rows)
    assert got == exp
    assert 3 not in got                       # no-transition doc absent
    assert got[1][2] == 2 and got[2][1] == 1  # OOV and backoff both live


def test_bigram_lm_fixture_backoff_branch_is_nonvacuous(spark, sf_dir):
    """~20% of fixture transitions must take the backoff branch (src0
    covers 715/916 corpus bigrams) — guards the constant against a
    fixture or ref-slice change that would silently re-vacuate it."""
    from etl_validator_github_spark.scale.text import bigram_lm_score

    got = bigram_lm_score(load(spark, sf_dir, "documents")).agg(
        F.sum("n_backoff"), F.sum("n_transitions"), F.sum("n_oov")).first()
    assert got[0] > 0 and got[0] < got[1]
    assert got[2] == 0  # src0 spans the fixture vocab: OOV fires only
    #                     in the hand-data test above


def test_bigram_lm_plan_shape(spark, sf_dir):
    """Reference tables broadcast; the corpus token stream is never
    shuffled on a term key — the only exchange after the scans is the
    final doc_id hash-agg (plus the 1-row N fold's BNLJ)."""
    from etl_validator_github_spark.scale.text import bigram_lm_score

    p = explain_str(bigram_lm_score(load(spark, sf_dir, "documents")))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p
    assert p.count("BroadcastNestedLoopJoin") <= 2  # the 1-row N fold
