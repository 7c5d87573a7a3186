"""Property-based tests (hypothesis): the tokenizer against the pure-
Python regex oracle on arbitrary unicode, and asof_join against a
brute-force per-row oracle on random event sets.

Few examples, batched rows per example — each hypothesis example costs
a Spark job, so the budget goes to input diversity, not example count.
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import unicodedata

from mapreduce_faultolerrant_localityaware_spark.operators.temporal import asof_join
from mapreduce_faultolerrant_localityaware_spark.operators.wordcount import wordcount_from_text


def _py_tokens(text: str) -> list[str]:
    """EXACT reference semantics: runs of category-L* characters
    (Go unicode.IsLetter, core/map_reduce.go:543-546).  NOT the regex
    ``[^\\W\\d_]`` — Python's \\w over-matches No/Nl number-letters
    ('²', '𐳺') that Go and Java \\p{L} correctly reject."""
    out, cur = [], []
    for ch in text:
        if unicodedata.category(ch).startswith("L"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


# Alphabet bounded to Unicode-version-STABLE ranges.  Python 3.11
# carries Unicode 14 tables, Java 17 carries Unicode 13: any letter
# assigned between the two (e.g. U+0870 Arabic Ext-B, added in 14)
# is a letter to the oracle but unassigned (non-letter) to the JVM —
# table-version skew, not tokenizer logic.  These blocks have had
# stable Letter assignments for 20+ years.
_char_ranges = [
    (0x0020, 0x02FF),  # ASCII, Latin-1, Latin Ext-A/B, IPA
    (0x0370, 0x03FF),  # Greek
    (0x0400, 0x04FF),  # Cyrillic
    (0x0590, 0x05EA),  # Hebrew
    (0x0620, 0x064A),  # Arabic core letters
    (0x1E00, 0x1EFF),  # Latin Extended Additional
    (0x2000, 0x206F),  # general punctuation
    (0x4E00, 0x4FFF),  # CJK unified (subset)
]
_texts = st.lists(
    st.text(
        alphabet=st.one_of(*[st.characters(min_codepoint=lo, max_codepoint=hi) for lo, hi in _char_ranges]),
        max_size=60,
    ),
    min_size=1,
    max_size=15,
)

_slow = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@_slow
@given(texts=_texts)
def test_tokenizer_matches_python_oracle(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["value"])
    got = {r["word"]: r["count"] for r in wordcount_from_text(df, sort=False).collect()}
    want = Counter()
    for t in texts:
        want.update(_py_tokens(t))
    assert got == dict(want)


_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (key, minutes offset)
    min_size=1,
    max_size=25,
)


@_slow
@given(left=_events, right=_events)
def test_asof_join_matches_bruteforce(spark, left, right):
    base = datetime(2024, 1, 1)
    lrows = [(i, k, base + timedelta(minutes=m)) for i, (k, m) in enumerate(left)]
    rrows = [(k, base + timedelta(minutes=m), 1000 + i) for i, (k, m) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, ["id", "key", "ts"])
    rdf = spark.createDataFrame(rrows, ["key", "ts", "payload"])
    got = {
        r["id"]: r["payload"]
        for r in asof_join(ldf, rdf, on=["key"], payload=["payload"]).collect()
    }
    want = {}
    for lid, lk, lts in lrows:
        cands = [(rts, p) for rk, rts, p in rrows if rk == lk and rts <= lts]
        if cands:
            # greatest ts; ties → greatest payload (operator's documented tiebreak)
            want[lid] = max(cands)[1]
    assert got == want


# ---- pack_sequences invariants ----

@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
    st.integers(min_value=4, max_value=30),
    st.integers(min_value=1, max_value=4),
)
def test_pack_sequences_invariants(spark, token_counts, budget, n_streams):
    from mapreduce_faultolerrant_localityaware_spark.operators.corpus import pack_sequences

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, budget=budget, n_streams=n_streams).collect()

    # every doc assigned exactly once, token counts preserved
    assert sorted(r["doc_id"] for r in out) == list(range(len(token_counts)))
    assert {r["doc_id"]: r["n_tokens"] for r in out} == dict(enumerate(token_counts))

    # within a stream, pack ids are monotone in doc order and every
    # pack's PREFIX (tokens before its last doc) stays under budget —
    # the greedy contiguous-fill contract
    from collections import defaultdict

    by_stream = defaultdict(list)
    for r in sorted(out, key=lambda r: r["doc_id"]):
        by_stream[r["stream"]].append(r)
    for rows_s in by_stream.values():
        packs = [r["pack_id"] for r in rows_s]
        assert packs == sorted(packs)
        run = defaultdict(int)
        for r in rows_s:
            # cum-before determines the bin: bin*budget <= cum_before
            bin_ = r["pack_id"] % (2 ** 32)
            assert bin_ * budget <= run[r["stream"]] if r["n_tokens"] else True
            run[r["stream"]] += r["n_tokens"]


# ---- triangle_count vs brute force ----

@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_triangle_count_matches_bruteforce(spark, raw_edges):
    from itertools import combinations

    from mapreduce_faultolerrant_localityaware_spark.operators.graph import triangle_count

    edges = {(min(a, b), max(a, b)) for a, b in raw_edges}
    nodes = {n for e in edges for n in e}
    expected = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if {(a, b), (a, c), (b, c)} <= edges
    )
    df = spark.createDataFrame(sorted(edges), ["doc_a", "doc_b"])
    row = triangle_count(df).collect()[0]
    assert row["n_triangles"] == expected
    assert row["n_edges"] == len(edges) and row["n_nodes"] == len(nodes)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["alpha", "bravo", "charlie", "delta", "echo"]),
                 min_size=0, max_size=12),
        min_size=1, max_size=20,
    ),
    window=st.integers(min_value=2, max_value=4),
)
def test_substring_spans_vs_python_oracle(spark, docs, window):
    """substring_spans against a brute-force Python oracle on random
    small-vocab corpora (small vocab maximizes cross-doc collisions)."""
    from mapreduce_faultolerrant_localityaware_spark.operators.dedup import substring_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_windows"], r["dup_windows"])
           for r in substring_spans(df, window=window).collect()}

    wins = {i: [" ".join(toks[j:j + window]) for j in range(len(toks) - window + 1)]
            for i, toks in enumerate(docs)}
    docs_per_span = Counter()
    for i, ws in wins.items():
        for w in set(ws):
            docs_per_span[w] += 1
    expect = {}
    for i, ws in wins.items():
        if not ws:
            continue
        dup = sum(1 for w in ws if docs_per_span[w] >= 2)
        expect[i] = (len(ws), dup)
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
)
def test_split_assign_proportions_and_purity(spark, vals):
    """split_assign is a pure function of the key: any subset of keys
    gets exactly the assignments the full set gives (additivity), and
    every bucket is in [0, 100)."""
    from mapreduce_faultolerrant_localityaware_spark.operators.corpus import split_assign

    keys = sorted(set(vals))
    df = spark.createDataFrame([(k,) for k in keys], ["doc_id"])
    full = {r["doc_id"]: (r["bucket"], r["split"]) for r in split_assign(df).collect()}
    assert all(0 <= b < 100 for b, _ in full.values())
    half = keys[: max(1, len(keys) // 2)]
    sub = {r["doc_id"]: (r["bucket"], r["split"])
           for r in split_assign(spark.createDataFrame([(k,) for k in half], ["doc_id"])).collect()}
    assert all(full[k] == v for k, v in sub.items())


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["alpha", "bravo", "charlie", "delta", "echo"]),
                 min_size=0, max_size=12),
        min_size=1, max_size=18,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.7, 0.9]),
)
def test_simjoin_prefix_vs_bruteforce_property(spark, docs, threshold):
    """Prefix filtering + PPJoin positional filter must stay EXACT —
    identical pairs and jaccard values to the brute-force oracle — on
    random small-vocab corpora (small vocab maximizes shared shingles,
    including many docs with identical/near-identical shingle sets and
    heavy df ties that stress the canonical-order tiebreak)."""
    from mapreduce_faultolerrant_localityaware_spark.operators.dedup import (
        set_similarity_join_prefix,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    sets = {}
    for i, toks in enumerate(docs):
        sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        if sh:
            sets[i] = sh
    expect = {}
    ids = sorted(sets)
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            inter = len(sets[a] & sets[b])
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= threshold:
                expect[(a, b)] = j
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in set_similarity_join_prefix(df, threshold=threshold).collect()
    }
    assert got == expect


# ---- softdedup_weights vs a Counter reference ----

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_docs_small = st.lists(
    st.lists(_word, min_size=0, max_size=8), min_size=1, max_size=8
)


@_slow
@given(docs=_docs_small)
def test_softdedup_weights_matches_counter_reference(spark, docs):
    """weight = n_distinct_shingles / Σ df(shingle) exactly, for
    arbitrary small corpora at n=2 (rich shared-shingle structure)."""
    from mapreduce_faultolerrant_localityaware_spark.operators.corpus import (
        softdedup_weights,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in softdedup_weights(df, n=2).collect()}

    shingle_sets = {
        i: {tuple(ws[j : j + 2]) for j in range(len(ws) - 1)}
        for i, ws in enumerate(docs)
    }
    df_counts = Counter(sh for s in shingle_sets.values() for sh in s)
    for i, ws in enumerate(docs):
        s = shingle_sets[i]
        assert got[i]["n_shingles"] == len(s)
        if s:
            sum_df = sum(df_counts[sh] for sh in s)
            assert got[i]["avg_df"] == round(sum_df / len(s), 6)
            assert got[i]["weight"] == round(len(s) / sum_df, 6)
        else:
            assert got[i]["avg_df"] is None and got[i]["weight"] == 1.0


# ---- gopher_repetition vs a pure-Python reference ----

_line = st.sampled_from(
    ["same line here", "other text now", "third one", "x y", ""]
)
_line_docs = st.lists(
    st.lists(_line, min_size=0, max_size=8), min_size=1, max_size=6
)


@_slow
@given(docs=_line_docs)
def test_gopher_repetition_lines_match_python_reference(spark, docs):
    """dup_line_frac and dup_line_char_frac computed in Python over
    the same non-blank-line definition must match exactly."""
    from mapreduce_faultolerrant_localityaware_spark.operators.textstats import (
        gopher_repetition,
    )

    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    for i, ls in enumerate(docs):
        lines = [l for l in ls if l.strip() != ""]
        assert got[i]["n_lines"] == len(lines)
        if lines:
            assert got[i]["dup_line_frac"] == round(
                1 - len(set(lines)) / len(lines), 6
            )
            total = sum(len(l) for l in lines)
            extra = sum(
                (lines.count(d) - 1) * len(d) for d in set(lines)
            )
            if total > 0:
                assert got[i]["dup_line_char_frac"] == round(extra / total, 6)
        else:
            assert got[i]["dup_line_frac"] is None


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 5), st.floats(0.01, 400).map(lambda x: round(x, 2))),
        min_size=8,
        max_size=60,
    )
)
def test_markov_transitions_is_a_probability_kernel(spark, vals):
    """Random event streams: per cur_type the probabilities sum to ~1
    (exact ratio rounding), counts equal a python lead() reference."""
    from collections import Counter, defaultdict

    from mapreduce_faultolerrant_localityaware_spark.operators import events as events_ops

    rows = [
        (i, u % 3, f"t{u}", f"2024-01-01 00:{i % 60:02d}:{i // 60 % 60:02d}")
        for i, (u, _) in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts STRING"
    ).withColumn("ts", __import__("pyspark").sql.functions.col("ts").cast("timestamp"))
    got = {(r["cur_type"], r["next_type"]): r["n"]
           for r in events_ops.markov_transitions(df).collect()}
    by_user = defaultdict(list)
    for i, (u, _) in enumerate(vals):
        # same order key as the operator: (ts, event_id); ts is built
        # from i so plain i-order matches
        by_user[u % 3].append((i, f"t{u}"))
    expect = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            expect[(a, b)] += 1
    assert got == dict(expect)
    per_cur = defaultdict(float)
    for r in events_ops.markov_transitions(df).collect():
        per_cur[r["cur_type"]] += r["p"]
    assert all(abs(v - 1.0) < 1e-4 for v in per_cur.values())


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.text(alphabet="ab cd", min_size=1, max_size=40),
        min_size=4,
        max_size=24,
    )
)
def test_unigram_kl_nonnegative_on_random_corpora(spark, docs):
    """Gibbs' inequality holds for the full-support smoothed KL on any
    random corpus split into two sources (up to nano quantization)."""
    from mapreduce_faultolerrant_localityaware_spark.operators import corpus

    rows = [(i, "s0" if i % 2 == 0 else "s1", t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING, text STRING")
    out = corpus.unigram_kl(df).collect()
    for r in out:
        assert r["kl"] >= -1e-6, out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.lists(st.floats(-1, 1).map(lambda x: round(x, 3)), min_size=4, max_size=4),
        min_size=3,
        max_size=40,
    )
)
def test_embedding_covariance_symmetric_psd(spark, data):
    """Random small vector tables: the exact integer covariance is
    symmetric and positive semi-definite (up to quantization jitter),
    and matches numpy on the same quantized values."""
    import numpy as np

    from mapreduce_faultolerrant_localityaware_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(data)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = similarity.embedding_covariance(df, dim=4).collect()
    C = np.zeros((4, 4))
    for r in got:
        C[r["i"] - 1, r["j"] - 1] = C[r["j"] - 1, r["i"] - 1] = r["cov"]
    # float32 storage then milli rounding — mirror through float32!
    X32 = np.array(data, dtype=np.float32).astype(np.float64) * 1e3
    Xq = np.sign(X32) * np.floor(np.abs(X32) + 0.5)
    n = len(Xq)
    S = Xq.sum(axis=0)
    G = Xq.T @ Xq
    ref = (G - np.outer(S, S) / n) / n / 1e6
    assert np.allclose(C, np.round(ref, 6), atol=2e-6)
    evals = np.linalg.eigvalsh(C)
    assert evals.min() > -1e-6
