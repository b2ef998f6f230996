"""Property-based aggregation parity (hypothesis): for random inputs,
every terminal aggregation must equal the plain-Python fold the
reference computes (aggregate/aggregate.go:29-508 semantics, SQL NULL
mode). Upgrades the reference's hand-picked goldens (SURVEY §5)."""

import math
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pippin_spark import Pipeline
from pyspark.sql import types as T

LONG = T.LongType()

ints = st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=0, max_size=30)
nonempty_ints = st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=30)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(xs=nonempty_ints)
@settings(**SETTINGS)
def test_sum_min_max_count(spark, xs):
    s = Pipeline.from_slice(spark, xs)
    assert s.sum() == sum(xs)
    s = Pipeline.from_slice(spark, xs)
    assert s.min() == min(xs)
    s = Pipeline.from_slice(spark, xs)
    assert s.max() == max(xs)
    s = Pipeline.from_slice(spark, xs)
    assert s.count() == len(xs)


@given(xs=nonempty_ints)
@settings(**SETTINGS)
def test_avg(spark, xs):
    got = Pipeline.from_slice(spark, xs).avg()
    assert math.isclose(got, sum(xs) / len(xs), rel_tol=1e-9)


@given(xs=ints)
@settings(**SETTINGS)
def test_sort_and_distinct(spark, xs):
    assert Pipeline.from_slice(spark, xs, schema=LONG).sort() == sorted(xs)
    assert Pipeline.from_slice(spark, xs, schema=LONG).sort_desc() == sorted(xs, reverse=True)
    assert sorted(Pipeline.from_slice(spark, xs, schema=LONG).distinct()) == sorted(set(xs))
    assert Pipeline.from_slice(spark, xs, schema=LONG).distinct_count() == len(set(xs))


@given(xs=ints)
@settings(**SETTINGS)
def test_group_by_parity(spark, xs):
    got = (
        Pipeline.from_slice(spark, xs, schema=LONG)
        .group_by(lambda c: c % 3 == 0)
        .to_dict()
    )
    want = defaultdict(list)
    for x in xs:
        want[x % 3 == 0].append(x)
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()
    }


@given(xs=nonempty_ints)
@settings(**SETTINGS)
def test_reduce_associative_commutative(spark, xs):
    # Reduce contract: fn must be associative+commutative (SURVEY §1.4)
    got = Pipeline.from_slice(spark, xs).reduce(lambda a, b: a + b)
    assert got == sum(xs)


@given(xs=ints)
@settings(**SETTINGS)
def test_pipeline_composition(spark, xs):
    # transforms compose exactly like the Python fold
    got = (
        Pipeline.from_slice(spark, xs, schema=LONG)
        .filter(lambda c: c % 2 == 0)
        .map(lambda c: c * 3)
        .sum()
    )
    want = sum(x * 3 for x in xs if x % 2 == 0)
    if [x for x in xs if x % 2 == 0]:
        assert got == want
    else:
        assert got is None  # SQL semantics: empty sum is NULL


@given(ids=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50, unique=True),
       salt=st.integers(min_value=0, max_value=1000))
@settings(**SETTINGS)
def test_hash_bucket_engine_portable(spark, ids, salt):
    # the sampling hash must produce IDENTICAL buckets in Spark, DuckDB
    # (the oracle engine), and plain Python — that's what makes sample
    # membership stable across engines/runs/partitionings
    import duckdb

    from pippin_spark.operators.sampling import (
        hash_bucket, hash_bucket_sql, _KNUTH, _M31, _M32,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got_spark = {
        r["id"]: r["b"]
        for r in df.select("id", hash_bucket(F.col("id"), salt).alias("b")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    got_duck = dict(
        con.sql(f"SELECT id, {hash_bucket_sql('id', salt)} FROM t").fetchall()
    )
    got_py = {i: (((i + salt) % _M31) * _KNUTH) % _M32 for i in ids}
    assert got_spark == got_py
    assert got_duck == got_py


@given(
    xs=st.lists(
        st.sampled_from([f"v{i}" for i in range(12)]), min_size=1, max_size=60
    ),
    k=st.integers(min_value=2, max_value=8),
    parts=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_heavy_hitters_property(spark, xs, k, parts):
    # for ANY multiset, partition count, and k: the output is exactly
    # the items with count*k > n, with exact counts — the MG sketch's
    # partitioning-dependence must never leak into the result
    from collections import Counter

    from pippin_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([(x,) for x in xs], "item string").repartition(parts)
    got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "item", k=k).collect()}
    n = len(xs)
    expect = {v: c for v, c in Counter(xs).items() if c * k > n}
    assert got == expect


@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
                   min_size=1, max_size=20),
    rights=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000),
                              st.integers(-100, 100)),
                    min_size=0, max_size=20),
    tol=st.integers(min_value=0, max_value=500),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_tolerance_property(spark, lefts, rights, tol):
    # as-of with tolerance == plain-Python scan: latest right at-or-
    # before, nulled when staler than tol. Right-side ties broken by
    # taking the LAST in (ts, value) sort order (matches the window's
    # deterministic tie-break on the carried value ordering).
    from pippin_spark.operators.relational import asof_join

    lefts = [(k, t, i) for i, (k, t) in enumerate(lefts)]
    ldf = spark.createDataFrame(lefts, "k long, t long, lid long")
    # one right row per (k, t): with equal timestamps the window's
    # order among right rows is undefined, so the spec would be
    # nondeterministic too — dedup keeps the max-v row
    best = {}
    for rk, rt, rv in rights:
        best[(rk, rt)] = max(rv, best.get((rk, rt), rv))
    rights = sorted((rk, rt, rv) for (rk, rt), rv in best.items())
    rdf = spark.createDataFrame(rights, "k long, t long, v long") if rights else (
        spark.createDataFrame([], "k long, t long, v long")
    )
    out = asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                    right_cols=["v"], tolerance=tol)
    got = {r["lid"]: r["v"] for r in out.collect()}
    for k, t, lid in lefts:
        cands = [(rt, rv) for rk, rt, rv in rights if rk == k and rt <= t]
        if not cands:
            assert got[lid] is None, (lid, got[lid])
            continue
        rt, rv = max(cands)
        assert got[lid] == (rv if t - rt <= tol else None), (lid, got[lid])


# ---------------------------------------------------------------------------
# round-3 continuation ops vs plain-Python references
# ---------------------------------------------------------------------------

corpora = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=6
)


@given(texts=corpora)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_merge_table_property(spark, texts):
    # tiny alphabet forces heavy pair ties and overlap runs — the
    # worst case for greedy-merge and argmax tie-break parity
    from collections import Counter

    from pippin_spark.operators import bpe as B
    from tests.test_llm_ops import _ref_bpe

    wc = Counter(w for t in texts for w in t.lower().split())
    if not wc:
        return
    rounds = 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["step"], r["w1"], r["w2"], r["merged"], r["pair_count"])
        for r in B.bpe_train_merges(docs, rounds=rounds).orderBy("step").collect()
    ]
    try:
        exp, _ = _ref_bpe(wc, rounds)
    except ValueError:  # max() on empty pair set: corpus ran out of pairs
        return
    assert got == exp


@given(texts=st.lists(st.text(alphabet="abcd", min_size=0, max_size=60),
                      min_size=1, max_size=5))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_winnowing_property(spark, texts):
    import hashlib

    from pippin_spark.operators import dedup as D

    k, w = 3, 4

    def ref(text):
        if len(text) < k + w - 1:
            return set()
        hs = [
            int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:8], 16)
            for i in range(len(text) - k + 1)
        ]
        sel = set()
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            mn = min(win)
            pos = j + max(i for i, h in enumerate(win) if h == mn)
            sel.add((pos + 1, hs[pos]))
        return sel

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {}
    for r in D.winnow_fingerprints(docs, "text", "doc_id", k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == ref(t), (i, t)


@given(strs=st.lists(st.text(alphabet="abxy", min_size=0, max_size=10),
                     min_size=2, max_size=12))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_qgram_edit_join_complete_vs_bruteforce(spark, strs):
    # completeness of the prefix filter is the whole game: every pair
    # within max_dist MUST survive candidate generation
    from pippin_spark.operators import relational as R

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {
        (r["s_a"], r["s_b"], r["dist"])
        for r in R.qgram_edit_join(df, "s", max_dist=2, q=3).collect()
    }
    ds = sorted(set(strs))
    exp = {
        (a, b, lev(a, b))
        for i, a in enumerate(ds)
        for b in ds[i + 1:]
        if lev(a, b) <= 2
    }
    assert got == exp


@given(docs=st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=8),
    min_size=2, max_size=10))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_set_similarity_join_complete_vs_bruteforce(spark, docs):
    from pippin_spark.operators import dedup as DD

    rows = [(i, list(set(s))) for i, s in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, sh array<string>")
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.set_similarity_join(df, "id", "sh", 1, 2).collect()
    }
    exp = set()
    for i, a in rows:
        for j, b in rows:
            if i >= j or not a or not b:
                continue
            inter = len(set(a) & set(b))
            union = len(set(a) | set(b))
            if 2 * inter >= union:
                exp.add((i, j))
    assert got == exp


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=1,
            max_size=17,
        ),
        min_size=1,
        max_size=6,
    ),
    block=st.integers(min_value=1, max_value=4),
    mask_pct=st.sampled_from([0, 15, 50, 100]),
)
@settings(**SETTINGS)
def test_span_corrupt_roundtrip(spark, docs, block, mask_pct):
    # invariant: splicing each target span back over its sentinel in
    # the input reproduces the original token sequence exactly — for
    # any block length, mask rate, and partial final block
    from pippin_spark.operators.text import span_corrupt

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in span_corrupt(df, "text", "doc_id", block=block, mask_pct=mask_pct).collect()
    }
    for i, words in enumerate(docs):
        r = out[i]
        # parse target into span lists keyed by sentinel index
        spans: dict = {}
        cur = None
        for tok in r["target_text"].split():
            if tok.startswith("<extra_id_"):
                cur = int(tok[len("<extra_id_"):-1])
                spans[cur] = []
            else:
                spans[cur].append(tok)
        rebuilt = []
        for tok in r["input_text"].split():
            if tok.startswith("<extra_id_"):
                rebuilt.extend(spans[int(tok[len("<extra_id_"):-1])])
            else:
                rebuilt.append(tok)
        assert rebuilt == words
        assert r["n_masked"] == sum(len(v) for v in spans.values())


# --- span scrub vs pure-Python reference ----------------------------------

_scrub_docs = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=120),
    min_size=2,
    max_size=6,
)


@given(texts=_scrub_docs)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_span_scrub_matches_python_reference(spark, texts):
    # tiny alphabet + overlapping lengths force frequent cross-doc
    # duplicated windows; small window/stride exercise merge paths
    from pippin_spark.operators import dedup as D
    from tests.test_llm_ops import _py_span_scrub

    docs = list(enumerate(texts))
    ref = _py_span_scrub(docs, W=8, S=4)
    got = {
        r["doc_id"]: (r["text"], r["n_removed_chars"])
        for r in D.dedup_span_scrub(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            "text",
            "doc_id",
            window_chars=8,
            stride=4,
        ).collect()
    }
    assert got == ref


@given(
    ns=st.lists(st.integers(min_value=1, max_value=10**12), min_size=1, max_size=12)
)
@settings(**SETTINGS)
def test_sqrt_temperature_weights_property(spark, ns):
    """For arbitrary domain sizes: weights match the pure-Python
    isqrt computation exactly, sum to <= 1e6 with deficit < #domains,
    and are monotone in n (a bigger domain never gets a smaller
    weight)."""
    import math

    from pippin_spark.operators import sampling as SMP
    from pyspark.sql import functions as F

    # one synthetic domain per n with exactly that many rows is too
    # big to materialize for n up to 1e12 — aggregate-level check
    # instead: feed the counts through the same isqrt+div arithmetic
    # via exact_isqrt on a counts table
    df = spark.createDataFrame([(i, n) for i, n in enumerate(ns)], "dom long, n long")
    tot = sum(math.isqrt(n) for n in ns)
    got = {
        r["dom"]: (r["s"], r["w"])
        for r in df.select(
            "dom",
            SMP.exact_isqrt(F.col("n")).alias("s"),
            F.expr(f"{0} + 0").alias("_z"),
        )
        .withColumn("w", F.expr(f"s * 1000000 div {tot}"))
        .collect()
    }
    for i, n in enumerate(ns):
        s = math.isqrt(n)
        assert got[i] == (s, s * 1_000_000 // tot)
    wsum = sum(w for _, w in got.values())
    assert 1_000_000 - len(ns) <= wsum <= 1_000_000
    for i, a in enumerate(ns):
        for j, b in enumerate(ns):
            if a >= b:
                assert got[i][1] >= got[j][1]


@given(
    docs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6), st.text(max_size=40)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    parts=st.integers(min_value=1, max_value=7),
)
@settings(**SETTINGS)
def test_corpus_manifest_property(spark, docs, parts):
    """Random corpora: the manifest is invariant under repartitioning
    and row order, counts partition the corpus, and id ranges bound
    every bucket's members."""
    from pippin_spark.operators import text as X

    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = sorted(
        tuple(r) for r in X.corpus_manifest(df, "text", "doc_id", 4).collect()
    )
    again = sorted(
        tuple(r)
        for r in X.corpus_manifest(df.repartition(parts), "text", "doc_id", 4).collect()
    )
    assert base == again
    assert sum(r[1] for r in base) == len(docs)
    for b, n, _, lo, hi in base:
        members = [d for d, _ in docs if d % 4 == b]
        assert (n, lo, hi) == (len(members), min(members), max(members))


@given(texts=st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                      min_size=1, max_size=4))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_wordpiece_merge_table_property(spark, texts):
    # same adversarial regime as the BPE property (tiny alphabet →
    # heavy ties and overlap runs), but the likelihood-gain argmax
    # additionally exercises the integer score floor-division ties
    from collections import Counter

    from pippin_spark.operators import bpe as B
    from tests.test_llm_ops import _ref_wordpiece

    wc = Counter(w for t in texts for w in t.lower().split())
    if not wc:
        return
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["step"], r["w1"], r["w2"], r["merged"], r["pair_count"],
         r["score"])
        for r in B.wordpiece_train_merges(docs, rounds=3)
        .orderBy("step")
        .collect()
    ]
    exp, _ = _ref_wordpiece(wc, 3)
    assert got == exp
