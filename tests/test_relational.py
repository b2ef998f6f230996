"""Relational extension operators (SURVEY §2.5 gap fills)."""

import pytest
from pyspark.sql import functions as F

from pippin_spark.operators import relational as R


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 25, 2), ("B", 5, 3), ("A", 4, 4)],
        ["sym", "ts", "trade_id"],
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 20, 101.0), ("B", 1, 50.0), ("B", 9, 51.0)],
        ["sym", "ts", "px"],
    )
    out = R.asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts")
    got = {(r["sym"], r["ts"]): r["px"] for r in out.collect()}
    assert got == {("A", 10): 100.0, ("A", 25): 101.0, ("B", 5): 50.0, ("A", 4): None}


def test_asof_join_equal_ts_matches(spark):
    left = spark.createDataFrame([("A", 10, 1)], ["k", "ts", "lid"])
    right = spark.createDataFrame([("A", 10, 7.0)], ["k", "ts", "v"])
    out = R.asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    assert out.collect()[0]["v"] == 7.0  # at-or-before includes equal ts


def test_range_join(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 42.0)], ["pid", "p"])
    ivals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 12.0, 20.0), (30, 0.0, 100.0)], ["iid", "lo", "hi"]
    )
    out = R.range_join(
        points, ivals, F.col("p"), F.col("lo"), F.col("hi"), bucket_width=8.0
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 10), (1, 30), (2, 20), (2, 30), (3, 30)]


def test_top_k_global_and_grouped(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 5), ("a", 3), ("b", 9), ("b", 2)], ["g", "v"]
    )
    top = R.top_k(df, 1, [F.col("v").desc(), F.col("g")])
    assert [(r["g"], r["v"]) for r in top.collect()] == [("b", 9)]
    per = R.top_k(df, 1, [F.col("v").desc()], partition_by=[F.col("g")])
    assert sorted((r["g"], r["v"]) for r in per.collect()) == [("a", 5), ("b", 9)]


def test_sessionize(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (1, 10.0), (1, 100.0), (2, 0.0)], ["uid", "t"]
    )
    out = R.sessionize(df, "uid", F.col("t"), gap=30.0)
    got = {(r["uid"], r["t"]): r["session_seq"] for r in out.collect()}
    assert got == {(1, 0.0): 1, (1, 10.0): 1, (1, 100.0): 2, (2, 0.0): 1}


def test_rollup_cube(spark):
    df = spark.createDataFrame([("x", "p", 1), ("x", "q", 2), ("y", "p", 4)], ["a", "b", "v"])
    roll = R.rollup_agg(df, ["a", "b"], F.sum("v").alias("s"))
    rows = {(r["a"], r["b"], r["grouping_id"]): r["s"] for r in roll.collect()}
    assert rows[(None, None, 3)] == 7  # grand total
    assert rows[("x", None, 1)] == 3
    cube = R.cube_agg(df, ["a", "b"], F.sum("v").alias("s"))
    crows = {(r["a"], r["b"], r["grouping_id"]): r["s"] for r in cube.collect()}
    assert crows[(None, "p", 2)] == 5  # cube-only slice


def test_time_bucket(spark):
    df = spark.createDataFrame([(0,), (59,), (60,), (3600,)], ["t"])
    out = df.select(R.time_bucket(F.col("t"), 60).alias("b"))
    assert [r["b"] for r in out.collect()] == [0, 0, 60, 3600]


def test_salted_join_matches_plain_join(spark):
    from pippin_spark.operators.relational import salted_join
    from pyspark.sql import functions as F

    # one pathologically hot key (80% of left rows)
    left = spark.createDataFrame(
        [(1, i) for i in range(80)] + [(k, k * 100) for k in range(2, 22)],
        ["k", "lv"],
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(1, 22)], ["k", "rv"])
    plain = sorted(tuple(r) for r in left.join(right, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(left, right, "k", salt=4).collect())
    assert salted == plain

    left_plain = sorted(tuple(r) for r in left.join(right, "k", "left").collect())
    left_salted = sorted(
        tuple(r) for r in salted_join(left, right, "k", how="left", salt=4).collect()
    )
    assert left_salted == left_plain

    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="full")


def test_sliding_time_buckets(spark):
    from pippin_spark.operators.relational import sliding_time_buckets
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3700,), (1800,), (0,)], ["ts"])
    out = {
        r["ts"]: r["ws"]
        for r in df.select(
            "ts", sliding_time_buckets(F.col("ts"), 3600, 1800).alias("ws")
        ).collect()
    }
    assert out[3700] == [1800, 3600]  # covered by windows starting 1800 and 3600
    assert out[1800] == [0, 1800]
    assert out[0] == [-1800, 0]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        sliding_time_buckets(F.col("ts"), 3600, 1000)


def test_vector_normalize_and_quantize(spark):
    from pippin_spark.operators.similarity import normalize_vectors, quantize_int8
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 1.0])], ["id", "v"]
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            normalize_vectors(F.col("v")).alias("nv"),
            quantize_int8(F.col("v")).alias("qv"),
        ).collect()
    }
    assert rows[1]["nv"] == [0.6, 0.8]
    assert rows[2]["nv"] == [0.0, 0.0]  # zero vector passes through
    assert rows[1]["qv"] == [95, 127]  # 3·127/4 = 95.25 → 95
    assert rows[2]["qv"] == [0, 0]
    assert rows[3]["qv"] == [-127, 127]


def test_grouping_sets_agg(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)], ["g1", "g2", "v"]
    )
    out = R.grouping_sets_agg(
        df, [["g1"], ["g2"], []], ["g1", "g2"], F.sum("v").alias("s")
    )
    got = {(r["g1"], r["g2"], r["grouping_id"]): r["s"] for r in out.collect()}
    assert got == {
        ("a", None, 1): 3,
        ("b", None, 1): 4,
        (None, "x", 2): 5,
        (None, "y", 2): 2,
        (None, None, 3): 7,
    }


def test_pivot_agg_explicit_values(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)], ["g", "p", "v"]
    )
    out = R.pivot_agg(df, ["g"], "p", ["x", "y", "z"], F.sum("v"))
    assert out.columns == ["g", "x", "y", "z"]
    got = {r["g"]: (r["x"], r["y"], r["z"]) for r in out.collect()}
    assert got == {"a": (1, 2, None), "b": (4, None, None)}


def test_range_frame_agg_trailing_window(spark):
    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 5, 2.0), (1, 20, 4.0), (2, 0, 8.0)], ["k", "t", "v"]
    )
    out = R.range_frame_agg(
        df, ["k"], F.col("t"), (-10, 0), (F.sum("v"), "s"), (F.count("*"), "n")
    )
    got = {(r["k"], r["t"]): (r["s"], r["n"]) for r in out.collect()}
    assert got == {
        (1, 0): (1.0, 1),
        (1, 5): (3.0, 2),
        (1, 20): (4.0, 1),
        (2, 0): (8.0, 1),
    }


def test_apply_changes_merge_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    ch = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (4, "d", "upsert")],
        ["k", "v", "op"],
    )
    out = {r["k"]: r["v"] for r in R.apply_changes(snap, ch, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


def test_histogram_buckets(spark):
    df = spark.createDataFrame([(0.5,), (1.5,), (1.7,), (9.9,)], ["x"])
    out = {r["bucket"]: r["n"] for r in R.histogram(df, F.col("x"), 1.0).collect()}
    assert out == {0: 1, 1: 2, 9: 1}


def _hot_key_events(spark, n_hot=4000, n_cold=50):
    # one celebrity key holding ~99% of rows + a few cold keys; ts
    # values interleave purchases (left) and views (right)
    rows = []
    for i in range(n_hot):
        rows.append((1, i * 10, "L" if i % 3 == 0 else "R", float(i)))
    for i in range(n_cold):
        rows.append((2 + (i % 5), 5 + i * 70, "L" if i % 2 == 0 else "R", float(i)))
    return spark.createDataFrame(rows, "k long, t long, side string, v double")


def test_asof_join_bucketed_matches_unbucketed_hot_key(spark):
    # the skew-safe twin must agree row-for-row with the windowed as-of
    # join on a corpus dominated by one hot key, across bucket widths
    # (including widths that leave many empty buckets between rows)
    ev = _hot_key_events(spark)
    left = ev.filter(F.col("side") == "L").select("k", "t")
    right = ev.filter(F.col("side") == "R").select("k", "t", "v")
    base = R.asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols=["v"]).collect()
    for width in (7, 100, 10_000):
        got = R.asof_join_bucketed(
            left, right, on="k", left_ts="t", right_ts="t",
            right_cols=["v"], bucket_width=width,
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, base)), width


def test_sessionize_bucketed_matches_unbucketed_hot_key(spark):
    ev = _hot_key_events(spark).withColumn("rid", F.monotonically_increasing_id())
    base = (
        R.sessionize(ev, "k", F.col("t"), gap=25, tie_break=[F.col("rid")])
        .select("k", "t", "rid", "session_seq")
        .collect()
    )
    for width in (7, 100, 10_000):
        got = (
            R.sessionize_bucketed(
                ev, "k", F.col("t"), gap=25, bucket_width=width,
                tie_break=[F.col("rid")],
            )
            .select("k", "t", "rid", "session_seq")
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, base)), width


def test_asof_join_bucketed_equal_ts_right_tie_deterministic(spark):
    # two right rows at the SAME ts with a tie column: the within-bucket
    # carry and the cross-bucket finals must resolve ties identically
    # (max tie wins), for every bucket width and partitioning
    left = spark.createDataFrame(
        [(1, 15), (1, 25), (1, 95)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0, 1), (1, 10, 200.0, 2), (1, 20, 300.0, 1), (1, 20, 400.0, 2)],
        "k long, t long, v double, seq long",
    )
    for width in (7, 50, 1000):
        got = {
            r["t"]: r["v"]
            for r in R.asof_join_bucketed(
                left, right, on="k", left_ts="t", right_ts="t",
                right_cols=["v"], bucket_width=width, right_tie=["seq"],
            ).collect()
        }
        # at-or-before with max-tie winner: t=15 → (10, seq 2) = 200;
        # t=25 and t=95 → (20, seq 2) = 400 (95 exercises cross-bucket)
        assert got == {15: 200.0, 25: 400.0, 95: 400.0}, (width, got)


def test_bloom_prefilter_no_false_negatives_and_effective(spark):
    # membership: every built key must survive (bloom has no false
    # negatives); effectiveness: with 100 of 10k keys built, the
    # 2^20-bit filter must drop almost all of the unmatched bulk
    keys = spark.range(1, 101).select(F.col("id").alias("k"))
    fact = spark.range(1, 10001).select(F.col("id").alias("fk"))
    bitmap = R.bloom_bitmap(keys, "k")
    surv = R.bloom_prefilter(fact, "fk", bitmap)
    got = {r["fk"] for r in surv.collect()}
    assert set(range(1, 101)) <= got
    # expected FP rate at m=2^20, n=100, k=3 is ~0 — allow slack
    assert len(got) < 200


def test_bloom_prefilter_join_exactness(spark):
    # false positives must be swallowed by the follow-up exact join
    keys = spark.createDataFrame([(7,), (42,)], "k long")
    fact = spark.range(0, 1000).select(F.col("id").alias("fk"), (F.col("id") * 2).alias("v"))
    surv = R.bloom_prefilter(fact, "fk", R.bloom_bitmap(keys, "k"))
    joined = surv.join(keys, surv.fk == keys.k, "inner").select("fk", "v")
    assert sorted((r["fk"], r["v"]) for r in joined.collect()) == [(7, 14), (42, 84)]


def test_triangle_count_matches_bruteforce(spark):
    from pippin_spark.operators import graph as G
    import itertools

    edges = (
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]  # K4: 4 triangles
        + [(5, 6), (6, 7)]  # path: 0
        + [(10, i) for i in range(20, 40)]  # star hub: 0
        + [(20, 21)]  # closes ONE triangle through the hub
        + [(2, 1), (3, 1)]  # duplicate/reversed edges must canonicalize
    )
    df = spark.createDataFrame(edges, "x long, y long")
    und = G.undirected_edges(df, "x", "y")
    got = G.triangle_count(und).collect()[0]["n_triangles"]

    es = {tuple(sorted(e)) for e in edges}
    nodes = sorted({n for e in es for n in e})
    brute = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (a, c) in es and (b, c) in es
    )
    assert got == brute == 5


def test_triangle_count_bcast_matches_join_path(spark):
    """The broadcast-edge-set Arrow pass (under _TRI_BCAST_EDGES_MAX)
    must count exactly what the wedge-self-join path counts — the
    guarded-collapse equality pin (same pattern as dedup_clusters /
    kmeans local)."""
    import random

    from pippin_spark.operators import graph as G

    rng = random.Random(11)
    edges = [
        (rng.randint(0, 400), rng.randint(0, 400)) for _ in range(3000)
    ]
    df = spark.createDataFrame(edges, "x long, y long")

    und = G.undirected_edges(df, "x", "y")
    got_bcast = G.triangle_count(und).collect()[0]["n_triangles"]
    assert got_bcast > 0  # nontrivial fixture

    old = G._TRI_BCAST_EDGES_MAX
    G._TRI_BCAST_EDGES_MAX = 0  # force the distributed join path
    try:
        und2 = G.undirected_edges(df, "x", "y")
        got_join = G.triangle_count(und2).collect()[0]["n_triangles"]
    finally:
        G._TRI_BCAST_EDGES_MAX = old
    assert got_bcast == got_join

    # string node ids fail the integer gate and take the join path
    sdf = df.selectExpr("cast(x as string) x", "cast(y as string) y")
    und3 = G.undirected_edges(sdf, "x", "y")
    assert G._triangle_count_bcast(
        und3.selectExpr("u as s", "v as d")
    ) is None


def test_skyline_2d_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    pts = [(rng.randint(0, 20), rng.randint(0, 20)) for _ in range(120)]
    pts += [(3, 3), (3, 3), (0, 20), (20, 0)]  # dups + axis extremes
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]) for r in R.skyline_2d(df, "x", "y").collect()}
    dpts = set(pts)
    brute = {
        (x, y)
        for x, y in dpts
        if not any(
            (a <= x and b <= y and (a, b) != (x, y)) for a, b in dpts
        )
    }
    assert got == brute


def test_skyline_plan_no_full_single_partition(spark):
    import __spark_entry__ as entry
    import re as _re

    df = entry.queries()["skyline_parts"](spark, "/root/testdata/sf0.001")
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the only SinglePartition exchange sits above the <= P-row
    # per-partition-min aggregate, never above the point set itself
    singles = p.count("Arguments: SinglePartition")
    assert singles <= 1
    assert "rangepartitioning" in p


def test_exact_kth_2pass_matches_sorted(spark):
    import random

    rng = random.Random(11)
    vals = [rng.randint(0, 100000) for _ in range(997)]
    vals += [0, 0, 100000, 50000]  # boundary duplicates
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    s = sorted(vals)
    for k in [1, 2, len(vals) // 2, len(vals) - 1, len(vals)]:
        got = R.exact_kth_2pass(df, "v", k=k).collect()[0]
        assert (got["k"], got["value"]) == (k, s[k - 1]), k
    # default k = lower median
    got = R.exact_kth_2pass(df, "v").collect()[0]
    n = len(vals)
    assert got["value"] == s[(n + 1) // 2 - 1]
    # k out of range fails loud
    import pytest as _pt

    with _pt.raises(ValueError):
        R.exact_kth_2pass(df, "v", k=len(vals) + 1)


def test_exact_kth_2pass_empty_input_returns_no_row(spark):
    """The k-th of an empty set is no row, not an error: the DSIR and
    classifier median gates join against the returned threshold, and
    an empty threshold keeps nothing — matching the SQL oracles, whose
    threshold CTE is empty on a degenerate corpus."""
    df = spark.createDataFrame([], "v long")
    out = R.exact_kth_2pass(df, "v")
    assert out.columns == ["k", "value"]
    assert out.count() == 0
    # the same holds with an explicit k — the data, not the rank
    # request, is what's degenerate
    assert R.exact_kth_2pass(df, "v", k=5).count() == 0


def test_exact_kth_local_matches_distributed(spark):
    """The bounded-collect path (under _KTH_LOCAL_MAX) must select the
    identical (k, value) the 2-pass histogram path selects — the
    guarded-collapse equality pin."""
    import random

    rng = random.Random(23)
    vals = [rng.randint(0, 1 << 40) for _ in range(1500)]
    vals += [0, 0, 7, 7, 7]  # duplicates at both ends
    df = spark.createDataFrame([(v,) for v in vals], "v long")

    old = R._KTH_LOCAL_MAX
    try:
        for k in [None, 1, 3, 700, len(vals)]:
            R._KTH_LOCAL_MAX = 262_144
            loc = R.exact_kth_2pass(df, "v", k=k).collect()[0]
            R._KTH_LOCAL_MAX = 0  # force the 2-pass histogram path
            dist = R.exact_kth_2pass(df, "v", k=k).collect()[0]
            assert tuple(loc) == tuple(dist), k
    finally:
        R._KTH_LOCAL_MAX = old


def test_cogroup_reconcile_matches_plain_python(spark):
    rows = [
        # (key, ts, tie, cents) — left if tie even
        (1, 10, 0, 500), (1, 10, 1, 300), (1, 20, 2, 200), (1, 30, 3, 900),
        (2, 5, 4, 100),             # left-only key
        (3, 5, 5, 250),             # right-only key
    ]
    import pandas as pd  # noqa: F401

    df = spark.createDataFrame(rows, "k long, ts long, tie long, cents long")
    left = df.filter(F.col("tie") % 2 == 0)
    right = df.filter(F.col("tie") % 2 == 1)
    got = {
        r["k"]: (r["max_imbalance_cents"], r["n_left"], r["n_right"])
        for r in R.cogroup_running_imbalance(
            left, right, "k", "ts", "tie", "cents"
        ).collect()
    }
    # key 1 running: +500, -300, +200, -900 -> peaks at 500
    assert got[1] == (500, 2, 2)
    assert got[2] == (100, 1, 0)
    assert got[3] == (-250, 0, 1)


def test_cogroup_reconcile_bucketed_identical(spark):
    import random

    rng = random.Random(3)
    rows = [
        (rng.randint(0, 50), rng.randint(0, 100), i, rng.randint(1, 999))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k long, ts long, tie long, cents long")
    left = df.filter(F.col("tie") % 2 == 0)
    right = df.filter(F.col("tie") % 2 == 1)

    def run(buckets):
        return sorted(
            tuple(r) for r in R.cogroup_running_imbalance(
                left, right, "k", "ts", "tie", "cents", buckets=buckets
            ).collect()
        )

    assert run(None) == run(7) == run(256)


def test_cogroup_reconcile_string_keys(spark):
    rows = [
        ("acct-a", 1, 0, 100), ("acct-a", 2, 1, 40),
        ("acct-b", 1, 2, 70),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, tie long, cents long")
    left = df.filter(F.col("tie") % 2 == 0)
    right = df.filter(F.col("tie") % 2 == 1)
    for buckets in (None, 4):
        got = {
            r["k"]: (r["max_imbalance_cents"], r["n_left"], r["n_right"])
            for r in R.cogroup_running_imbalance(
                left, right, "k", "ts", "tie", "cents", buckets=buckets
            ).collect()
        }
        assert got == {"acct-a": (100, 1, 1), "acct-b": (70, 1, 0)}, buckets


def test_sorted_neighborhood_matches_window_bruteforce(spark):
    from pippin_spark.operators import dedup as DD

    names = [
        (1, "alpha-001"), (2, "alpha-002"), (3, "alpha-003"),
        (4, "beta-001"), (5, "beta-0012"), (6, "gamma"),
        (7, "alpha-001"),  # exact dup, id tiebreak in sort order
    ]
    df = spark.createDataFrame(names, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in DD.sorted_neighborhood_pairs(
            df, "id", "name", window=3, max_dist=2
        ).collect()
    }

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

    s = sorted(names, key=lambda t: (t[1], t[0]))
    exp = set()
    for i in range(len(s)):
        for j in range(i + 1, min(i + 4, len(s))):
            d = lev(s[i][1], s[j][1])
            if d <= 2:
                exp.add((s[i][0], s[j][0], d))
    assert got == exp
    assert (7, 1, 0) in got or (1, 7, 0) in got


def test_partsupp_derivation_invariants(spark):
    # the derived partsupp (TPC-H Q2/Q9/Q11/Q16/Q20) must give every
    # part exactly 4 DISTINCT suppliers with in-range keys, and the
    # pushdown trick the queries rely on — deriving from a FILTERED
    # part slice — must equal filtering the full derivation
    from pyspark.sql import functions as F

    from pippin_spark.entry_queries import _partsupp

    sf = "/root/testdata/sf0.001"
    ps = _partsupp(spark, sf)
    ns = spark.read.parquet(f"{sf}/supplier.parquet").count()
    bad = (
        ps.groupBy("ps_partkey")
        .agg(F.count_distinct("ps_suppkey").alias("n"))
        .filter(F.col("n") != 4)
        .count()
    )
    assert bad == 0
    rng = ps.agg(
        F.min("ps_suppkey"), F.max("ps_suppkey"),
        F.min("ps_availqty"), F.max("ps_availqty"),
        F.min("ps_cost_cents"), F.max("ps_cost_cents"),
    ).first()
    assert 0 <= rng[0] and rng[1] < ns
    assert 1 <= rng[2] and rng[3] <= 9999
    assert 10000 <= rng[4] and rng[5] <= 99999 + 10000
    part = spark.read.parquet(f"{sf}/part.parquet")
    flt = F.col("p_size") < 15
    a = sorted(map(tuple, _partsupp(spark, sf, part=part.filter(flt)).collect()))
    keep = {r[0] for r in part.filter(flt).select("p_partkey").collect()}
    b = sorted(t for t in map(tuple, ps.collect()) if t[0] in keep)
    assert a == b


def test_recursive_reach_local_matches_sql(spark):
    # the driver-BFS fast path (edges collected below _REACH_EDGES_MAX)
    # must equal the SQL recursion exactly: MIN(depth) over the
    # UNION ALL path enumeration is the BFS first-reach depth
    from pippin_spark import entry_queries as EQ

    sf = "/root/testdata/sf0.001"
    got = {
        (r["node"], r["min_depth"])
        for r in EQ.q_recursive_cte_reach(spark, sf).collect()
    }
    EQ._t(spark, sf, "events").df.createOrReplaceTempView("events")
    exp = {
        (r["node"], r["min_depth"])
        for r in spark.sql(EQ._RECURSIVE_REACH_SQL).collect()
    }
    assert got == exp
