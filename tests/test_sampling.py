"""Deterministic sampling operators (operators/sampling.py)."""

import pyspark.sql.functions as F
import pytest

from pippin_spark.operators import sampling as SMP
from pippin_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def ids_df(spark):
    return spark.range(0, 10_000).withColumnRenamed("id", "rid")


def test_sample_hash_fraction_and_stability(ids_df):
    s = SMP.sample_hash(ids_df, "rid", 0.2)
    n = s.count()
    # uniform hash → binomial around 2000; generous 5-sigma band
    assert 1700 < n < 2300
    # identical membership on re-execution and under repartitioning
    a = {r["rid"] for r in s.collect()}
    b = {r["rid"] for r in SMP.sample_hash(ids_df.repartition(7), "rid", 0.2).collect()}
    assert a == b


def test_sample_hash_salt_independence(ids_df):
    a = {r["rid"] for r in SMP.sample_hash(ids_df, "rid", 0.5, salt=0).collect()}
    b = {r["rid"] for r in SMP.sample_hash(ids_df, "rid", 0.5, salt=7).collect()}
    assert a != b
    # ~independent decisions: overlap near 0.25 of the population
    assert 0.15 < len(a & b) / 10_000 < 0.35


def test_sample_stratified(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(2000)], "rid long, s string"
    )
    out = SMP.sample_stratified(df, "s", "rid", {"keep": 1.0}, default=0.0)
    rows = out.collect()
    assert all(r["s"] == "keep" for r in rows)
    assert len(rows) == 1000


def test_sample_per_group_exact_n(spark):
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(1000)], "rid long, g int"
    )
    out = SMP.sample_per_group(df, "g", "rid", 7)
    sizes = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert sizes == {g: 7 for g in range(5)}
    # deterministic: same picks every run
    assert sorted(r["rid"] for r in out.collect()) == sorted(
        r["rid"] for r in SMP.sample_per_group(df, "g", "rid", 7).collect()
    )


def test_split_assign_partitions_everything(ids_df):
    out = SMP.split_assign(ids_df, "rid", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 10_000
    assert 7700 < counts["train"] < 8300
    # disjoint + exhaustive by construction; remainder goes to the last label
    out2 = SMP.split_assign(ids_df, "rid", {"train": 0.8, "test": 0.1})
    assert out2.filter(F.col("split").isNull()).count() == 0


def test_sample_hash_is_pushed_to_scan(ids_df, tmp_path):
    # the sampling predicate must stay a plain codegen'd filter — no
    # shuffle, no UDF in the plan
    path = str(tmp_path / "ids.parquet")
    ids_df.write.parquet(path)
    df = ids_df.sparkSession.read.parquet(path)
    plan = SMP.sample_hash(df, "rid", 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_kmeans_centroids_shape_and_ivf_parity(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.gauss(cx, 0.05), rnd.gauss(cy, 0.05)])
        for i in range(200)
        for cx, cy in [[(0.0, 1.0), (1.0, 0.0), (0.7, 0.7)][i % 3]]
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = SIM.kmeans_centroids(df, "embedding", "vec_id", 3, iters=4)
    got = cents.collect()
    assert len(got) == 3 and all(len(r["centroid"]) == 2 for r in got)
    # trained IVF with nprobe == num_cells is exhaustive → exact parity
    q = df.filter(F.col("vec_id") < 3)
    bf = SIM.brute_force_topk(df, q, "embedding", "vec_id", k=3)
    ivf = SIM.ivf_topk(
        df, q, "embedding", "vec_id", k=3, num_cells=3, nprobe=3, train_iters=2
    )
    assert sorted(map(tuple, bf.collect())) == sorted(map(tuple, ivf.collect()))


def test_kmeans_local_matches_distributed(spark, monkeypatch):
    # the local-corpus fast path (_kmeans_local: whole Lloyd loop in
    # driver numpy off one bounded collect) must produce the identical
    # centroid table to the distributed per-round loop, both metrics —
    # same seed, same argmax scoring, same round-9 HALF_UP means
    import random

    rnd = random.Random(11)
    rows = [
        (i, [rnd.gauss(cx, 0.3), rnd.gauss(cy, 0.3), rnd.gauss(cx - cy, 0.3)])
        for i in range(500)
        for cx, cy in [[(0.0, 1.0), (1.0, 0.0), (0.7, 0.7), (-1.0, 0.2)][i % 4]]
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for metric in ("cosine", "l2"):
        local = [
            (r["cell"], list(r["centroid"]))
            for r in SIM.kmeans_centroids(
                df, "embedding", "vec_id", 4, iters=3, metric=metric
            ).collect()
        ]
        monkeypatch.setattr(SIM, "_KMEANS_LOCAL_MAX", 0)
        dist = [
            (r["cell"], list(r["centroid"]))
            for r in SIM.kmeans_centroids(
                df, "embedding", "vec_id", 4, iters=3, metric=metric
            ).collect()
        ]
        monkeypatch.undo()
        assert sorted(local) == sorted(dist)


def test_assign_cells_l2_vs_cosine_metric(spark):
    # a vector can be cosine-closest to one centroid but L2-closest to
    # another (magnitude matters for L2, not for cosine): v = (3, 0.3)
    # is cosine-nearest the unit x-axis direction but L2-nearest the
    # far (3, 1) centroid
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [3.0, 1.0])], "cell int, centroid array<double>"
    )
    v = spark.createDataFrame([(7, [3.0, 0.3])], "id long, cv array<double>")
    cos = SIM._assign_cells(v, cents).first()["cell"]
    l2 = SIM._assign_cells(v, cents, metric="l2").first()["cell"]
    assert cos == 1 and l2 == 2


def test_sample_kmeans_matches_numpy_lloyd(spark):
    # the driver-sample training path must reproduce _numpy_lloyd on
    # the full (ascending-id) sample exactly
    import numpy as np

    rows = [(i, [float(i % 5), float((i * 3) % 7)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["cell"]: r["centroid"]
        for r in SIM.sample_kmeans_centroids(
            df, "embedding", "vec_id", 3, iters=3
        ).collect()
    }
    X = np.array([v for _, v in rows])
    want = SIM._numpy_lloyd(X, 3, 3)
    for c in range(3):
        assert got[c + 1] == list(want[c])


def test_sample_balance_equalizes_strata(spark):
    from pippin_spark.operators.sampling import sample_balance

    rows = [(i, "big" if i % 10 else "small") for i in range(5000)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = sample_balance(df, "grp", "id").groupBy("grp").count().collect()
    got = {r["grp"]: r["count"] for r in out}
    # small stratum (500 rows) is kept whole; big (4500) downsampled to
    # ~500 (hash-uniform, so within ~5 sigma)
    assert got["small"] == 500
    assert abs(got["big"] - 500) < 120

    # deterministic: same membership on re-run
    a = {r["id"] for r in sample_balance(df, "grp", "id").select("id").collect()}
    b = {r["id"] for r in sample_balance(df, "grp", "id").select("id").collect()}
    assert a == b


def test_sample_mixture_composition_and_determinism(spark):
    from pippin_spark.operators.sampling import sample_mixture

    rows = [(i, "a" if i % 10 < 6 else ("b" if i % 10 < 9 else "c")) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, src string")
    w = {"a": 400_000, "b": 400_000, "c": 200_000}
    got = sample_mixture(df, "id", "src", w)
    by_src = {r["src"]: r["n"] for r in got.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # counts (a,b,c) = (3000, 1500, 500); budget B = min(c_s*1e6//w_s)
    # = c's 500*1e6//200000 = 2_500_000 → targets n_s = w_s*B//1e6 =
    # (1000, 1000, 500). The hash threshold approximates n_s
    # binomially — assert composition within 5% of target shares
    total = sum(by_src.values())
    assert total > 0
    for s, ws in w.items():
        assert abs(by_src.get(s, 0) / total - ws / 1e6) < 0.05, (s, by_src)
    # deterministic under repartitioning
    again = sample_mixture(df.repartition(13), "id", "src", w)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))


def test_sample_weighted_topk_bias_and_determinism(spark):
    from pippin_spark.operators.sampling import sample_weighted_topk

    # ids 0..1999; weight 100 for ids < 200, weight 1 otherwise —
    # heavy items should dominate the sample
    rows = [(i, 100.0 if i < 200 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = sample_weighted_topk(df, "id", "w", k=100)
    ids = sorted(r["id"] for r in got.collect())
    assert len(ids) == 100
    heavy = sum(1 for i in ids if i < 200)
    # E[heavy] ≈ 97 under A-ES with 100:1 weights over 200/1800 items;
    # deterministic hash keys make this a fixed number — assert the
    # qualitative bias generously
    assert heavy > 60
    # membership is invariant under repartitioning
    again = sample_weighted_topk(df.repartition(17), "id", "w", k=100)
    assert sorted(r["id"] for r in again.collect()) == ids


def test_sample_weighted_topk_global_plan_is_take_ordered(spark):
    from pippin_spark.operators.sampling import sample_weighted_topk

    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    p = sample_weighted_topk(df, "id", "w", k=10)._sc._jvm.PythonSQLUtils.explainString(
        sample_weighted_topk(df, "id", "w", k=10)._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in p  # never a single-partition sort


def test_sample_mixture_absent_group_matches_oracle_semantics(spark):
    # a weighted group with zero rows is excluded from the budget (the
    # oracle's inner join does the same); all-absent → empty sample
    from pippin_spark.operators.sampling import sample_mixture

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1000)], "id long, src string"
    )
    got = sample_mixture(df, "id", "src", {"a": 500_000, "b": 250_000, "zz": 250_000})
    srcs = {r["src"] for r in got.collect()}
    assert srcs == {"a", "b"}  # absent 'zz' doesn't zero the budget
    none = sample_mixture(df, "id", "src", {"zz": 1_000_000})
    assert none.count() == 0


def test_dsir_importance_matches_pure_python(spark):
    """Bit-parity of the DSIR-shaped hashed frequency-ratio importance
    against a pure-Python mirror of the integer contract, and the
    semantic direction: target-looking docs (stopword-rich) must score
    strictly higher than raw-only docs on a corpus where the splits
    use disjoint vocabulary."""
    import hashlib

    stop = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]
    docs = [
        (1, "the cat sat on a mat and it is fine"),
        (2, "zebra quark mango vortex plasma"),
        (3, "of the and to in is that it for a"),
        (4, "quark vortex zebra zebra plasma mango"),
        (5, "the a zebra mango"),
        (6, ""),
    ]

    def bucket(tok, dim=64):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim

    tokrows = []
    for d, t in docs:
        toks = [w for w in t.lower().split() if w]
        y = 1 if len(set(toks) & set(stop)) >= 2 else 0
        for w in toks:
            tokrows.append((d, y, bucket(w)))
    cr, ct = {}, {}
    for d, y, j in tokrows:
        cr[j] = cr.get(j, 0) + 1
        if y:
            ct[j] = ct.get(j, 0) + 1
    ratio = {j: (ct.get(j, 0) + 1) * 10_000 // (r + 1) for j, r in cr.items()}
    exp = {}
    for d, _, j in tokrows:
        s, n = exp.get(d, (0, 0))
        exp[d] = (s + ratio[j], n + 1)
    exp = {d: (n, s // n) for d, (s, n) in exp.items()}

    from pippin_spark.operators import classifier as C

    df = spark.createDataFrame(docs, "doc_id long, text string")
    lab = C.stopword_rule_label(F.col("text"), stop, 2)
    got = {
        r["doc_id"]: (r["n_tok"], r["imp_scaled"])
        for r in SMP.dsir_importance_scores(
            df, "text", "doc_id", lab
        ).collect()
    }
    assert got == exp
    assert 6 not in got  # empty doc carries no tokens
    # direction: pure-stopword doc 3 beats pure-raw doc 4
    assert got[3][1] > got[4][1]
    # no row UDFs in the plan
    from pippin_spark import plans as P

    assert P.plan_stats(
        SMP.dsir_importance_scores(df, "text", "doc_id", lab)
    )["row_udfs"] == 0


def test_exact_isqrt_matches_math_isqrt(spark):
    import math

    # edge cases where float sqrt rounds the wrong way: perfect squares,
    # square±1, and large values near the 2^52 float-precision cliff
    vals = [0, 1, 2, 3, 4, 8, 9, 10, 15, 16, 17, 24, 25, 26]
    for r in [10**6, 10**7, 2**26 - 1]:
        vals += [r * r - 1, r * r, r * r + 1]
    vals += [2**50, 2**51, 2**52 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = {
        r["n"]: r["s"]
        for r in df.select("n", SMP.exact_isqrt(F.col("n")).alias("s")).collect()
    }
    for v in vals:
        assert got[v] == math.isqrt(v), v


def test_sqrt_temperature_weights_matches_pure_python(spark):
    import math

    rows = [(i, "en" if i % 7 else "de", f"s{i % 3}") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "source"])
    got = {
        (r["lang"], r["source"]): (r["n"], r["s"], r["weight_ppm"])
        for r in SMP.sqrt_temperature_weights(df, ["lang", "source"]).collect()
    }
    from collections import Counter

    cnt = Counter((lang, src) for _, lang, src in rows)
    tot = sum(math.isqrt(n) for n in cnt.values())
    for dom, n in cnt.items():
        s = math.isqrt(n)
        assert got[dom] == (n, s, s * 1_000_000 // tot), dom
    # the ppm weights under-shoot 1e6 by at most #domains (floor div)
    wsum = sum(w for _, _, w in got.values())
    assert 1_000_000 - len(cnt) <= wsum <= 1_000_000


def test_shuffle_order_epochs_distinct_and_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])

    def ranks(epoch, data):
        return {
            r["doc_id"]: r["shuffle_rank"]
            for r in SMP.shuffle_order(data, "doc_id", epoch=epoch).collect()
        }

    e0, e1, e2 = ranks(0, df), ranks(1, df), ranks(2, df)
    n = 200
    for e in (e0, e1, e2):
        assert sorted(e.values()) == list(range(1, n + 1))  # a permutation
    # epochs are pairwise-distinct permutations
    assert e0 != e1 and e1 != e2 and e0 != e2
    # each epoch's order is invariant to the input partitioning
    assert e1 == ranks(1, df.repartition(7))
    assert e2 == ranks(2, df.orderBy(F.desc("doc_id")))
    # different seed, different permutation
    assert e1 != {
        r["doc_id"]: r["shuffle_rank"]
        for r in SMP.shuffle_order(df, "doc_id", seed="other", epoch=1).collect()
    }


def test_waterfill_allocate_invariants_and_reference(spark):
    rows = [("a", 100, 10), ("b", 5000, 30), ("c", 50, 40), ("d", 9000, 20)]
    df = spark.createDataFrame(rows, ["dom", "avail", "w"])

    def run(budget):
        return {
            r["dom"]: r["alloc"]
            for r in SMP.waterfill_allocate(df, "dom", "avail", "w", budget).collect()
        }

    # small budget: tiny-avail domains saturate, surplus redistributes
    got = run(2000)
    avail = dict((d, a) for d, a, _ in rows)
    assert sum(got.values()) <= 2000
    for d, a in avail.items():
        assert 0 <= got[d] <= a
    # c saturates (share 40/100*2000 = 800 >= 50); a saturates on the
    # redistribution (10/60 * 1950 = 325 >= 100)
    assert got["c"] == 50 and got["a"] == 100
    # remaining budget splits 30:20 between b and d by floor division
    rem = 2000 - 150
    assert got["b"] == 30 * rem // 50 and got["d"] == 20 * rem // 50
    # budget >= total avail: everyone saturates
    got_all = run(1_000_000)
    assert got_all == avail
    # zero budget: nothing allocated
    assert all(v == 0 for v in run(0).values())


def test_waterfill_allocate_zero_weight_corner(spark):
    # ADVICE r7: one zero-weight domain alongside domains that saturate
    # used to ZeroDivisionError on the final redistribution (uw == 0
    # with unsaturated rows remaining). Contract: weight 0 => share 0.
    rows = [("a", 10, 5), ("b", 10, 5), ("z", 1000, 0)]
    df = spark.createDataFrame(rows, ["dom", "avail", "w"])
    got = {
        r["dom"]: r["alloc"]
        for r in SMP.waterfill_allocate(df, "dom", "avail", "w", 500).collect()
    }
    assert got == {"a": 10, "b": 10, "z": 0}
    # all-zero weights: nothing allocates, no crash
    dfz = spark.createDataFrame([("a", 10, 0), ("b", 20, 0)], ["dom", "avail", "w"])
    gotz = {
        r["dom"]: r["alloc"]
        for r in SMP.waterfill_allocate(dfz, "dom", "avail", "w", 500).collect()
    }
    assert gotz == {"a": 0, "b": 0}
