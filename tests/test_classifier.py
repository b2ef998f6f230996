"""Quality-classifier (exact-integer logistic regression) gates:
bit-parity against a pure-Python reference trajectory, learnability on
a separable rule, engine-division semantics, and plan quality.

Engine extension (no reference-repo analog): models fastText
`supervised` / CCNet quality-LM distillation; the exactness contract
is what makes the declared queries full cross-engine parity oracles.
"""

import hashlib
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from pippin_spark import plans as P
from pippin_spark.operators import classifier as C

STOP = ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"]


def _py_tokens(text):
    return [t for t in re.split(r"\s+", text.lower()) if t]


def _py_bucket(tok, dim=64):
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim


def _py_pipeline(docs, dim=64, iters=8, lr_num=4, lr_den=1):
    """Pure-Python mirror of featurize + GD, same integer semantics."""
    feats = []
    for _id, text in docs:
        toks = _py_tokens(text)
        if not toks:
            continue
        y = 1 if len(set(toks) & set(STOP)) >= 2 else 0
        cnt = {}
        for t in toks:
            j = _py_bucket(t, dim)
            cnt[j] = cnt.get(j, 0) + 1
        tot = sum(cnt.values())
        x = [cnt.get(j, 0) * C.SCALE_X // tot for j in range(dim)]
        feats.append((_id, y, x))
    n = len(feats)
    w = [0] * dim
    for _ in range(iters):
        g = [0] * dim
        for _id, y, x in feats:
            z = C.tdiv(sum(wi * xi for wi, xi in zip(w, x)), C.SCALE_X)
            prob = C.HALF_W + C.tdiv(
                z * C.SCALE_W, 2 * (C.SCALE_W + abs(z))
            )
            err = prob - y * C.SCALE_W
            for j in range(dim):
                if x[j]:
                    g[j] += err * x[j]
        w = [
            w[j] - C.tdiv(g[j] * lr_num, n * C.SCALE_X * lr_den)
            for j in range(dim)
        ]
    return feats, w


DOCS = [
    (1, "the cat sat on a mat and the dog barked"),
    (2, "alpha beta gamma delta epsilon zeta"),
    (3, "a stitch in time saves nine for the win"),
    (4, "lorem ipsum dolor sit amet consectetur"),
    (5, "it is what it is and that is that"),
    (6, "spark shuffle partition broadcast join"),
    (7, "to be or not to be that is the question"),
    (8, ""),
    (9, "   "),
    (10, "of mice and men in the field"),
]


def _spark_feat(spark, docs):
    df = spark.createDataFrame(docs, "doc_id int, text string")
    lab = C.stopword_rule_label(F.col("text"), STOP, 2)
    return C.hash_token_features(df, "text", "doc_id", lab)


def test_logreg_matches_pure_python_reference(spark):
    feats_ref, w_ref = _py_pipeline(DOCS)
    feat = _spark_feat(spark, DOCS)
    got_feat = {
        r["doc_id"]: (r["y"], list(r["x"])) for r in feat.collect()
    }
    assert got_feat == {i: (y, x) for i, y, x in feats_ref}
    w = C.logreg_train(feat)
    assert w == w_ref


def test_logreg_learns_separable_rule(spark):
    # label == presence of two stopword types; a corpus where the
    # positive docs are exactly the ones carrying 'the a' must be
    # learnable to high held-out accuracy by the hashed-BoW model
    docs = []
    for i in range(200):
        if i % 2:
            docs.append((i, f"the a tok{i % 7} tok{i % 11} tok{i % 13}"))
        else:
            docs.append((i, f"tok{i % 7} tok{i % 11} tok{i % 13} tok{i % 5}"))
    train = [d for d in docs if d[0] % 10 < 8]
    held = [d for d in docs if d[0] % 10 >= 8]
    w = C.logreg_train(_spark_feat(spark, train))
    scored = C.logreg_score(_spark_feat(spark, held), w)
    row = scored.agg(
        F.sum("correct").alias("c"), F.count(F.lit(1)).alias("n")
    ).first()
    assert row["n"] == len(held)
    assert row["c"] / row["n"] >= 0.9


@pytest.mark.parametrize("a,b", [(-7, 2), (7, 2), (-7, -2), (7, -2), (0, 5), (-1, 3)])
def test_tdiv_matches_both_engines(spark, a, b):
    got = C.tdiv(a, b)
    duck = duckdb.sql(f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)").fetchone()[0]
    sp = spark.sql(f"SELECT CAST({a} AS BIGINT) div CAST({b} AS BIGINT) AS q").first()["q"]
    assert got == duck == sp


def test_classifier_plans_have_no_row_udfs(spark):
    feat = _spark_feat(spark, DOCS)
    stats = P.plan_stats(feat)
    assert stats["row_udfs"] == 0
    scored = C.logreg_score(feat, [3] * C.DIM)
    assert P.plan_stats(scored)["row_udfs"] == 0


def test_empty_corpus_returns_zero_weights(spark):
    feat = _spark_feat(spark, [(1, ""), (2, "   ")])
    assert C.logreg_train(feat) == [0] * C.DIM


def test_classifier_scrub_e2e_median_gate(spark):
    """The e2e composition keeps exactly the docs scoring >= the
    exact lower median (value-based: ties at the threshold all
    survive), and every output doc is scrubbed consistently with the
    standalone scrub of the same kept subset."""
    from pippin_spark.entry_queries import ENTRY_QUERIES

    out = ENTRY_QUERIES["classifier_scrub_e2e"](
        spark, "/root/testdata/sf0.001"
    )
    rows = out.collect()
    n_kept = len(rows)
    # recompute the gate independently from the scored corpus
    from pippin_spark import entry_queries as EQ
    from pippin_spark.operators import classifier as C2

    docs = EQ._t(spark, "/root/testdata/sf0.001", "documents").df
    lab = C2.stopword_rule_label(
        F.col("text"), list(EQ.CLF_STOPWORDS), 2
    )
    w = C2.logreg_train(
        C2.hash_token_features(
            docs.filter(F.col("doc_id") % 10 < 8), "text", "doc_id", lab
        )
    )
    scored = C2.logreg_score(
        C2.hash_token_features(docs, "text", "doc_id", lab), w
    )
    probs = sorted(r["prob_scaled"] for r in scored.collect())
    med = probs[(len(probs) + 1) // 2 - 1]
    expect = sum(1 for p in probs if p >= med)
    assert n_kept == expect
    assert 0 < n_kept < len(probs)  # the gate is not degenerate
    assert all(r["prob_scaled"] >= med for r in rows)
    # scrub bookkeeping holds on the composed output too
    for r in rows:
        assert r["n_removed_chars"] >= 0
        assert r["n_tokens"] >= 0


def test_label_binds_below_the_generator(spark):
    """Regression gate for the bind-once discipline: the per-document
    label expression (array_intersect over the full token set) must be
    evaluated in a projection BELOW the token Generate, not re-derived
    once per generated token row (measured 13x slower). In the
    formatted physical plan the Generate node prints above its child
    projection, so the label's distinguishing function must appear
    AFTER the Generate line."""
    feat = _spark_feat(spark, DOCS)
    plan = feat._jdf.queryExecution().executedPlan().toString()
    gen = plan.index("Generate")
    lab = plan.index("array_intersect")
    assert gen < lab, (
        "label expression found above the Generate — it will be "
        "re-evaluated per token row"
    )


def test_score_rowwise_matches_batch_scorer(spark):
    """The stateless per-row HOF scorer must reproduce the shuffle-
    based featurize+score path bit-for-bit (integer sums are order-
    independent, so the two evaluation strategies are provably equal —
    this pins the implementation to the proof)."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    lab = C.stopword_rule_label(F.col("text"), STOP, 2)
    w = C.logreg_train(_spark_feat(spark, DOCS))
    batch = {
        r["doc_id"]: (
            r["z_scaled"], r["prob_scaled"], r["pred"], r["label"],
            r["correct"],
        )
        for r in C.logreg_score(_spark_feat(spark, DOCS), w).collect()
    }
    roww = {
        r["doc_id"]: (
            r["z_scaled"], r["prob_scaled"], r["pred"], r["label"],
            r["correct"],
        )
        for r in C.score_rowwise(df, "text", "doc_id", w, STOP).collect()
    }
    assert roww == batch
    # stateless: the plan carries no exchange at all
    from pippin_spark import plans as P

    stats = P.plan_stats(C.score_rowwise(df, "text", "doc_id", w, STOP))
    assert stats["exchanges"] == 0 and stats["row_udfs"] == 0
