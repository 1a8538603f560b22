"""Edge semantics for the segment-dedup (operators/lines.py) and the
funnel/cohort analytics (operators/events.py) — the catalog oracles pin the
bulk behavior; these pin the corners the synthetic corpus may not contain."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import events as ev_ops
from advanced_elb_logs_etl_spark.operators import lines


def test_segment_docs_widths_and_order(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(25))), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.seg_no): r.seg
        for r in lines.segment_docs(df, seg_tokens=10).collect()
    }
    assert rows[(1, 0)] == " ".join(f"w{i}" for i in range(10))
    assert rows[(1, 1)] == " ".join(f"w{i}" for i in range(10, 20))
    assert rows[(1, 2)] == " ".join(f"w{i}" for i in range(20, 25))  # short tail
    assert rows[(2, 0)] == "a b"
    # split(trim('')) yields [''] — one empty segment, same as the SQL twin.
    assert rows[(3, 0)] == ""
    assert len(rows) == 5


def test_interdoc_segment_dedup_removes_shared_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(10))
    uniq1 = " ".join(f"x{i}" for i in range(10))
    uniq2 = " ".join(f"y{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq1}"),
            (2, f"{uniq2} {boiler}"),
            (3, boiler),  # fully boilerplate -> empty survivor
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in lines.interdoc_segment_dedup(df).collect()}
    assert out[1].text_deduped == uniq1 and out[1].n_kept == 1 and out[1].n_removed == 1
    assert out[2].text_deduped == uniq2 and out[2].n_kept == 1
    assert out[3].text_deduped == "" and out[3].n_kept == 0 and out[3].n_removed == 1
    assert len(out) == 3  # the all-boilerplate doc is KEPT as a row


def test_interdoc_segment_dedup_no_cartesian(spark):
    df = spark.createDataFrame([(1, "a b c"), (2, "a b c")], ["doc_id", "text"])
    plan = lines.interdoc_segment_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_funnel_order_is_strict(spark):
    rows = [
        # u1: full ordered funnel
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2: purchase BEFORE the first qualifying click -> stops at click
        (2, _ts(0), "view"), (2, _ts(1), "purchase"), (2, _ts(2), "click"),
        # u3: click before any view -> stops at view
        (3, _ts(0), "click"), (3, _ts(1), "view"),
        # u4: no view at all -> not in the funnel
        (4, _ts(0), "click"), (4, _ts(1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r.event_type: r.users for r in ev_ops.funnel_counts(ev).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_counts(spark):
    # >= (not >): a click at exactly the view instant qualifies.
    ev = spark.createDataFrame(
        [(1, _ts(0), "view"), (1, _ts(0), "click")],
        ["user_id", "ts", "event_type"],
    )
    got = {r.event_type: r.users for r in ev_ops.funnel_counts(ev).collect()}
    assert got["click"] == 1


def test_cohort_retention_triangle(spark):
    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 5)), (1, d(2024, 1, 1, 9)), (1, d(2024, 1, 3, 1)),
        (2, d(2024, 1, 1, 2)),
        (3, d(2024, 1, 2, 8)), (3, d(2024, 1, 3, 8)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (str(r.cohort_day), r.day_offset): r.users
        for r in ev_ops.cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,   # u1, u2 day-0
        ("2024-01-01", 2): 1,   # u1 returns on day 3 (dup same-day visits collapse)
        ("2024-01-02", 0): 1,   # u3 cohort
        ("2024-01-02", 1): 1,   # u3 returns
    }


def test_chunk_documents_overlap_and_tail(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "a b c")],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.chunk_no): r
        for r in lines.chunk_documents(df, width=50, stride=40).collect()
    }
    # 100 tokens, width 50, stride 40 -> chunks at 0, 40, 80
    assert {c for d, c in rows if d == 1} == {0, 1, 2}
    assert rows[(1, 0)].chunk_text.split()[:2] == ["w0", "w1"]
    assert rows[(1, 1)].chunk_text.split()[0] == "w40"   # 10-token overlap
    assert rows[(1, 0)].chunk_text.split()[40] == "w40"
    assert rows[(1, 2)].n_tokens == 20                   # short tail chunk
    assert rows[(2, 0)].chunk_text == "a b c" and rows[(2, 0)].n_tokens == 3


def test_chunk_documents_exact_boundary(spark):
    # n == width -> exactly one chunk, not an empty trailing one.
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(50)))], ["doc_id", "text"]
    )
    out = lines.chunk_documents(df, width=50, stride=40).collect()
    assert len(out) == 1 and out[0].n_tokens == 50


def test_knn_classify_majority_and_tiebreak(spark):
    from advanced_elb_logs_etl_spark.operators import similarity

    # query 0 at origin-ish; neighbors engineered by cosine to [1,0]:
    # ids 1,2 label 7 (cos 1.0), ids 3,4 label 3 (cos ~0.97), id 5 label 9.
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [2.0, 0.0], 7), (2, [3.0, 0.0], 7),
        (3, [4.0, 1.0], 3), (4, [8.0, 2.0], 3),
        (5, [1.0, 1.0], 9),
        (6, [-1.0, 0.5], 1),  # far; excluded from top-5? k=5 takes it too
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.knn_classify(df, df.filter("vec_id = 0"), k=4).collect()
    assert len(out) == 1
    # top-4 = ids 1,2 (label 7) and 3,4 (label 3): 2-2 tie -> smaller label 3
    assert out[0].predicted_label == 3 and out[0].votes == 2


def test_chunk_documents_property_differential(spark):
    """Differential vs a plain-Python reference chunker over a sweep of
    (n_tokens, width, stride) including every boundary class: n < width,
    n == width, (n - width) % stride == 0, and a 1-token tail."""

    def py_chunks(toks, width, stride):
        n = len(toks)
        if n <= width:
            return [(0, " ".join(toks), n)]
        kmax = (n - width + stride - 1) // stride
        return [
            (s, " ".join(toks[s * stride : s * stride + width]),
             min(width, n - s * stride))
            for s in range(kmax + 1)
        ]

    cases = [(n, w, s) for n in (1, 5, 39, 40, 41, 49, 50, 51, 80, 90, 130)
             for (w, s) in ((50, 40), (10, 5), (8, 8))]
    rows = [(i, " ".join(f"t{j}" for j in range(n))) for i, (n, _, _) in enumerate(cases)]
    for (w, s) in {(w, s) for _, w, s in cases}:
        ids = [i for i, (n, cw, cs) in enumerate(cases) if (cw, cs) == (w, s)]
        df = spark.createDataFrame([rows[i] for i in ids], ["doc_id", "text"])
        got = {
            (r.doc_id, r.chunk_no): (r.chunk_text, r.n_tokens)
            for r in lines.chunk_documents(df, width=w, stride=s).collect()
        }
        for i in ids:
            n = cases[i][0]
            toks = rows[i][1].split()
            for cn, txt, nt in py_chunks(toks, w, s):
                assert got[(i, cn)] == (txt, nt), (i, n, w, s, cn)
            assert len([1 for (d, _) in got if d == i]) == len(py_chunks(toks, w, s))


def test_write_training_shards_deterministic(spark, tmp_path):
    from pyspark.sql import functions as F  # noqa: F811

    from advanced_elb_logs_etl_spark.operators.sampling import write_training_shards

    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)], ["doc_id", "text"])
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(df, p1, n_shards=4)
    write_training_shards(df, p2, n_shards=4)
    a = spark.read.parquet(p1)
    b = spark.read.parquet(p2)
    assert a.count() == 200
    # every shard present, membership identical across reruns
    sa = {(r.doc_id, r.shard) for r in a.select("doc_id", "shard").collect()}
    sb = {(r.doc_id, r.shard) for r in b.select("doc_id", "shard").collect()}
    assert sa == sb
    assert {r.shard for r in a.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # membership matches the documented formula
    expected = {
        (r.doc_id, r.exp)
        for r in df.select(
            "doc_id",
            F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(4)).cast("int").alias("exp"),
        ).collect()
    }
    assert sa == expected


def test_funnel_random_differential(spark):
    """Seeded random event streams vs a plain-Python funnel walker —
    exercises interleavings (repeats, pre-view clicks, equal timestamps,
    missing stages) that the hand-built cases can't enumerate."""
    import random

    rng = random.Random(20240813)
    stages = ["view", "click", "purchase"]
    types = stages + ["signup", "error"]
    rows = []
    for u in range(40):
        for _ in range(rng.randint(0, 12)):
            rows.append(
                (u, _ts(rng.randint(0, 59)), types[rng.randrange(len(types))])
            )
    # plain-Python reference: earliest stage-k event at-or-after stage k-1
    def walk(evts):
        t_prev, reached = None, 0
        for st in stages:
            cand = [t for (t, ty) in evts if ty == st and (t_prev is None or t >= t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            reached += 1
        return reached

    by_user = {}
    for u, t, ty in rows:
        by_user.setdefault(u, []).append((t, ty))
    expected = {s: 0 for s in stages}
    for evts in by_user.values():
        r = walk(evts)
        for i in range(r):
            expected[stages[i]] += 1

    ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r.event_type: r.users for r in ev_ops.funnel_counts(ev, stages).collect()}
    assert got == expected


def test_replicated_skew_join_result_identity(spark):
    import random

    from advanced_elb_logs_etl_spark.operators.skew import replicated_skew_join

    rng = random.Random(7)
    # 100:1 hot key + a fact key with no dim match (exercises inner drop)
    fact_rows = [("hot", rng.randint(0, 99)) for _ in range(500)] + [
        (f"k{i}", i) for i in range(50)
    ] + [("orphan", -1)] * 3
    dim_rows = [("hot", "HOT")] + [(f"k{i}", f"V{i}") for i in range(50)]
    fact = spark.createDataFrame(fact_rows, ["key", "v"])
    dim = spark.createDataFrame(dim_rows, ["key", "label"])
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = sorted(map(tuple, fact.join(dim, "key").collect()))
        salted = sorted(map(tuple, replicated_skew_join(fact, dim, "key").collect()))
        assert salted == plain
        left_p = sorted(map(tuple, fact.join(dim, "key", "left").collect()))
        left_s = sorted(
            map(tuple, replicated_skew_join(fact, dim, "key", how="left").collect())
        )
        assert left_s == left_p
        # the join really keys on (key, salt): hot rows spread over >1 salt
        from pyspark.sql import functions as F  # noqa: F811

        salts = (
            fact.filter("key = 'hot'")
            .select(F.pmod(F.xxhash64("key", "v"), F.lit(16)).alias("s"))
            .distinct()
            .count()
        )
        assert salts > 4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_compact_parquet_reduces_files(spark, tmp_path):
    import os

    from advanced_elb_logs_etl_spark.operators.reports import compact_parquet

    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    df = spark.range(10000).selectExpr("id", "id * 2 AS v")
    df.repartition(64).write.parquet(src)  # 64 tiny files
    n_src = sum(f.endswith(".parquet") for _, _, fs in os.walk(src) for f in fs)
    assert n_src == 64
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n == 1
    n_dst = sum(f.endswith(".parquet") for _, _, fs in os.walk(dst) for f in fs)
    assert n_dst == 1
    assert spark.read.parquet(dst).count() == 10000
