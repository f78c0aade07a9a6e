"""Property-based checks (SURVEY.md §5.2 item 4) — algebraic laws the
operators must satisfy on ARBITRARY inputs, not just the fixtures.

Hypothesis drives small generated tables through the real Spark
operators; examples are kept small (Spark job per example) but the laws
are exact:

* dedup_exact is a fixed point: dedup(dedup(X)) == dedup(X)
* inclusion–exclusion: |A ∪ B| == |A| + |B| − |A ∩ B| on key sets
* the last value of a running sum per group equals the group sum
* incremental_filter partitions: rows == kept(>hwm) + dropped(≤hwm)
* asof_join ≡ pandas.merge_asof(by=key, direction=backward)
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET_PROFILE = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.lists(st.integers(min_value=0, max_value=20), min_size=0, max_size=30)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@SET_PROFILE
@given(texts=st.lists(st.sampled_from(["a b c", "d e f", "g h", "a b c "]), max_size=25))
def test_dedup_exact_is_fixed_point(sp, texts):
    from projektdataengineering_spark.queries.dedup import dedup_exact_frame

    df = sp.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = dedup_exact_frame(df)
    twice = dedup_exact_frame(once.drop("content_sha256"))
    assert sorted(r["text"] for r in once.collect()) == sorted(
        r["text"] for r in twice.collect()
    )
    # one survivor per distinct text
    assert once.count() == len(set(texts))


@SET_PROFILE
@given(a=keys, b=keys)
def test_union_inclusion_exclusion(sp, a, b):
    da = sp.createDataFrame([(k,) for k in a] or [(None,)], "k long").filter("k is not null")
    db = sp.createDataFrame([(k,) for k in b] or [(None,)], "k long").filter("k is not null")
    union = da.union(db).distinct().count()
    inter = da.distinct().intersect(db.distinct()).count()
    assert union == len(set(a)) + len(set(b)) - inter
    assert inter == len(set(a) & set(b))


@SET_PROFILE
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # group
            st.integers(min_value=-100, max_value=100),  # value
        ),
        min_size=1,
        max_size=30,
    )
)
def test_running_sum_ends_at_group_sum(sp, rows):
    from pyspark.sql import Window

    df = sp.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)], "id long, g long, v long"
    )
    w = Window.partitionBy("g").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    running = df.select("g", "id", F.sum("v").over(w).alias("rs"))
    last_per_group = (
        running.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("g").orderBy(F.col("id").desc())),
        )
        .filter("rn = 1")
        .select("g", "rs")
    )
    direct = df.groupBy("g").agg(F.sum("v").alias("total"))
    got = {r["g"]: r["rs"] for r in last_per_group.collect()}
    want = {r["g"]: r["total"] for r in direct.collect()}
    assert got == want


@SET_PROFILE
@given(
    ts=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=30),
    hwm=st.integers(min_value=-1, max_value=1001),
)
def test_incremental_filter_partitions_rows(sp, ts, hwm):
    from projektdataengineering_spark.operators.incremental import incremental_filter

    df = sp.createDataFrame([(t,) for t in ts], "ts long")
    kept = incremental_filter(df, "ts", hwm).count()
    assert kept == sum(1 for t in ts if t > hwm)  # strict >: boundary drops


@SET_PROFILE
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=20
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=0, max_size=20
    ),
)
def test_asof_join_matches_pandas_merge_asof(sp, left, right):
    from projektdataengineering_spark.operators.asof import asof_join

    ldf = sp.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, k long, lts long"
    )
    rdf = sp.createDataFrame(
        [(k, t) for k, t in right] or [(None, None)], "k long, rts long"
    ).filter("k is not null")

    got = {
        r["lid"]: r["asof_rts"]
        for r in asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts").collect()
    }

    lpd = pd.DataFrame({"lid": range(len(left)), "k": [k for k, _ in left], "lts": [t for _, t in left]})
    rpd = pd.DataFrame(
        {"k": [k for k, _ in right], "rts": [t for _, t in right]}, dtype="int64"
    )
    lpd = lpd.sort_values("lts", kind="stable")
    rpd = rpd.sort_values("rts", kind="stable")
    want_df = pd.merge_asof(
        lpd, rpd, left_on="lts", right_on="rts", by="k", direction="backward"
    )
    want = {
        int(r.lid): (None if pd.isna(r.rts) else int(r.rts))
        for r in want_df.itertuples()
    }
    assert got == want


def test_asof_join_payload_is_row_atomic(sp):
    """The matched right row must be carried as ONE atomic struct: a
    NULL payload field on the matched row propagates as NULL (not
    backfilled from an older right row), and a multi-column payload
    never mixes values from different right rows (the pd.merge_asof /
    DuckDB ASOF row semantics)."""
    from projektdataengineering_spark.operators.asof import asof_join

    ldf = sp.createDataFrame([(1, 0, 100)], "lid long, k long, lts long")
    # Older right row has non-null fields; the MATCHED (latest ≤ lts)
    # right row has v1 NULL and a different v2.
    rdf = sp.createDataFrame(
        [(0, 10, 7, 70), (0, 50, None, 71)],
        "k long, rts long, v1 long, v2 long",
    )
    [row] = asof_join(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        right_payload={"rts": "m_rts", "v1": "m_v1", "v2": "m_v2"},
    ).collect()
    assert row["m_rts"] == 50
    assert row["m_v1"] is None  # NOT 7 — no backfill across right rows
    assert row["m_v2"] == 71


@SET_PROFILE
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True))
def test_split_is_stable_under_subsetting(sp, ids):
    """The md5 split must be a pure function of the key: any subset of
    the corpus assigns its members exactly as the full corpus does (the
    property that keeps train/test membership fixed as data accretes),
    and every row lands in exactly one of the three splits."""
    from pyspark.sql import functions as F

    df = sp.createDataFrame([(i,) for i in ids], "doc_id long")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    case = """CASE WHEN bucket < 'cd' THEN 'train'
                   WHEN bucket < 'e7' THEN 'val'
                   ELSE 'test' END"""
    full = {
        r["doc_id"]: r["split"]
        for r in df.withColumn("bucket", bucket).withColumn("split", F.expr(case)).collect()
    }
    half_ids = ids[: max(1, len(ids) // 2)]
    half = sp.createDataFrame([(i,) for i in half_ids], "doc_id long")
    sub = {
        r["doc_id"]: r["split"]
        for r in half.withColumn("bucket", bucket).withColumn("split", F.expr(case)).collect()
    }
    assert all(full[i] == s for i, s in sub.items())
    assert set(full.values()) <= {"train", "val", "test"}


@SET_PROFILE
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # user
            st.integers(min_value=0, max_value=3),   # type
            st.integers(min_value=0, max_value=50),  # ts offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_keep_latest_is_idempotent_and_newest(sp, rows):
    """Keep-latest compaction: applying it twice equals once, and the
    survivor per key is the max (ts, event_id) under the same total
    order the operator sorts by."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    data = [(i, u, str(t), o) for i, (u, t, o) in enumerate(rows)]
    df = sp.createDataFrame(data, "event_id long, user_id long, event_type string, ts long")

    def compact(d):
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")

    once = sorted(map(tuple, compact(df).collect()))
    twice = sorted(map(tuple, compact(compact(df)).collect()))
    assert once == twice
    expected = {}
    for i, (u, t, o) in enumerate(rows):
        k = (u, str(t))
        if k not in expected or (o, i) > (expected[k][3], expected[k][0]):
            expected[k] = (i, u, str(t), o)
    assert once == sorted(expected.values())


def test_char_split_is_codepoint_safe_cross_engine(sp):
    """text_char_diversity splits with F.split(text, "") — Java regex
    splits at CODE POINT boundaries (surrogate pairs stay whole), which
    must agree with DuckDB's string_split(text, '') for any input,
    including non-BMP characters (emoji, rare CJK).  Pins the round-8
    advice concern: if either engine ever regressed to UTF-16 code
    units, n_cp/collision_ppm would diverge and this fails first."""
    import duckdb

    samples = [
        "\U0001F600a\U0001F600",          # emoji surrogate pairs
        "\U00020000\U00020000x",          # CJK ext-B (non-BMP)
        "plain ascii",
        "café 中文",        # BMP accents + CJK
        "\U0001F600" * 5,                 # run of identical non-BMP
    ]
    df = sp.createDataFrame([(s,) for s in samples], "text string")
    got = [
        (r.n, r.arr)
        for r in df.select(
            F.size(F.split("text", "")).alias("n"),
            F.split("text", "").alias("arr"),
        ).collect()
    ]
    for s, (n, arr) in zip(samples, got):
        want_n, want_arr = duckdb.sql(
            "SELECT len(string_split(?, '')), string_split(?, '')",
            params=[s, s],
        ).fetchone()
        assert n == want_n == len(s), s
        assert arr == want_arr == list(s), s
