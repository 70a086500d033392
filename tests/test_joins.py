"""Join-layout helpers: bucketed joins must be shuffle-free, salted joins
must equal their plain counterparts."""

from __future__ import annotations

import pytest

# r14 (VERDICT r13 #2): multi-minute file on a latency-floor box — skipped
# by the default serial run, always run by scripts/partest.py (see conftest)
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from dask_glm_spark.operators import joins as J
from dask_glm_spark.plans import audit
from dask_glm_spark.sources.glm_source import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # Stale-location hygiene (round 9): DROP TABLE IF EXISTS is a no-op on
    # a fresh in-memory catalog, so a warehouse dir leaked by a killed
    # prior run makes saveAsTable fail LOCATION_ALREADY_EXISTS forever.
    # Remove both catalog entry AND location before writing.
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    J.write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=8,
                     sort_cols=["o_orderkey"])
    J.write_bucketed(li, "t_lineitem_b", ["l_orderkey"], num_buckets=8,
                     sort_cols=["l_orderkey"])
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    """Two co-bucketed tables join with ZERO exchanges — the write-time
    shuffle is amortized over every later join on the key. (Broadcast is
    disabled so the test exercises the bucketed sort-merge path — at real
    scale neither side fits a broadcast.)"""
    to, tl = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(to)
        l = spark.table(tl)
        joined = o.join(l, o["o_orderkey"] == l["l_orderkey"])
        assert audit.count_exchanges(joined) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # and it still returns the right rows
    plain = (
        load_table(spark, SF, "orders")
        .select("o_orderkey")
        .join(
            load_table(spark, SF, "lineitem").select("l_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    assert joined.count() == plain.count()


def test_bucketed_agg_is_shuffle_free(spark, bucketed_tables):
    """groupBy on the bucket key needs no exchange either."""
    _, tl = bucketed_tables
    agg = spark.table(tl).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert audit.count_exchanges(agg) == 0


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    small = orders.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(small, ["l_orderkey"]).groupBy().agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 3).alias("s")
    ).first()
    salted = J.salted_join(li, small, ["l_orderkey"], salt_buckets=8).groupBy().agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 3).alias("s")
    ).first()
    assert plain["n"] == salted["n"]
    assert plain["s"] == salted["s"]


def test_salted_left_join_keeps_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (99, "z")], "k long, v string")
    b = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, w double")
    out = {r["k"]: r["w"] for r in J.salted_join(a, b, ["k"], salt_buckets=4, how="left").collect()}
    assert out == {1: 10.0, 2: 20.0, 99: None}


def test_salted_join_rejects_right(spark):
    a = spark.createDataFrame([(1, "x")], "k long, v string")
    with pytest.raises(ValueError):
        J.salted_join(a, a, ["k"], how="right")


def _asof_fixture(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    lrows = [
        (int(i), int(rng.randint(0, 5)), float(rng.uniform(0, 100)))
        for i in range(200)
    ]
    rrows = [
        (int(1000 + i), int(rng.randint(0, 5)), float(rng.uniform(0, 100)),
         float(rng.standard_normal()))
        for i in range(150)
    ]
    left = spark.createDataFrame(lrows, "lid long, user_id long, t double")
    right = spark.createDataFrame(rrows, "rid long, user_id long, t double, v double")
    return left, right, lrows, rrows


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas_merge_asof(spark, direction):
    """The union + carry-forward as-of == pandas merge_asof (per-key,
    at-or-before / at-or-after, left semantics)."""
    import pandas as pd

    from dask_glm_spark.operators.joins import asof_join

    left, right, lrows, rrows = _asof_fixture(spark)
    out = asof_join(
        left, right, time_col="t", by="user_id",
        value_cols=["rid", "v"], direction=direction,
    ).toPandas().sort_values("lid").reset_index(drop=True)

    lp = pd.DataFrame(lrows, columns=["lid", "user_id", "t"]).sort_values("t")
    rp = pd.DataFrame(rrows, columns=["rid", "user_id", "t", "v"]).sort_values("t")
    exp = pd.merge_asof(
        lp, rp, on="t", by="user_id", direction=direction,
        allow_exact_matches=True, suffixes=("", "_r"),
    ).sort_values("lid").reset_index(drop=True)
    assert len(out) == len(exp) == 200
    for i in range(200):
        g, w = out.iloc[i], exp.iloc[i]
        assert g["lid"] == w["lid"]
        if pd.isna(w["rid"]):
            assert pd.isna(g["rid_asof"])
        else:
            assert g["rid_asof"] == w["rid"]
            assert g["v_asof"] == pytest.approx(w["v"])


def test_asof_join_single_exchange(spark):
    """Scale pin: the as-of is ONE hash exchange on the by key (the window
    shuffle) — never a range/cross join."""
    from dask_glm_spark.operators.joins import asof_join
    from dask_glm_spark.plans import audit

    left, right, _, _ = _asof_fixture(spark)
    # bucket_seconds=None pins the single-pass shape; the "auto" default
    # would (correctly) bucket this fixture — its handful of keys reads as
    # concentration to the probe, and spreading a low-cardinality key
    # space across time buckets is the desired behavior at scale
    out = asof_join(
        left, right, time_col="t", by="user_id", value_cols=["v"],
        bucket_seconds=None,
    )
    plan = audit.explain_str(out, "simple")
    assert audit.count_exchanges(out) <= 2  # two sides union pre-shuffle
    assert "hashpartitioning(user_id" in plan
    assert "Join" not in plan  # no join operator at all: union + window


def test_range_join_matches_bruteforce(spark):
    """Chunked range join == the naive per-key containment scan, including
    inclusive boundaries and intervals spanning many chunks."""
    import datetime as dt

    import numpy as np

    from dask_glm_spark.operators.joins import range_join

    rng = np.random.RandomState(23)
    base = dt.datetime(2024, 1, 1)
    pts = [
        (int(i), int(rng.randint(0, 4)), base + dt.timedelta(seconds=int(rng.randint(0, 500_000))))
        for i in range(300)
    ]
    ivs = []
    for i in range(60):
        s = int(rng.randint(0, 480_000))
        ivs.append(
            (int(100 + i), int(rng.randint(0, 4)),
             base + dt.timedelta(seconds=s),
             base + dt.timedelta(seconds=s + int(rng.randint(0, 30_000))))
        )
    # exact-boundary case: a point equal to an interval's start and end
    pts.append((9000, 0, ivs[0][2]))
    pts.append((9001, ivs[0][1], ivs[0][3]))
    points = spark.createDataFrame(pts, "pid long, user_id long, ts timestamp")
    intervals = spark.createDataFrame(
        ivs, "iid long, user_id long, session_start timestamp, session_end timestamp"
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, chunk_seconds=3600).collect()
    }
    want = {
        (pid, iid)
        for pid, pu, pt in pts
        for iid, iu, s, e in ivs
        if pu == iu and s <= pt <= e
    }
    assert got == want and len(want) > 100


def test_range_join_is_equi_join_not_theta(spark):
    """Scale pin: the chunked range join plans as a hash/merge EQUI-join on
    (key, chunk) — never BroadcastNestedLoop/Cartesian (the naive theta
    shape whose candidate set is |points| x |intervals| per key)."""
    from dask_glm_spark.operators.joins import range_join
    from dask_glm_spark.plans import audit
    from dask_glm_spark.streaming.scoring import load_events
    from dask_glm_spark.streaming.sessions import sessionize_batch

    ev = load_events(spark, "/root/testdata/sf0.001")
    sess = sessionize_batch(ev, gap_minutes=30).select(
        "user_id", "session_start", "session_end"
    )
    pts = ev.where(F.col("event_type") == "error").select("user_id", "ts")
    out = range_join(pts, sess)
    plan = audit.explain_str(out, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_asof_join_null_payload_returns_matched_row_intact(spark):
    """Review r5: a NULL field in the matched right row must come through
    as NULL — never back-filled from an older row (the whole payload rides
    one struct, so the carry can't stitch two rows together)."""
    from dask_glm_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 0, 20.0)], "lid long, user_id long, t double")
    right = spark.createDataFrame(
        [(3, 0, 5.0, 2.0), (7, 0, 10.0, None)],
        "rid long, user_id long, t double, v double",
    )
    r = asof_join(
        left, right, time_col="t", by="user_id", value_cols=["rid", "v"]
    ).first()
    assert r["rid_asof"] == 7
    assert r["v_asof"] is None


def test_range_join_drops_malformed_intervals_before_explode(spark):
    """ADVICE r5: an interval with end < start matches nothing — but
    F.sequence(floor(start), floor(end)) built a DESCENDING sequence that
    silently replicated the bad row across every spanned chunk. The guard
    filters it before the explode; results are unchanged and a grossly
    inverted interval (spanning thousands of chunks backwards) stays
    cheap."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(1, base + dt.timedelta(hours=1), "p1")],
        "user_id long, ts timestamp, pt_tag string",
    )
    iv = spark.createDataFrame(
        [
            # well-formed: contains the point
            (1, base, base + dt.timedelta(hours=2), "good"),
            # malformed: end 5000 hours BEFORE start
            (1, base + dt.timedelta(hours=5000), base, "bad"),
        ],
        "user_id long, session_start timestamp, session_end timestamp, tag string",
    )
    out = J.range_join(pts, iv).collect()
    assert [r["tag"] for r in out] == ["good"]


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_bucketed_matches_plain(spark, direction):
    """VERDICT r5 skew hardening: the two-pass (by, time-bucket) carry is
    result-identical to the single-window path — including carries across
    bucket borders (bucket=20s over t in [0,100))."""
    from dask_glm_spark.operators.joins import asof_join

    left, right, _, _ = _asof_fixture(spark)
    plain = asof_join(
        left, right, time_col="t", by="user_id",
        value_cols=["rid", "v"], direction=direction,
    ).toPandas().sort_values("lid").reset_index(drop=True)
    bucketed = asof_join(
        left, right, time_col="t", by="user_id",
        value_cols=["rid", "v"], direction=direction, bucket_seconds=20,
    ).toPandas().sort_values("lid").reset_index(drop=True)
    assert plain.equals(bucketed)


def test_asof_join_bucketed_hot_key_and_plan(spark):
    """One user owns 30% of both sides; the bucketed path must (a) agree
    with the plain path and (b) partition its big window by (by, bucket)
    so the hot key spreads across buckets instead of one task's sort."""
    import numpy as np

    from dask_glm_spark.operators.joins import asof_join
    from dask_glm_spark.plans import audit

    rng = np.random.RandomState(3)
    n = 1000
    users = [0 if i < n * 3 // 10 else int(rng.randint(1, 20)) for i in range(n)]
    lrows = [
        (i, users[i], float(rng.uniform(0, 1000))) for i in range(n)
    ]
    rrows = [
        (1_000_000 + i, users[i], float(rng.uniform(0, 1000)), float(i))
        for i in range(n)
    ]
    left = spark.createDataFrame(lrows, "lid long, user_id long, t double")
    right = spark.createDataFrame(
        rrows, "rid long, user_id long, t double, v double"
    )
    plain = asof_join(
        left, right, time_col="t", by="user_id", value_cols=["rid", "v"]
    ).toPandas().sort_values("lid").reset_index(drop=True)
    out = asof_join(
        left, right, time_col="t", by="user_id", value_cols=["rid", "v"],
        bucket_seconds=50,
    )
    bucketed = out.toPandas().sort_values("lid").reset_index(drop=True)
    assert plain.equals(bucketed)
    plan = audit.explain_str(out, "simple")
    assert "hashpartitioning(user_id" in plan and "_bkt" in plan.split(
        "hashpartitioning(user_id", 1
    )[1].split(")")[0]


def test_asof_join_bucketed_property(spark):
    """Property check: bucketed == plain over randomized key/time layouts,
    including duplicate timestamps, keys missing from one side, and bucket
    widths that land rows on exact bucket borders."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dask_glm_spark.operators.joins import asof_join

    @given(
        seed=st.integers(0, 10_000),
        bucket=st.sampled_from([1, 3, 7, 50]),
        direction=st.sampled_from(["backward", "forward"]),
    )
    @settings(max_examples=8, deadline=None)
    def check(seed, bucket, direction):
        rng = np.random.RandomState(seed)
        nl, nr = 60, 40
        # integer-second times: many exact border/tie collisions
        lrows = [
            (i, int(rng.randint(0, 4)), float(rng.randint(0, 120)))
            for i in range(nl)
        ]
        rrows = [
            (1000 + i, int(rng.randint(0, 5)), float(rng.randint(0, 120)),
             float(i))
            for i in range(nr)
        ]
        left = spark.createDataFrame(lrows, "lid long, user_id long, t double")
        right = spark.createDataFrame(
            rrows, "rid long, user_id long, t double, v double"
        )
        kw = dict(time_col="t", by="user_id", value_cols=["rid", "v"],
                  direction=direction)
        plain = (
            asof_join(left, right, **kw)
            .toPandas().sort_values("lid").reset_index(drop=True)
        )
        bucketed = (
            asof_join(left, right, bucket_seconds=bucket, **kw)
            .toPandas().sort_values("lid").reset_index(drop=True)
        )
        assert plain.equals(bucketed)

    check()


def test_asof_join_bucketed_null_keys_carry_across_buckets(spark):
    """Null by keys (the archetypal 'default id' hot key) must carry
    across bucket borders exactly like the plain path — the boundary join
    is null-safe."""
    import datetime as dt

    from dask_glm_spark.operators.joins import asof_join

    base = dt.datetime(2024, 1, 1)

    def mk(h):
        return base + dt.timedelta(hours=h)

    left = spark.createDataFrame(
        [(1, None, mk(5)), (2, None, mk(0)), (3, 7, mk(5))],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, None, mk(1), 1.0), (200, 7, mk(1), 2.0)],
        "rid long, user_id long, ts timestamp, v double",
    )
    for kw in ({}, {"bucket_seconds": 3600}):
        out = {
            r["lid"]: r["rid_asof"]
            for r in asof_join(
                left, right, by="user_id", value_cols=["rid", "v"], **kw
            ).collect()
        }
        # lid=1 (null key, 4 buckets after the right row) matches rid=100;
        # lid=2 precedes it (no match); lid=3 (key 7) matches rid=200.
        assert out == {1: 100, 2: None, 3: 200}, (kw, out)


def test_asof_auto_skew_detection(spark):
    """Round-7 default (`bucket_seconds="auto"`): a head-of-partition probe
    auto-enables the two-pass carry on hot-key data and stays single-pass
    on uniform keys — a 100-TB caller gets skew safety without asking."""
    import numpy as np

    from dask_glm_spark.operators.joins import _asof_skew_probe, asof_join
    from dask_glm_spark.plans import audit
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    n = 1000

    def mk(hot):
        users = [
            0 if (hot and i < n * 3 // 10) else int(rng.randint(1, 50))
            for i in range(n)
        ]
        lrows = [(i, users[i], float(rng.uniform(0, 1000))) for i in range(n)]
        rrows = [
            (1_000_000 + i, users[i], float(rng.uniform(0, 1000)), float(i))
            for i in range(n)
        ]
        left = spark.createDataFrame(lrows, "lid long, user_id long, t double")
        right = spark.createDataFrame(
            rrows, "rid long, user_id long, t double, v double"
        )
        return left, right

    # hot-key data: auto == explicit-bucketed == never-bucketed results,
    # and the auto plan partitions by (user_id, _bkt)
    left, right = mk(hot=True)
    auto = asof_join(left, right, time_col="t", by="user_id", value_cols=["rid", "v"])
    plan = audit.explain_str(auto, "simple")
    assert "hashpartitioning(user_id" in plan and "_bkt" in plan.split(
        "hashpartitioning(user_id", 1
    )[1].split(")")[0]
    never = asof_join(
        left, right, time_col="t", by="user_id", value_cols=["rid", "v"],
        bucket_seconds=None,
    )
    a = auto.toPandas().sort_values("lid").reset_index(drop=True)
    b = never.toPandas().sort_values("lid").reset_index(drop=True)
    assert a.equals(b)

    # uniform keys: probe stays below threshold -> single-pass plan
    left_u, right_u = mk(hot=False)
    auto_u = asof_join(
        left_u, right_u, time_col="t", by="user_id", value_cols=["rid", "v"]
    )
    plan_u = audit.explain_str(auto_u, "simple")
    assert "_bkt" not in plan_u

    # probe numbers directly: hot share ~0.3 vs uniform ~1/50
    u = left.withColumn("_side", F.lit(1)).unionByName(
        right.withColumnRenamed("rid", "rid2"), allowMissingColumns=True
    )
    t_us = (F.col("t").cast("double") * 1_000_000).cast("long")
    share_hot, span = _asof_skew_probe(u, ["user_id"], t_us)
    assert share_hot >= 0.2 and span > 0
    u2 = left_u.unionByName(
        right_u.withColumnRenamed("rid", "rid2"), allowMissingColumns=True
    )
    share_uni, _ = _asof_skew_probe(u2, ["user_id"], t_us)
    assert share_uni < 0.1


def test_asof_auto_probe_skips_shuffle_rooted_sides(spark):
    """Round-8 hardening (r7 verdict #6): the auto probe only reads sides
    where the eager action is cheap. An uncached aggregate is excluded
    (its shuffle is NOT re-executed for the probe); caching it opts back
    in; results are identical either way."""
    from pyspark.sql import functions as F

    from dask_glm_spark.operators.joins import _probe_cheap, asof_join

    left = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(50)],
        "lid long, user_id long, t double",
    )
    raw = spark.createDataFrame(
        [(i, i % 5, float(i), float(i) * 2) for i in range(50)],
        "rid long, user_id long, t double, v double",
    )
    # shuffle-rooted right side: groupBy aggregate
    right = raw.groupBy("user_id", "t").agg(
        F.max("rid").alias("rid"), F.max("v").alias("v")
    )
    assert _probe_cheap(left)          # local relation: exchange-free
    assert not _probe_cheap(right)     # uncached aggregate: not cheap
    cached = right.persist()
    try:
        assert _probe_cheap(cached)    # cached: cheap regardless of plan
        # auto with a non-cheap side still returns correct results
        out_auto = asof_join(
            left, right, time_col="t", by="user_id", value_cols=["rid", "v"]
        )
        out_plain = asof_join(
            left, right, time_col="t", by="user_id",
            value_cols=["rid", "v"], bucket_seconds=None,
        )
        a = out_auto.toPandas().sort_values("lid").reset_index(drop=True)
        b = out_plain.toPandas().sort_values("lid").reset_index(drop=True)
        assert a.equals(b)
    finally:
        cached.unpersist()


def test_asof_join_tolerance_matches_pandas(spark):
    """tolerance_seconds == pandas merge_asof(tolerance=...) on random-ish
    numeric timestamps, single-pass AND forced two-pass paths; stale
    carries null out, in-window matches survive, tolerance=None is the
    plain as-of."""
    import pandas as pd

    from dask_glm_spark.operators.joins import asof_join

    lrows = [
        (u, float(t), i)
        for i, (u, t) in enumerate(
            [("a", 5), ("a", 10), ("a", 30), ("b", 7), ("b", 8), ("c", 1)]
        )
    ]
    rrows = [
        ("a", 4.0, "a4"), ("a", 9.0, "a9"), ("a", 12.0, "a12"),
        ("b", 7.0, "b7"), ("d", 1.0, "d1"),
    ]
    left = spark.createDataFrame(lrows, "user_id string, ts double, eid long")
    right = spark.createDataFrame(rrows, "user_id string, ts double, tag string")

    lpd = pd.DataFrame(lrows, columns=["user_id", "ts", "eid"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["user_id", "ts", "tag"]).sort_values("ts")

    for tol in (2.0, 5.0, None):
        for bseconds in (None, 3):  # single-pass and forced two-pass
            got = {
                r["eid"]: r["tag_asof"]
                for r in asof_join(
                    left, right, time_col="ts", by="user_id",
                    value_cols=["tag"], bucket_seconds=bseconds,
                    tolerance_seconds=tol,
                ).collect()
            }
            want_df = pd.merge_asof(
                lpd, rpd, on="ts", by="user_id",
                tolerance=tol, direction="backward",
            )
            want = {
                int(r.eid): (None if pd.isna(r.tag) else r.tag)
                for r in want_df.itertuples()
            }
            assert got == want, (tol, bseconds)

    # forward direction with tolerance
    got = {
        r["eid"]: r["tag_asof"]
        for r in asof_join(
            left, right, time_col="ts", by="user_id",
            value_cols=["tag"], direction="forward",
            bucket_seconds=None, tolerance_seconds=2.0,
        ).collect()
    }
    want_df = pd.merge_asof(
        lpd, rpd, on="ts", by="user_id", tolerance=2.0, direction="forward"
    )
    want = {
        int(r.eid): (None if pd.isna(r.tag) else r.tag)
        for r in want_df.itertuples()
    }
    assert got == want


def test_asof_join_tolerance_timestamp_type(spark):
    """The tolerance gate's timestamp branch (unix_micros on the carried
    _rts): a 90-second-stale reference nulls out at 60 s tolerance and
    survives at 120 s."""
    import datetime as dt

    from dask_glm_spark.operators.joins import asof_join

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [("a", t0 + dt.timedelta(seconds=90), 1),
         ("a", t0 + dt.timedelta(seconds=30), 2)],
        "user_id string, ts timestamp, eid long",
    )
    right = spark.createDataFrame(
        [("a", t0, "ref0")], "user_id string, ts timestamp, tag string"
    )
    for tol, want1 in ((60.0, None), (120.0, "ref0")):
        got = {
            r["eid"]: r["tag_asof"]
            for r in asof_join(
                left, right, time_col="ts", by="user_id",
                value_cols=["tag"], bucket_seconds=None,
                tolerance_seconds=tol,
            ).collect()
        }
        assert got[1] == want1
        assert got[2] == "ref0"  # 30 s stale: inside both bounds
