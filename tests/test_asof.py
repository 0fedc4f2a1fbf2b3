"""As-of join operator (operators/asof.py) vs a brute-force oracle."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluent_bit_clp_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "l-a"),
            (1, 25, "l-b"),
            (1, 30, "l-c"),   # ts ties a right row → inclusive match
            (2, 5, "l-d"),    # before any right row → NULL (backward)
            (3, 50, "l-e"),   # key with no right rows at all
        ],
        "k int, ts bigint, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, 8, "r-w"),
            (1, 20, "r-x"),
            (1, 30, "r-y"),
            (2, 7, "r-z"),
        ],
        "k int, ts bigint, rv string",
    )
    return left, right


def test_backward_asof(sides):
    left, right = sides
    got = {
        (r.k, r.ts): (r.ts_right, r.rv)
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert got[(1, 10)] == (8, "r-w")
    assert got[(1, 25)] == (20, "r-x")
    assert got[(1, 30)] == (30, "r-y")  # inclusive <=
    assert got[(2, 5)] == (None, None)  # no prior right row
    assert got[(3, 50)] == (None, None)  # key absent from right
    assert len(got) == 5  # left join: every left row survives


def test_forward_asof(sides):
    left, right = sides
    got = {
        (r.k, r.ts): (r.ts_right, r.rv)
        for r in asof_join(left, right, on=["k"], direction="forward").collect()
    }
    assert got[(1, 10)] == (20, "r-x")  # earliest right >= 10
    assert got[(1, 30)] == (30, "r-y")  # inclusive >=
    assert got[(1, 25)] == (30, "r-y")
    assert got[(2, 5)] == (7, "r-z")
    assert got[(3, 50)] == (None, None)
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], direction="nearest")


def test_asof_matches_brute_force_oracle(spark):
    """Randomized-ish (hash-derived) corpus vs the O(L×R) definition."""
    left = spark.range(200).select(
        (F.col("id") % 7).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(80).select(
        (F.col("id") % 7).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).alias("ts"),
        F.col("id").alias("rid"),
    )
    # dedupe right (k, ts) so the match is uniquely defined
    right = right.groupBy("k", "ts").agg(F.max("rid").alias("rid"))
    got = {
        r.lid: (r.ts_right, r.rid)
        for r in asof_join(left, right, on=["k"]).collect()
    }
    lrows = left.collect()
    rrows = right.collect()
    for lr in lrows:
        cands = [r for r in rrows if r.k == lr.k and r.ts <= lr.ts]
        want = (None, None)
        if cands:
            best = max(cands, key=lambda r: (r.ts, r.rid))
            want = (best.ts, best.rid)
        assert got[lr.lid] == want, lr


def test_asof_single_shuffle_plan(sides):
    """The union-window shape must cost ONE exchange (the window's hash
    partition on the key) — no inequality-join row explosion."""
    left, right = sides
    plan = (
        asof_join(left, right, on=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def _hot_key_sides(spark):
    """ONE key holds every row — the pathological case that serializes a
    single-window as-of join (VERDICT r4 #2)."""
    left = spark.range(500).select(
        F.lit(1).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = (
        spark.range(200)
        .select(
            F.lit(1).alias("k"),
            F.pmod(F.xxhash64("id", F.lit(4)), F.lit(10_000)).alias("ts"),
            F.col("id").alias("rid"),
        )
        .groupBy("k", "ts")
        .agg(F.max("rid").alias("rid"))  # unique (k, ts): match well-defined
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_time_blocks_bit_identical(spark, direction):
    """time_blocks>1 must reproduce the single-window result exactly —
    including cross-block matches (a left row whose match lives in an
    earlier/later block) and no-match NULLs."""
    left, right = _hot_key_sides(spark)
    base = asof_join(left, right, on=["k"], direction=direction)
    split = asof_join(
        left, right, on=["k"], direction=direction, time_blocks=8
    )
    rows = lambda df: sorted(map(tuple, df.collect()))
    assert rows(split) == rows(base)
    with pytest.raises(ValueError, match="time_blocks"):
        asof_join(left, right, on=["k"], time_blocks=0)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_time_blocks_sparse_rights_and_null_ts(spark, direction):
    """The carry must cross EMPTY blocks (rights confined to one end of
    the time range while lefts span it — most blocks hold no right rows)
    and null timestamps must behave exactly as in the single window."""
    left = spark.range(300).select(
        F.lit(1).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(5)), F.lit(80_000)).alias("ts"),
        F.col("id").alias("lid"),
    ).unionByName(
        spark.createDataFrame(
            [(1, None, 9001), (1, None, 9002)], "k int, ts bigint, lid long"
        )
    )
    right = (
        spark.range(60)
        .select(
            F.lit(1).alias("k"),
            # rights only in the first eighth of the time span: with 8
            # blocks, ~7 blocks have no right rows at all
            F.pmod(F.xxhash64("id", F.lit(6)), F.lit(10_000)).alias("ts"),
            F.col("id").alias("rid"),
        )
        .unionByName(
            spark.createDataFrame([(1, None, 777)], "k int, ts bigint, rid long")
        )
        .groupBy("k", "ts")
        .agg(F.max("rid").alias("rid"))
    )
    base = asof_join(left, right, on=["k"], direction=direction)
    split = asof_join(
        left, right, on=["k"], direction=direction, time_blocks=8
    )
    rows = lambda df: sorted(map(tuple, df.collect()), key=str)
    assert rows(split) == rows(base)


def test_asof_time_blocks_parallelizes_hot_key(spark):
    """With one key holding all rows, the blocked window stage must run
    as MULTIPLE tasks (partition spec includes the block column and the
    data actually lands in >1 shuffle partition), where the single-window
    path is one task by construction."""
    left, right = _hot_key_sides(spark)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(coalesce_key, "true")
    prev_b = spark.conf.get(bcast_key)
    try:
        # AQE's small-partition coalescing would merge the tiny test
        # partitions back together, and at THIS corpus size AQE happily
        # broadcasts the big window side of the carry join (both sides
        # are KBs), replacing the partitioning the probe measures — at
        # real scale the window side exceeds any broadcast threshold
        spark.conf.set(coalesce_key, "false")
        spark.conf.set(bcast_key, "-1")
        # keep a window-derived column (ts_right) in the projection —
        # selecting spark_partition_id() alone lets Catalyst prune the
        # whole Window+Exchange and the probe measures the source scan
        def n_window_parts(df):
            # the aggregate must CONSUME a window-derived column
            # (sum(ts_right)) or Catalyst prunes the Window+Exchange away
            # and the pid probe measures the source scan instead; ditto
            # len(collect()) vs .count(), which re-prunes
            return len(
                df.groupBy(F.spark_partition_id().alias("p"))
                .agg(F.sum("ts_right"))
                .collect()
            )

        split = asof_join(left, right, on=["k"], time_blocks=8)
        plan = split._jdf.queryExecution().executedPlan().toString()
        assert "_asof_blk" in plan  # window partitions on (key, block)
        assert n_window_parts(split) > 1
        assert n_window_parts(asof_join(left, right, on=["k"])) == 1
        # plan shape: exactly ONE window runs over the stacked rows
        # (last over _r); the carry window runs over block summaries
        # (last over _bl) — the summary/spine branches are narrow
        # recomputes, never a second stacked window/shuffle
        assert plan.count("last(_r#") == 1
        assert plan.count("last(_bl#") == 1
    finally:
        spark.conf.set(coalesce_key, prev)
        spark.conf.set(bcast_key, prev_b)


def test_pick_time_blocks_unit():
    """B from the skew probe (VERDICT r5 #5): 1 when the hottest key fits
    one task (or the input is empty), else ceil(hot/rows_per_task),
    capped."""
    from fluent_bit_clp_spark.operators.asof import _pick_time_blocks

    assert _pick_time_blocks(None, 1000, 64) == 1  # empty input: max() is None
    assert _pick_time_blocks(0, 1000, 64) == 1
    assert _pick_time_blocks(1000, 1000, 64) == 1
    assert _pick_time_blocks(1001, 1000, 64) == 2
    assert _pick_time_blocks(10_000, 1000, 64) == 10
    assert _pick_time_blocks(10**9, 1000, 64) == 64  # cap


def test_asof_auto_time_blocks_default_splits_hot_key(spark):
    """VERDICT r5 #5 done-criterion: with the DEFAULT time_blocks (None →
    exact skew probe) a pathologically hot key is pre-split without the
    caller anticipating it.  rows_per_task is shrunk so the ~700-row test
    corpus crosses the threshold the way a multi-million-row key would at
    the 2M default; results stay bit-identical to the forced single
    window."""
    left, right = _hot_key_sides(spark)
    auto = asof_join(left, right, on=["k"], rows_per_task=100)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "_asof_blk" in plan  # the probe chose the blocked path
    rows = lambda df: sorted(map(tuple, df.collect()), key=str)
    assert rows(auto) == rows(
        asof_join(left, right, on=["k"], time_blocks=1)
    )
    with pytest.raises(ValueError, match="rows_per_task"):
        asof_join(left, right, on=["k"], rows_per_task=0)


def test_asof_with_map_payload_column(spark):
    """Review fix r4: a map-typed right column (e.g. props) must not
    break the window sort — tie-break uses only orderable columns."""
    left = spark.createDataFrame([(1, 10, "l")], "k int, ts bigint, lv string")
    right = spark.createDataFrame(
        [(1, 5, 100)], "k int, ts bigint, rid bigint"
    ).withColumn("props", F.create_map(F.lit("a"), F.lit("b")))
    got = asof_join(left, right, on=["k"]).collect()[0]
    assert got.ts_right == 5 and got.rid == 100
    assert dict(got.props) == {"a": "b"}


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_time_blocks_null_join_key(spark, direction):
    """Review fix r5: Window.partitionBy groups NULL keys, so the blocked
    carry joins must be null-SAFE — name-list joins silently dropped
    null-key left rows whenever time_blocks > 1."""
    left = spark.createDataFrame(
        [(None, 10, 1), ("k1", 10, 2), (None, 30, 3)],
        "k string, ts bigint, lid int",
    )
    right = spark.createDataFrame(
        [(None, 5, 7), ("k1", 5, 8), (None, 25, 9)],
        "k string, ts bigint, rid int",
    )
    single = {
        (r.lid, r.rid)
        for r in asof_join(left, right, on=["k"], direction=direction).collect()
    }
    blocked = {
        (r.lid, r.rid)
        for r in asof_join(
            left, right, on=["k"], direction=direction, time_blocks=4
        ).collect()
    }
    assert blocked == single
    assert len(blocked) == 3  # the two null-key left rows survive


def test_asof_time_blocks_exact_beyond_double_precision(spark):
    """Review fix r5: block summaries must order by the EXACT timestamp —
    a double cast ties distinct bigints beyond 2^53 (nanosecond-epoch
    longs), the tie falls to the max-payload tie-break, and the FORWARD
    carry (whose window wants the MINIMUM ts of the later block) then
    hands a left row the wrong right payload."""
    base = 1_700_000_000_000_000_000  # ns epoch, ~1.7e18 >> 2^53
    left = spark.createDataFrame(
        [(1, base + 1_000, 1)], "k int, ts bigint, lid int"
    )
    # two rights in a later block, 1 ns apart (tied as double); forward
    # must match the EARLIER one — the max-_tb tie-break would pick the
    # later (rid=21)
    right = spark.createDataFrame(
        [(1, base + 3_000, 20), (1, base + 3_001, 21)],
        "k int, ts bigint, rid int",
    )
    single = asof_join(left, right, on=["k"], direction="forward").collect()[0]
    blocked = asof_join(
        left, right, on=["k"], direction="forward", time_blocks=4
    ).collect()[0]
    assert single.rid == blocked.rid == 20


@settings(max_examples=10, deadline=None)
@given(
    lrows=st.lists(
        st.tuples(
            st.sampled_from([None, "a", "b"]),
            st.one_of(
                st.integers(0, 50),
                st.integers(1_700_000_000_000_000_000,
                            1_700_000_000_000_000_050),
            ),
        ),
        min_size=1, max_size=8,
    ),
    rrows=st.lists(
        st.tuples(
            st.sampled_from([None, "a", "b"]),
            st.one_of(
                st.integers(0, 50),
                st.integers(1_700_000_000_000_000_000,
                            1_700_000_000_000_000_050),
            ),
        ),
        min_size=0, max_size=8,
    ),
    direction=st.sampled_from(["backward", "forward"]),
    blocks=st.sampled_from([2, 5]),
)
def test_asof_blocked_equals_single_property(spark, lrows, rrows, direction,
                                             blocks):
    """Property sweep of the review-found failure space: null keys, tied
    and >2^53 timestamps, empty rights, both directions — blocked must
    equal the single window row-for-row."""
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
        "k string, ts bigint, lid int",
    )
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rrows)],
        "k string, ts bigint, rid int",
    ) if rrows else spark.createDataFrame([], "k string, ts bigint, rid int")
    from collections import Counter

    single = Counter(
        map(tuple, asof_join(left, right, on=["k"],
                             direction=direction).collect())
    )
    blocked = Counter(
        map(tuple, asof_join(left, right, on=["k"], direction=direction,
                             time_blocks=blocks).collect())
    )
    assert blocked == single
