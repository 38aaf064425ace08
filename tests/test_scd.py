"""SCD Type 2 operator tests: crafted-feed semantics, late-data
order-insensitivity, replay idempotence, and the single-Exchange plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from databricks_etl_pipelines_spark.operators.scd import (
    scd2_apply,
    scd2_history,
)
from databricks_etl_pipelines_spark.sources.managed_table import ManagedTable


def _ts(d: int) -> datetime:
    return datetime(2024, 1, d)


def _feed(spark, rows):
    return spark.createDataFrame(
        rows, "k int, attr string, tier int, ts timestamp, obs_id int"
    )


BASE_ROWS = [
    # key 1: A,A → B → A  (run collapse, change, revert = new version)
    (1, "A", 1, _ts(1), 1),
    (1, "A", 1, _ts(2), 2),
    (1, "B", 1, _ts(3), 3),
    (1, "A", 1, _ts(4), 4),
    # key 2: NULL handling — NULL==NULL holds the run open, NULL→X closes
    (2, None, 5, _ts(1), 5),
    (2, None, 5, _ts(2), 6),
    (2, "X", 5, _ts(3), 7),
    # key 3: single observation stays one open version
    (3, "Z", 9, _ts(1), 8),
    # key 4: same-ts tie broken by obs_id (total order across engines)
    (4, "P", 0, _ts(1), 10),
    (4, "Q", 0, _ts(1), 9),
]


def test_scd2_history_crafted_feed(spark):
    hist = scd2_history(
        _feed(spark, BASE_ROWS),
        keys=["k"],
        attrs=["attr", "tier"],
        ts_col="ts",
        tiebreak=["obs_id"],
    )
    rows = {
        (r.k, r.scd_version): r
        for r in hist.orderBy("k", "scd_version").collect()
    }
    assert len(rows) == 3 + 2 + 1 + 2
    k1 = [rows[(1, v)] for v in (1, 2, 3)]
    assert [r.attr for r in k1] == ["A", "B", "A"]
    assert k1[0].n_obs == 2 and k1[0].effective_from == _ts(1)
    assert k1[0].effective_to == _ts(3)  # closed by the B version
    assert k1[2].is_current and k1[2].effective_to is None
    # NULL run collapses, then closes when a non-NULL arrives
    assert rows[(2, 1)].attr is None and rows[(2, 1)].n_obs == 2
    assert rows[(2, 2)].attr == "X" and rows[(2, 2)].is_current
    # single observation: open from its own ts
    assert rows[(3, 1)].is_current and rows[(3, 1)].effective_from == _ts(1)
    # tie at same ts: obs_id 9 (Q) precedes obs_id 10 (P)
    assert rows[(4, 1)].attr == "Q" and rows[(4, 2)].attr == "P"
    assert rows[(4, 2)].is_current


def test_scd2_history_plan_single_exchange(spark):
    hist = scd2_history(
        _feed(spark, BASE_ROWS),
        keys=["k"],
        attrs=["attr", "tier"],
        ts_col="ts",
        tiebreak=["obs_id"],
    )
    hist.collect()
    plan = hist._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    assert final.count("Exchange hashpartitioning") == 1


def test_scd2_apply_late_data_matches_batch(spark, tmp_path):
    """Batch 2 delivers observations that fall BETWEEN batch 1's: the
    incremental dim must equal the one-shot history of the full feed
    (minus n_obs, which the set-semantics apply path doesn't track)."""
    late = [r for r in BASE_ROWS if r[4] % 2 == 0]
    first = [r for r in BASE_ROWS if r[4] % 2 == 1]
    log = ManagedTable(str(tmp_path / "log"))
    dim = ManagedTable(str(tmp_path / "dim"))
    for batch in (first, late):
        scd2_apply(
            spark,
            log,
            dim,
            _feed(spark, batch),
            keys=["k"],
            attrs=["attr", "tier"],
            ts_col="ts",
            tiebreak=["obs_id"],
        )
    expected = scd2_history(
        _feed(spark, BASE_ROWS),
        keys=["k"],
        attrs=["attr", "tier"],
        ts_col="ts",
        tiebreak=["obs_id"],
        with_counts=False,
    )
    got = dim.read(spark).select(*expected.columns)
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()
    # late arrival split key 1's history: versions were re-stitched
    assert (
        dim.read(spark).filter((F.col("k") == 1) & F.col("is_current"))
        .select("attr").first().attr
        == "A"
    )


def test_scd2_apply_replay_idempotent(spark, tmp_path):
    log = ManagedTable(str(tmp_path / "log"))
    dim = ManagedTable(str(tmp_path / "dim"))
    for _ in range(2):  # same batch delivered twice (foreachBatch replay)
        scd2_apply(
            spark,
            log,
            dim,
            _feed(spark, BASE_ROWS),
            keys=["k"],
            attrs=["attr", "tier"],
            ts_col="ts",
            tiebreak=["obs_id"],
        )
    got = dim.read(spark)
    expected = scd2_history(
        _feed(spark, BASE_ROWS),
        keys=["k"],
        attrs=["attr", "tier"],
        ts_col="ts",
        tiebreak=["obs_id"],
        with_counts=False,
    ).select(*got.columns)
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()


def test_scd2_apply_prunes_untouched_buckets(spark, tmp_path):
    """A second batch touching one key must not rewrite every dim bucket:
    the MERGE commit records fewer buckets rewritten than exist."""
    log = ManagedTable(str(tmp_path / "log"))
    dim = ManagedTable(str(tmp_path / "dim"))
    scd2_apply(
        spark, log, dim, _feed(spark, BASE_ROWS),
        keys=["k"], attrs=["attr", "tier"], ts_col="ts",
        tiebreak=["obs_id"],
    )
    scd2_apply(
        spark, log, dim,
        _feed(spark, [(1, "C", 1, _ts(9), 99)]),
        keys=["k"], attrs=["attr", "tier"], ts_col="ts",
        tiebreak=["obs_id"],
    )
    from databricks_etl_pipelines_spark.sources.managed_table import _read_log

    last = _read_log(dim.root)[-1]
    assert last["operation"] == "merge"
    assert last["buckets_rewritten"] == 1
    cur = dim.read(spark).filter((F.col("k") == 1) & F.col("is_current"))
    assert cur.select("attr").first().attr == "C"


def test_cdc_apply_tombstones_and_late_updates(spark, tmp_path):
    """SCD1 APPLY CHANGES: last-write-wins by (ts, lsn), deletes persist
    as tombstones so a LATE update older than an applied delete stays
    dead, and replaying a batch changes nothing."""
    from databricks_etl_pipelines_spark.operators.scd import (
        cdc_apply,
        cdc_read_current,
    )

    def feed(rows):
        return spark.createDataFrame(
            rows, "k int, ts timestamp, lsn int, op string, v string"
        )

    dim = ManagedTable(str(tmp_path / "dim"))
    apply = lambda rows: cdc_apply(  # noqa: E731
        spark, dim, feed(rows), ["k"], "ts", "lsn", "op"
    )

    # batch 1: k1 updated then deleted; k2 two updates same ts (lsn wins);
    # k3 plain update
    apply([
        (1, _ts(2), 2, "U", "a"),
        (1, _ts(5), 5, "D", None),
        (2, _ts(3), 3, "U", "x"),
        (2, _ts(3), 4, "U", "y"),
        (3, _ts(1), 1, "U", "z"),
    ])
    cur = {r.k: r for r in cdc_read_current(dim, spark).collect()}
    assert 1 not in cur              # tombstoned
    assert cur[2].v == "y"           # ts tie -> higher lsn wins
    assert cur[3].v == "z"

    # batch 2 (late data): k1 update OLDER than the delete -> stays dead;
    # k3 newer update wins; k4 appears
    apply([
        (1, _ts(3), 3, "U", "ghost"),
        (3, _ts(9), 9, "U", "z2"),
        (4, _ts(1), 6, "U", "new"),
    ])
    cur = {r.k: r for r in cdc_read_current(dim, spark).collect()}
    assert 1 not in cur
    assert cur[3].v == "z2" and cur[4].v == "new"

    # replay batch 2 verbatim: no state change
    before = sorted(map(tuple, dim.read(spark).collect()))
    apply([
        (1, _ts(3), 3, "U", "ghost"),
        (3, _ts(9), 9, "U", "z2"),
        (4, _ts(1), 6, "U", "new"),
    ])
    assert sorted(map(tuple, dim.read(spark).collect())) == before

    # un-delete: an update NEWER than the tombstone resurrects the key
    apply([(1, _ts(8), 8, "U", "back")])
    cur = {r.k: r for r in cdc_read_current(dim, spark).collect()}
    assert cur[1].v == "back"


def test_scd2_history_with_deletes(spark):
    """Deletes close intervals at the delete ts and leave gaps: version
    numbering skips the delete run, re-observation reopens a new
    version, and a key ending in a delete has no current row."""
    from databricks_etl_pipelines_spark.operators.scd import scd2_history

    rows = [
        (1, "A", _ts(1), 1, "U"),
        (1, None, _ts(3), 2, "D"),   # closes A at day 3
        (1, "B", _ts(5), 3, "U"),    # reopens after a 2-day gap
        (2, "X", _ts(1), 4, "U"),
        (2, None, _ts(2), 5, "D"),   # key 2 ends deleted
    ]
    hist = scd2_history(
        spark.createDataFrame(
            rows, "k int, attr string, ts timestamp, obs_id int, op string"
        ),
        keys=["k"], attrs=["attr"], ts_col="ts", tiebreak=["obs_id"],
        op_col="op",
    )
    got = {(r.k, r.scd_version): r for r in hist.collect()}
    assert set(got) == {(1, 1), (1, 3), (2, 1)}  # delete runs absent
    assert got[(1, 1)].effective_to == _ts(3) and not got[(1, 1)].is_current
    assert got[(1, 3)].effective_from == _ts(5) and got[(1, 3)].is_current
    assert got[(2, 1)].effective_to == _ts(2)
    assert not any(r.is_current for r in [got[(2, 1)]])


def test_cdc_stream_apply_processing_time_matches_available_now(
    spark, tmp_path
):
    """Streaming CDC under the production interval trigger: a bounded
    3-file feed drained via stop_after_drained must yield the same dim
    state as the availableNow drain (the fold is order-insensitive and
    replay-safe, so the trigger mode is invisible in the result)."""
    from databricks_etl_pipelines_spark.operators.scd import (
        cdc_read_current,
        cdc_stream_apply,
    )
    from databricks_etl_pipelines_spark.streaming.structured import (
        await_drained,
        stop_after_drained,
    )

    rows = [
        (1, _ts(2), 2, "U", "a"),
        (1, _ts(5), 5, "D", None),
        (2, _ts(3), 3, "U", "x"),
        (2, _ts(4), 4, "U", "y"),
        (3, _ts(1), 1, "U", "z"),
        (3, _ts(6), 6, "U", "w"),
    ]
    feed = spark.createDataFrame(
        rows, "k int, ts timestamp, lsn int, op string, v string"
    )
    src = str(tmp_path / "src")
    feed.repartition(3).write.parquet(src)
    n_src = len(rows)

    def run(trigger_kw, drain, dim_name, ckpt_name):
        stream = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        dim = ManagedTable(str(tmp_path / dim_name))
        q = cdc_stream_apply(
            stream, dim, keys=["k"], ts_col="ts", lsn_col="lsn",
            op_col="op", checkpoint_dir=str(tmp_path / ckpt_name),
            **trigger_kw,
        )
        drain(q)
        return {
            r.k: (r.ts, r.lsn, r.v)
            for r in cdc_read_current(dim, spark).collect()
        }

    pt = run(
        {"processing_time": "1 second"},
        lambda q: stop_after_drained(q, expected_rows=n_src, timeout_s=120),
        "dim_pt", "ckpt_pt",
    )
    an = run({}, await_drained, "dim_an", "ckpt_an")
    assert pt == an
    assert set(pt) == {2, 3}  # k1 tombstoned
