"""Unit tests for custom operators (asof join, recursive CTE)."""

import pandas as pd
from pyspark.sql import functions as F


def test_asof_join_backward(spark):
    from databend_spark.operators.asof_join import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 15, "c"), (3, 5, "d")],
        "k int, ts int, v string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 20, 200.0), (2, 30, 300.0)],
        "k int, ts int, payload double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["payload"]
    )
    got = {(r.k, r.ts): r.payload for r in out.collect()}
    # k=1 ts=10 → right ts=5; k=1 ts=20 → right ts=20 (at-or-before);
    # k=2 ts=15 → no right ≤ 15 → null; k=3 → no right rows → null
    assert got == {(1, 10): 100.0, (1, 20): 200.0, (2, 15): None, (3, 5): None}


def test_asof_join_forward(spark):
    from databend_spark.operators.asof_join import asof_join

    left = spark.createDataFrame([(1, 10, "a")], "k int, ts int, v string")
    right = spark.createDataFrame(
        [(1, 5, 1.0), (1, 12, 2.0), (1, 30, 3.0)], "k int, ts int, p double"
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_cols=["p"], direction="forward",
    )
    assert out.collect()[0].p == 2.0


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property check vs pandas.merge_asof on a bigger random-ish frame."""
    from databend_spark.operators.asof_join import asof_join

    ldata = [(i % 7, (i * 37) % 1000, f"l{i}") for i in range(300)]
    rdata = [(i % 7, (i * 61) % 1000, float(i)) for i in range(100)]
    left = spark.createDataFrame(ldata, "k int, ts int, v string")
    right = spark.createDataFrame(rdata, "k int, ts int, p double")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["p"]
    ).toPandas().sort_values(["k", "ts", "v"]).reset_index(drop=True)

    lp = pd.DataFrame(ldata, columns=["k", "ts", "v"]).sort_values("ts")
    rp = pd.DataFrame(rdata, columns=["k", "ts", "p"]).sort_values("ts")
    # break right-side ties deterministically like the window (last wins)
    expected = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    expected = expected.sort_values(["k", "ts", "v"]).reset_index(drop=True)
    assert list(out["p"].fillna(-1)) == list(expected["p"].fillna(-1))


def test_recursive_cte_fixpoint(spark):
    from databend_spark.operators.recursive_cte import recursive_cte

    anchor = spark.createDataFrame([(1,)], "n int")
    out = recursive_cte(
        anchor, lambda df: df.filter(F.col("n") < 10).select((F.col("n") + 1).alias("n"))
    )
    assert sorted(r.n for r in out.collect()) == list(range(1, 11))


def test_recursive_cte_distinct_terminates_on_cycle(spark):
    from databend_spark.operators.recursive_cte import recursive_cte

    # graph with a cycle: 1→2→3→1 ; reachability from 1 must terminate
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src int, dst int")
    anchor = spark.createDataFrame([(1,)], "node int")

    def step(frontier):
        return (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
        )

    out = recursive_cte(anchor, step, distinct=True, max_iterations=10)
    assert sorted(r.node for r in out.collect()) == [1, 2, 3]


def test_agg_index_rewrite_matches_direct(spark, sf_dir, ctx):
    """Aggregating index: a matching GROUP BY query must be answered
    from the partial-aggregate table with identical results — including
    subset-of-group-cols rollups and avg recomposition."""
    from databend_spark.session import register_tables

    register_tables(spark, sf_dir)
    ctx.create_agg_index(
        "li_idx", "lineitem", ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice"],
    )
    q = ("SELECT l_returnflag, sum(l_quantity) AS sq, count(*) AS n, "
         "avg(l_extendedprice) AS ap FROM lineitem GROUP BY l_returnflag")
    direct = {
        (r.l_returnflag, float(r.sq), r.n, round(r.ap, 6))
        for r in spark.sql(q).collect()
    }
    via_idx = {
        (r.l_returnflag, float(r.sq), r.n, round(r.ap, 6))
        for r in ctx.sql(q).collect()
    }
    assert via_idx == direct
    # the rewrite actually fired: plan reads the index table
    from databend_spark.operators.agg_index import try_rewrite

    assert "__aggidx_li_idx" in try_rewrite(q, ctx._agg_indexes)
    # non-matching query (different table) passes through
    assert try_rewrite("SELECT count(*) FROM orders", ctx._agg_indexes) is None
    spark.sql("DROP TABLE IF EXISTS __aggidx_li_idx")


def test_markov_train_model(spark):
    """markov_train: totals/count_end/buckets per context (reference
    aggregate_markov_tarin.rs row shape, context string as key)."""
    from databend_spark.operators.markov import markov_train, transitions

    df = spark.createDataFrame([("abab",), ("ab",)], "s string")
    t = {(r.context, r.next_cp): r.cnt for r in transitions(df, "s", order=2).collect()}
    assert t[("", "a")] == 2          # both strings start with 'a'
    assert t[("ab", "a")] == 1        # abab: pos3 ctx 'ab' → 'a'
    assert t[("ab", "")] == 2         # both strings end after ...'ab'
    m = {r.context: r for r in markov_train(df, "s", order=2).collect()}
    assert m["ab"].total == 3 and m["ab"].count_end == 2
    assert m["ab"].buckets == {"a": 1}
    assert m[""].total == 2 and m[""].count_end == 0


def test_topn_late_materialize_equals_naive(spark, tmp_path):
    """Row-fetch TopN (physical_row_fetch.rs analog): same rows as naive
    ORDER BY/LIMIT over a wide table, but the sort scans 2 columns."""
    from databend_spark.operators.row_fetch import topn_late_materialize

    path = str(tmp_path / "wide")
    wide = spark.range(20_000).selectExpr(
        "id", "xxhash64(id) % 1000000 AS score",
        *[f"concat('v{i}_', id) AS payload{i:02d}" for i in range(30)],
    )
    wide.repartition(4).write.parquet(path)
    df = spark.read.parquet(path)

    got = topn_late_materialize(df, "id", [F.desc("score"), "id"], 10).collect()
    want = df.orderBy(F.desc("score"), "id").limit(10).collect()
    assert [r["id"] for r in got] == [r["id"] for r in want]
    assert got[0].asDict() == want[0].asDict()
    # the narrow pre-pass plan reads only (id, score) from parquet
    narrow = df.select("id", "score").orderBy(F.desc("score")).limit(10)
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" not in plan or "payload00" not in plan


def test_sandbox_guards_untrusted_paths(tmp_path):
    """fs:/// locations parsed from SLT text are cleaned with rmtree —
    the sandbox must refuse anything outside the temp/warehouse roots
    (r8 ADVICE high: a corpus statement naming '/home' must be inert)."""
    import pytest as _pytest

    from databend_spark.testkit.sandbox import (
        ensure_sandboxed,
        is_sandboxed,
        safe_rmtree,
    )

    assert is_sandboxed("/tmp/slt_case_dir")
    assert is_sandboxed(str(tmp_path / "sub"))
    for bad in ("/home", "/root", "/", "/tmp", "/tmp/../etc", "/etc/passwd", ""):
        assert not is_sandboxed(bad), bad
        with _pytest.raises(RuntimeError):
            ensure_sandboxed(bad)
    probe = tmp_path / "probe"
    probe.mkdir()
    safe_rmtree(str(probe))
    assert not probe.exists()
    # outside the sandbox: silently a no-op, target untouched
    safe_rmtree("/root/repo/databend_spark")
    import os

    assert os.path.isdir("/root/repo/databend_spark")


def test_stage_metadata_ddl_allowed_outside_sandbox_access_refused(spark):
    """Out-of-sandbox fs:/// stages: metadata DDL (CREATE/ALTER/DESC/
    DROP) must succeed — base/05_ddl/05_0016 declares url='fs:///' — but
    any filesystem ACCESS through the stage raises 2501 (the r8 ADVICE
    rmtree surface stays closed at the access chokepoints, not at
    registration)."""
    import pytest as _pytest

    from databend_spark.testkit.stage_shim import StageManager

    sm = StageManager(spark)
    run = spark.sql
    sm.try_handle("CREATE STAGE sbx_meta_only url='fs:///';", run)
    st = sm.stages["sbx_meta_only"]
    assert st.sandboxed is False
    with _pytest.raises(RuntimeError, match="2501"):
        sm.list_files(st)
    sm.try_handle(
        "ALTER STAGE sbx_meta_only SET URL = 'fs:///tmp/sbx_meta_ok/';", run
    )
    assert sm.stages["sbx_meta_only"].sandboxed is True
    sm.try_handle("DROP STAGE sbx_meta_only;", run)
    assert "sbx_meta_only" not in sm.stages


def test_read_file_refuses_out_of_sandbox_stage_and_traversal(spark, tmp_path):
    """read_file must not bypass the sandbox chokepoint (r9 ADVICE
    medium): a metadata-only out-of-sandbox stage yields NULL, and a
    '..' traversal out of a sandboxed stage dir yields NULL, while an
    in-stage read still works."""
    from databend_spark.testkit.stage_shim import StageManager

    sm = StageManager(spark)
    run = spark.sql
    sm.try_handle("CREATE STAGE rf_escape url='fs:///';", run)
    assert sm.stages["rf_escape"].sandboxed is False
    inside = tmp_path / "rf_in"
    inside.mkdir()
    (inside / "ok.bin").write_bytes(b"payload")
    sm.try_handle(f"CREATE STAGE rf_in url='fs://{inside}/';", run)
    assert sm.stages["rf_in"].sandboxed is True
    rows = spark.sql(
        "SELECT read_file('@rf_escape/etc/passwd', NULL) AS a, "
        "read_file('@rf_in/../../../etc/passwd', NULL) AS b, "
        "read_file('@rf_in/ok.bin', NULL) AS c"
    ).collect()
    assert rows[0].a is None
    assert rows[0].b is None
    assert bytes(rows[0].c) == b"payload"
    sm.try_handle("DROP STAGE rf_escape;", run)
    sm.try_handle("DROP STAGE rf_in;", run)
