"""Bucketed co-located joins: pre-bucketing both sides of a recurring
join key eliminates the per-query shuffle — the storage-layout lever
for repeated 100 TB fact-fact joins (task brief: "co-locate joins via
bucketing").
"""

import shutil

import pytest

from bend_archiver_spark.tables import load_table


def _clean(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a managed-table location surviving from a previous session blocks
    # saveAsTable even after DROP (the in-memory catalog forgot it)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    _clean(spark)
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield
    _clean(spark)


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, sf_dir, bucketed_tables):
        # disable broadcast so the planner must consider the shuffle
        # path — which the bucket layout then eliminates (with
        # broadcast on, these small tables short-circuit to BHJ and
        # bucketing is "disabled by query planner")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_orders").join(
                spark.table("b_lineitem"), "o_orderkey"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located: the join consumes the bucket layout directly —
            # no hash-partitioning exchange on either side
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            assert "Bucketed: true" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_bucketed_join_result_matches_plain(self, spark, sf_dir, bucketed_tables):
        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        plain = orders.join(li, "o_orderkey").count()
        bucketed = (
            spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        ).count()
        assert plain == bucketed
