"""ClickHouse PROJECTION analog (sources/projections.py): routing
picks the right copy, pruning actually appears in the routed plan,
and merge re-aggregation equals a base-table aggregate."""

import pyspark.sql.functions as F
import pytest

from clickhub_spark.sources.projections import (
    AggProjection,
    SortProjection,
    materialize,
    read_for_agg,
    read_for_filter,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def proj_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("proj") / "orders")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    materialize(
        orders,
        base,
        [
            SortProjection(
                "by_priority", sort_cols=("o_orderdate",), partition_by="o_orderpriority"
            ),
            SortProjection("by_date", sort_cols=("o_orderdate", "o_orderkey")),
            AggProjection(
                "rollup",
                group_cols=("o_orderpriority", "o_orderstatus"),
                aggs={
                    "total": ("sum", "o_totalprice"),
                    "n": ("count", "o_orderkey"),
                    "mx": ("max", "o_totalprice"),
                    "mn": ("min", "o_totalprice"),
                },
            ),
        ],
    )
    return base


def test_partition_predicate_routes_to_partitioned_copy(spark, proj_dir):
    _, chosen = read_for_filter(spark, proj_dir, ["o_orderpriority"])
    assert chosen == "by_priority"


def test_sort_predicate_routes_to_sorted_copy(spark, proj_dir):
    _, chosen = read_for_filter(spark, proj_dir, ["o_orderdate"])
    assert chosen == "by_date"


def test_unmatched_predicate_falls_back_to_base(spark, proj_dir):
    _, chosen = read_for_filter(spark, proj_dir, ["o_custkey"])
    assert chosen == "base"


def test_routed_copy_is_row_identical_and_pruned(spark, proj_dir):
    routed, chosen = read_for_filter(spark, proj_dir, ["o_orderpriority"])
    filtered = routed.where(F.col("o_orderpriority") == "1-URGENT")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    base = spark.read.parquet(f"{SF_DIR}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    assert filtered.count() == base.count()


def test_agg_route_merges_partial_states_without_fact_scan(spark, proj_dir):
    merged, chosen = read_for_agg(
        spark,
        proj_dir,
        ["o_orderpriority"],
        {
            "total": ("sum", "o_totalprice"),
            "n": ("count", "o_orderkey"),
            "mx": ("max", "o_totalprice"),
            "mn": ("min", "o_totalprice"),
        },
    )
    assert chosen == "rollup"
    assert all("proj_rollup" in f for f in merged.inputFiles())
    base = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(
            F.sum("o_totalprice").alias("total"),
            F.count("o_orderkey").alias("n"),
            F.max("o_totalprice").alias("mx"),
            F.min("o_totalprice").alias("mn"),
        )
    )
    got = {r["o_orderpriority"]: r for r in merged.collect()}
    want = {r["o_orderpriority"]: r for r in base.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["mx"] == want[k]["mx"]
        assert got[k]["mn"] == want[k]["mn"]
        # sum of partial double sums vs one global sum: ulp tolerance
        assert abs(got[k]["total"] - want[k]["total"]) < 1e-6 * abs(want[k]["total"])


def test_agg_route_falls_back_when_agg_not_stored(spark, proj_dir):
    _, chosen = read_for_agg(
        spark, proj_dir, ["o_orderpriority"], {"avg_p": ("sum", "o_custkey")}
    )
    assert chosen == "base"


def test_non_mergeable_agg_rejected(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    with pytest.raises(ValueError, match="non-mergeable"):
        materialize(
            orders,
            str(tmp_path / "bad"),
            [AggProjection("bad", ("o_orderstatus",), {"a": ("avg", "o_totalprice")})],
        )


def test_zorder_write_gives_locality_in_both_dims(spark, tmp_path):
    """Z-order vs single-key sort: sorting by x gives disjoint per-file
    x ranges but full-span y ranges (a y-predicate reads every file);
    the Morton layout shrinks per-file spans in BOTH dimensions, so
    min/max stats prune on whichever column the query filters."""
    import glob

    from clickhub_spark.sources.writer import write_zordered

    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x int, y int")
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, ["x", "y"], bits=6, target_files=16)
    # single-key comparison layout at the same file count (explicit
    # count: AQE would otherwise coalesce this tiny table to 1 file)
    (df.repartitionByRange(16, F.col("x")).sortWithinPartitions("x")
       .write.mode("overwrite").parquet(spath))

    def spans(path):
        sx, sy, nf = 0.0, 0.0, 0
        for f in glob.glob(path + "/*.parquet"):
            p = spark.read.parquet(f)
            r = p.agg(
                F.min("x"), F.max("x"), F.min("y"), F.max("y")
            ).first()
            sx += r[1] - r[0]
            sy += r[3] - r[2]
            nf += 1
        return sx / nf / (n - 1), sy / nf / (n - 1), nf

    zx, zy, zn = spans(zpath)
    sx, sy, sn = spans(spath)
    assert zn > 4 and sn > 4  # multiple files, or spans are trivial
    # layout must not change content
    got = spark.read.parquet(zpath)
    assert got.count() == n * n and got.agg(F.sum("x")).first()[0] == df.agg(F.sum("x")).first()[0]
    # single-key sort: x clustered, y unclustered (≈ full span)
    assert sx < 0.35 and sy > 0.9
    # z-order: BOTH dims well under full span
    assert zx < 0.55 and zy < 0.55


def test_numeric_string_partition_route_is_row_identical(spark, tmp_path):
    """Round-12 review finding: hive partition-column TYPE INFERENCE
    rewrote a numeric-string partition value ('07' -> int 7) and moved
    the column to the end of the schema, so a string filter matched
    rows on the base route and ZERO rows on the projection route.
    read_for_filter now reads projections under the base's schema."""
    base = str(tmp_path / "evts")
    df = spark.createDataFrame(
        [(i, f"{i % 3:02d}", float(i)) for i in range(60)],
        "id long, bucket string, v double",
    )
    materialize(df, base, [
        SortProjection("by_bucket", sort_cols=("id",), partition_by="bucket"),
    ])
    routed, name = read_for_filter(spark, base, ["bucket"])
    assert name == "by_bucket"
    assert routed.columns == df.columns  # base column ORDER preserved
    assert dict(routed.dtypes)["bucket"] == "string"
    got = routed.where(F.col("bucket") == "07").count()
    assert got == df.where(F.col("bucket") == "07").count()
    # and a value that exists: '01' has 20 rows
    assert routed.where(F.col("bucket") == "01").count() == 20
