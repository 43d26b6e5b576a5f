"""Binned range-join family (operators/rangejoin.py)."""

def test_interval_overlap_join_owner_bin_dedup(spark):
    # pairs sharing MANY bins must appear exactly once; half-open
    # semantics: touching intervals ([0,10) vs [10,20)) do NOT overlap
    from clickhub_spark.operators.rangejoin import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 0, 100), (2, 50, 60), (3, 200, 210)], "id_a long, sa long, ea long"
    )
    b = spark.createDataFrame(
        [(10, 90, 150), (11, 0, 100), (12, 100, 110), (13, 205, 206)],
        "id_b long, sb long, eb long",
    )
    rows = sorted(
        (r.id_a, r.id_b)
        for r in interval_overlap_join(a, b, "sa", "ea", "sb", "eb", 7).collect()
    )
    # 1x10 overlap [90,100); 1x11 full overlap (many shared bins, once);
    # 2x11 nested; 3x13 nested; 1x12 touches at 100 only -> excluded
    assert rows == [(1, 10), (1, 11), (2, 11), (3, 13)]


def test_fractional_bounds_covered(spark):
    # the floor((end-1)/w) form under-covered fractional intervals;
    # _last_bin must reach the end's true bin
    from clickhub_spark.operators.rangejoin import (
        interval_overlap_join,
        point_in_interval_join,
    )

    pts = spark.createDataFrame([(10.3,), (9.9,), (10.5,)], "p double")
    iv = spark.createDataFrame([(9.8, 10.5)], "s double, e double")
    got = sorted(r.p for r in point_in_interval_join(pts, iv, "p", "s", "e", 10).collect())
    assert got == [9.9, 10.3]  # 10.5 excluded (half-open), 10.3 KEPT
    a = spark.createDataFrame([(1, 0.0, 10.5)], "id_a long, sa double, ea double")
    b = spark.createDataFrame([(2, 10.2, 20.0)], "id_b long, sb double, eb double")
    assert interval_overlap_join(a, b, "sa", "ea", "sb", "eb", 10).count() == 1


def test_outer_how_refused(spark):
    import pytest as _pytest

    from clickhub_spark.operators.rangejoin import point_in_interval_join

    pts = spark.createDataFrame([(1.0,)], "p double")
    iv = spark.createDataFrame([(0.0, 2.0)], "s double, e double")
    with _pytest.raises(ValueError, match="inner"):
        point_in_interval_join(pts, iv, "p", "s", "e", 10, how="left")


def test_overlap_join_rejects_column_clash(spark):
    # ADVICE r5: shared column names between the two sides used to
    # surface as an ambiguous-reference resolution error deep inside
    # the residual predicates; now a clear up-front ValueError.
    import pytest

    from clickhub_spark.operators.rangejoin import interval_overlap_join

    a = spark.createDataFrame([(1, 0, 10)], "id long, s long, e long")
    b = spark.createDataFrame([(2, 5, 15)], "id long, s long, e long")
    with pytest.raises(ValueError, match=r"disjoint.*\['e', 'id', 's'\]"):
        interval_overlap_join(a, b, "s", "e", "s", "e", 4)
