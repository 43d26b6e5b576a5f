"""largestTriangleThreeBuckets (operators/lttb.py) — endpoint/bucket
structure, hand-computable selections, pass-through, determinism under
x ties, NULL drops, and a reference-implementation equivalence sweep
(the certification query q_agg_lttb_cert re-verifies the greedy
recurrence distributed; these pin the operator locally)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from clickhub_spark.operators.lttb import bucket_of, lttb


def _df(spark, rows):
    # rows: (series, x, y)
    return spark.createDataFrame(
        [(s, i, float(x), None if y is None else float(y)) for i, (s, x, y) in enumerate(rows)],
        "series string, event_id long, x double, y double",
    )


def _ref_lttb(points, n_out):
    """Single-process reference (mirrors the operator's ceil-boundary
    bucket split, written independently of numpy)."""
    pts = sorted(points)
    n = len(pts)
    if n <= n_out:
        return list(range(n))
    nb = n_out - 2
    bound = [-((-b * (n - 2)) // nb) for b in range(nb + 1)]
    sel = [0]
    ax, ay = pts[0]
    for b in range(nb):
        s, e = bound[b] + 1, bound[b + 1] + 1
        if b + 1 < nb:
            nxt = pts[bound[b + 1] + 1 : bound[b + 2] + 1]
            cx = sum(p[0] for p in nxt) / len(nxt)
            cy = sum(p[1] for p in nxt) / len(nxt)
        else:
            cx, cy = pts[n - 1]
        best, best_a = s, -1.0
        for j in range(s, e):
            a = abs((ax - cx) * (pts[j][1] - ay) - (ax - pts[j][0]) * (cy - ay))
            if a > best_a:
                best, best_a = j, a
        sel.append(best)
        ax, ay = pts[best]
    sel.append(n - 1)
    return sel


def test_passthrough_and_endpoints(spark):
    rows = [("a", x, x * 2.0) for x in range(5)]
    out = lttb(_df(spark, rows), "series", "x", "y", 10).collect()
    assert len(out) == 5
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(range(5))

    rows = [("b", x, float(x % 7)) for x in range(50)]
    out = sorted(
        lttb(_df(spark, rows), "series", "x", "y", 10).collect(),
        key=lambda r: r.rank,
    )
    assert len(out) == 10
    assert out[0].rank == 0 and out[0].bucket == -1
    assert out[-1].rank == 49 and out[-1].bucket == 9
    assert [r.bucket for r in out[1:-1]] == list(range(8))


def test_known_selection_peak(spark):
    # flat series with one spike: the spike's bucket must select it
    rows = [("s", x, 100.0 if x == 25 else 0.0) for x in range(50)]
    out = lttb(_df(spark, rows), "series", "x", "y", 10).collect()
    assert any(r.rank == 25 and r.y == 100.0 for r in out)


def test_null_xy_rows_dropped(spark):
    rows = [("n", x, None if x % 2 else float(x)) for x in range(8)]
    out = lttb(_df(spark, rows), "series", "x", "y", 10).collect()
    assert len(out) == 4 and all(r.y is not None for r in out)


def test_deterministic_under_x_ties(spark):
    rows = [("t", x // 2, float(x % 3)) for x in range(40)]  # every x twice
    df = _df(spark, rows)
    a = sorted(
        lttb(df, "series", "x", "y", 8, order_cols=["event_id"]).collect(),
        key=lambda r: r.rank,
    )
    b = sorted(
        lttb(
            df.repartition(7), "series", "x", "y", 8, order_cols=["event_id"]
        ).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.rank, r.x, r.y) for r in a] == [(r.rank, r.x, r.y) for r in b]


def test_matches_reference_sweep(spark):
    rng = random.Random(7)
    cases = []
    for s in range(6):
        n = rng.choice([3, 4, 19, 20, 21, 37, 100])
        pts = []
        x = 0.0
        for _ in range(n):
            x += rng.choice([1.0, 2.0, 5.0])
            pts.append((x, rng.uniform(-10, 10)))
        cases.append((f"s{s}", pts))
    rows = [(s, x, y) for s, pts in cases for x, y in pts]
    out = lttb(_df(spark, rows), "series", "x", "y", 20)
    got = {}
    for r in out.collect():
        got.setdefault(r.series, []).append(r.rank)
    for s, pts in cases:
        assert sorted(got[s]) == sorted(_ref_lttb(pts, 20)), s


def test_bucket_of_matches_operator_split(spark):
    # the SQL-side bucket recomputation partitions interior ranks
    # exactly as the fit's ceil boundaries do
    for n, n_out in [(21, 20), (50, 10), (100, 20), (23, 4), (1000, 20)]:
        nb = n_out - 2
        bound = [-((-b * (n - 2)) // nb) for b in range(nb + 1)]
        want = {}
        for b in range(nb):
            for j in range(bound[b], bound[b + 1]):
                want[j + 1] = b  # rank = interior index + 1
        df = spark.range(n).select(
            F.col("id").alias("rank"), F.lit(n).alias("n")
        )
        got = {
            r.rank: r.b
            for r in df.select(
                "rank", bucket_of(F.col("rank"), F.col("n"), n_out).alias("b")
            ).collect()
        }
        for rank in range(1, n - 1):
            assert got[rank] == want[rank], (n, n_out, rank)
        assert got[0] == -1 and got[n - 1] == n_out - 1


def test_n_out_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="n_out"):
        lttb(_df(spark, [("a", 1, 1.0)]), "series", "x", "y", 2)
