"""100× scale smoke for distributed IRLS logistic regression
(PERFORMANCE.md round 7; operators/glm.logistic_fit).

sf0.1's documents table has ~100k rows; this smoke fits the SAME
operator on a 10M-row synthetic design (100×) with a KNOWN generating
model, then checks the fit recovers the true coefficients.  The point
being demonstrated: each IRLS iteration is ONE map-side moment
aggregate (coefficients broadcast as literals, no shuffle of rows, no
UDF), so per-iteration cost is a corpus scan with map-side combine
and total cost is ~iters scans — the shape that survives 100 TB.

Usage: python tools/smoke_glm_scale.py [n_rows]
Prints one JSON line with wall time and coefficient recovery.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

#: generating model: eta = 0.5 + 1.5*x1 - 0.8*x2
TRUE_BETA = [0.5, 1.5, -0.8]


def main() -> None:
    import pyspark.sql.functions as F

    from clickhub_spark.operators.glm import logistic_fit
    from clickhub_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("smoke-glm")
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic design: two ~N(0,1)-ish features from
    # hash-uniforms (sum of 2 uniforms, centered; variance matched is
    # unnecessary — recovery tolerance below is set for THIS design),
    # labels drawn by comparing a third hash-uniform to sigmoid(eta)
    u = lambda k: (F.abs(F.xxhash64("id", F.lit(k))) % 1_000_000) / 1_000_000.0  # noqa: E731
    base = (
        spark.range(n)
        .select(
            ((u(1) + u(2)) * 1.7 - 1.7).alias("x1"),
            ((u(3) + u(4)) * 1.7 - 1.7).alias("x2"),
            u(5).alias("r"),
        )
        .withColumn(
            "eta",
            F.lit(TRUE_BETA[0])
            + F.lit(TRUE_BETA[1]) * F.col("x1")
            + F.lit(TRUE_BETA[2]) * F.col("x2"),
        )
        .select(
            "x1",
            "x2",
            (
                F.col("r") < F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("eta")))
            )
            .cast("int")
            .alias("y"),
        )
    )
    base.write.mode("overwrite").parquet("/tmp/glm_smoke")
    df = spark.read.parquet("/tmp/glm_smoke")

    t0 = time.time()
    beta = logistic_fit(df, ["x1", "x2"], "y")
    wall = time.time() - t0
    # at 10M samples the standard error is ~1e-3; 0.05 is pure slack
    ok = all(abs(b - t) < 0.05 for b, t in zip(beta, TRUE_BETA))
    print(
        json.dumps(
            {
                "n_rows": n,
                "fit_wall_s": round(wall, 2),
                "iters": 8,
                "beta": [round(b, 4) for b in beta],
                "true_beta": TRUE_BETA,
                "recovered": ok,
            }
        )
    )
    assert ok, beta


if __name__ == "__main__":
    main()
