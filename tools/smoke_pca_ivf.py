"""PCA→IVF composition smoke: project 100k 64-dim vectors to 16
PCA dims, build the IVF index in REDUCED space, and measure probe
cost + recall@10 against full-space brute-force truth.  The point of
the composition at 100 TB: every stored code and every distance
computation shrinks by d/k, and the index build's shuffle moves k-dim
rows, not d-dim ones.  Prints one JSON line for PERFORMANCE.md."""

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from clickhub_spark.operators import knn  # noqa: E402
from clickhub_spark.operators.pca import fit_pca, transform_pca  # noqa: E402
from clickhub_spark.session import get_spark  # noqa: E402

N, D = 100_000, 64
KPC = int(sys.argv[1]) if len(sys.argv) > 1 else 16
NPROBE = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    spark = get_spark("smoke-pca-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"k_pca": KPC, "nprobe": NPROBE}
    # cluster-structured deterministic vectors (the realistic ANN
    # workload): 200 centers + small per-id noise
    emb = (
        spark.range(1, N + 1)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {D-1}), j -> cast("
                "sin((id % 200) * (j + 1) * 1.17) * (4.0 / sqrt(j + 1))"
                " + sin(id * (j + 13) * 1.37) * 0.25 as double))"
            ).alias("embedding"),
        )
        .repartition(32)
        .cache()
    )
    emb.count()

    t0 = time.time()
    mean, comps, ev = fit_pca(emb, "embedding", KPC)
    out["fit_sec"] = round(time.time() - t0, 3)
    # cosine is not translation-invariant: project WITHOUT centering
    # (axes still from the centered fit) so subspace dot products
    # approximate full-space ones
    red = transform_pca(
        emb, "embedding", np.zeros(D), comps, out_col="pca", ndigits=None
    )
    red = red.select("vec_id", F.col("pca").alias("embedding")).cache()
    red.count()

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        knn.build_ivf_index(red, td + "/ivf16", n_cells=64)
        out["ivf_build_reduced_sec"] = round(time.time() - t0, 3)

        # truth: brute top-10 in FULL space for one probe vector
        qrow = emb.where(F.col("vec_id") == 12345).first()
        qfull = np.asarray(qrow.embedding)
        t0 = time.time()
        truth = {
            r.vec_id for r in knn.brute_force_topk(emb, 12345, k=10).collect()
        }
        out["brute_full_sec"] = round(time.time() - t0, 3)

        qred = qfull @ comps.T
        t0 = time.time()
        got = {
            r.vec_id
            for r in knn.ivf_probe_topk(
                spark,
                td + "/ivf16",
                list(map(float, qred)),
                k=10,
                nprobe=NPROBE,
                exclude_id=12345,
            ).collect()
        }
        out["ivf_probe_reduced_sec"] = round(time.time() - t0, 3)
        out["recall_at_10_reduced"] = round(len(truth & got) / 10, 2)

        # two-stage retrieval (the production shape): top-100
        # CANDIDATES in reduced space, re-ranked by full-space cosine
        # — the re-rank touches 100 rows, not 100k
        t0 = time.time()
        cand_ids = [
            r.vec_id
            for r in knn.ivf_probe_topk(
                spark,
                td + "/ivf16",
                list(map(float, qred)),
                k=100,
                nprobe=NPROBE,
                exclude_id=12345,
            ).collect()
        ]
        from clickhub_spark.functions.vectors import as_double, cosine

        qlit = F.array(*[F.lit(float(x)) for x in qfull])
        rer = (
            emb.where(F.col("vec_id").isin(cand_ids))
            .select(
                "vec_id",
                cosine(as_double(F.col("embedding")), qlit).alias("sim"),
            )
            .orderBy(F.col("sim").desc(), F.col("vec_id"))
            .limit(10)
        )
        got2 = {r.vec_id for r in rer.collect()}
        out["two_stage_sec"] = round(time.time() - t0, 3)
        out["recall_at_10_two_stage"] = round(len(truth & got2) / 10, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
