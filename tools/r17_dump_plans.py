"""Dump explain('formatted') for every bench-tracked query to
plans/r17/<name>_before.txt (round-17 optimization evidence)."""
import os, sys, io, contextlib
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from clickhub_spark.plans import all_specs
from clickhub_spark.session import get_spark
import bench

names = list(bench.HEADLINE) + [f"q_tpch_q{i}" for i in range(1, 23)]
# pipeline list is defined inline in main(); re-derive it
import re
src = open("/root/repo/bench.py").read()
m = re.search(r"pipeline = \[(.*?)\n    \]", src, re.S)
pipe = re.findall(r'"(q_[a-z0-9_]+)"', m.group(1))
names += [n for n in pipe if n not in names]

spark = get_spark("r17-plans")
spark.sparkContext.setLogLevel("ERROR")
specs = all_specs()
sf = os.environ["SPARK_GRAFT_SF_DIR"]
out_dir = "/root/repo/plans/r17"
suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
for n in names:
    if n not in specs or (only and n not in only):
        continue
    try:
        df = specs[n].builder(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"{out_dir}/{n}_{suffix}.txt", "w") as fh:
            fh.write(buf.getvalue())
        print("ok", n)
    except Exception as e:
        print("FAIL", n, repr(e)[:200])
