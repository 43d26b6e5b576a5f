"""Streaming sequenceMatch (streaming/seqmatch.py).

Two pins: (1) the bounded-state NFA fold must agree with the batch
backtracking automaton (operators/seqmatch._match_entries) on
EXISTENCE over random entry streams × patterns — including time
constraints, adjacency and overlapping condition bitsets — which is
the exactness claim for the one-timestamp-per-level state; (2) the
Structured Streaming wrapper folded over time-ordered micro-batches
must converge to the batch operator, with state persisting across
batches."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from clickhub_spark.operators.seqmatch import (
    _match_entries,
    parse_pattern,
    sequence_match,
)
from clickhub_spark.streaming.seqmatch import (
    compile_atoms,
    nfa_fold,
    sequence_match_stream,
)

_PATTERNS = [
    "(?1).*(?2)",
    "(?1)(?2)",
    "(?1).*(?2).*(?3)",
    "(?1)(?t<3)(?2)",
    "(?1)(?t<3)(?2).*(?3)",
    "(?1).*(?2)(?t>2)(?3)",
    ".(?t<5)(?2)",
    "(?2)(?3)",
    "(?1)(?2)(?3)",
    "(?3).*(?1)",
    "(?1)(?t==1)(?2)",
    "(?1).*(?2)(?t>=2)(?3)",
]


def _random_entries(rng, max_len=14, k=3):
    n = rng.randint(0, max_len)
    ts, out = 0.0, []
    for _ in range(n):
        ts += rng.choice([1.0, 1.0, 2.0, 4.0])
        bits = rng.randint(1, (1 << k) - 1)  # entries always match >=1
        out.append((ts, bits))
    return out


def test_nfa_matches_backtracking_differential():
    rng = random.Random(1207)
    for pattern in _PATTERNS:
        tokens = parse_pattern(pattern)
        atoms = compile_atoms(pattern)
        for trial in range(400):
            entries = _random_entries(rng)
            want = _match_entries(entries, tokens, 3) is not None
            got, _ = nfa_fold(entries, atoms, False, [None] * len(atoms))
            assert got == want, (
                f"pattern={pattern} entries={entries}: "
                f"nfa={got} backtracking={want}"
            )


def test_nfa_fold_is_incremental():
    """Folding a stream in arbitrary batch splits must equal folding
    it whole — the state carries everything the NFA needs."""
    rng = random.Random(77)
    for pattern in _PATTERNS:
        atoms = compile_atoms(pattern)
        for trial in range(150):
            entries = _random_entries(rng, max_len=18)
            whole, _ = nfa_fold(entries, atoms, False, [None] * len(atoms))
            cut1 = rng.randint(0, len(entries))
            cut2 = rng.randint(cut1, len(entries))
            m, s = nfa_fold(entries[:cut1], atoms, False, [None] * len(atoms))
            m, s = nfa_fold(entries[cut1:cut2], atoms, m, s)
            m, s = nfa_fold(entries[cut2:], atoms, m, s)
            assert m == whole, f"pattern={pattern} split at {cut1},{cut2}"


def test_compile_atoms_rejections():
    with pytest.raises(ValueError, match="event atoms"):
        compile_atoms(".*")
    # (?t==n) IS streamable: the constraint reads an adjacent slot,
    # which is single-valued — compile must accept it
    atoms = compile_atoms("(?1)(?t==5)(?2)")
    assert atoms[1]["time"] == ("==", 5.0)
    assert atoms[1]["star_before"] is False


def _make_streams(n_users, seed):
    rng = random.Random(seed)
    streams = {}
    for uid in range(n_users):
        length = rng.randint(1, 12)
        ts = 0.0
        evts = []
        for _ in range(length):
            ts += rng.choice([1.0, 1.0, 2.0, 5.0])
            evts.append((ts, rng.choice("vvccppbxy")))
        streams[uid] = evts
    return streams


def test_stream_seqmatch_converges_to_batch(spark, tmp_path):
    from clickhub_spark.streaming.mv import read_event_stream
    from pyspark.sql.types import _parse_datatype_string

    streams = _make_streams(70, seed=515)
    rows = [
        (uid, uid * 1000 + i, float(ts), letter)
        for uid, evts in streams.items()
        for i, (ts, letter) in enumerate(evts)
    ]
    schema_str = "user_id long, event_id long, ts double, event_type string"
    src = str(tmp_path / "src")
    hi = max(r[2] for r in rows) + 1.0
    os.makedirs(src, exist_ok=True)
    for s in range(3):  # global-time slices => per-user ordered batches
        lo_b, hi_b = hi * s / 3, hi * (s + 1) / 3
        part = [r for r in rows if lo_b <= r[2] < hi_b] or rows[:0]
        sl = src + f"/slice={s}"
        spark.createDataFrame(part, schema_str).coalesce(1).write.mode(
            "overwrite"
        ).parquet(sl)
        for f in os.listdir(sl):
            os.utime(os.path.join(sl, f), (1_000_000 + s, 1_000_000 + s))

    df = spark.createDataFrame(rows, schema_str)
    lt = F.col("event_type")
    # overlapping: 'b' satisfies BOTH cond1 and cond2
    conds = [
        lt.isin("v", "b"),
        lt.isin("c", "b"),
        lt == "p",
    ]
    for tag, pattern in (
        ("sub", "(?1).*(?2).*(?3)"),
        ("adj", "(?1)(?2)"),
        ("time", "(?1)(?t<4)(?2).*(?3)"),
    ):
        stream = read_event_stream(
            spark, src + "/slice=*",
            _parse_datatype_string(schema_str), max_files=1,
        )
        for k, c in enumerate(conds):
            stream = stream.withColumn(f"__c{k}", c)
        out = sequence_match_stream(
            stream,
            user_col="user_id",
            ts_col="ts",
            cond_cols=[f"__c{k}" for k in range(3)],
            pattern=pattern,
            order_cols=["event_id"],
        )
        name = f"seqmatch_sink_{tag}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = {}
        emitted = spark.sql(f"SELECT * FROM {name}").collect()
        for r in emitted:
            final[r.user_id] = r.matched
        want = {
            r.user_id: r.matched
            for r in sequence_match(
                df, "user_id", ["ts", "event_id"], conds, pattern,
                ts_col="ts",
            ).collect()
        }
        # the batch regex path omits users with ZERO entries (its
        # entry-string groupBy filters them); the stream emits a
        # False row for every user it sees — align on False
        assert set(want) <= set(final), f"pattern={pattern}: missing users"
        aligned = {uid: want.get(uid, False) for uid in final}
        assert final == aligned, f"pattern={pattern}: stream != batch"
        assert len(emitted) > len(final)  # state persisted across batches
