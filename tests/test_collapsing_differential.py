"""Differential tests: collapse_final / collapse_final_versioned vs
direct sequential transcriptions of the engine's merge algorithms
(VERDICT r10 #3 — the same pattern as test_funnel_differential.py).

The registered queries' DuckDB oracles derive the expected survivor
set from the same changelog construction the Spark side builds, so
the oracle-parity gate is structurally blind to a semantics error
made identically in both places.  The references here transcribe the
ENGINE's documented merge rules instead:

- plain collapsing — ``CollapsingSortedAlgorithm::insertRows``: per
  key, track (count_positive, count_negative, first_negative,
  last_positive, last_is_positive) over rows in order; at key end
  emit first_negative when count_pos <= count_neg, last_positive when
  count_pos >= count_neg, EXCEPT nothing when the counts tie and the
  stream ends on a cancel (full cancellation).  The tie-ending-on-a-
  state case therefore keeps BOTH rows — the case a net-sign-only
  fold silently drops.
- versioned collapsing — pair deletion per (key, version): each
  cancel annihilates one state of the same version regardless of
  order; survivors are the unpaired rows.  The FINAL read view then
  surfaces the highest version per key that retains a state row.

Order ties between a state and its cancel read state-before-cancel
(a cancel revokes a previously written state), the documented
determinism choice where the engine depends on insertion order.
"""

from __future__ import annotations

import random

from clickhub_spark.operators.collapsing import (
    collapse_final,
    collapse_final_versioned,
)


def _engine_collapse(rows):
    """``rows``: [(seq, payload, sign)] in scan order, one key.
    Returns surviving (seq, payload, sign) per the engine epilogue."""
    first_neg = last_pos = None
    cp = cn = 0
    last_is_pos = False
    for seq, payload, sign in rows:
        if sign == 1:
            cp += 1
            last_pos = (seq, payload, 1)
            last_is_pos = True
        else:
            cn += 1
            if first_neg is None:
                first_neg = (seq, payload, -1)
            last_is_pos = False
    if cp == 0 and cn == 0:
        return []
    if cp == cn and not last_is_pos:
        return []
    out = []
    if cp <= cn:
        out.append(first_neg)
    if cp >= cn:
        out.append(last_pos)
    return out


def _engine_collapse_versioned(rows):
    """Pair deletion per version over [(ver, seq, payload, sign)] for
    one key, then the max-version-with-a-state read view."""
    cells: dict[int, dict] = {}
    for ver, seq, payload, sign in rows:
        c = cells.setdefault(ver, {"net": 0, "ls": None})
        c["net"] += sign
        if sign == 1 and (c["ls"] is None or seq > c["ls"][0]):
            c["ls"] = (seq, payload)
    best = None
    for ver, c in cells.items():
        if c["net"] > 0 and c["ls"] is not None:
            if best is None or ver > best[0]:
                best = (ver, c["ls"][1])
    return best


def _random_changelogs(n_keys, seed, with_version=False):
    """Random changelogs biased toward the interesting boundaries:
    ties, equal counts, ends-on-state, dangling cancels."""
    rng = random.Random(seed)
    logs = {}
    for k in range(n_keys):
        length = rng.randint(1, 10)
        rows = []
        seen = set()
        seq = 0
        for i in range(length):
            seq += rng.choice([0, 1, 1, 2])  # order ties are common
            sign = rng.choice([1, 1, 1, -1, -1])
            if with_version:
                ver = rng.randint(1, 4)
                rows.append((ver, seq, rng.randint(0, 99), sign))
            elif (seq, sign) not in seen:
                # ``order`` must be a total order per sign (ties
                # BETWEEN a state and a cancel exercise the tie rule;
                # ties within one sign make first/last arbitrary in
                # any engine)
                seen.add((seq, sign))
                rows.append((seq, rng.randint(0, 99), sign))
        logs[f"k{k}"] = rows
    return logs


def test_differential_collapsing_vs_engine_merge(spark):
    logs = _random_changelogs(200, seed=47)
    data = [
        (k, seq, payload, sign)
        for k, rows in logs.items()
        for seq, payload, sign in rows
    ]
    df = spark.createDataFrame(
        data, "k string, seq int, payload int, sign int"
    )
    got: dict[str, list] = {}
    for r in collapse_final(
        df, keys=["k"], sign="sign", order=["seq"]
    ).collect():
        got.setdefault(r.k, []).append((r.seq, r.payload, r.sign))
    for k, rows in logs.items():
        # the engine walks rows in storage order; our operator's tie
        # rule is state-before-cancel, so present them to the
        # transcription in that exact total order
        ordered = sorted(rows, key=lambda r: (r[0], -r[2]))
        want = sorted(_engine_collapse(ordered))
        have = sorted(got.get(k, []))
        assert have == want, (
            f"k={k}: got {have}, engine merge says {want}; log={rows}"
        )


def test_differential_collapsing_tie_cases(spark):
    """Hand-picked boundary changelogs, including the equal-counts-
    ending-on-a-state case the old net-sign fold dropped."""
    cases = {
        # cancel first, then state: equal counts, ends on state →
        # engine keeps BOTH rows
        "both": [(1, 10, -1), (2, 20, 1)],
        # state then cancel: full cancellation
        "gone": [(1, 10, 1), (2, 10, -1)],
        # exact order tie between a state and its cancel → state is
        # read first → ends on cancel → full cancellation
        "tie": [(1, 10, 1), (1, 10, -1)],
        # dangling cancel only
        "neg": [(1, 10, -1)],
        # state, cancel, state: net positive → last state
        "pos": [(1, 10, 1), (2, 10, -1), (3, 30, 1)],
    }
    data = [
        (k, seq, payload, sign)
        for k, rows in cases.items()
        for seq, payload, sign in rows
    ]
    df = spark.createDataFrame(
        data, "k string, seq int, payload int, sign int"
    )
    got: dict[str, list] = {}
    for r in collapse_final(
        df, keys=["k"], sign="sign", order=["seq"]
    ).collect():
        got.setdefault(r.k, []).append((r.seq, r.payload, r.sign))
    assert sorted(got.get("both", [])) == [(1, 10, -1), (2, 20, 1)]
    assert got.get("gone") is None
    assert got.get("tie") is None
    assert got.get("neg") == [(1, 10, -1)]
    assert got.get("pos") == [(3, 30, 1)]


def test_differential_versioned_vs_pair_deletion(spark):
    logs = _random_changelogs(200, seed=48, with_version=True)
    data = [
        (k, ver, seq, payload, sign)
        for k, rows in logs.items()
        for ver, seq, payload, sign in rows
    ]
    df = spark.createDataFrame(
        data, "k string, ver long, seq int, payload int, sign int"
    )
    got = {
        r.k: (r.ver, r.payload)
        for r in collapse_final_versioned(
            df, keys=["k"], sign="sign", version="ver", order=["seq"]
        ).collect()
    }
    for k, rows in logs.items():
        # exact (ver, seq, sign) duplicates make the surviving payload
        # ambiguous in both engines — skip those keys
        seen = set()
        dup = False
        for ver, seq, payload, sign in rows:
            if (ver, seq, sign) in seen:
                dup = True
            seen.add((ver, seq, sign))
        if dup:
            continue
        want = _engine_collapse_versioned(rows)
        have = got.get(k)
        assert have == want, (
            f"k={k}: got {have}, pair deletion says {want}; log={rows}"
        )
