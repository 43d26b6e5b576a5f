"""Incremental sequenceMatch over Structured Streaming — real-time
pattern-existence flags with BOUNDED per-user state (SURVEY §2.I
stateful family × §2.D sequence family; the batch operator is
operators/seqmatch.py).

Why existence streams and counting does not: ``sequenceMatch`` is
anchor-invariant — the pattern matches iff it matches from ANY anchor,
which is exactly the language of ``.*pattern`` — so the backtracking
search collapses into an NFA whose live states need ONE timestamp per
pattern level:

- level j ("atoms 0..j-1 matched, waiting for atom j") is a STAR level
  when ``.*`` separates atoms j-1 and j: its state survives gaps, and
  its stored timestamp is NEVER read — the parser rejects a time
  constraint adjacent to ``.*`` (parse_pattern, matching the engine's
  grammar), so a time-constrained transition always reads an ADJACENT
  level's slot;
- an ADJACENT level (no star) must consume the very next entry, so its
  state lives exactly one entry — and every creator within one entry
  writes the same timestamp, making the slot single-valued.

The single-valued-slot property makes the fold EXACT for every legal
pattern, including ``==`` time constraints.  Total state: <= 6
timestamps + the sticky matched flag, independent of history length —
the engine's own aggregate buffers every matching event per user, so
this is strictly smaller at 100 TB.  ``sequenceCount``'s scan-restart
anchoring, by contrast, depends on LOOKAHEAD (the restart position is
the end of the FIRST anchor's match, which later entries determine),
so exact incremental counting is impossible one-pass with bounded
state; count over the table with the batch operator instead.

ORDERING CONTRACT: same as streaming/funnel.py — cross-batch delivery
must be per-user time-ordered (rows are sorted within each batch);
for out-of-order histories run the batch operator.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from clickhub_spark.operators.seqmatch import parse_pattern

_MAX_ATOMS = 8
#: sticky matched flag + one live-timestamp slot per level 1..n-1
STATE_SCHEMA = "matched boolean, " + ", ".join(
    f"s{j} double" for j in range(1, _MAX_ATOMS)
)


def compile_atoms(pattern: str) -> list[dict]:
    """Pattern → atom list [{kind, idx, time, star_before}]."""
    tokens = parse_pattern(pattern)
    atoms: list[dict] = []
    star_pending = False
    time_pending: tuple | None = None
    for tok in tokens:
        if tok[0] == "star":
            star_pending = True
        elif tok[0] == "time":
            time_pending = (tok[1], tok[2])
        else:
            atoms.append(
                {
                    "kind": tok[0],
                    "idx": tok[1] if tok[0] == "cond" else None,
                    "time": time_pending,
                    "star_before": star_pending,
                }
            )
            star_pending = False
            time_pending = None
    if not atoms:
        raise ValueError("pattern has no event atoms")
    if len(atoms) > _MAX_ATOMS:
        raise ValueError(f"max {_MAX_ATOMS} event atoms")
    for a in atoms:
        # parse_pattern guarantees a time constraint never sits next
        # to '.*' — the exactness of the single-slot fold rests on it
        assert not (a["time"] and a["star_before"]), pattern
    return atoms


def _time_ok(time: tuple | None, dt: float) -> bool:
    if time is None:
        return True
    op, bound = time
    return {
        "<": dt < bound,
        "<=": dt <= bound,
        ">": dt > bound,
        ">=": dt >= bound,
        "==": dt == bound,
    }[op]


def nfa_fold(entries, atoms, matched: bool, slots: list):
    """Fold ordered (ts, bitset) entries through the anchored NFA.
    ``slots[j]`` (j in 1..n-1) is the live timestamp of level j or
    None; level 0 is the ever-present anchor (existence == match of
    ``.*pattern``).  Returns (matched, slots); ``matched`` is sticky.
    This is the single transition function both the streaming state
    update and the unit differentials run."""
    n = len(atoms)

    def hits(atom, bits) -> bool:
        return atom["kind"] == "any" or bool(bits >> atom["idx"] & 1)

    for ts, bits in entries:
        if matched:
            break
        adv = []
        if hits(atoms[0], bits):
            adv.append(1)
        for j in range(1, n):
            lt = slots[j]
            if lt is None:
                continue
            if hits(atoms[j], bits) and _time_ok(atoms[j]["time"], ts - lt):
                adv.append(j + 1)
        # adjacent levels live exactly one entry
        for j in range(1, n):
            if not atoms[j]["star_before"]:
                slots[j] = None
        for tgt in adv:
            if tgt == n:
                matched = True
            else:
                # a star slot's value is never read (time constraints
                # only sit on adjacent transitions); an adjacent slot's
                # creators within one entry all write this same ts
                slots[tgt] = ts
    return matched, slots


def sequence_match_stream(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    cond_cols: Sequence[str],
    pattern: str,
    order_cols: Sequence[str] = (),
    user_type: str = "bigint",
) -> DataFrame:
    """Streaming sequenceMatch: ``events`` is a streaming DataFrame
    carrying ``user_col``, ``ts_col`` (castable to double seconds) and
    boolean ``cond_cols`` (one per pattern condition, precomputed by
    the caller; one event may satisfy several — the engine's bitset
    entry model).  Returns an ``update``-mode stream of (user_id,
    matched); the latest row per user is the live flag, and it never
    flips back to false."""
    atoms = compile_atoms(pattern)
    k_top = len(cond_cols)
    for a in atoms:
        if a["kind"] == "cond" and a["idx"] >= k_top:
            raise ValueError(
                f"pattern references (?{a['idx'] + 1}) but only "
                f"{k_top} condition columns were given"
            )
    n = len(atoms)
    tiebreak = list(order_cols)

    def update(key, batches, state: GroupState):
        if state.exists:
            raw = state.get
            matched = bool(raw[0])
            slots = [None] + [
                None if raw[j] is None else float(raw[j])
                for j in range(1, n)
            ]
        else:
            matched = False
            slots = [None] * n

        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values([ts_col, *tiebreak], kind="mergesort")
        ts_vals = pdf[ts_col].astype("float64").to_numpy()
        flags = [pdf[c].fillna(False).to_numpy() for c in cond_cols]
        entries = []
        for i in range(len(pdf)):
            bits = 0
            for k in range(k_top):
                if flags[k][i]:
                    bits |= 1 << k
            if bits:  # events matching nothing never become entries
                entries.append((float(ts_vals[i]), bits))
        matched, slots = nfa_fold(entries, atoms, matched, slots)

        flat = [matched, *slots[1:n]]
        flat.extend([None] * (_MAX_ATOMS - n))
        state.update(tuple(flat))
        yield pd.DataFrame({"user_id": [key[0]], "matched": [matched]})

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=f"user_id {user_type}, matched boolean",
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
