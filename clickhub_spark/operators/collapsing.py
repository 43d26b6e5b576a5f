"""CollapsingMergeTree / VersionedCollapsingMergeTree FINAL semantics.

ClickHouse's collapsing engines store an application-written changelog:
every row carries a ``sign`` column, +1 for a "state" row and -1 for a
"cancel" row that revokes a previously written state.  Reading with
FINAL collapses the changelog to the net state per key
(ReplacingMergeTree's sibling, reference README.md:132-134 table DDL
family; SURVEY §2.E).  The two variants differ in HOW cancels pair:

- **CollapsingMergeTree**: cancels pair with states by count per key —
  the engine only looks at the net sign balance.
- **VersionedCollapsingMergeTree**: a cancel revokes exactly the state
  carrying the same ``version`` value, so out-of-order delivery of
  (state, cancel) pairs still collapses correctly.

Both are one hash-aggregate shuffle on the key (map-side partial
combine, no per-key sort) — the same 100 TB-shaped plan as
``dedup.final_view``: at 1000 executors the changelog never
materializes per-key row lists anywhere; each group folds to a
constant-size accumulator (net count + two candidate rows).

ClickHouse itself collapses in storage-ORDER BY sequence; this port
takes an explicit ``order`` column list instead (as final_view does for
the version), because "insert order" is not a total order a
distributed engine should depend on.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NET = "__net"
_LAST_STATE = "__last_state"
_FIRST_CANCEL = "__first_cancel"
_LS_ORD = "__ls_ord"
_LC_ORD = "__lc_ord"


def collapse_accumulate(
    df: DataFrame,
    keys: Sequence[str],
    sign: str,
    order: Sequence[str],
) -> DataFrame:
    """Fold a changelog to the MERGEABLE per-key accumulator:
    ``keys + (__net, __last_state, __first_cancel, __ls_ord,
    __lc_ord)`` — the last two are the ``order`` positions of the last
    state / last cancel, which finalize compares to decide whether the
    changelog ENDS on a state row (the engine's ``last_is_positive``).

    This is the collapse's commutative-monoid partial state (the
    AggregatingMergeTree-style ``-State`` form, ≙ operators/aggstate):
    ``collapse_merge`` over any partition of the changelog equals one
    accumulate over the whole — which is what makes INCREMENTAL
    maintenance correct.  Note the plain FINAL output is NOT mergeable:
    it discards the net count, so "collapse, then collapse the union
    with the next batch" silently forgets how many cancels a surviving
    state can still absorb.  Persist the accumulator between batches,
    not the finalized view.
    """
    cols = df.columns
    order_struct = F.struct(*[F.col(c) for c in order])
    return df.groupBy(*keys).agg(
        F.sum(sign).alias(_NET),
        F.max_by(
            F.struct(*cols), F.when(F.col(sign) == 1, order_struct)
        ).alias(_LAST_STATE),
        F.min_by(
            F.struct(*cols), F.when(F.col(sign) == -1, order_struct)
        ).alias(_FIRST_CANCEL),
        F.max(F.when(F.col(sign) == 1, order_struct)).alias(_LS_ORD),
        F.max(F.when(F.col(sign) == -1, order_struct)).alias(_LC_ORD),
    )


def collapse_merge(
    acc: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
) -> DataFrame:
    """Merge a union of ``collapse_accumulate`` outputs back to one
    accumulator row per key (the ``-Merge`` combinator): nets add,
    the latest last-state and earliest first-cancel win.  The ordering
    expressions are gated on the struct being non-NULL — a struct of
    NULL fields is itself non-NULL, so ``F.struct(acc.order)`` alone
    would let an absent side win the max_by."""
    ls, fc = F.col(_LAST_STATE), F.col(_FIRST_CANCEL)
    ls_ord = F.when(ls.isNotNull(), F.struct(*[ls[c] for c in order]))
    fc_ord = F.when(fc.isNotNull(), F.struct(*[fc[c] for c in order]))
    return acc.groupBy(*keys).agg(
        F.sum(_NET).alias(_NET),
        F.max_by(ls, ls_ord).alias(_LAST_STATE),
        F.min_by(fc, fc_ord).alias(_FIRST_CANCEL),
        F.max(_LS_ORD).alias(_LS_ORD),
        F.max(_LC_ORD).alias(_LC_ORD),
    )


def collapse_finalize(acc: DataFrame) -> DataFrame:
    """FINAL read-view over an accumulator, transcribing the engine's
    ``CollapsingSortedAlgorithm::insertRows`` per-key epilogue exactly:

    - more states than cancels  → the last state row,
    - more cancels than states  → the first cancel row,
    - equal counts, ending on a CANCEL → nothing (full cancellation),
    - equal counts, ending on a STATE  → BOTH the first cancel and the
      last state (the engine keeps the unmatched-cancel + fresh-state
      pair so a later merge can still collapse it — and FINAL reads
      surface exactly that pair).

    "Ends on a state" compares the order position of the last state
    against the last cancel; on an exact order tie the state is taken
    to precede its cancel (a cancel revokes a previously written
    state), so a tied pair fully cancels.  Row-local (no shuffle)."""
    last_is_state = (
        F.col(_LS_ORD).isNotNull()
        & (F.col(_LC_ORD).isNull() | (F.col(_LS_ORD) > F.col(_LC_ORD)))
    )
    survivors = (
        F.when(F.col(_NET) > 0, F.array(F.col(_LAST_STATE)))
        .when(F.col(_NET) < 0, F.array(F.col(_FIRST_CANCEL)))
        .when(
            last_is_state
            & F.col(_LAST_STATE).isNotNull()
            & F.col(_FIRST_CANCEL).isNotNull(),
            F.array(F.col(_FIRST_CANCEL), F.col(_LAST_STATE)),
        )
    )
    return acc.select(F.explode(survivors).alias("__r")).select("__r.*")


def collapse_final(
    df: DataFrame,
    keys: Sequence[str],
    sign: str,
    order: Sequence[str],
) -> DataFrame:
    """CollapsingMergeTree FINAL read-view.

    Per ``keys`` group over rows with ``sign`` ∈ {+1, -1}:

    - net sign > 0 → the LAST state row by ``order`` survives,
    - net sign = 0 → the key collapses away entirely — UNLESS the
      changelog ends on a state row, in which case the engine keeps
      the (first cancel, last state) pair (collapse_finalize),
    - net sign < 0 → the FIRST cancel row survives (ClickHouse keeps a
      cancel row when the changelog ends sign-negative, signalling the
      broken sequence downstream rather than hiding it).

    Single aggregate (= ``collapse_finalize(collapse_accumulate(df))``;
    the finalize is row-local): ``max_by``/``min_by`` skip rows whose
    ordering expression is NULL, so gating the ordering struct on the
    sign selects among state rows only (resp. cancel rows) without a
    second shuffle or a window sort.
    """
    return collapse_finalize(collapse_accumulate(df, keys, sign, order))


def collapse_final_versioned(
    df: DataFrame,
    keys: Sequence[str],
    sign: str,
    version: str,
    order: Sequence[str],
) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL read-view.

    Cancels pair with states PER (key, version): a (key, version) cell
    whose signs net to zero vanishes — regardless of arrival order,
    which is the variant's whole point — and the surviving state per
    cell is the last by ``order``.  FINAL then keeps the max surviving
    ``version`` per key.

    Two aggregates, but the second runs on the already-collapsed relation
    (≤1 row per live (key, version)) — at scale the first shuffle does
    all the data-volume work and the second is a key-cardinality fold.
    Cells that net negative (cancel without a matching state) vanish
    like zero cells: with per-version pairing a dangling cancel can
    only mean its state was never written, so there is no state to
    surface (this is where the variant's contract genuinely differs
    from plain collapsing's net<0 rule).
    """
    cols = df.columns
    order_struct = F.struct(*[F.col(c) for c in order])
    cells = (
        df.groupBy(*keys, version)
        .agg(
            F.sum(sign).alias(_NET),
            F.max_by(
                F.struct(*cols), F.when(F.col(sign) == 1, order_struct)
            ).alias(_LAST_STATE),
        )
        .where((F.col(_NET) > 0) & F.col(_LAST_STATE).isNotNull())
    )
    return (
        cells.groupBy(*keys)
        .agg(F.max_by(F.col(_LAST_STATE), F.col(version)).alias("__r"))
        .select("__r.*")
    )
