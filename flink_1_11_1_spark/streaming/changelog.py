"""Changelog / retraction adapters (SURVEY.md §2.3, §8.3 item 1).

Flink streaming SQL emits changelog streams (retract/upsert); Spark has
no first-class retraction.  The engine's documented replacements:

- ``to_upsert_stream``: update-mode writer — per-trigger revisions keyed
  by the full grouping key (Flink's upsert sink contract).
- ``ChangelogBatcher``: a ``foreachBatch`` adapter that diffs each
  micro-batch's aggregate snapshot against the previous one and emits
  Flink-RowKind-tagged rows (+I / +U / -D) to a user callback — the
  changelog surface, reconstructed batch-wise.
- ``RetractStreamBatcher`` + ``fold_retracts``: the actual
  ``toRetractStream`` rendering — boolean-tagged full rows whose
  multiset fold reproduces the table at every prefix (update = retract
  old THEN add new).

The batcher keeps the previous snapshot as a plain dict keyed by the
group key: suitable for dimension-sized aggregates (its scale contract;
an unbounded-key aggregate belongs in update mode + an idempotent store).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def to_upsert_stream(
    agg_df: DataFrame, checkpoint: str, sink_format: str = "memory", **options
) -> StreamingQuery:
    """Update-mode writer: emits per-trigger revisions per key."""
    return (
        agg_df.writeStream.format(sink_format)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .options(**options)
        .start()
    )


class RetractStreamBatcher:
    """``toRetractStream`` parity: per-trigger ``(add: bool, row)`` records.

    Flink's ``StreamTableEnvironment.toRetractStream`` (public tree
    flink-table/flink-table-api-java-bridge
    ``.../StreamTableEnvironment.java``) renders an updating table as a
    stream of boolean-tagged full rows: an insert emits ``(true, row)``;
    an update emits ``(false, old_row)`` THEN ``(true, new_row)``; a
    delete emits ``(false, row)``.  The accumulated multiset — add on
    true, retract on false — always equals the current table, which is
    the property ``fold_retracts`` reconstructs and the S13 test checks
    against the batch twin.

    Same scale contract as ChangelogBatcher: the snapshot dict holds one
    entry per group key, so this is for dimension-sized aggregates; an
    unbounded-key aggregate belongs in update mode + an idempotent store.
    """

    def __init__(
        self,
        keys: Sequence[str],
        on_change: Callable[[int, list[tuple[bool, tuple]]], None],
    ):
        self.keys = list(keys)
        self.on_change = on_change
        self._snapshot: dict[tuple, tuple] = {}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        cols = batch_df.columns
        key_idx = [cols.index(k) for k in self.keys]
        current: dict[tuple, tuple] = {}
        for r in batch_df.collect():
            row = tuple(r)
            current[tuple(row[i] for i in key_idx)] = row
        records: list[tuple[bool, tuple]] = []
        for key, row in current.items():
            old = self._snapshot.get(key)
            if old is None:
                records.append((True, row))
            elif old != row:
                records.append((False, old))  # retract precedes the add
                records.append((True, row))
        for key, row in self._snapshot.items():
            if key not in current:
                records.append((False, row))
        self._snapshot = current
        if records:
            self.on_change(batch_id, records)


def fold_retracts(records: Sequence[tuple[bool, tuple]]) -> list[tuple]:
    """Accumulate a retract stream back into its table (multiset fold)."""
    from collections import Counter

    acc: Counter = Counter()
    for add, row in records:
        acc[row] += 1 if add else -1
        if acc[row] < 0:
            raise ValueError(f"retract without prior add: {row}")
        if acc[row] == 0:
            del acc[row]
    out: list[tuple] = []
    for row, n in acc.items():
        out.extend([row] * n)
    return out


class ChangelogBatcher:
    """foreachBatch diff adapter producing +I/+U/-D rows per trigger.

    Usage::

        batcher = ChangelogBatcher(keys=["k"], on_change=collect_fn)
        q = (agg_stream.writeStream.outputMode("complete")
             .foreachBatch(batcher).start())

    ``on_change(batch_id, rows)`` receives a list of
    ``(row_kind, key_tuple, value_tuple)``.
    """

    def __init__(
        self,
        keys: Sequence[str],
        on_change: Callable[[int, list[tuple[str, tuple, tuple]]], None],
    ):
        self.keys = list(keys)
        self.on_change = on_change
        self._snapshot: dict[tuple, tuple] = {}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        value_cols = [c for c in batch_df.columns if c not in self.keys]
        current = {
            tuple(getattr(r, k) for k in self.keys): tuple(
                getattr(r, c) for c in value_cols
            )
            for r in batch_df.collect()
        }
        changes: list[tuple[str, tuple, tuple]] = []
        for key, val in current.items():
            if key not in self._snapshot:
                changes.append(("+I", key, val))
            elif self._snapshot[key] != val:
                changes.append(("+U", key, val))
        for key, val in self._snapshot.items():
            if key not in current:
                changes.append(("-D", key, val))
        self._snapshot = current
        if changes:
            self.on_change(batch_id, changes)
