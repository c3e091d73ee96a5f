"""Changelog / retraction adapters (SURVEY.md §2.3, §8.3 item 1).

Flink streaming SQL emits changelog streams (retract/upsert); Spark has
no first-class retraction.  The engine's documented replacements:

- ``to_upsert_stream``: update-mode writer — per-trigger revisions keyed
  by the full grouping key (Flink's upsert sink contract).
- ``ChangelogWriter``: a ``foreachBatch`` adapter that diffs each
  micro-batch's aggregate snapshot against the previous one and appends
  Flink-RowKind-tagged rows (+I / +U / -D) to a records table — the
  changelog surface, reconstructed batch-wise.
- ``RetractStreamWriter`` + ``fold_retracts``: the actual
  ``toRetractStream`` rendering — boolean-tagged full rows whose
  multiset fold reproduces the table at every prefix (update = retract
  old THEN add new).

Both renderers are EXECUTOR-SIDE (round 6; the round-5 versions
collected every snapshot to a driver dict, which caps out at
dimension-sized aggregates): each trigger writes the aggregate snapshot
to a snapshot table, diffs it against the previous snapshot with one
full-outer join on the group key, and appends the rendered change
records to a per-batch records directory — idempotent under
foreachBatch's batch-id retry contract (overwrite of a deterministic
path), never materializing a row on the driver, so key cardinality is
bounded by cluster storage, not driver memory.  The driver holds two
path strings.
"""

from __future__ import annotations

import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


def _snapshot_diff(old: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """(seq, add, _old struct, _new struct) change rows via ONE full-outer
    join of consecutive snapshots on the group key — the executor-side
    replacement for the round-5 driver-dict diff.  ``seq`` orders a
    retract (0) before its replacing add (1) inside a batch; null-safe
    struct comparison routes NULL aggregate values explicitly (a NULL
    field must read as "same" only against NULL)."""
    cols = new.columns
    o = old.select(*keys, F.struct(*cols).alias("_old"))
    n = new.select(*keys, F.struct(*cols).alias("_new"))
    j = o.join(n, list(keys), "full_outer")
    changed = ~F.col("_old").eqNullSafe(F.col("_new"))
    retract = F.when(
        F.col("_old").isNotNull() & changed,
        F.struct(F.lit(0).alias("seq"), F.lit(False).alias("add"),
                 F.col("_old").alias("row")),
    )
    add = F.when(
        F.col("_new").isNotNull() & changed,
        F.struct(F.lit(1).alias("seq"), F.lit(True).alias("add"),
                 F.col("_new").alias("row")),
    )
    return (
        j.select(
            F.explode(
                F.filter(F.array(retract, add), lambda x: x.isNotNull())
            ).alias("_r")
        )
        .select("_r.seq", "_r.add", "_r.row.*")
    )


class RetractStreamWriter:
    """``toRetractStream`` parity: per-trigger ``(add: bool, row)`` records
    appended to a records table, rendered entirely executor-side.

    Flink's ``StreamTableEnvironment.toRetractStream`` (public tree
    flink-table/flink-table-api-java-bridge
    ``.../StreamTableEnvironment.java``) renders an updating table as a
    stream of boolean-tagged full rows: an insert emits ``(true, row)``;
    an update emits ``(false, old_row)`` THEN ``(true, new_row)``; a
    delete emits ``(false, row)``.  The accumulated multiset — add on
    true, retract on false — always equals the current table, which is
    the property ``fold_retracts`` reconstructs and the S13 test checks
    against the batch twin; within a batch ``seq`` (0=retract, 1=add)
    preserves retract-before-add, so reading the records table ordered
    by ``(batch_id, seq)`` is the retract stream.

    Scale contract: per trigger, one snapshot write + one full-outer
    join on the group key + one append — all distributed; the driver
    holds only ``workdir``.  Snapshot/records are parquet under
    ``workdir`` (an object-store prefix on a real cluster); each batch
    overwrites its own deterministic subdirectory, so foreachBatch's
    retry of a batch id is idempotent.  The previous snapshot is pruned
    after a successful diff unless ``keep_snapshots``.
    """

    def __init__(self, keys: Sequence[str], workdir: str,
                 keep_snapshots: bool = False):
        self.keys = list(keys)
        self.workdir = str(workdir)
        self.keep_snapshots = keep_snapshots

    def _render(self, old: DataFrame, new: DataFrame) -> DataFrame:
        return _snapshot_diff(old, new, self.keys)

    def _snapshot_ids(self) -> list[int]:
        import os

        try:
            return sorted(
                int(d[len("snap_b"):])
                for d in os.listdir(self.workdir)
                if d.startswith("snap_b")
            )
        except FileNotFoundError:
            return []

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # the diff base is discovered on DISK, not held in memory: the
        # latest snapshot with a SMALLER batch id.  That makes both
        # failure modes correct — a query restart (fresh writer object)
        # resumes against the last committed snapshot, and a retry of
        # batch N (whose own snapshot may already exist) still diffs
        # against N's true predecessor instead of N itself.
        prev_ids = [i for i in self._snapshot_ids() if i < batch_id]
        snap = f"{self.workdir}/snap_b{batch_id}"
        batch_df.write.mode("overwrite").parquet(snap)
        new = spark.read.parquet(snap)
        old = (
            spark.read.parquet(f"{self.workdir}/snap_b{prev_ids[-1]}")
            if prev_ids
            else new.limit(0)
        )
        recs = self._render(old, new).withColumn("batch_id", F.lit(batch_id))
        recs.write.mode("overwrite").parquet(f"{self.workdir}/records/b{batch_id}")
        if not self.keep_snapshots:
            # keep the immediate predecessor (a retry of this batch id
            # must still find its diff base); prune everything older
            for i in prev_ids[:-1]:
                shutil.rmtree(f"{self.workdir}/snap_b{i}", ignore_errors=True)


def read_retracts(spark: SparkSession, workdir: str) -> DataFrame:
    """The accumulated retract stream: records ordered (batch_id, seq) —
    ``seq`` keeps every retract before the adds of its batch, so any
    prefix folds without going negative."""
    return spark.read.parquet(f"{workdir}/records/*").orderBy("batch_id", "seq")


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


class ChangelogWriter(RetractStreamWriter):
    """foreachBatch diff adapter appending +I/+U/-D rows per trigger.

    Same executor-side snapshot-diff machinery as RetractStreamWriter,
    rendered as Flink RowKinds instead of boolean retract pairs: a key
    only in the new snapshot appends ``+I`` with the new row, a changed
    key ``+U`` with the new row, a vanished key ``-D`` with the old row.

    Usage::

        writer = ChangelogWriter(keys=["k"], workdir=path)
        q = (agg_stream.writeStream.outputMode("complete")
             .foreachBatch(writer).start())
        changes = read_changelog(spark, path)   # kind, row..., batch_id
    """

    def _render(self, old: DataFrame, new: DataFrame) -> DataFrame:
        cols = new.columns
        o = old.select(*self.keys, F.struct(*cols).alias("_old"))
        n = new.select(*self.keys, F.struct(*cols).alias("_new"))
        j = o.join(n, list(self.keys), "full_outer")
        changed = ~F.col("_old").eqNullSafe(F.col("_new"))
        return (
            j.where(changed)
            .select(
                F.when(F.col("_old").isNull(), F.lit("+I"))
                .when(F.col("_new").isNull(), F.lit("-D"))
                .otherwise(F.lit("+U"))
                .alias("kind"),
                F.coalesce(F.col("_new"), F.col("_old")).alias("row"),
            )
            .select("kind", "row.*")
        )


def read_changelog(spark: SparkSession, workdir: str) -> DataFrame:
    """The accumulated +I/+U/-D changelog ordered by batch."""
    return spark.read.parquet(f"{workdir}/records/*").orderBy("batch_id")


class UpsertStreamWriter:
    """Update-mode foreachBatch adapter: appends each trigger's REVISED
    rows — the upsert stream, Flink's upsert-sink contract — to a
    records table with ``batch_id``, executor-side (one write per
    trigger, idempotent per-batch path, nothing collected).

    Where RetractStreamWriter diffs complete snapshots, update mode
    already hands over exactly the changed rows, so no diff join is
    needed; this is also the allowedLateness RE-FIRE rendering
    (SURVEY §3.6): a late row inside the watermark delay makes the
    windowed aggregate emit its window's revised row in a later batch,
    which ``read_upserts`` classifies as ``+U`` — Flink's late firing.
    """

    def __init__(self, workdir: str):
        self.workdir = str(workdir)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).parquet(f"{self.workdir}/records/b{batch_id}")


def read_upserts(spark: SparkSession, workdir: str, keys: Sequence[str]) -> DataFrame:
    """The upsert stream with Flink RowKinds: the first revision of a
    key is ``+I``, every later one ``+U`` (an update-mode aggregate
    never deletes).  Folding = keep each key's last revision."""
    from pyspark.sql.window import Window

    recs = spark.read.parquet(f"{workdir}/records/*")
    w = Window.partitionBy(*keys).orderBy("batch_id")
    return recs.withColumn(
        "kind",
        F.when(F.row_number().over(w) == 1, F.lit("+I")).otherwise(F.lit("+U")),
    ).orderBy("batch_id")
