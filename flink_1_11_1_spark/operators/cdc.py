"""CDC ingestion formats (SURVEY.md §3.1): debezium-json / canal-json.

Reference parity: flink-formats/flink-json
debezium/DebeziumJsonDeserializationSchema.java and
canal/CanalJsonDeserializationSchema.java — decode a CDC envelope into
changelog rows tagged with Flink's RowKind
(flink-core types/RowKind.java): +I / -U / +U / -D.

Spark-first realization: ``from_json`` + an array-of-struct explode (one
envelope can emit two rows for an update), all JVM expressions.  The
changelog is then *applied* with ``materialize`` — the upsert/retract
adapter (SURVEY.md §2.3: Spark has no first-class retraction; the
contract is changelog-batch → final state per key, usable directly or
inside ``foreachBatch`` for a MERGE).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window

ROW_KINDS = ("+I", "-U", "+U", "-D")


def _guard_parse(pieces, value_col: str, ignore_parse_errors: bool, fmt: str):
    """Flink's ignore-parse-errors contract (round-13 review): a
    non-null payload that decodes to NO changelog pieces (unparseable
    JSON, unknown op/type) FAILS the job unless opted out — explode()
    would otherwise drop it silently and a corrupt feed would
    materialize to stale-but-healthy-looking state.  Null payloads
    (Kafka tombstones) are skipped either way."""
    if ignore_parse_errors:
        return pieces
    return F.when(
        F.col(value_col).isNotNull() & pieces.isNull(),
        F.raise_error(
            F.concat(F.lit(f"malformed {fmt} envelope: "), F.col(value_col))
        ),
    ).otherwise(pieces)


def debezium_decode(
    df: DataFrame,
    value_col: str,
    row_schema: StructType,
    ignore_parse_errors: bool = False,
) -> DataFrame:
    """Decode debezium-json envelopes to (row_kind, <row fields>).

    op mapping (DebeziumJsonDeserializationSchema): c/r -> +I(after),
    u -> -U(before) and +U(after), d -> -D(before).  Unknown ops and
    unparseable payloads raise unless ``ignore_parse_errors`` (Flink's
    ``debezium-json.ignore-parse-errors``, default false).
    """
    env = StructType().add("before", row_schema).add("after", row_schema).add("op", "string")
    parsed = df.withColumn("_env", F.from_json(F.col(value_col), env))
    pieces = F.expr(
        """
        CASE _env.op
          WHEN 'c' THEN array(struct('+I' as row_kind, _env.after as row))
          WHEN 'r' THEN array(struct('+I' as row_kind, _env.after as row))
          WHEN 'u' THEN array(struct('-U' as row_kind, _env.before as row),
                              struct('+U' as row_kind, _env.after as row))
          WHEN 'd' THEN array(struct('-D' as row_kind, _env.before as row))
        END
        """
    )
    pieces = _guard_parse(pieces, value_col, ignore_parse_errors, "debezium-json")
    passthrough = [c for c in df.columns if c != value_col]
    out = parsed.select(*passthrough, F.explode(pieces).alias("_p")).select(
        *passthrough, F.col("_p.row_kind").alias("row_kind"), F.col("_p.row.*")
    )
    return out


def canal_decode(
    df: DataFrame,
    value_col: str,
    row_schema: StructType,
    ignore_parse_errors: bool = False,
) -> DataFrame:
    """Decode canal-json envelopes: {type: INSERT|UPDATE|DELETE,
    data: [row...], old: [partial-row...]}.

    UPDATE emits -U (old merged over data, per CanalJson semantics the
    ``old`` array carries only changed fields) and +U (data).  Unknown
    types and unparseable payloads raise unless ``ignore_parse_errors``
    (Flink's ``canal-json.ignore-parse-errors``, default false).
    """
    from pyspark.sql.types import ArrayType

    env = (
        StructType()
        .add("data", ArrayType(row_schema))
        .add("old", ArrayType(row_schema))
        .add("type", "string")
    )
    parsed = df.withColumn("_env", F.from_json(F.col(value_col), env))
    passthrough = [c for c in df.columns if c != value_col]
    exploded = parsed.select(
        *passthrough,
        value_col,  # kept visible for the parse guard's error message
        "_env.type",
        F.posexplode_outer("_env.data").alias("_i", "_row"),
        F.col("_env.old").alias("_old"),
    )
    # get(), not _old[_i]: ANSI mode errors on out-of-bounds (CLAUDE.md)
    # and a truncated 'old' array must fall back to the data row
    old_row = F.expr("get(_old, _i)")
    # canal 'old' rows hold only changed fields -> coalesce field-wise
    merged_old = F.struct(
        *[
            F.coalesce(old_row.getField(f.name), F.col("_row").getField(f.name)).alias(f.name)
            for f in row_schema.fields
        ]
    )
    pieces = F.when(
        F.col("type") == "INSERT",
        F.array(F.struct(F.lit("+I").alias("row_kind"), F.col("_row").alias("row"))),
    ).when(
        F.col("type") == "DELETE",
        F.array(F.struct(F.lit("-D").alias("row_kind"), F.col("_row").alias("row"))),
    ).when(
        F.col("type") == "UPDATE",
        F.array(
            F.struct(F.lit("-U").alias("row_kind"), merged_old.alias("row")),
            F.struct(F.lit("+U").alias("row_kind"), F.col("_row").alias("row")),
        ),
    )
    pieces = _guard_parse(pieces, value_col, ignore_parse_errors, "canal-json")
    return exploded.select(*passthrough, F.explode(pieces).alias("_p")).select(
        *passthrough, F.col("_p.row_kind").alias("row_kind"), F.col("_p.row.*")
    )


def materialize(
    changelog: DataFrame, keys: Sequence[str], seq_col: str
) -> DataFrame:
    """Fold a changelog into final state per key (upsert adapter).

    The row with the greatest ``seq_col`` per key wins; if it is a
    retraction (-D or -U with no following +U), the key is absent from
    the result.  One shuffle on the keys.

    Ties on ``seq_col`` resolve additions over retractions: the -U/+U
    pair of ONE update envelope shares its passthrough seq (offset,
    ts_ms), and the +U is the envelope's final state — without the
    tiebreak the winner was nondeterministic and the key could be
    wrongly deleted (round-13 review).
    """
    add_rank = F.when(F.col("row_kind").isin("+I", "+U"), 1).otherwise(0)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(), add_rank.desc())
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .where(F.col("row_kind").isin("+I", "+U"))
        .drop("_rn", "row_kind")
    )
