"""Declared-query registry for extension operators.

Each entry mirrors the driver contract of ``__spark_entry__``: a
``(spark, sf_dir) -> DataFrame`` callable, plus a DuckDB oracle SQL
string where the semantics are portably expressible (exact math — no
float-ranking ambiguity); otherwise the entry is rows-only checked and
covered by unit tests instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], oracle: str | None = None):
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    """Import extension modules for their registration side effects."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        analytics,
        curation,
        dedup,
        pipeline,
        retrieval,
        selection,
        similarity,
        sketch,
        sql_surface,
        stats,
        text,
        tpch_extra,
        tpcds_shapes,
    )
    from ..operators import (
        declared_cep,
        declared_mr,
        declared_ops,
        declared_ops2,
        declared_ops3,
    )

    from . import ds_entries, table_api_entries

    declared_ops.register_all()
    declared_ops2.register_all()
    declared_ops3.register_all()
    declared_cep.register_all()
    declared_mr.register_all()
    table_api_entries.register_all()
    ds_entries.register_all()
    _LOADED = True
