"""Async-I/O-style enrichment (SURVEY.md §3.11).

Reference parity: AsyncDataStream / AsyncWaitOperator — per-record async
calls against an external service with ordered emission.  Spark has no
per-record async operator; the engine contract is BATCHED enrichment:
``mapInPandas`` hands the client whole Arrow batches, the client fans
out internally (thread pool / asyncio / bulk endpoint) and returns
results in order.  Latency semantics differ (documented: batch, not
per-record); throughput semantics are equal-or-better since batching is
what the async operator exists to approximate.

The client is injected as a plain function ``fn(pd.Series) -> pd.Series``
— the engine never hardwires a transport.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def enrich(
    df: DataFrame,
    input_col: str,
    output_col: str,
    output_type: str,
    fn: Callable[[pd.Series], pd.Series],
    batch_size: int | None = None,
) -> DataFrame:
    """Ordered batched enrichment: adds ``output_col`` = fn(input_col).

    ``fn`` receives one pandas Series per Arrow batch (optionally
    re-chunked to ``batch_size``) and must return an equal-length Series
    in the same order — Flink's *ordered* AsyncDataStream mode.
    """
    fields = df.schema.fields
    # copy the field list: StructType(fields) aliases it, and .add would
    # mutate the DataFrame's cached python-side schema in place
    out_schema = StructType(list(fields)).add(output_col, output_type)
    cols = [f.name for f in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            chunks = (
                [pdf[i : i + batch_size] for i in range(0, len(pdf), batch_size)]
                if batch_size
                else [pdf]
            )
            for chunk in chunks:
                if not len(chunk):
                    continue
                result = fn(chunk[input_col])
                out = chunk[cols].copy()
                out[output_col] = list(result)
                yield out

    return df.mapInPandas(run, out_schema)
