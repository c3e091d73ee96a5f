"""Sources & sinks (SURVEY.md §3.1).

Reference parity: FileSystemTableSource/Sink (csv/json/avro/orc/parquet,
partitioned, with pushdown abilities per FLIP-95), datagen / print /
blackhole connectors, StreamingFileSink.  Spark provides every piece
natively; this module pins the engine conventions (formats, partitioned
layout, exactly-once streaming file sink via checkpoint manifest) behind
one API and keeps the pushdown-preserving patterns testable.
"""

from .files import (  # noqa: F401
    datagen_stream,
    read_table,
    to_blackhole,
    to_console,
    write_stream_files,
    write_table,
)
