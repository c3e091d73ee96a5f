"""``pyflink`` import-compatibility shim.

One import makes a genuine PyFlink 1.11 program run on this engine
unchanged::

    import flink_1_11_1_spark.pyflink_shim  # noqa: F401  (only new line)

    from pyflink.table import EnvironmentSettings, TableEnvironment
    from pyflink.table.udf import udf
    from pyflink.table.window import Tumble
    ...

The shim registers ``pyflink.table`` / ``pyflink.table.udf`` /
``pyflink.table.window`` / ``pyflink.table.types`` /
``pyflink.datastream`` (+ ``.window``) module objects in
``sys.modules``, each exposing this engine's parity classes under the
reference's names (flink-python/pyflink/* in the public Flink 1.11
tree).  A REAL pyflink installation takes precedence — the shim
refuses to shadow one.
"""

from __future__ import annotations

import importlib.util
import sys
import types

from . import datastream as _ds
from . import table_api as _tapi
from . import table_env as _tenv
from . import udf as _udf


def _module(name: str, **attrs) -> types.ModuleType:
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install(force: bool = False) -> None:
    if not force:
        if "pyflink" in sys.modules and not getattr(
                sys.modules["pyflink"], "__flink_1_11_1_spark_shim__", False):
            raise RuntimeError("a real pyflink is already imported")
        if importlib.util.find_spec("pyflink") is not None:
            raise RuntimeError(
                "a real pyflink installation exists — not shadowing it")
    root = _module("pyflink")
    root.__flink_1_11_1_spark_shim__ = True
    table = _module(
        "pyflink.table",
        TableEnvironment=_tenv.TableEnvironment,
        StreamTableEnvironment=_tenv.TableEnvironment,
        BatchTableEnvironment=_tenv.TableEnvironment,
        EnvironmentSettings=_tenv.EnvironmentSettings,
        TableConfig=_tenv.TableConfig,
        StatementSet=_tenv.StatementSet,
        Table=_tapi.Table,
        TableSchema=_tapi.TableSchema,
        TableResult=_tapi.TableResult,
        DataTypes=_udf.DataTypes,
    )
    _module(
        "pyflink.table.udf",
        udf=_udf.udf,
        udtf=_udf.udtf,
        UserDefinedFunction=_udf.UserDefinedFunction,
        UserDefinedTableFunction=_udf.UserDefinedTableFunction,
    )
    _module(
        "pyflink.table.window",
        Tumble=_tapi.Tumble,
        Slide=_tapi.Slide,
        Session=_tapi.Session,
        Over=_tapi.Over,
    )
    _module("pyflink.table.types", DataTypes=_udf.DataTypes)
    _module(
        "pyflink.datastream",
        StreamExecutionEnvironment=_ds.StreamExecutionEnvironment,
        DataStream=_ds.DataStream,
        KeyedStream=_ds.KeyedStream,
    )
    _module(
        "pyflink.datastream.window",
        TumblingEventTimeWindows=_ds.TumblingEventTimeWindows,
        SlidingEventTimeWindows=_ds.SlidingEventTimeWindows,
        EventTimeSessionWindows=_ds.EventTimeSessionWindows,
    )
    root.table = sys.modules["pyflink.table"]
    root.datastream = sys.modules["pyflink.datastream"]


install()
