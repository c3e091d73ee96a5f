"""PyFlink 1.11 UDF surface (``pyflink.table.udf`` / ``DataTypes``).

Reference parity: ``flink-python/pyflink/table/udf.py`` (``udf`` /
``udtf`` wrappers, FLIP-58 general Python UDFs and FLIP-97 vectorized
``udf_type="pandas"``) and ``flink-python/pyflink/table/types.py``
(``DataTypes`` factory).  A PyFlink program's registration shape

    add = udf(lambda a, b: a + b,
              [DataTypes.BIGINT(), DataTypes.BIGINT()], DataTypes.BIGINT())
    t_env.register_function("add", add)

runs unchanged; execution maps onto Spark's own Python UDF stack —
``F.udf`` (row-at-a-time, Flink's general mode; Beam there, Arrow
picklers here) or ``pandas_udf`` (Arrow-vectorized, Flink's pandas
mode), and Python UDTFs onto Spark's native UDTF registration.  The
slow/fast tiering is IDENTICAL to the reference's: general = per-row
Python, pandas = columnar batches — prefer pandas mode in hot paths.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DataTypes", "udf", "udtf", "UserDefinedFunction",
           "UserDefinedTableFunction"]


class DataTypes:
    """``pyflink.table.types.DataTypes`` factory → Spark types."""

    @staticmethod
    def STRING() -> T.DataType:
        return T.StringType()

    @staticmethod
    def BOOLEAN() -> T.DataType:
        return T.BooleanType()

    @staticmethod
    def TINYINT() -> T.DataType:
        return T.ByteType()

    @staticmethod
    def SMALLINT() -> T.DataType:
        return T.ShortType()

    @staticmethod
    def INT() -> T.DataType:
        return T.IntegerType()

    @staticmethod
    def BIGINT() -> T.DataType:
        return T.LongType()

    @staticmethod
    def FLOAT() -> T.DataType:
        return T.FloatType()

    @staticmethod
    def DOUBLE() -> T.DataType:
        return T.DoubleType()

    @staticmethod
    def DECIMAL(precision: int, scale: int) -> T.DataType:
        return T.DecimalType(precision, scale)

    @staticmethod
    def DATE() -> T.DataType:
        return T.DateType()

    @staticmethod
    def TIMESTAMP(precision: int = 3) -> T.DataType:
        return T.TimestampType()

    @staticmethod
    def TIME(precision: int = 0) -> T.DataType:
        # engine convention: TIME = INT millis-of-day (functions.py)
        return T.IntegerType()

    @staticmethod
    def BYTES() -> T.DataType:
        return T.BinaryType()

    @staticmethod
    def ARRAY(element: T.DataType) -> T.DataType:
        return T.ArrayType(element)

    @staticmethod
    def MAP(k: T.DataType, v: T.DataType) -> T.DataType:
        return T.MapType(k, v)

    @staticmethod
    def FIELD(name: str, dtype: T.DataType) -> T.StructField:
        return T.StructField(name, dtype)

    @staticmethod
    def ROW(fields: list[T.StructField]) -> T.DataType:
        return T.StructType(fields)


class UserDefinedFunction:
    """The object ``udf(...)`` returns: callable on Columns (DataFrame
    use) and registrable by name (SQL / Table API expression strings)."""

    def __init__(self, func: Callable, result_type: T.DataType,
                 udf_type: str):
        self._func = func
        self._result_type = result_type
        self._udf_type = udf_type
        if udf_type == "pandas":
            self._spark_udf = F.pandas_udf(func, returnType=result_type)
        else:
            self._spark_udf = F.udf(func, returnType=result_type)

    def __call__(self, *cols):
        return self._spark_udf(*cols)

    def register(self, spark, name: str) -> None:
        spark.udf.register(name, self._spark_udf)


class UserDefinedTableFunction:
    """The object ``udtf(...)`` returns: the wrapped generator yields
    0..n tuples per call (PyFlink contract); registration maps onto
    Spark's native Python UDTF (usable as ``LATERAL name(...)`` /
    ``FROM name(...)`` in SQL)."""

    def __init__(self, func: Callable, result_types: list[T.DataType],
                 field_names: list[str] | None = None):
        self._func = func
        names = field_names or [f"c{i}" for i in range(len(result_types))]
        self._schema = T.StructType(
            [T.StructField(n, t) for n, t in zip(names, result_types)])

    def register(self, spark, name: str) -> None:
        from pyspark.sql.functions import udtf as spark_udtf

        fn = self._func

        class _Wrapped:
            def eval(self, *args):
                for row in fn(*args):
                    yield row if isinstance(row, tuple) else (row,)

        spark.udtf.register(
            name, spark_udtf(_Wrapped, returnType=self._schema))


def udf(f: Callable | None = None, input_types=None, result_type=None,
        udf_type: str = "general"):
    """``pyflink.table.udf.udf``: direct call or decorator form.

    ``input_types`` is accepted for signature parity and unused — Spark
    infers input handling; ``udf_type="pandas"`` selects the
    Arrow-vectorized path (pandas.Series in/out, FLIP-97)."""
    if udf_type not in ("general", "pandas"):
        raise ValueError(f"unsupported udf_type {udf_type!r}")
    if f is None:  # decorator form: @udf(result_type=..., ...)
        def wrap(func):
            return UserDefinedFunction(func, result_type, udf_type)

        return wrap
    return UserDefinedFunction(f, result_type, udf_type)


def udtf(f: Callable | None = None, input_types=None, result_types=None,
         field_names: list[str] | None = None):
    """``pyflink.table.udf.udtf``: the callable yields tuples."""
    if f is None:
        def wrap(func):
            return UserDefinedTableFunction(func, result_types, field_names)

        return wrap
    return UserDefinedTableFunction(f, result_types, field_names)
