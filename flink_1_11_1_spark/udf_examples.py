"""Dotted-path targets for FLIP-79 ``CREATE FUNCTION ... AS '<path>'
LANGUAGE PYTHON`` (SqlCreateFunction in flink-sql-parser; routed by
ddl.py).  In Flink the path names a class on the cluster classpath; the
Python analogue is a module attribute importable on the executors —
the package zip shipped by ``session.configure()`` makes everything
under ``flink_1_11_1_spark`` resolvable there, so these live in-tree.

A target may be a plain callable (registered with Spark's default
STRING result type, same as ``t_env.register_function`` with a bare
callable) or a ``udf.udf`` / ``udf.udtf`` wrapper carrying declared
Flink types.
"""

from __future__ import annotations

from .udf import DataTypes, udf, udtf


def _pair_tokens(s):
    if s is None:
        return
    for w in str(s).split(" "):
        if w:
            yield (w,)


pair_tokens = udtf(
    _pair_tokens,
    input_types=[DataTypes.STRING()],
    result_types=[DataTypes.STRING()],
    field_names=["w"],
)


def shout(s):
    """Plain-callable example: default STRING result type."""
    return None if s is None else str(s).upper()


add_one = udf(
    lambda x: None if x is None else x + 1,
    input_types=[DataTypes.BIGINT()],
    result_type=DataTypes.BIGINT(),
)
