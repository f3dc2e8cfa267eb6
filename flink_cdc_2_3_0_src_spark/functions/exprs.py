"""Expression-construction helpers shared by the operators.

``lit_array`` exists because PySpark literal construction marshals ONE
py4j call per element: ``F.lit([1024 ints])`` (or the equivalent
``F.array(*[F.lit(v) ...])``) costs ~0.9s of pure driver time per
array, rebuilt on every query build — measured 2.6s for the Count-Min
probe's three 1024-cell rows alone (r13).  Rendering the same values as
ONE SQL ``array(...)`` expression string parses in ~1ms and yields the
identical literal column (verified elementwise in
tests/test_r13_optimizations.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_array(values, element_type: str) -> Column:
    """Literal ``array<element_type>`` column built via one SQL string.

    Numeric element types only (int-like values render as ``<v>L``
    bigint literals, floats as ``repr(v)D`` double literals — ``repr``
    is the shortest round-tripping decimal, and Spark's
    ``Double.parseDouble`` returns the same IEEE value, so the literal
    is bit-identical to ``F.lit``'s).  The trailing cast normalizes to
    the requested element type exactly like the ``F.lit(...).cast``
    form it replaces.
    """

    def render(v) -> str:
        if v is None:
            return f"CAST(NULL AS {element_type})"
        if isinstance(v, float):
            if math.isnan(v):
                return f"CAST('NaN' AS {element_type})"
            if math.isinf(v):
                sign = "-" if v < 0 else ""
                return f"CAST('{sign}Infinity' AS {element_type})"
            return repr(v) + "D"
        return str(int(v)) + "L"

    if not len(values):
        return F.expr(f"CAST(array() AS array<{element_type}>)")
    return F.expr("array(" + ",".join(render(v) for v in values) + ")").cast(
        f"array<{element_type}>"
    )
