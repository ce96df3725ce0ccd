"""Vector math over ``array<float>`` columns — pure JVM-side exprs.

The reference's similarity metric is cosine (Pinecone index,
service_layer/service.py:91); queries embed to 384-dim float vectors
(utils/embeddings_utils.py:7-14). Here vectors are plain
``array<float>`` columns and the math is ``zip_with``/``aggregate``
higher-order functions — codegen'd, no Python round-trip, and
distributable over any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(values) -> Column:
    """A literal array<double> built as ONE parsed SQL expression.

    ``F.array(*[F.lit(x) for x in vec])`` costs one py4j round-trip per
    element — ~0.5 s of driver-side plan construction for a handful of
    64-dim planes, repeated per query build. Python float repr
    round-trips exactly through Spark's double parser, so the single
    ``expr`` string is bit-identical and ~100x cheaper to construct."""
    return F.expr("array(" + ",".join(f"{float(v)!r}D" for v in values) + ")")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))
