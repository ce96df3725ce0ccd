"""Canonical row -> JSON serialization (reference P6/F1-F3).

The reference serializes each fetched row to a JSON string
(service_layer/service.py:117 ``json.dumps(d["data"],
default=json_serialize)``) with custom coercions
(service.py:176-182): datetime/date -> ISO-8601 string,
Decimal -> float (lossy, deliberate), anything else -> TypeError.

The engine re-expresses this as a *canonical* JSON rendering built
entirely from JVM-side string/date functions, so it is deterministic,
whole-stage-codegen'd, and reproducible by an external SQL oracle
(``to_json`` would hit engine-specific key ordering and timestamp
formats). Canonical form:

- keys in the order given by the caller (schema order by default);
- ``{"k":v,...}`` with no whitespace;
- strings JSON-escaped and double-quoted;
- timestamps/dates as ISO-8601 (``yyyy-MM-dd'T'HH:mm:ss`` /
  ``yyyy-MM-dd``) quoted strings (≙ ``obj.isoformat()``,
  service.py:178-179);
- decimals cast to double before rendering (≙ ``float(obj)``,
  service.py:180-181);
- NULL -> ``null``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def iso_ts(col: Column) -> Column:
    """Timestamp -> ISO-8601 string, second precision (≙ datetime
    .isoformat() at service.py:178-179 for whole-second values)."""
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")


def _json_escape(col: Column) -> Column:
    # Escape backslash first, then quotes — enough for the fixture
    # text domain; control chars would need more in a general engine.
    # (In the JVM replacement string a backslash is itself an escape
    # char, hence the quadrupling.)
    return F.regexp_replace(F.regexp_replace(col, r"\\", "\\\\\\\\"), '"', '\\\\"')


def _render_value(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        rendered = F.concat(F.lit('"'), iso_ts(col), F.lit('"'))
    elif isinstance(dtype, T.DateType):
        rendered = F.concat(F.lit('"'), F.date_format(col, "yyyy-MM-dd"), F.lit('"'))
    elif isinstance(dtype, T.StringType):
        rendered = F.concat(F.lit('"'), _json_escape(col), F.lit('"'))
    elif isinstance(dtype, T.DecimalType):
        # reference semantics: Decimal -> float (service.py:180-181)
        rendered = col.cast("double").cast("string")
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        rendered = col.cast("string")
    elif isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.BooleanType)):
        rendered = col.cast("string")
    else:
        # reference raises TypeError on unknown types (service.py:182)
        raise TypeError(f"canonical_json: unsupported type {dtype}")
    return F.when(col.isNull(), F.lit("null")).otherwise(rendered)


def canonical_json(df: DataFrame, columns: list[str] | None = None) -> Column:
    """Column rendering each row of ``df`` as a canonical JSON object
    string over ``columns`` (default: full schema order)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else [f.name for f in df.schema.fields]
    parts: list[Column] = [F.lit("{")]
    for i, name in enumerate(cols):
        prefix = ("," if i else "") + f'"{name}":'
        parts.append(F.lit(prefix))
        parts.append(_render_value(F.col(name), fields[name]))
    parts.append(F.lit("}"))
    return F.concat(*parts)
