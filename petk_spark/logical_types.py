"""Logical type inference from Spark schemas.

Reference parity: petk/tools.py:82-102 (``get_type``). The reference
infers a logical type per pandas Series with data-dependent probes; on
Spark we infer from ``StructType`` metadata (no scan), except ``EMPTY``
which is inherently data-dependent (entirely-null column) and is folded
into the single describe aggregation pass as a ``count(col) == 0`` probe.

Scale note: metadata-only inference costs nothing at 100 TB; the EMPTY
probe rides along the stats scan and adds no extra job.
"""

from __future__ import annotations

from pyspark.sql import types as T

from petk_spark import constants


#: Column-level metadata key marking a WKB/WKT geometry column.
GEOMETRY_METADATA_KEY = "petk_spark.geometry"


def static_logical_type(field: T.StructField) -> str:
    """Map a StructField to its logical type, ignoring the EMPTY probe.

    Mirrors the dtype dispatch order of petk/tools.py:92-99: bool before
    numeric (bools are never profiled as numbers), datetime before the
    numeric probe, strings as the fallthrough. Nested/complex types map to
    UNSUPPORTED (the reference's 2-D escape hatch, petk/tools.py:100-102);
    extension operators profile them separately.
    """
    dt = field.dataType
    if field.metadata and field.metadata.get(GEOMETRY_METADATA_KEY):
        return constants.TYPE_GEO
    if field.name == "geometry" and isinstance(dt, (T.BinaryType, T.StringType)):
        # WKB/WKT payload named 'geometry' ≈ the reference's GeoSeries
        # named 'geometry' rule (petk/tools.py:83-84).
        return constants.TYPE_GEO
    if isinstance(dt, T.BooleanType):
        return constants.TYPE_BOOL
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return constants.TYPE_DATE
    if isinstance(
        dt,
        (
            T.ByteType,
            T.ShortType,
            T.IntegerType,
            T.LongType,
            T.FloatType,
            T.DoubleType,
            T.DecimalType,
        ),
    ):
        return constants.TYPE_NUM
    if isinstance(dt, T.StringType):
        return constants.TYPE_STR
    return constants.TYPE_UNSUPPORTED


def is_numeric(field: T.StructField) -> bool:
    return static_logical_type(field) == constants.TYPE_NUM


def is_floating(field: T.StructField) -> bool:
    return isinstance(field.dataType, (T.FloatType, T.DoubleType))
