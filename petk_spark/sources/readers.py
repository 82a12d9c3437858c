"""File-format ingestion (SURVEY §2.A1).

The reference delegates file reading to geopandas (`README.md:23`) and
profiles whatever DataFrame arrives. Here ingestion is first-class:
parquet / CSV / JSON / text readers returning standard DataFrames, with
an explicit-schema fast path (no inference scan — at 100 TB, schema
inference is a full extra pass) and the engine's null-canonicalization
applied lazily on top.

GeoJSON/WKT ingest: ``read_geo_csv`` marks the geometry column with the
metadata key the logical-type system recognises (logical_types.py), so
downstream describe/validate treat it as GEOMETRY without relying on
the name-based fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from petk_spark.logical_types import GEOMETRY_METADATA_KEY
from petk_spark.nulls import canonicalize_nulls


def read_parquet(spark: SparkSession, path: str, schema: dict | None = None) -> DataFrame:
    """Parquet scan; Catalyst prunes columns and pushes filters into the
    reader. ``schema`` here is the VALIDATION schema (rules dict) — its
    per-column 'nulls' sentinels are canonicalized lazily."""
    return canonicalize_nulls(spark.read.parquet(path), schema or {})


def read_csv(
    spark: SparkSession,
    path: str,
    struct: T.StructType | str | None = None,
    header: bool = True,
    schema: dict | None = None,
    **options,
) -> DataFrame:
    """CSV ingest. Pass ``struct`` (StructType or DDL string) to skip the
    inference pass — mandatory practice at scale; inference reads the
    data once before the real job."""
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    if struct is not None:
        reader = reader.schema(struct)
    else:
        reader = reader.option("inferSchema", "true")
    return canonicalize_nulls(reader.csv(path), schema or {})


def read_json(
    spark: SparkSession,
    path: str,
    struct: T.StructType | str | None = None,
    schema: dict | None = None,
    **options,
) -> DataFrame:
    """JSON-lines ingest; same explicit-schema contract as read_csv."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if struct is not None:
        reader = reader.schema(struct)
    return canonicalize_nulls(reader.json(path), schema or {})


def with_geometry_column(df: DataFrame, column: str, crs: str = "epsg:4326") -> DataFrame:
    """Mark ``column`` as the geometry column via field metadata —
    the declarative alternative to naming it 'geometry'
    (petk/tools.py:83-84 parity is the name rule; this is the
    engine-native one). CRS travels with the column metadata."""
    from pyspark.sql import functions as F

    field = df.schema[column]
    meta = dict(field.metadata or {})
    meta[GEOMETRY_METADATA_KEY] = True
    meta["crs"] = crs
    return df.withColumn(column, F.col(column).alias(column, metadata=meta))


def read_geo_csv(
    spark: SparkSession,
    path: str,
    geometry_col: str = "geometry",
    crs: str = "epsg:4326",
    **kwargs,
) -> DataFrame:
    """CSV with a WKT geometry column, marked for the geo subsystem."""
    return with_geometry_column(read_csv(spark, path, **kwargs), geometry_col, crs)


def read_orc(spark: SparkSession, path: str, schema: dict | None = None) -> DataFrame:
    """ORC scan — same pushdown/pruning story as parquet (Spark's
    native vectorized ORC reader), same lazy null canonicalization."""
    return canonicalize_nulls(spark.read.orc(path), schema or {})


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    struct: T.StructType | str | None = None,
    schema: dict | None = None,
    **options,
) -> DataFrame:
    """XML ingest via Spark 4's NATIVE xml source (the spark-xml
    package was merged upstream in 4.0 — no extra jars). ``row_tag``
    names the repeating element that becomes a row. Same
    explicit-schema contract as read_csv/read_json: pass ``struct`` to
    skip the inference pass (inference reads the data once before the
    real job — at 100 TB that is a full extra scan). XML files are NOT
    splittable within a row element, so at scale parallelism comes
    from file count — many medium files beat one giant document, and
    the reader's per-file work streams (documented trade, same class
    as read_text(whole_file=True))."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    if struct is not None:
        reader = reader.schema(struct)
    return canonicalize_nulls(reader.load(path), schema or {})


def read_text(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
) -> DataFrame:
    """Raw-text corpus ingest for the documents pipeline.

    ``whole_file=False`` (default): one row per LINE, the shape of
    .txt/.jsonl-adjacent corpora — splittable, streams through the
    normal partitioned scan. ``whole_file=True``: one row per FILE
    (``wholetext``) for document-per-file layouts; each file must fit
    an executor's row budget, and files are the parallelism unit — the
    documented trade.

    Output: (doc_id, text, source_file). ``doc_id`` is a deterministic
    63-bit xxhash64 of (source file, CONTENT) — stable across re-runs
    and partitioning, unlike ``monotonically_increasing_id`` whose
    values encode the partition layout. Identical lines within one file
    therefore share an id (they are the same document to the dedup
    semantics downstream) while remaining separate rows; use
    ``whole_file=True`` when byte-offset identity matters."""
    from pyspark.sql import functions as F

    df = spark.read.text(path, wholetext=whole_file).select(
        F.col("value").alias("text"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source_file"),
        F.input_file_name().alias("__f"),
    )
    if whole_file:
        # (path, content) hash — the same content-identity contract as
        # the per-line branch: re-ingesting a file whose bytes changed
        # yields a NEW doc_id, so downstream dedup/fingerprints can't
        # silently alias two different documents to one id
        keyed = df.select(
            F.abs(F.xxhash64(F.col("__f"), F.col("text"))).alias("doc_id"),
            "text", "source_file",
        )
    else:
        # line offset within the file via a per-file ordered window is
        # a shuffle; a content+file hash is shuffle-free and stable —
        # identical lines in one file collapse to one id, which the
        # dedup semantics downstream treat as the same document anyway
        keyed = df.select(
            F.abs(F.xxhash64(F.col("__f"), F.col("text"))).alias("doc_id"),
            "text", "source_file",
        )
    return keyed
