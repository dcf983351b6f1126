"""Text-format ingestion: CSV, JSON-lines, and raw-text corpus readers.

The reference consumes REST JSON payloads only; an engine replacing it
for corpus work also ingests files. These are thin, opinionated wrappers
over ``spark.read`` that encode the 100 TB defaults you actually want:

- **explicit schema, never inferSchema** — schema inference reads the
  data twice and silently drifts between runs; at scale it is both a
  correctness and a cost bug. ``schema`` is required, not optional.
- **corrupt-record capture, not job failure** — a bad line among
  billions should land in a quarantine column (PERMISSIVE +
  ``_corrupt_record``), and the caller decides the threshold.
- **one doc per file for raw text** (``wholetext``) or one doc per
  line — both map straight onto the ``documents`` table shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: quarantine column for malformed rows (PERMISSIVE mode)
CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType([*schema.fields, T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    delimiter: str = ",",
    multiline: bool = False,
) -> DataFrame:
    """CSV with a required schema and corrupt-record quarantine.
    ``multiline=False`` keeps files splittable — a multiline CSV cannot
    be chunked across tasks, so only enable it when fields really
    contain newlines."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("multiLine", multiline)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """JSON-lines with a required schema and corrupt quarantine (one
    object per line keeps the input splittable; never use multiline
    JSON arrays for bulk data)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) — clean rows drop the quarantine column.

    Caches the parsed frame first: Spark refuses plans that reference
    *only* ``_corrupt_record`` over a raw CSV/JSON scan (the parser
    can't know a row is corrupt without parsing the others), and the
    split reads the parse result twice anyway."""
    df = df.cache()
    corrupt = df.where(F.col(CORRUPT_COL).isNotNull())
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return clean, corrupt


def corrupt_fraction(df: DataFrame) -> float:
    """Fraction of malformed rows (one aggregate pass) — gate loads
    with e.g. ``assert corrupt_fraction(df) < 0.001``."""
    # Spark refuses an aggregate over a raw PERMISSIVE scan whose only
    # referenced column is the internal corrupt-record column — cache
    # first (the same pitfall split_corrupt documents above)
    df = df.cache()
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col(CORRUPT_COL)).alias("bad"),
    ).first()
    return (row["bad"] / row["n"]) if row["n"] else 0.0


def read_text_docs(
    spark: SparkSession,
    path: str,
    whole_files: bool = False,
    id_from: str = "path",
) -> DataFrame:
    """Raw text → the ``documents`` shape: (doc_id bigint, text,
    source). ``whole_files=True`` reads one document per file
    (``wholetext`` — right for article-per-file corpora; files are not
    split, so shard large corpora into many files); otherwise one
    document per line (splittable). ``doc_id`` is the xxhash64 of the
    source path (+ line text when line-mode) — stable across reruns,
    no ``zipWithIndex``/driver sequencing."""
    # NB: must be the text() kwarg — .option("wholetext", ...) is
    # silently ignored by the text source
    reader = spark.read.text(path, wholetext=whole_files)
    src = F.input_file_name()
    doc_id = (
        F.xxhash64(src)
        if whole_files
        else F.xxhash64(src, F.col("value"))
    )
    return reader.select(
        doc_id.alias("doc_id"),
        F.col("value").alias("text"),
        src.alias("source"),
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str,
) -> DataFrame:
    """XML ingest via Spark 4's NATIVE xml data source (the merged
    spark-xml): one DataFrame row per ``row_tag`` element, with the
    same required-schema + PERMISSIVE corrupt-record quarantine
    contract as :func:`read_csv` / :func:`read_jsonl` — schema is
    never inferred (an inference pass both costs a read and lets a
    malformed feed silently reshape downstream plans).

    Note XML is NOT line-splittable: files are the parallelism unit
    (like multiline JSON), so feeds should arrive as many files, not
    one giant document."""
    return (
        spark.read.format("xml")
        .schema(_with_corrupt(schema))
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )
