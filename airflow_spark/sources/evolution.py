"""Schema-evolution-tolerant parquet ingest.

A table that lives for years accretes schema drift: producers add
columns, widen ints to longs, reorder fields, occasionally rename.
Reading such a table naively either fails (strict schema) or silently
narrows (first-file schema wins). These helpers make drift explicit and
safe:

- ``read_evolving``: one scan over every batch with
  ``mergeSchema=true`` (Spark unions parquet footers — metadata-only,
  no data pass), then alignment to a DECLARED target schema: missing
  columns become typed nulls, extra columns are dropped (reported),
  compatible type changes are cast. The result always has exactly the
  target schema, whatever any batch looked like.
- ``align_to_schema``: the alignment step alone, for frames from any
  source.
- ``schema_drift_report``: per-file-batch drift summary (added /
  missing / retyped columns vs the target) — the audit view a table
  owner reviews before widening the declared schema.

Casting policy: only widenings that cannot lose information are applied
implicitly (int→long, float→double, int→double, any→string); anything
else (string→int, double→int, …) raises unless ``strict=False``, where
it becomes ``try_cast`` (nulls on failure) so one bad producer can't
stall ingest — the same PERMISSIVE-quarantine philosophy as
``sources/text_formats.py``.

Scale note: ``mergeSchema`` reads every file footer on the driver —
fine per-batch, expensive over a 100 TB table's full history; at scale
you pin the target schema explicitly (this module's whole point) and
pass ``merge=False`` so the scan skips footer-merging entirely.

Reference scope: the reference's REST payloads drift the same way
(fields appear/vanish between API versions — e.g. the Cloudflare apps
payloads SURVEY.md §2.1 S1-S4); this is the columnar-table analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

#: lossless implicit widenings, keyed by DataType.simpleString() names
_WIDENINGS: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint", "double", "string"},
    "smallint": {"int", "bigint", "double", "string"},
    "int": {"bigint", "double", "string"},
    "bigint": {"string"},
    "float": {"double", "string"},
    "double": {"string"},
    "date": {"timestamp", "string"},
    "boolean": {"string"},
    "timestamp": {"string"},
    "timestamp_ntz": {"timestamp", "string"},
}


def _is_widening(src: T.DataType, dst: T.DataType) -> bool:
    return dst.simpleString() in _WIDENINGS.get(src.simpleString(), set())


def align_to_schema(
    df: DataFrame,
    target: T.StructType,
    strict: bool = True,
) -> DataFrame:
    """Project ``df`` onto exactly ``target``: missing columns become
    typed nulls, extras are dropped, matching columns are cast when the
    change is a lossless widening. A narrowing raises in strict mode;
    with ``strict=False`` it becomes ``try_cast`` (null on failure).
    Pure projection — no shuffle, survives whole-stage codegen."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        src = have[f.name]
        if src == f.dataType:
            cols.append(F.col(f.name))
        elif _is_widening(src, f.dataType):
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif not strict:
            cols.append(
                F.col(f.name).try_cast(f.dataType).alias(f.name)
            )
        else:
            raise ValueError(
                f"align_to_schema: column {f.name!r} is {src.simpleString()} "
                f"but target wants {f.dataType.simpleString()} — a lossy "
                "narrowing. Pass strict=False to try_cast (nulls on "
                "failure) or fix the producer."
            )
    return df.select(*cols)


def read_evolving(
    spark: SparkSession,
    path: str | list[str],
    target: T.StructType,
    strict: bool = True,
    merge: bool = True,
) -> DataFrame:
    """Read a parquet table whose batches may disagree on schema and
    deliver exactly ``target``. Each path (one batch / partition drop)
    is read and aligned INDEPENDENTLY, then unioned by name — parquet's
    own ``mergeSchema`` refuses type conflicts across files
    (CANNOT_MERGE_SCHEMAS for int vs bigint), so cross-batch type drift
    must be reconciled by the aligner, per batch. Within one path,
    ``merge=True`` unions footers so add/drop-column drift is visible;
    pass ``merge=False`` once the target is pinned to skip footer-merge
    cost — that path reads with the EXPLICIT target schema (absent
    columns null-fill per row group). Reading with merge=False and an
    inferred schema would sample ONE arbitrary footer and silently drop
    a column other files in the same path do carry."""
    paths = [path] if isinstance(path, str) else list(path)
    if merge:
        frames = [
            align_to_schema(
                spark.read.option("mergeSchema", "true").parquet(p),
                target,
                strict=strict,
            )
            for p in paths
        ]
    else:
        frames = [
            align_to_schema(
                spark.read.schema(target).parquet(p), target, strict=strict
            )
            for p in paths
        ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def schema_drift_report(
    spark: SparkSession,
    batches: dict[str, str],
    target: T.StructType,
) -> DataFrame:
    """Drift audit over named batches (name -> parquet path): one row
    per (batch, column) that differs from the target — ``added``
    (batch-only column), ``missing`` (target column absent), or
    ``retyped`` (present with another type, flagged lossy when not a
    lossless widening). Footer-only: reads schemas, never data."""
    want = {f.name: f.dataType for f in target.fields}
    rows = []
    for name, p in sorted(batches.items()):
        have = {
            f.name: f.dataType
            # mergeSchema: auditing one arbitrary footer would miss
            # drift introduced partway through a batch — and disagree
            # with read_evolving, which merges
            for f in spark.read.option("mergeSchema", "true")
            .parquet(p)
            .schema.fields
        }
        for col in sorted(set(have) - set(want)):
            rows.append((name, col, "added", have[col].simpleString(), None, None))
        for col in sorted(set(want) - set(have)):
            rows.append((name, col, "missing", None, want[col].simpleString(), None))
        for col in sorted(set(want) & set(have)):
            if have[col] != want[col]:
                rows.append(
                    (
                        name,
                        col,
                        "retyped",
                        have[col].simpleString(),
                        want[col].simpleString(),
                        not _is_widening(have[col], want[col]),
                    )
                )
    schema = T.StructType(
        [
            T.StructField("batch", T.StringType()),
            T.StructField("column", T.StringType()),
            T.StructField("drift", T.StringType()),
            T.StructField("batch_type", T.StringType()),
            T.StructField("target_type", T.StringType()),
            T.StructField("lossy", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
