"""Run-state store: the metadata-DB analog (runs + task instances).

The reference persists DAG runs / task instances / XCom in Postgres
(compose.yml:129-145). Here the engine appends one parquet record per
run under a state dir — queryable with the same engine it orchestrates
— plus a retention vacuum (O13/K4 analog: Airflow-Cleanup's 7-day
file retention, dags/Airflow_Cleanup.py:46-58).
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RUN_SCHEMA = T.StructType(
    [
        T.StructField("pipeline", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("started", T.TimestampType()),
        T.StructField("elapsed_s", T.DoubleType()),
        T.StructField("task_statuses", T.StringType()),  # JSON map
    ]
)


class RunStateStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def record_run(self, pipeline, run) -> None:
        row = [
            (
                pipeline.name,
                run.run_id,
                run.status,
                run.started.replace(tzinfo=None),
                float(run.elapsed),
                json.dumps(
                    {
                        k: {
                            "status": v.status,
                            "attempts": v.attempts,
                            "elapsed_s": v.elapsed,
                            "error": v.error,
                        }
                        for k, v in run.tasks.items()
                    }
                ),
            )
        ]
        df = self.spark.createDataFrame(row, RUN_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def runs(self) -> DataFrame:
        return self.spark.read.schema(RUN_SCHEMA).parquet(self.path)

    def latest(self, pipeline: str):
        df = (
            self.runs()
            .where(F.col("pipeline") == pipeline)
            .orderBy(F.col("started").desc())
            .limit(1)
        )
        rows = df.collect()
        return rows[0] if rows else None

    def vacuum(self, retention: dt.timedelta, now: dt.datetime | None = None) -> int:
        """Drop run records older than ``retention`` (rewrite-compact).
        Returns rows kept. The destructive step is a state-table
        rewrite, never external file deletion."""
        now = now or dt.datetime.now(dt.timezone.utc)
        cutoff = (now - retention).replace(tzinfo=None)
        kept = self.runs().where(F.col("started") >= F.lit(cutoff))
        rows = kept.collect()  # state table is small by construction
        for f in os.listdir(self.path):
            os.remove(os.path.join(self.path, f))
        if rows:
            self.spark.createDataFrame(rows, RUN_SCHEMA).coalesce(1).write.mode(
                "append"
            ).parquet(self.path)
        return len(rows)
