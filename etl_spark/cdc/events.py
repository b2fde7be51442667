"""Deterministic synthetic CDC event stream (WAL/binlog over source-code repos).

Replaces the reference's live extractors (DATASUS FTP, SISAB Selenium, REST —
/root/reference/src/impulsoetl/utilitarios/datasus_ftp.py:133-251 etc.) with
the driver-mandated synthetic source: every column is a pure Spark expression
of ``event_id`` and a seed, so the same ``(n_events, seed)`` produces the
same stream at any parallelism level, with no Python in the data plane and
no driver-side materialization — generation itself scales to 10^10 rows.

Baked-in stream properties (per FIXTURES.md F2):
- ~hot-key skew: one repo receives ``hot_pct``% of all events,
- out-of-order ``op_ts`` relative to arrival (event_id) order,
- duplicate deliveries (same event re-emitted in a later epoch),
- delete → late-insert sequences,
- multi-epoch split for crash/resume tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["EVENT_SCHEMA", "synth_events", "write_event_epochs"]

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("op", StringType(), False),
        StructField("op_ts", TimestampType(), False),
        StructField("epoch", LongType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)

_LANGS = ["py", "js", "rs", "go", "md", "java", "c", "ts"]
_BASE_TS = "2024-01-01 00:00:00"


def _h(seed: int, salt: int, *cols):
    """Deterministic 64-bit hash stream: xxhash64(salt-tagged columns)."""
    return F.xxhash64(F.lit(seed), F.lit(salt), *cols)


def synth_events(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 200,
    paths_per_repo: int = 500,
    n_epochs: int = 8,
    seed: int = 42,
    hot_pct: int = 30,
    delete_pct: int = 10,
    dup_pct: int = 5,
    partitions: int | None = None,
) -> DataFrame:
    """Generate ``n_events`` change events plus ~``dup_pct``% duplicates."""
    rng = spark.range(0, n_events, 1, partitions or spark.sparkContext.defaultParallelism)
    eid = F.col("id")

    u = F.pmod(_h(seed, 1, eid), F.lit(100))
    repo_idx = F.when(u < F.lit(hot_pct), F.lit(0)).otherwise(
        F.pmod(_h(seed, 2, eid), F.lit(n_repos - 1)) + 1
    )
    path_idx = F.pmod(_h(seed, 3, eid), F.lit(paths_per_repo))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (F.pmod(_h(seed, 4, repo_idx, path_idx), F.lit(len(_LANGS))) + 1).cast("int"),
    )
    opr = F.pmod(_h(seed, 5, eid), F.lit(100))
    op = (
        F.when(opr < F.lit(delete_pct), F.lit("D"))
        .when(opr < F.lit(delete_pct + 30), F.lit("I"))
        .otherwise(F.lit("U"))
    )
    # Event time decoupled from arrival order => heavy out-of-orderness.
    ts_off = F.pmod(_h(seed, 6, eid), F.lit(max(n_events, 1000)))
    op_ts = F.timestamp_add("SECOND", ts_off.cast("int"), F.to_timestamp(F.lit(_BASE_TS)))
    epoch_size = max(1, (n_events + n_epochs - 1) // n_epochs)
    epoch = F.floor(eid / F.lit(epoch_size)).cast("long")

    repo = F.concat(
        F.lit("org-"), F.pmod(repo_idx, F.lit(37)).cast("string"),
        F.lit("/repo-"), repo_idx.cast("string"),
    )
    path = F.concat(
        F.lit("src/d"), F.pmod(path_idx, F.lit(13)).cast("string"),
        F.lit("/f_"), path_idx.cast("string"), F.lit("."), lang,
    )
    commit = F.substring(F.sha2(F.concat_ws("|", repo, path, eid.cast("string")), 256), 1, 40)
    body = F.sha2(F.concat_ws("#", repo, path, eid.cast("string"), F.lit(seed)), 256)
    content = F.when(op == F.lit("D"), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lit("// "), repo, F.lit(":"), path, F.lit("@"), commit, F.lit("\n"),
            F.repeat(body, (F.pmod(_h(seed, 7, eid), F.lit(8)) + 1).cast("int")),
        )
    )

    events = rng.select(
        eid.alias("event_id"),
        op.alias("op"),
        op_ts.alias("op_ts"),
        epoch.alias("epoch"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )

    if dup_pct > 0:
        # Re-deliver a deterministic subset in the *next* epoch (same
        # event_id, op_ts => LWW tie => must be idempotent).
        dups = events.filter(F.pmod(_h(seed, 8, F.col("event_id")), F.lit(100)) < F.lit(dup_pct))
        dups = dups.withColumn(
            "epoch", F.least(F.col("epoch") + 1, F.lit(n_epochs - 1)).cast("long")
        )
        events = events.unionByName(dups)
    return events


def write_event_epochs(events: DataFrame, out_dir: str) -> list[str]:
    """Land the stream as one parquet directory per epoch (the WAL segments
    a file-based Structured Streaming source or batch replay consumes)."""
    os.makedirs(out_dir, exist_ok=True)
    events.write.mode("overwrite").partitionBy("epoch").parquet(out_dir)
    return sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("epoch=")
    )
