"""Per-batch lineage + run-metrics ledger.

Reference analogues: the loguru row/memory telemetry per batch
(/root/reference/src/impulsoetl/siasus/procedimentos.py:269-277,416-421),
the error ledger ``configuracoes.capturas_erros_etl``
(sisab/excecoes.py:14-40) and the capture history
(scripts/geral.py:92-109). Here: an append-only JSON-lines ledger next to
the table, plus a DataFrame view for queries. JSON-lines is deliberate —
the ledger is control-plane-sized (one row per epoch), not data-plane.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession

__all__ = ["MetricsSink"]


class MetricsSink:
    def __init__(self, ledger_dir: str):
        self.ledger_dir = ledger_dir
        os.makedirs(ledger_dir, exist_ok=True)
        self.path = os.path.join(ledger_dir, "merges.jsonl")

    def record(self, stats, wall_sec: float | None = None, error: str | None = None) -> None:
        row = asdict(stats) if not isinstance(stats, dict) else dict(stats)
        if wall_sec is not None:
            row["wall_sec"] = round(wall_sec, 4)
        if error is not None:
            row["error"] = error
        # listener-bus events may arrive after a caller cleaned the dir
        os.makedirs(self.ledger_dir, exist_ok=True)
        with open(self.path, "a") as fh:
            fh.write(json.dumps(row, sort_keys=True) + "\n")

    def rows(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def as_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows() or [{}])
