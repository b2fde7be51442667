"""Naive single-threaded replay oracle (golden-output generator).

Mirrors the reference's golden-fixture strategy (checked-in
``pa_transformada.parquet`` etc.,
/root/reference/tests/siasus/teste_procedimentos.py:26-43): the engine's
distributed MERGE result must byte-match what a trivially-correct sequential
replay produces. Runs in DuckDB over the landed WAL parquet, entirely outside
Spark, so it shares no code with the engine under test.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["oracle_final_state"]

_ORACLE_SQL = """
WITH dedup AS (                       -- duplicate deliveries collapse
  SELECT DISTINCT event_id, op, op_ts, repo, path, commit, lang, content
  FROM read_parquet('{glob}')
), ranked AS (                        -- sequential replay == per-key argmax
  SELECT *,
         row_number() OVER (
           PARTITION BY repo, path
           ORDER BY op_ts DESC, event_id DESC
         ) AS rn
  FROM dedup
)
SELECT event_id, op_ts, repo, path, commit, lang, content
FROM ranked
WHERE rn = 1 AND op <> 'D'
ORDER BY repo, path
"""


def oracle_final_state(events_dir: str) -> pd.DataFrame:
    """Final table state per naive replay: sort by (op_ts, event_id), apply
    I/U/D per (repo, path); deletes remove the key."""
    import duckdb

    con = duckdb.connect()
    try:
        return con.execute(
            _ORACLE_SQL.format(glob=f"{events_dir}/**/*.parquet")
        ).fetchdf()
    finally:
        con.close()
