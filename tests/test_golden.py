"""Golden-fixture regression test (the reference's checked-in
``pa_transformada.parquet`` strategy, tests/siasus/teste_procedimentos.py:
26-43): the engine's replay of the canonical seeded WAL must byte-match a
committed parquet — guarding against *joint* drift of the engine and the
computed oracle."""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from etl_spark.cdc import replay_events, synth_events, write_event_epochs

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "final_state_5000_seed42.parquet")


def test_replay_matches_checked_in_golden(spark, tmp_root):
    wal = os.path.join(tmp_root, "wal")
    write_event_epochs(
        synth_events(spark, 5000, n_repos=40, paths_per_repo=30,
                     n_epochs=5, seed=42),
        wal,
    )
    table, _ = replay_events(spark, wal, os.path.join(tmp_root, "tbl"), n_buckets=8)
    got = (
        table.read()
        .select("event_id", "op_ts", "repo", "path", "commit", "lang", "content")
        .orderBy("repo", "path")
        .toPandas()
        .reset_index(drop=True)
    )
    want = pd.read_parquet(GOLDEN).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # the BASELINE.json per-row invariant, against the committed fixture
    def sha(s):
        return None if s is None else hashlib.sha256(s.encode()).hexdigest()

    got_h = {(r.repo, r.path): sha(r.content) for r in got.itertuples()}
    want_h = {(r.repo, r.path): sha(r.content) for r in want.itertuples()}
    assert got_h == want_h
