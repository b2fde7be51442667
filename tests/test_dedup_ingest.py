"""Dedup-gated CDC ingest: exact + within-batch + cross-batch near-dup
filtering fused with the exactly-once merge (reference: idempotent
capture units, scripts/geral.py:36-116, plus the pre-load QA gate,
sisab/relatorio_validacao_producao/verificacao.py:15-44)."""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from etl_spark.cdc import create_dedup_state, dedup_gated_merge
from etl_spark.lake import LakeTable

DOCS_SCHEMA = "doc_id bigint, text string, v bigint"

LONG_A = ("the quick brown fox jumps over the lazy dog and keeps running "
          "through the wide open field all day long without any rest")
LONG_B = ("completely different content about ships sailing across the "
          "northern sea under heavy winter storms and grey morning skies")


def _mk(spark, root):
    docs = LakeTable.create(
        spark, os.path.join(root, "docs"), StructType.fromDDL(DOCS_SCHEMA),
        key_cols=["doc_id"], version_cols=["v"], n_buckets=2,
    )
    state = create_dedup_state(spark, os.path.join(root, "state"),
                               n_buckets=2)
    return docs, state


def _batch(spark, rows, v):
    return spark.createDataFrame(
        [(i, t, v, "I") for i, t in rows], DOCS_SCHEMA + ", op string"
    )


def test_gate_exact_within_and_cross(spark, tmp_path):
    docs, state = _mk(spark, str(tmp_path))

    b1 = _batch(spark, [
        (1, LONG_A),
        (2, LONG_A),                  # exact dup of 1 -> dropped
        (3, LONG_A + " tonight"),     # near-dup of 1 -> dropped (within)
        (4, LONG_B),                  # distinct -> kept
        (5, "too short"),             # <3 tokens: bypasses LSH -> kept
    ], v=1)
    s1 = dedup_gated_merge(docs, state, b1, "ingest:1")
    assert s1.applied and (s1.n_input, s1.n_after_exact,
                           s1.n_after_within, s1.n_kept) == (5, 4, 3, 3)
    assert {r["doc_id"] for r in docs.read().collect()} == {1, 4, 5}
    assert {r["doc_id"] for r in state.read().collect()} == {1, 4, 5}

    b2 = _batch(spark, [
        (6, LONG_A + " again"),       # near-dup of corpus doc 1 -> dropped
        (7, "some genuinely new text about gardening tomatoes in clay "
            "pots on a small sunny balcony during early spring months"),
    ], v=2)
    s2 = dedup_gated_merge(docs, state, b2, "ingest:2")
    assert (s2.n_input, s2.n_after_exact, s2.n_after_within, s2.n_kept) \
        == (2, 2, 2, 1)
    assert {r["doc_id"] for r in docs.read().collect()} == {1, 4, 5, 7}


def test_verification_rejects_low_jaccard_candidates(spark, tmp_path):
    docs, state = _mk(spark, str(tmp_path))
    # rows_per_band=1 makes LSH candidates near-certain at jaccard ~0.5;
    # a 0.9 threshold must then keep both docs (candidate but not dup)
    half = LONG_A + " " + LONG_B            # shares ~half its shingles w/ A
    b = _batch(spark, [(1, LONG_A), (2, half)], v=1)
    s = dedup_gated_merge(docs, state, b, "ingest:1",
                          bands=16, rows_per_band=1, threshold=0.9)
    assert s.n_kept == 2
    assert {r["doc_id"] for r in docs.read().collect()} == {1, 2}

    # same pair at threshold 0.3 -> doc 2 dropped
    docs2, state2 = _mk(spark, str(tmp_path / "t2"))
    s2 = dedup_gated_merge(docs2, state2, b, "ingest:1",
                           bands=16, rows_per_band=1, threshold=0.3)
    assert s2.n_kept == 1


def test_same_key_rerun_is_noop_and_crash_window_heals(spark, tmp_path):
    docs, state = _mk(spark, str(tmp_path))
    b1 = _batch(spark, [(1, LONG_A), (2, LONG_B)], v=1)
    s1 = dedup_gated_merge(docs, state, b1, "ingest:1")
    assert s1.applied
    dv, sv = s1.docs_version, s1.state_version

    # full rerun under the same key: no-op, versions unchanged
    s2 = dedup_gated_merge(docs, state, b1, "ingest:1")
    assert not s2.applied
    assert (s2.docs_version, s2.state_version) == (dv, sv)

    # crash window: docs committed, state merge lost -> rerun applies
    # ONLY the state half, with the identical survivor set
    docs3, state3 = _mk(spark, str(tmp_path / "t3"))
    docs3.merge(b1, "ingest:1")           # simulate the pre-crash half
    s3 = dedup_gated_merge(docs3, state3, b1, "ingest:1")
    assert s3.applied                      # state half applied
    assert s3.docs_version == docs3.current_snapshot().version
    assert {r["doc_id"] for r in state3.read().collect()} == {1, 2}


def test_redelivery_under_new_key_is_absorbed(spark, tmp_path):
    docs, state = _mk(spark, str(tmp_path))
    b1 = _batch(spark, [(1, LONG_A), (2, LONG_B), (3, "too short")], v=1)
    dedup_gated_merge(docs, state, b1, "ingest:1")
    before = {(r["doc_id"], r["v"]) for r in docs.read().collect()}

    # at-least-once upstream re-sends the batch under a fresh key with
    # the SAME ids: self-matches are excluded (an id re-delivery is an
    # update, not a dup), so everything passes the gate and the LWW
    # merge absorbs it — table content is unchanged
    s2 = dedup_gated_merge(docs, state, b1, "ingest:1b")
    assert s2.n_kept == 3
    after = {(r["doc_id"], r["v"]) for r in docs.read().collect()}
    assert after == before

    # the same content re-delivered under NEW ids (a botched replay that
    # re-keyed the stream) IS dropped as corpus twins; only the short
    # doc — invisible to LSH — lands
    b2 = _batch(spark, [(11, LONG_A), (12, LONG_B), (13, "too short")], v=2)
    s3 = dedup_gated_merge(docs, state, b2, "ingest:2")
    assert s3.n_kept == 1
    assert {r["doc_id"] for r in docs.read().collect()} == {1, 2, 3, 13}


def test_same_id_update_refreshes_state_sketch(spark, tmp_path):
    """A same-id re-delivery with CHANGED text is an update: its sketch
    must WIN the state LWW (monotone docs-version), so future batches
    dedup against the doc's current text, not its original."""
    docs, state = _mk(spark, str(tmp_path))
    dedup_gated_merge(docs, state,
                      _batch(spark, [(1, LONG_A)], v=1), "ingest:1")
    # doc 1 edited to LONG_B (passes the gate: id match = update)
    dedup_gated_merge(docs, state,
                      _batch(spark, [(1, LONG_B)], v=2), "ingest:2")

    s3 = dedup_gated_merge(docs, state, _batch(spark, [
        (30, LONG_B + " again"),   # near-dup of doc 1's CURRENT text -> drop
        (31, LONG_A + " again"),   # near-dup only of the long-gone text -> keep
    ], v=3), "ingest:3")
    assert s3.n_kept == 1
    kept = {r["doc_id"] for r in docs.read().collect()}
    assert 31 in kept and 30 not in kept
    # state carries exactly one (winning) sketch per doc
    assert state.read().filter("doc_id = 1").count() == 1
