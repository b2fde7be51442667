"""Property tests for the exactly-once manifest ledger (pure metadata —
no Spark session): under ANY interleaving of work-unit keys (with gaps,
zero-padded variants, multi-colon prefixes), cursor keys, and plain keys,
across any window size, the ledger must never claim an uncommitted
work-unit key applied (a false positive silently drops a batch), and must
always claim every committed key applied (a false negative merely wastes
a re-merge, but the engine relies on completeness for pending-work
discovery)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import StringType, StructField, StructType

from etl_spark.lake.table import LakeTable, Snapshot

SCHEMA = StructType([StructField("k", StringType(), True)])


def _fresh(window: int) -> Snapshot:
    return Snapshot(
        version=0, parent=None, schema=SCHEMA, key_cols=["k"],
        version_cols=["k"], n_buckets=1, buckets={}, applied=[],
        props={"manifest_window": str(window), "cursor_prefixes": "cur"},
    )


def _commit(snap: Snapshot, key: str) -> Snapshot:
    # unbound _child only reads `snap` and its args — no table state needed
    return LakeTable._child(
        LakeTable.__new__(LakeTable), snap, snap.schema, snap.buckets,
        key, added=[],
    )


_KEYS = st.one_of(
    st.integers(0, 24).map(lambda n: f"w:{n}"),        # canonical work seqs
    st.integers(0, 24).map(lambda n: f"w:{n:03d}"),    # zero-padded variants
    st.integers(0, 24).map(lambda n: f"a:1:{n}"),      # multi-colon prefix
    st.integers(0, 40).map(lambda n: f"cur:{n}"),      # monotone cursor
    st.integers(0, 9).map(lambda n: f"adhoc{n}"),      # non-sequence keys
)


@settings(max_examples=150, deadline=None)
@given(keys=st.lists(_KEYS, min_size=1, max_size=60),
       window=st.integers(1, 6))
def test_ledger_has_no_false_positives_and_no_false_negatives(keys, window):
    snap = _fresh(window)
    committed: list[str] = []
    for k in keys:
        if snap.has_applied(k):      # the guard merge() itself applies
            continue
        snap = _commit(snap, k)
        committed.append(k)

    committed_set = set(committed)
    assert snap.applied_count == len(committed)

    # completeness: every committed key answers applied
    for k in committed_set:
        assert snap.has_applied(k), f"false negative for {k}"

    # soundness: an uncommitted key may answer applied ONLY under the
    # documented cursor rule (prefix 'cur', canonical seq ≤ committed max)
    cur_max = max(
        (int(k.split(":")[1]) for k in committed_set
         if k.startswith("cur:")), default=None,
    )
    universe = (
        [f"w:{n}" for n in range(26)] + [f"w:{n:03d}" for n in range(26)]
        + [f"a:1:{n}" for n in range(26)] + [f"cur:{n}" for n in range(42)]
        + [f"adhoc{n}" for n in range(11)] + ["w:", "x:0", "a:1:02"]
    )
    for k in universe:
        if k in committed_set:
            continue
        claimed = snap.has_applied(k)
        if k.startswith("cur:") and cur_max is not None:
            seq = k.split(":", 1)[1]
            if seq.isdigit() and str(int(seq)) == seq and int(seq) <= cur_max:
                continue  # allowed by the monotone-cursor contract
        assert not claimed, f"false positive for {k}"
