"""TablePort conformance (lake/port.py): the seam behind "swap the sink
for a real catalog".

Pins: LakeTable structurally satisfies the protocol; the protocol's
signatures match LakeTable's (a drifted default or renamed parameter
would break a third-party binding silently); a minimal fake binding —
implementing ONLY the port — drives a representative consumer
(cdc.sync.sync_changes) end to end, proving the consumer tier needs
nothing beyond the port surface.
"""

from __future__ import annotations

import inspect
import os

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_spark.lake import LakeTable
from etl_spark.lake.port import TablePort

SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("v", LongType()),
    StructField("x", StringType()),
])
ROWS = "op string, k bigint, v bigint, x string"


def test_laketable_conforms_structurally(spark, tmp_root):
    t = LakeTable.create(
        spark, os.path.join(tmp_root, "t"), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=2,
    )
    assert isinstance(t, TablePort)


def test_port_signatures_match_laketable():
    """Every port member's parameters (names, order, defaults) must be a
    PREFIX-compatible subset of LakeTable's — the binding contract."""
    for name in ("merge", "read", "changes", "folded_state",
                 "current_version", "versions", "snapshot",
                 "current_snapshot"):
        port_sig = inspect.signature(getattr(TablePort, name))
        impl_sig = inspect.signature(getattr(LakeTable, name))
        port_params = list(port_sig.parameters.values())
        impl_params = list(impl_sig.parameters.values())
        assert len(impl_params) >= len(port_params), name
        for p, i in zip(port_params, impl_params):
            assert p.name == i.name, (name, p.name, i.name)
            assert p.default == i.default, (name, p.name)


class _WrappedPort:
    """A deliberately minimal binding: holds a LakeTable PRIVATELY and
    exposes ONLY the port members — any consumer reaching past the port
    gets AttributeError, which is the test."""

    def __init__(self, inner):
        self._inner = inner

    def merge(self, batch, manifest_key, op_col="op", delete_op="D",
              max_retries=3):
        return self._inner.merge(batch, manifest_key, op_col=op_col,
                                 delete_op=delete_op,
                                 max_retries=max_retries)

    def read(self, version=None, with_meta=False, buckets=None,
             include_deleted=False, where=None):
        return self._inner.read(version=version, with_meta=with_meta,
                                buckets=buckets,
                                include_deleted=include_deleted,
                                where=where)

    def changes(self, from_version, to_version=None):
        return self._inner.changes(from_version, to_version)

    def folded_state(self, version=None):
        return self._inner.folded_state(version=version)

    def current_version(self):
        return self._inner.current_version()

    def versions(self):
        return self._inner.versions()

    def snapshot(self, version=None):
        return self._inner.snapshot(version)

    def current_snapshot(self):
        return self._inner.current_snapshot()


def test_consumer_tier_runs_on_a_port_only_binding(spark, tmp_root):
    from etl_spark.cdc.sync import last_synced_version, sync_changes

    src = LakeTable.create(
        spark, os.path.join(tmp_root, "src"), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=2,
    )
    dst = LakeTable.create(
        spark, os.path.join(tmp_root, "dst"), SCHEMA,
        key_cols=["k"], version_cols=["v"], n_buckets=2,
        props={"cursor_prefixes": "sync"},
    )
    src.merge(spark.createDataFrame(
        [("I", 1, 1, "a"), ("I", 2, 1, "b")], ROWS), manifest_key="w0")
    sp, dp = _WrappedPort(src), _WrappedPort(dst)
    assert isinstance(sp, TablePort)
    sync_changes(sp, dp)
    assert {r["k"] for r in dst.read().collect()} == {1, 2}
    src.merge(spark.createDataFrame(
        [("U", 1, 2, "a2"), ("D", 2, 2, None)], ROWS), manifest_key="w1")
    sync_changes(sp, dp)
    got = {r["k"]: r["x"] for r in dst.read().collect()}
    assert got == {1: "a2"}
    assert last_synced_version(dp) == src.current_version()
