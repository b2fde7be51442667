"""Z-order (Morton-curve) clustering for multi-dimension file layouts.

``cluster_cols`` with the default lexicographic order gives row-group
pruning on the FIRST dimension only: inside a compacted file sorted by
``(a, b)``, every row group spans nearly the whole domain of ``b``, so a
predicate on ``b`` alone — or on both — prunes nothing beyond what ``a``
already gave. The reference's two-dimensional slice pruning (UF × month
file patterns, /root/reference/src/impulsoetl/sisab/
relatorio_saude_producao/procedimentos.py:210-219) needs BOTH dimensions
to cut; the lake analogue is interleaving the dimensions' bits into one
sort key so that rows close on the curve are close in EVERY dimension —
Iceberg's ``zorder()`` sort-order / Delta ``OPTIMIZE ZORDER BY`` parity.

Set the table prop ``cluster_order: "zorder"`` next to a multi-column
``cluster_cols``; background rewrites (compaction / rebucket / widening
rewrite) then sort each bucket file by the Morton key instead of
lexicographically. Mechanics:

* **Rank** — each dimension is normalized to a ``zorder_bits``-bit
  integer cell (default 16: 65,536 cells per dimension, far finer than
  any file's row-group count) by min/max scaling. Bounds come from the
  snapshot's existing zone-map metadata when ``stats_cols`` covers the
  cluster columns (driver-side fold of per-file bounds, zero data I/O);
  otherwise ONE min/max aggregate over the rewrite's input files — the
  raw pre-fold frame, so the fold is never evaluated twice. Bounds from
  a superset of the written rows are still valid bounds (ranks clamp).
* **Interleave** — ranks are bit-interleaved MSB-first into a single
  long (``d × bits ≤ 63``), entirely with JVM-side shift/and/or
  expressions: whole-stage codegen, no UDF, no shuffle beyond the sort
  the rewrite already pays.
* **Semantics** — a pure ORDER change: merge-on-read resolution, zone
  maps, blooms and the residual filters are untouched; reads return
  byte-identical rows. NULL ranks clamp to cell 0 (nulls cluster
  together at the curve's origin).

Numeric, date and timestamp dimensions are supported; strings are
refused loudly (their collation order does not embed in a numeric
curve — keep them lexicographic or key-side). Skewed dimensions get
skewed cell occupancy (min/max scaling, as in Iceberg's fixed-transform
z-values); the row groups still separate because the curve is locality
preserving within the occupied cells.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "cluster_bounds", "validate_zorder_cols"]

DEFAULT_BITS = 16

_EPOCH_DATE = dt.date(1970, 1, 1)
_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float"}


def validate_zorder_cols(schema, cols: list[str]) -> None:
    by_name = {f.name: f.dataType for f in schema.fields}
    for c in cols:
        t = by_name[c].simpleString()
        if not (t in _NUMERIC or t.startswith("decimal")
                or t in ("date", "timestamp", "timestamp_ntz")):
            raise ValueError(
                f"cluster_order=zorder supports numeric/date/timestamp "
                f"dimensions; column {c!r} is {t!r} — keep it "
                f"lexicographic or drop it from cluster_cols"
            )


def _as_double(col: str, dtype) -> Column:
    """A monotone numeric image of the column (double is exact for the
    16-bit cell resolution that matters here)."""
    t = dtype.simpleString()
    if t == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01").cast("date")) \
            .cast("double")
    if t in ("timestamp", "timestamp_ntz"):
        # ntz casts through timestamp (session-tz interpretation: a
        # constant offset, harmless for rank ordering)
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    return F.col(col).cast("double")


def _bound_as_float(v) -> float:
    """Decoded zone-map bound → the same numeric image as _as_double."""
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    if isinstance(v, dt.date):
        return float((v - _EPOCH_DATE).days)
    return float(v)


def cluster_bounds(
    snap, cols: list[str], files: list[str], fallback_df: DataFrame,
) -> dict[str, tuple[float, float]]:
    """Per-dimension (min, max) over the rewrite input. Metadata-only
    from the snapshot's zone maps when they cover every input file;
    otherwise one min/max aggregate over ``fallback_df`` (the raw input
    read — a columnar scan of just these columns)."""
    from etl_spark.lake.stats import decode_bound

    if all(c in snap.stats_cols() for c in cols) and files and all(
        c in snap.file_stats.get(f, {}) for f in files for c in cols
    ):
        out = {}
        for c in cols:
            los, his = [], []
            for f in files:
                b = snap.file_stats[f][c]
                los.append(_bound_as_float(decode_bound(b[0])))
                his.append(_bound_as_float(decode_bound(b[1])))
            out[c] = (min(los), max(his))
        return out
    types = {f.name: f.dataType for f in fallback_df.schema.fields}
    aggs = []
    for c in cols:
        v = _as_double(c, types[c])
        aggs += [F.min(v).alias(f"__lo_{c}"), F.max(v).alias(f"__hi_{c}")]
    row = fallback_df.agg(*aggs).collect()[0]
    return {
        c: (row[f"__lo_{c}"] if row[f"__lo_{c}"] is not None else 0.0,
            row[f"__hi_{c}"] if row[f"__hi_{c}"] is not None else 0.0)
        for c in cols
    }


def zorder_key(
    schema,
    bounds: dict[str, tuple[float, float]],
    bits: int = DEFAULT_BITS,
) -> Column:
    """The Morton sort key over ``bounds``' dimensions as one JVM-side
    expression: per-dimension clamped min/max cell ranks, bits
    interleaved MSB-first (dimension order = dict order, matching
    ``cluster_cols``)."""
    cols = list(bounds)
    d = len(cols)
    bits = max(1, min(bits, 63 // d))
    scale = (1 << bits) - 1
    types = {f.name: f.dataType for f in schema.fields}
    ranks = []
    for c in cols:
        lo, hi = bounds[c]
        v = _as_double(c, types[c])
        if hi > lo:
            r = F.floor((v - F.lit(float(lo)))
                        * F.lit(float(scale) / (hi - lo))).cast("long")
            r = F.least(F.greatest(r, F.lit(0).cast("long")),
                        F.lit(scale).cast("long"))
        else:
            r = F.lit(0).cast("long")
        ranks.append(F.coalesce(r, F.lit(0).cast("long")))
    out = F.lit(0).cast("long")
    for j in range(bits):  # MSB-first: high bits of every dim lead
        for i, r in enumerate(ranks):
            bit = F.shiftrightunsigned(r, bits - 1 - j) \
                .bitwiseAND(F.lit(1).cast("long"))
            out = out.bitwiseOR(
                F.shiftleft(bit, bits * d - 1 - (j * d + i)))
    return out


def zorder_ref(values: list[tuple], bounds: list[tuple[float, float]],
               bits: int = DEFAULT_BITS) -> list[int]:
    """Pure-Python reference Morton keys for test parity (same clamp,
    same MSB-first interleave)."""
    d = len(bounds)
    bits = max(1, min(bits, 63 // d))
    scale = (1 << bits) - 1
    out = []
    for tup in values:
        z = 0
        for j in range(bits):
            for i, v in enumerate(tup):
                lo, hi = bounds[i]
                if v is None or hi <= lo:
                    r = 0
                else:
                    r = int((float(v) - lo) * (scale / (hi - lo)))
                    r = min(max(r, 0), scale)
                bit = (r >> (bits - 1 - j)) & 1
                z |= bit << (bits * d - 1 - (j * d + i))
        out.append(z)
    return out
