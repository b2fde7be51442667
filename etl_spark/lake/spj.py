"""Storage-partitioned join (SPJ): join two co-bucketed LakeTables with
ZERO shuffle on either side.

Both tables hash their rows into ``n_buckets`` buckets by
``pmod(xxhash64(key cols), n_buckets)`` (lake/table.py `_bucket_of`).
When two tables share the bucket count and their key columns are
pairwise type-identical, equal join keys land in the SAME bucket id on
both sides — so the join decomposes into ``n_buckets`` independent
bucket-pair joins with no data movement at all. This is Spark 3.3+'s
storage-partitioned join (SPARK-37375) re-expressed for this format:
the fact-to-fact join Catalyst cannot avoid shuffling for plain parquet
(it cannot see the layout) runs here as one task per bucket.

Execution shape (the whole plan is ``Range -> mapInPandas`` — no
Exchange, no sort, no broadcast of either side):

* driver: per-bucket file lists from both snapshots — zone-map file
  pruning applied per side (same soundness rules as ``read(where=...)``,
  lake/stats.py) — shipped as ONE broadcast of O(files) metadata;
* ``spark.range(n_buckets, numPartitions=n_buckets)``: task i owns
  bucket i on both sides (the same bijection the write path uses);
* each task reads its bucket's parquet files column-pruned via Arrow,
  resolves merge-on-read LWW exactly where the engine's read would
  (multi-file or nonunique buckets), drops tombstones, applies the
  residual predicates on the winners, and joins the two sides in one
  vectorized pandas merge.

At 100 TB this is the difference between a join that moves both tables
through the cluster's network twice and one that reads each bucket once
where it lies: wall-clock scales with the largest bucket pair, task
count equals ``n_buckets`` at every cluster size (same decomposition at
N and 4N executors), and file pruning keeps cold buckets at zero I/O.
The working set of a task is its bucket PAIR in Arrow memory — the same
sizing rule as the write path (n_buckets ≈ 10^5 keeps buckets ~1 GB at
100 TB; a table that outgrows it takes one ``rebucket``), and a join
whose buckets do not fit is a layout problem the metadata names, not a
silent spill.

Reference parity: the reference joins co-indexed pandas frames in one
process (e.g. ``impulsoetl``'s enriquecimento merges); this is that
merge made distributed WITHOUT acquiring a shuffle on the way.

Limits, checked loudly: both tables row-semantics (patch tables fold
per column — their winners are not rows a pandas LWW can reproduce);
join is on the FULL key tuple of each side (bucket placement hashes all
key columns, so a prefix join would not co-locate); version columns
must be non-null (the engine's merges already require that).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType

from etl_spark.lake.table import META_DELETED, LakeTable, _is_patch
from etl_spark.lake import stats as _st

__all__ = ["cobucket_join"]


def _nullable_dtype(spark_type) -> str | None:
    """Pandas NULLABLE dtype for a Spark type — integral/bool columns
    must not decay to float64 when a file lacks them or a left join
    misses (NaN would then fail the Arrow cast back to long)."""
    s = spark_type.simpleString()
    return {
        "bigint": "Int64", "int": "Int32", "smallint": "Int16",
        "tinyint": "Int8", "boolean": "boolean",
        "double": "float64", "float": "float32",
    }.get(s)


def _arrow_join(lp, rp, keys, how):
    """Join two pandas frames through Arrow's native hash join (Acero).
    String join keys hash as native Arrow strings instead of Python
    objects. Measured (tools/bench_spj.py, 8M x 8M): ~4% on the
    merge-on-read shape, neutral on compacted buckets — the task wall
    is parquet read + LWW resolve, not the join — kept because it also
    removes a semantic trap: ``pandas.merge`` matches NaN keys to each
    other, Acero (like SQL) does not; engine keys are non-null by
    contract, so neither path could diverge, but the Arrow join makes
    that true by construction. Output row order is arbitrary, like any
    Spark join."""
    import pandas as pd
    import pyarrow as pa

    mapper = {
        pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int32Dtype(),
        pa.int16(): pd.Int16Dtype(), pa.int8(): pd.Int8Dtype(),
        pa.bool_(): pd.BooleanDtype(),
    }.get
    la = pa.Table.from_pandas(lp, preserve_index=False)
    ra = pa.Table.from_pandas(rp, preserve_index=False)
    joined = la.join(
        ra, keys=keys, join_type="inner" if how == "inner" else "left outer"
    )
    return joined.to_pandas(types_mapper=mapper)


def _pred_mask(pdf, preds):
    """Residual predicate evaluation on LWW winners — the pandas mirror
    of lake/stats.predicate_column (same tuple grammar; NULL compares
    false, like SQL)."""
    import pandas as pd

    mask = pd.Series(True, index=pdf.index)
    for p in preds:
        col, op = p[0], p[1]
        if isinstance(col, (tuple, list)):
            tuples = p[2] if op == "in" else [p[2]]
            keys = pd.MultiIndex.from_frame(pdf[list(col)])
            want = pd.MultiIndex.from_tuples([tuple(t) for t in tuples])
            m = pd.Series(keys.isin(want), index=pdf.index)
        else:
            s = pdf[col]
            v = p[2]
            if op == "=":
                m = s == v
            elif op == ">":
                m = s > v
            elif op == ">=":
                m = s >= v
            elif op == "<":
                m = s < v
            elif op == "<=":
                m = s <= v
            elif op == "in":
                m = s.isin(list(v))
            elif op == "between":
                m = (s >= v) & (s <= p[3])
            else:  # pragma: no cover — validate_predicates refuses these
                raise ValueError(f"unsupported op {op!r}")
        # nullable-dtype comparisons yield pd.NA for NULL operands
        mask &= pd.Series(m, index=pdf.index).fillna(False).astype(bool)
    return mask


def _side_plan(table: LakeTable, snap, preds, buckets):
    """Per-bucket ``(files, needs_lww)`` after zone-map pruning — the
    metadata half of ``read(where=...)``, grouped by bucket."""
    sel = snap.buckets if buckets is None else {
        b: snap.buckets.get(b, []) for b in buckets
    }
    nonuniq = set(snap.nonunique)
    out = {}
    for b, fl in sel.items():
        if not fl:
            continue
        is_mor = len(fl) > 1 or any(f in nonuniq for f in fl)
        use = _st.prunable_predicates(
            preds, snap.key_cols, snap.version_cols, not is_mor
        ) if preds else []
        keep = [f for f in fl
                if not use or _st.file_matches(snap.file_stats.get(f), use,
                                               root=table.path)]
        if keep:
            out[b] = (keep, is_mor)
    return out


def _read_side(root, files, user_cols, types_by_col, renames):
    """Read one bucket side into a pandas frame: per-file column-pruned
    Arrow reads, rename coalesce across physical vintages, nullable
    integral dtypes, columns aligned to ``user_cols`` + tombstone."""
    import pandas as pd
    import pyarrow.parquet as pq

    want = user_cols + [META_DELETED]
    frames = []
    for rel in files:
        pf = pq.ParquetFile(os.path.join(root, rel))
        have = set(pf.schema_arrow.names)
        phys = [c for c in want if c in have]
        for n, olds in renames.items():
            phys += [o for o in olds if o in have and o not in phys]
        pdf = pf.read(columns=phys).to_pandas()
        for n, olds in renames.items():
            if n not in pdf.columns:
                pdf[n] = pd.NA
            for o in olds:  # newest-first precedence, like the read path
                if o in pdf.columns:
                    pdf[n] = pdf[n].where(pdf[n].notna(), pdf[o])
        frames.append(pdf.reindex(columns=want))
    pdf = frames[0] if len(frames) == 1 else pd.concat(
        frames, ignore_index=True)
    for c in user_cols:
        st = types_by_col[c].simpleString()
        dt = _nullable_dtype(types_by_col[c])
        if dt is not None:
            if str(pdf[c].dtype) != dt:
                pdf[c] = pdf[c].astype(dt)
        elif str(pdf[c].dtype) == "float64":
            # reindex/concat filler for a file that lacks this column:
            # an all-NaN float64 that Arrow cannot cast back to the
            # declared string/timestamp/etc. type
            if st.startswith("timestamp"):
                pdf[c] = pdf[c].astype("datetime64[ns]")
            else:
                pdf[c] = pdf[c].astype(object).where(pdf[c].notna(), None)
    return pdf


def cobucket_join(
    left: LakeTable,
    right: LakeTable,
    how: str = "inner",
    rsuffix: str = "_r",
    where_left: Sequence | None = None,
    where_right: Sequence | None = None,
    buckets: list[int] | None = None,
    version: int | None = None,
    right_version: int | None = None,
) -> DataFrame:
    """Join two co-bucketed LakeTables on their key columns with zero
    shuffle (module docstring has the full story). Returns a DataFrame
    with the LEFT key/payload columns plus the right payload columns
    (collisions suffixed ``rsuffix``). ``how`` is ``inner`` or ``left``.
    ``where_left`` / ``where_right`` take ``read(where=...)``'s
    predicate tuples — they prune files per side before any I/O and
    filter winners before the join. ``version`` / ``right_version``
    pin snapshots (time-travel joins)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    ls, rs = left.snapshot(version), right.snapshot(right_version)
    if _is_patch(ls.props) or _is_patch(rs.props):
        raise ValueError(
            "cobucket_join requires row update semantics on both sides "
            "(patch tables fold winners per COLUMN — resolve them with "
            "read() and join normally)"
        )
    if ls.n_buckets != rs.n_buckets:
        raise ValueError(
            f"tables are not co-bucketed: n_buckets {ls.n_buckets} != "
            f"{rs.n_buckets} (rebucket one side first)"
        )
    if len(ls.key_cols) != len(rs.key_cols):
        raise ValueError(
            f"key arity differs: {ls.key_cols} vs {rs.key_cols}"
        )
    ltypes = {f.name: f.dataType for f in ls.schema.fields}
    rtypes = {f.name: f.dataType for f in rs.schema.fields}
    for lc, rc in zip(ls.key_cols, rs.key_cols):
        if ltypes[lc] != rtypes[rc]:
            raise ValueError(
                f"key column types differ: {lc}:{ltypes[lc].simpleString()}"
                f" vs {rc}:{rtypes[rc].simpleString()} — xxhash64 bucket "
                f"placement is type-sensitive, the layouts do not align"
            )
    lpreds = list(where_left or [])
    rpreds = list(where_right or [])
    if lpreds:
        _st.validate_predicates(lpreds, [f.name for f in ls.schema.fields])
    if rpreds:
        _st.validate_predicates(rpreds, [f.name for f in rs.schema.fields])

    lcols = [f.name for f in ls.schema.fields]
    rcols = [f.name for f in rs.schema.fields]
    rkey_to_l = dict(zip(rs.key_cols, ls.key_cols))
    rpayload = [c for c in rcols if c not in rs.key_cols]
    taken = set(lcols)
    rout = {}
    for c in rpayload:
        name = c if c not in taken else c + rsuffix
        if name in taken:
            raise ValueError(
                f"output column collision on {name!r} even after "
                f"rsuffix={rsuffix!r}"
            )
        taken.add(name)
        rout[c] = name
    out_cols = lcols + [rout[c] for c in rpayload]
    out_schema = StructType(
        [StructField(c, ltypes[c], True) for c in lcols]
        + [StructField(rout[c], rtypes[c], True) for c in rpayload]
    )

    plan = {}
    lplan = _side_plan(left, ls, lpreds, buckets)
    rplan = _side_plan(right, rs, rpreds, buckets)
    # left join output only needs buckets where the LEFT has rows
    ids = set(lplan) & set(rplan) if how == "inner" else set(lplan)
    for b in ids:
        plan[b] = (lplan.get(b, ([], False)), rplan.get(b, ([], False)))
    spark = left.spark
    if not plan:
        return spark.createDataFrame([], out_schema)
    bc = spark.sparkContext.broadcast({
        "plan": plan,
        "lroot": left.path, "rroot": right.path,
        "lcols": lcols, "rcols": rcols,
        "ltypes": ltypes, "rtypes": rtypes,
        "lkeys": ls.key_cols, "lvers": ls.version_cols,
        "rkeys": rs.key_cols, "rvers": rs.version_cols,
        "lren": {n: o for n, o in ls.renamed_map().items() if n in lcols},
        "rren": {n: o for n, o in rs.renamed_map().items() if n in rcols},
        "lpreds": lpreds, "rpreds": rpreds,
        "rkey_to_l": rkey_to_l, "rout": rout, "out_cols": out_cols,
        "how": how,
    })

    def _kernel(batches):
        import pandas as pd

        cfg = bc.value
        for pdf_ids in batches:
            for b in pdf_ids["id"].tolist():
                entry = cfg["plan"].get(int(b))
                if entry is None:
                    continue
                (lfiles, lmor), (rfiles, rmor) = entry

                def _load(files, mor, root, cols, types, ren, keys, vers,
                          preds):
                    if not files:
                        return None
                    pdf = _read_side(root, files, cols, types, ren)
                    if mor and len(pdf):
                        pdf = pdf.sort_values(
                            vers, kind="mergesort", na_position="first"
                        ).drop_duplicates(subset=keys, keep="last")
                    pdf = pdf[~pdf[META_DELETED].astype(bool)]
                    if preds and len(pdf):
                        pdf = pdf[_pred_mask(pdf, preds)]
                    return pdf.drop(columns=[META_DELETED])

                lp = _load(lfiles, lmor, cfg["lroot"], cfg["lcols"],
                           cfg["ltypes"], cfg["lren"], cfg["lkeys"],
                           cfg["lvers"], cfg["lpreds"])
                if lp is None or not len(lp):
                    continue
                rp = _load(rfiles, rmor, cfg["rroot"], cfg["rcols"],
                           cfg["rtypes"], cfg["rren"], cfg["rkeys"],
                           cfg["rvers"], cfg["rpreds"])
                if rp is None or not len(rp):
                    if cfg["how"] == "inner":
                        continue
                    merged = lp.copy()
                    for c, name in cfg["rout"].items():
                        merged[name] = None
                else:
                    rp = rp.rename(columns=cfg["rkey_to_l"]).rename(
                        columns=cfg["rout"])
                    merged = _arrow_join(lp, rp, cfg["lkeys"], cfg["how"])
                if not len(merged):
                    continue
                out = merged.reindex(columns=cfg["out_cols"])
                for c, name in cfg["rout"].items():
                    dt = _nullable_dtype(cfg["rtypes"][c])
                    if dt is not None and str(out[name].dtype) != dt:
                        out[name] = out[name].astype(dt)
                yield out

    n = ls.n_buckets
    return spark.range(0, n, 1, numPartitions=n).mapInPandas(
        _kernel, schema=out_schema)
