"""Storage-partitioned join (SPJ): join two co-bucketed LakeTables with
ZERO shuffle on either side.

Both tables hash their rows into ``n_buckets`` buckets by
``pmod(xxhash64(key cols), n_buckets)`` (lake/table.py `_bucket_of`).
When two tables share the bucket count and their key columns are
pairwise type-identical, equal join keys land in the SAME bucket id on
both sides — so the join decomposes into ``n_buckets`` independent
bucket-pair joins with no data movement at all. COMPATIBLE counts join
too: when one ``n_buckets`` divides the other (the shape an incremental
rescale leaves behind), keys co-locate at the coarser granularity
(``h % coarse = (h % fine) % coarse``) and the join runs one task per
COARSE bucket, folding the finer side's k child buckets in — disjoint
key spaces, every file read exactly once, still zero Exchange. This is Spark 3.3+'s
storage-partitioned join (SPARK-37375) re-expressed for this format:
the fact-to-fact join Catalyst cannot avoid shuffling for plain parquet
(it cannot see the layout) runs here as one task per bucket.

Execution shape (the whole plan is ``Range -> MapInArrow`` — no
Exchange, no sort, no broadcast of either side, and no pandas on the
fast path):

* driver: per-bucket file lists from both snapshots — zone-map file
  pruning applied per side (same soundness rules as ``read(where=...)``,
  lake/stats.py) — shipped as ONE broadcast of O(files) metadata;
* ``spark.range(n_buckets, numPartitions=n_buckets)``: task i owns
  bucket i on both sides (the same bijection the write path uses);
* each task reads its bucket's parquet files column-pruned via Arrow
  and CASTS each file to the declared table schema (which is also what
  makes promoted-type and rename-evolved vintages align), resolves
  merge-on-read LWW exactly where the engine's read would (multi-file
  or nonunique buckets; Arrow sort + grouped ``last``, falling back to
  a pandas resolve only for nested payload types), drops tombstones,
  applies the residual predicates as Arrow compute expressions, and
  joins the two sides through Acero's native hash join — the result
  batches stream straight back to the JVM with no pandas round-trip.

At 100 TB this is the difference between a join that moves both tables
through the cluster's network twice and one that reads each bucket once
where it lies: wall-clock scales with the largest bucket pair, task
count equals ``n_buckets`` at every cluster size (same decomposition at
N and 4N executors), and file pruning keeps cold buckets at zero I/O.
The working set of a task is its bucket PAIR in Arrow memory — the same
sizing rule as the write path (n_buckets ≈ 10^5 keeps buckets ~1 GB at
100 TB; a table that outgrows it takes an incremental rescale), and a join
whose buckets do not fit is a layout problem the metadata names, not a
silent spill.

Reference parity: the reference joins co-indexed pandas frames in one
process (e.g. ``impulsoetl``'s enriquecimento merges); this is that
merge made distributed WITHOUT acquiring a shuffle on the way.

Limits, checked loudly: both tables row-semantics (patch tables fold
per column — their winners are not rows this bucket-local LWW can
reproduce); join is on the FULL key tuple of each side (bucket
placement hashes all key columns, so a prefix join would not
co-locate); version columns must be non-null (the engine's merges
already require that). Null join keys cannot occur (merge refuses
null key columns), so SQL-vs-pandas null-match semantics never arise:
Acero, like SQL, would not match them.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType

from etl_spark.lake.table import META_DELETED, LakeTable, _is_patch
from etl_spark.lake import stats as _st

__all__ = ["cobucket_join"]


def _arrow_type(spark_type):
    """Arrow type for a Spark type — pyspark's own mapping, so the
    batches this kernel yields match what mapInArrow expects."""
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(spark_type)


def _is_nested(atype) -> bool:
    import pyarrow.types as pt

    return (pt.is_nested(atype) or pt.is_list(atype)
            or pt.is_struct(atype) or pt.is_map(atype))


def _pred_mask(tbl, preds):
    """Residual predicate evaluation on LWW winners — the Arrow mirror
    of lake/stats.predicate_column (same tuple grammar; NULL compares
    false, like SQL)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    mask = None
    for p in preds:
        col, op = p[0], p[1]
        if isinstance(col, (tuple, list)):
            # composite-key IN: OR of per-tuple AND-equalities (the
            # tuple lists are bounded probe sets, lake/stats.py)
            tuples = p[2] if op == "in" else [p[2]]
            m = None
            for t in tuples:
                em = None
                for c, v in zip(col, t):
                    e = pc.equal(tbl[c], v)
                    em = e if em is None else pc.and_kleene(em, e)
                m = em if m is None else pc.or_kleene(m, em)
        else:
            s = tbl[col]
            v = p[2]
            if op == "=":
                m = pc.equal(s, v)
            elif op == ">":
                m = pc.greater(s, v)
            elif op == ">=":
                m = pc.greater_equal(s, v)
            elif op == "<":
                m = pc.less(s, v)
            elif op == "<=":
                m = pc.less_equal(s, v)
            elif op == "in":
                m = pc.is_in(s, value_set=pa.array(list(v), type=s.type))
            elif op == "between":
                m = pc.and_kleene(pc.greater_equal(s, v),
                                  pc.less_equal(s, p[3]))
            else:  # pragma: no cover — validate_predicates refuses these
                raise ValueError(f"unsupported op {op!r}")
        m = pc.fill_null(m, False)
        mask = m if mask is None else pc.and_kleene(mask, m)
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


def _lww_pandas(tbl, keys, vers):
    """LWW resolve through pandas for payload types Arrow's grouped
    ``last`` kernel does not take (nested lists/structs) — the slow
    path; primitive schemas stay in Arrow."""
    import pyarrow as pa

    pdf = tbl.to_pandas()
    pdf = pdf.sort_values(vers, kind="mergesort", na_position="first") \
             .drop_duplicates(subset=keys, keep="last")
    return pa.Table.from_pandas(pdf, schema=tbl.schema,
                                preserve_index=False)


def _load_side(root, files, user_cols, atypes, renames, mor, keys, vers,
               preds, defaults=None):
    """Read one bucket side into an Arrow table of live LWW winners:
    per-file column-pruned reads cast to the declared schema (aligning
    promoted-type and rename-evolved vintages), rename coalesce
    newest-first, initial-default fill by file vintage
    (alter_add_column), merge-on-read resolve, tombstone drop, residual
    predicate filter. Columns exactly ``user_cols``."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from etl_spark.lake.table import _file_vintage

    want = user_cols + [META_DELETED]
    parts = []
    for rel in files:
        pf = pq.ParquetFile(os.path.join(root, rel))
        have = set(pf.schema_arrow.names)
        phys = [c for c in want if c in have]
        for n, olds in renames.items():
            phys += [o for o in olds if o in have and o not in phys]
        t = pf.read(columns=phys)
        vintage = _file_vintage(rel)
        cols = {}
        for c in want:
            target = atypes[c]
            src = t[c] if c in t.column_names else None
            if src is not None:
                src = pc.cast(src, target)
            for o in renames.get(c, ()):  # newest-first precedence
                if o in t.column_names:
                    oc = pc.cast(t[o], target)
                    src = oc if src is None else pc.coalesce(src, oc)
            d = (defaults or {}).get(c)
            if d is not None and vintage < d["at"]:
                # pre-alter file: rows read the column's initial default
                # (cast from the JSON-stored literal, so e.g. an ISO
                # string default fills a date column)
                dv = pc.cast(pa.scalar(d["v"]), target)
                src = pc.fill_null(
                    pa.nulls(t.num_rows, target) if src is None else src,
                    dv)
            cols[c] = src if src is not None else pa.nulls(
                t.num_rows, target)
        parts.append(pa.table(cols))
    tbl = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
    if mor and tbl.num_rows:
        if any(_is_nested(atypes[c]) for c in want):
            tbl = _lww_pandas(tbl, keys, vers)
        else:
            tbl = tbl.sort_by([(v, "ascending") for v in vers])
            aggs = [c for c in want if c not in keys]
            g = pa.TableGroupBy(tbl, keys, use_threads=False).aggregate(
                [(c, "last") for c in aggs])
            ren = {f"{c}_last": c for c in aggs}
            g = g.rename_columns([ren.get(n, n) for n in g.column_names])
            tbl = g.select(want)
    if tbl.num_rows:
        tbl = tbl.filter(pc.invert(pc.fill_null(tbl[META_DELETED], False)))
    tbl = tbl.drop_columns([META_DELETED])
    if preds and tbl.num_rows:
        tbl = tbl.filter(_pred_mask(tbl, preds))
    return tbl


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
    if ls.n_buckets != rs.n_buckets and \
            max(ls.n_buckets, rs.n_buckets) % \
            min(ls.n_buckets, rs.n_buckets) != 0:
        # COMPATIBLE layouts need only a common modulus: when one count
        # divides the other, keys still co-locate at the coarser
        # granularity — h % coarse = (h % fine) % coarse. An incremental
        # rescale therefore never breaks a table's SPJ partners: the
        # finer side's k child buckets per coarse id are disjoint key
        # spaces and join inside one task. Arbitrary counts share no
        # modulus and genuinely require a rebucket.
        raise ValueError(
            f"tables are not co-bucketed: n_buckets {ls.n_buckets} vs "
            f"{rs.n_buckets} share no common modulus (one must divide "
            f"the other; rebucket or rescale one side)"
        )
    for side, s in (("left", ls), ("right", rs)):
        if s.rescale_to is not None:
            # mid-rescale a bucket id is watermark-dependent, so "equal
            # keys share a bucket id" no longer holds ACROSS tables —
            # the zero-shuffle decomposition would silently drop matches
            raise ValueError(
                f"{side} table is mid-rescale to {s.rescale_to} "
                f"(watermark {s.rescale_watermark}/{s.n_buckets}): drive "
                f"rescale_step() to completion before a co-bucketed join"
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

    import pyarrow as pa

    latypes = {c: _arrow_type(ltypes[c]) for c in lcols}
    ratypes = {c: _arrow_type(rtypes[c]) for c in rcols}
    latypes[META_DELETED] = ratypes[META_DELETED] = pa.bool_()
    out_arrow = pa.schema(
        [pa.field(c, latypes[c]) for c in lcols]
        + [pa.field(rout[c], ratypes[c]) for c in rpayload]
    )

    # join-unit space = the COARSER layout: with nF = k * nC, fine
    # bucket f holds exactly the keys with h % nC = f % nC of coarse
    # bucket f % nC, so one task per coarse id reads the coarse bucket
    # plus its k fine children — every file exactly once. ``buckets``
    # subsets are interpreted in this coarse space.
    n_coarse = min(ls.n_buckets, rs.n_buckets)

    def _fine_sel(n_side):
        if buckets is None or n_side == n_coarse:
            return buckets
        return [c + j * n_coarse for c in buckets
                for j in range(n_side // n_coarse)]

    def _fold(side_plan, n_side):
        if n_side == n_coarse:
            return side_plan
        out: dict = {}
        for b in sorted(side_plan):
            fl, mor = side_plan[b]
            cf, cm = out.get(b % n_coarse, ([], False))
            # children are disjoint key spaces: concatenating clean
            # buckets stays clean (no cross-file key repeats), so the
            # union needs LWW only if some constituent did
            out[b % n_coarse] = (cf + fl, cm or mor)
        return out

    plan = {}
    lplan = _fold(_side_plan(left, ls, lpreds, _fine_sel(ls.n_buckets)),
                  ls.n_buckets)
    rplan = _fold(_side_plan(right, rs, rpreds, _fine_sel(rs.n_buckets)),
                  rs.n_buckets)
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
        "latypes": latypes, "ratypes": ratypes,
        "lkeys": ls.key_cols, "lvers": ls.version_cols,
        "rkeys": rs.key_cols, "rvers": rs.version_cols,
        "lren": {n: o for n, o in ls.renamed_map().items() if n in lcols},
        "rren": {n: o for n, o in rs.renamed_map().items() if n in rcols},
        "ldef": {c: d for c, d in ls.default_map().items() if c in lcols},
        "rdef": {c: d for c, d in rs.default_map().items() if c in rcols},
        "lpreds": lpreds, "rpreds": rpreds,
        "rkey_to_l": rkey_to_l, "rout": rout, "out_cols": out_cols,
        "out_arrow": out_arrow, "how": how,
    })

    def _kernel(batches):
        cfg = bc.value
        out_a = cfg["out_arrow"]
        for rb in batches:
            for b in rb.column("id").to_pylist():
                entry = cfg["plan"].get(int(b))
                if entry is None:
                    continue
                (lfiles, lmor), (rfiles, rmor) = entry
                if not lfiles:
                    continue
                la = _load_side(cfg["lroot"], lfiles, cfg["lcols"],
                                cfg["latypes"], cfg["lren"], lmor,
                                cfg["lkeys"], cfg["lvers"], cfg["lpreds"],
                                cfg["ldef"])
                if not la.num_rows:
                    continue
                ra = None
                if rfiles:
                    ra = _load_side(cfg["rroot"], rfiles, cfg["rcols"],
                                    cfg["ratypes"], cfg["rren"], rmor,
                                    cfg["rkeys"], cfg["rvers"],
                                    cfg["rpreds"], cfg["rdef"])
                if ra is None or not ra.num_rows:
                    if cfg["how"] == "inner":
                        continue
                    merged = la
                    for c, name in cfg["rout"].items():
                        merged = merged.append_column(name, pa.nulls(
                            merged.num_rows, cfg["ratypes"][c]))
                else:
                    ren = {**cfg["rkey_to_l"], **cfg["rout"]}
                    ra = ra.rename_columns(
                        [ren.get(n, n) for n in ra.column_names])
                    merged = la.join(
                        ra, keys=cfg["lkeys"],
                        join_type="inner" if cfg["how"] == "inner"
                        else "left outer",
                    )
                if not merged.num_rows:
                    continue
                merged = merged.select(cfg["out_cols"]).cast(out_a)
                yield from merged.combine_chunks().to_batches()

    n = n_coarse
    return spark.range(0, n, 1, numPartitions=n).mapInArrow(
        _kernel, schema=out_schema)
