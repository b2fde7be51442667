"""Driver-contract query library: one entry per implemented operator
(SURVEY.md §2), each with a DuckDB oracle that reproduces it exactly.

Every query is a callable ``(spark, sf_dir) -> DataFrame`` over the driver's
parquet tables (region nation customer supplier part orders lineitem events
documents embeddings); ``ORACLES[name]`` is ANSI SQL DuckDB runs on the same
tables. Engine-portability rules used throughout:

- hashes: md5 / sha256 / :func:`etl_spark.functions.hashing.portable_hash60`
  (identical in both engines);
- floats: round before emitting (2-6 dp) and break ranking ties on ids;
- money/ints: integer cent math instead of locale formatting;
- sorted canonical strings instead of nondeterministic collect order.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.functions import (
    decode_bool,
    doc_fingerprint,
    money_brl_to_double,
    month_pt_to_num,
    normalize_text,
    null_if_all_nines,
    parse_aaaamm,
    parse_aaaammdd,
    parse_dmy,
    roman_to_int,
    strip_non_digits,
    stopword_ratio,
    token_count,
    zfill,
)
from etl_spark.functions.hashing import portable_hash60_sql
from etl_spark.functions.text import STOPWORDS_EN, tokens, word_shingles
from etl_spark.operators import (
    anti_join_fill,
    asof_join,
    broadcast_lookup,
    brute_force_topk,
    exact_dedup_groups,
    group_nest_sorted,
    lsh_ann_topk,
    lsh_buckets,
    hash_split,
    melt,
    minhash_signature,
    ngram_jaccard_pairs,
    range_join,
    simhash_groups,
    stratified_sample,
)
from etl_spark.operators.sampling import hash_permille_sql
from etl_spark.plans import apply_de_para, impose_types, with_additive_columns

__all__ = ["QUERIES", "ORACLES", "flagship"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


#: scratch dirs created by table-building queries this process. The
#: returned DataFrames read these paths LAZILY, so the query functions
#: cannot clean up themselves — harnesses (bench.py, check_correctness)
#: call :func:`cleanup_scratch` once all result actions are done.
_SCRATCH_DIRS: list[str] = []


def _tmpdir(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d


def cleanup_scratch() -> int:
    """Remove every scratch dir created by query functions in this
    process; returns how many were removed. Call after the last action
    on any returned DataFrame."""
    import shutil

    n = 0
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)
        n += 1
    return n


def _h60(expr: str) -> str:
    return portable_hash60_sql(expr)


# --------------------------------------------------------------------- CDC

def q_cdc_lww_latest_state(spark, sf_dir):
    """LWW dedup (SURVEY §2.5): latest event per user via combinable max_by."""
    from etl_spark.cdc.lww import lww_dedup

    ev = _t(spark, sf_dir, "events")
    out = lww_dedup(ev, ["user_id"], ["ts", "event_id"])
    return out.select("user_id", "event_id", "ts", "event_type", "value", "props")


SQL_CDC_LWW = """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_cdc_replay_final_state(spark, sf_dir):
    """Flagship: full engine path — events table reinterpreted as a WAL
    (error=delete, signup=insert, rest=update), landed as epoch files,
    replayed through LakeTable MERGE with exactly-once manifests; returns
    the final live table state."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_replay_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=16,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        # write-optimized CDC-tail config (the headline bench mode):
        # deltas land as-is, read-time LWW resolves winners — identical
        # final state, fewer jobs per merge
        table_props={"batch_dedup": "false", "write_metrics": "coarse"},
    )
    return table.read().select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


SQL_CDC_REPLAY = """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_point_lookup(spark, sf_dir):
    """Bucket-pruned point lookup against a replayed LakeTable (the
    reference's memoized per-key dim SELECTs at lake scale,
    geografias.py:78-97): a k-key lookup hashes the keys driver-side,
    reads ONLY their buckets, pushes an IN-list predicate to the parquet
    scan (row-group pruning via the key-sorted compacted layout), then
    exact-matches with a broadcast semi join."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 3)
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(2)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_lookup_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=16,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
    )
    table.compact()  # key-sorted single-file buckets => row-group pruning
    keys = [(uid,) for uid in (3, 13, 23, 33, 43, 53, 63, 73)]
    return table.lookup(keys).select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


SQL_POINT_LOOKUP = """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id % 10 = 3
) WHERE rn = 1 AND event_type <> 'error'
  AND user_id IN (3, 13, 23, 33, 43, 53, 63, 73)
"""


def q_bloom_point_lookup(spark, sf_dir):
    """Bloom-filter file skipping on an UN-compacted merge-on-read table
    (lake/bloom.py): every epoch file spans nearly the full key range
    (hash-scattered), so zone maps cannot refute an equality probe — the
    per-file blooms skip every delta file that does not hold the probed
    keys, pre-LWW-sound on key columns. The query raises if no file was
    actually pruned, so the driver verdict covers the skipping itself,
    not just the row values."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 7)
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        # Epoch shards by KEY (not by event): a key's whole history lands
        # in one epoch's delta files — the cold-key CDC-tail shape whose
        # point read blooms accelerate. Event-sharded epochs put every
        # active user in EVERY file once events-per-user exceeds the
        # epoch count, so pruning would (truthfully) go inert at sf>=0.1
        # and the gate's raise would fire on scale, not on regression.
        F.pmod(F.floor(F.col("user_id") / 10).cast("long"), F.lit(4))
        .alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_bloom_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=4,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        # high threshold: keep all 4 epoch deltas as separate MoR files so
        # the probe exercises bloom skipping where zone maps are blind;
        # auto-sized bitmaps keep fpp ~1% at any scale factor
        table_props={"bloom_cols": "user_id", "bloom_bits": "auto",
                     "compact_threshold": "100"},
    )
    keys = [7, 107, 207, 307, 407, 507]
    where = [("user_id", "in", keys)]
    counts = table.scan_counts(where=where)
    # Raise only when the layout has enough files that pruning is
    # expected (tiny scale factors can collapse to a single delta file,
    # where "nothing pruned" is emptiness, not regression).
    if counts["files_total"] >= 8 and counts["files_pruned"] == 0:
        raise AssertionError(
            f"bloom pruning inert: {counts} — the gate exists to catch "
            f"exactly this regression")
    return table.read(where=where).select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


SQL_BLOOM_LOOKUP = """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id % 10 = 7
) WHERE rn = 1 AND event_type <> 'error'
  AND user_id IN (7, 107, 207, 307, 407, 507)
"""


def q_bloom_pair_lookup(spark, sf_dir):
    """Composite-bloom point lookup on a MULTI-COLUMN key (lake/bloom.py
    composite entries): on a hash-bucketed layout most individual key
    values appear in every delta file, so scalar blooms and zone maps
    cannot refute a pair probe — only a bloom over the (user_id,
    event_id) PAIR, probed by ``lookup()``'s tuple predicate, skips the
    files that don't hold the probed pairs. Raises if the tuple
    predicate pruned nothing, so the driver verdict covers the skipping
    itself, not just the row values."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 4)
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_bloom_pair_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=4,
        key_cols=["user_id", "event_id"], version_cols=["ts"],
        # high threshold: all 4 epoch deltas stay separate MoR files;
        # auto-sized bitmaps keep fpp ~1% at any scale factor
        table_props={"bloom_cols": "user_id|event_id",
                     "bloom_bits": "auto", "compact_threshold": "100"},
    )
    probe_users = [4, 104, 204, 304, 404, 504]
    pairs = [
        (r["user_id"], r["event_id"])
        for r in ev.filter(F.col("user_id").isin(probe_users))
        .groupBy("user_id").agg(F.min("event_id").alias("event_id"))
        .orderBy("user_id").collect()
    ]
    counts = table.scan_counts(
        where=[(("user_id", "event_id"), "in", pairs)])
    # see q_bloom_point_lookup: tiny scale factors can collapse to a
    # handful of files where zero pruning is emptiness, not regression
    if counts["files_total"] >= 8 and counts["files_pruned"] == 0:
        raise AssertionError(
            f"composite-bloom pruning inert: {counts} — the gate exists "
            f"to catch exactly this regression")
    return table.lookup(pairs).select(
        "user_id", "event_id", "ts", "event_type", "value", "props")


SQL_BLOOM_PAIR_LOOKUP = """
SELECT e.user_id, e.event_id, e.ts, e.event_type, e.value, e.props
FROM events e
JOIN (
  SELECT user_id, min(event_id) AS event_id
  FROM events
  WHERE user_id % 10 = 4
    AND user_id IN (4, 104, 204, 304, 404, 504)
  GROUP BY user_id) k
  ON e.user_id = k.user_id AND e.event_id = k.event_id
WHERE e.event_type <> 'error'
"""


# -------------------------------------------------------- M1: transforms

DE_PARA_LINEITEM = {
    "l_orderkey": "order_id",
    "l_linenumber": "line_no",
    "l_quantity": "qty",
    "l_extendedprice": "gross_price",
    "l_discount": "discount_pct",
    "l_shipdate": "ship_date",
}


def q_depara_projection(spark, sf_dir):
    """DE-PARA rename map + type imposition (SURVEY §1.3, §2.3)."""
    li = _t(spark, sf_dir, "lineitem")
    out = apply_de_para(li, DE_PARA_LINEITEM)
    out = impose_types(out, {"line_no": "bigint", "ship_date": "date"})
    # dates travel as ISO strings so the value hash is engine-portable
    return out.withColumn("ship_date", F.col("ship_date").cast("string"))


SQL_DEPARA = """
SELECT l_orderkey AS order_id, CAST(l_linenumber AS BIGINT) AS line_no,
       l_quantity AS qty, l_extendedprice AS gross_price,
       l_discount AS discount_pct, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
FROM lineitem
"""


def q_cleaning_sentinels(spark, sf_dir):
    """Null sentinels + code cleaning + boolean decode (SURVEY §2.7)."""
    ev = _t(spark, sf_dir, "events")
    k_code = strip_non_digits(F.col("props"))
    return ev.select(
        "event_id",
        k_code.alias("k_code"),
        null_if_all_nines(k_code).alias("k_clean"),
        zfill("user_id", 6).alias("user_code"),
        decode_bool("event_type", ["purchase", "signup"], ["view", "click"])
        .alias("is_conversion"),
    )


SQL_CLEANING = """
SELECT event_id,
       regexp_replace(props, '[^0-9]', '', 'g') AS k_code,
       CASE WHEN regexp_matches(regexp_replace(props, '[^0-9]', '', 'g'), '^9+$')
            THEN NULL ELSE regexp_replace(props, '[^0-9]', '', 'g') END AS k_clean,
       lpad(CAST(user_id AS VARCHAR), 6, '0') AS user_code,
       CASE WHEN event_type IN ('purchase', 'signup') THEN TRUE
            WHEN event_type IN ('view', 'click') THEN FALSE
            ELSE NULL END AS is_conversion
FROM events
"""


def q_date_roundtrip(spark, sf_dir):
    """AAAAMMDD / DD/MM/AAAA parsers with coerce semantics (SURVEY §2.7)."""
    li = _t(spark, sf_dir, "lineitem")
    s8 = F.date_format("l_shipdate", "yyyyMMdd")
    dmy = F.date_format("l_shipdate", "dd/MM/yyyy")
    return li.select(
        "l_orderkey", "l_linenumber",
        s8.alias("s8"),
        parse_aaaammdd(s8).cast("string").alias("d8"),
        parse_dmy(dmy).cast("string").alias("d_dmy"),
        parse_aaaammdd(F.lit("garbage")).cast("string").alias("d_bad"),
    )


SQL_DATES = """
SELECT l_orderkey, l_linenumber,
       strftime(l_shipdate, '%Y%m%d') AS s8,
       strftime(l_shipdate, '%Y-%m-%d') AS d8,
       strftime(l_shipdate, '%Y-%m-%d') AS d_dmy,
       CAST(NULL AS VARCHAR) AS d_bad
FROM lineitem
"""


def q_money_parse(spark, sf_dir):
    """BRL money string parse (SURVEY §2.7) — integer cent math keeps the
    string construction engine-portable."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    brl = F.concat(
        F.lit("R$ "),
        F.floor(cents / 100).cast("long").cast("string"),
        F.lit(","),
        F.lpad(F.pmod(cents, F.lit(100)).cast("string"), 2, "0"),
    )
    return o.select(
        "o_orderkey", brl.alias("brl"), money_brl_to_double(brl).alias("parsed")
    )


SQL_MONEY = """
WITH c AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT o_orderkey,
       concat('R$ ', CAST(cents // 100 AS VARCHAR), ',',
              lpad(CAST(cents % 100 AS VARCHAR), 2, '0')) AS brl,
       CAST(replace(regexp_replace(
              concat('R$ ', CAST(cents // 100 AS VARCHAR), ',',
                     lpad(CAST(cents % 100 AS VARCHAR), 2, '0')),
              '[R$ .]', '', 'g'), ',', '.') AS DOUBLE) AS parsed
FROM c
"""


def q_code_array_clean(spark, sf_dir):
    """CID-10-style code tokenize/validate/serialize (sim/do.py:486-507):
    free-text cause field → '{A123,B45}' array literal."""
    from etl_spark.functions import valid_code_array

    o = _t(spark, sf_dir, "orders")
    raw = F.concat(
        F.lit("causa: X"), (F.col("o_orderkey") % 900 + 100).cast("string"),
        F.lit(".1 / "), F.col("o_orderpriority"),
        F.lit(" B"), (F.col("o_custkey") % 90 + 10).cast("string"), F.lit(";"),
    )
    return o.select(
        "o_orderkey", raw.alias("raw"), valid_code_array(raw).alias("codes")
    )


SQL_CODE_ARRAY = """
WITH r AS (
  SELECT o_orderkey,
         concat('causa: X', CAST(o_orderkey % 900 + 100 AS VARCHAR), '.1 / ',
                o_orderpriority, ' B', CAST(o_custkey % 90 + 10 AS VARCHAR),
                ';') AS raw
  FROM orders
)
SELECT o_orderkey, raw,
       concat('{', array_to_string(list_distinct(list_filter(
         string_split_regex(upper(replace(raw, '.', '')), '[^0-9A-Z]+'),
         x -> regexp_matches(x, '^[A-Z][0-9]{2,3}$'))), ','), '}') AS codes
FROM r
"""


def q_normalize_names(spark, sf_dir):
    """Text normalization (utilitarios/textos.py equivalent). The constant
    accented prefix exercises the decomposition-generated Latin fold —
    Latin-1/Extended-A (ß→ss, ł/ő/ř/ž), Extended Additional (Việt),
    Romanian comma-below (Ț), pinyin tone vowels (ǚ), and the Extended-B
    digraph + ĳ multi-char ligatures (Ǌ→nj, Ĳ→ij); the oracle carries the
    ground-truth folded form as a literal, so the gate fails if the fold
    map regresses."""
    p = _t(spark, sf_dir, "part")
    name = F.concat(
        F.lit("Sífilis Ação Łódź Gärße Őř Čaj Việt Ția Ǚber Ǌegoš ĲS — "),
        F.col("p_name"))
    return p.select("p_partkey", normalize_text(name).alias("norm_name"))


SQL_NORMALIZE = """
SELECT p_partkey,
       concat('sifilis_acao_lodz_garsse_or_caj_viet_tia_uber_njegos_ijs_',
              regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '_', 'g'),
                             '^_+|_+$', '', 'g')) AS norm_name
FROM part
"""


# ------------------------------------------------------------- M2: joins

def q_dim_broadcast_enrich(spark, sf_dir):
    """Broadcast dimension lookups (geografias.py equivalent)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    out = broadcast_lookup(c, n, F.col("c_nationkey") == F.col("n_nationkey"))
    out = broadcast_lookup(out, r, F.col("n_regionkey") == F.col("r_regionkey"))
    return out.select("c_custkey", "c_name", "n_name", "r_name")


SQL_DIM_ENRICH = """
SELECT c_custkey, c_name, n_name, r_name
FROM customer
LEFT JOIN nation ON c_nationkey = n_nationkey
LEFT JOIN region ON n_regionkey = r_regionkey
"""


def q_range_join_period(spark, sf_dir):
    """Range/interval dim lookup (periodo_por_data, datas.py:65-92)."""
    o = _t(spark, sf_dir, "orders")
    dim = (
        o.select(F.to_date(F.date_trunc("quarter", "o_orderdate")).alias("q_start"))
        .distinct()
        .select(
            "q_start",
            F.date_sub(F.add_months("q_start", 3), 1).alias("q_end"),
        )
    )
    out = range_join(
        o, dim, F.to_date("o_orderdate"), F.col("q_start"), F.col("q_end")
    )
    return out.select(
        "o_orderkey",
        F.col("q_start").cast("string").alias("q_start"),
        F.col("q_end").cast("string").alias("q_end"),
    )


SQL_RANGE_JOIN = """
SELECT o_orderkey,
       strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS q_start,
       strftime(CAST(date_trunc('quarter', o_orderdate) AS DATE)
                + INTERVAL 3 MONTH - INTERVAL 1 DAY, '%Y-%m-%d') AS q_end
FROM orders
"""


def q_asof_join_rules(spark, sf_dir):
    """As-of (temporal) join against a versioned rule dim
    (sisab/indicadores_municipios/tratamento.py:61-85 equivalent)."""
    ev = _t(spark, sf_dir, "events")
    dim = (
        ev.select("event_type").distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(51))).alias("version"))
        .select(
            "event_type", "version",
            F.timestamp_add(
                "DAY", (F.col("version") * 7).cast("int"),
                F.to_timestamp(F.lit("2024-01-01 00:00:00")),
            ).alias("valid_from"),
        )
    )
    out = asof_join(ev, dim, ["event_type"], ["event_type"], "ts", "valid_from")
    return out.select("event_id", "event_type", F.col("version").alias("rule_version"))


SQL_ASOF = """
SELECT event_id, event_type,
       CAST(floor(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) / 7)
            AS BIGINT) AS rule_version
FROM events
"""


def q_anti_join_fill(spark, sf_dir):
    """Left-anti placeholder fill for missing detail records
    (scnes/.../extracao.py:56-80 equivalent)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    detail = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )
    return anti_join_fill(c, detail, ["c_custkey"])


SQL_ANTI_FILL = """
SELECT c_custkey, n_orders, max_price
FROM customer
LEFT JOIN (
  SELECT o_custkey AS k, COUNT(*) AS n_orders, round(MAX(o_totalprice), 2) AS max_price
  FROM orders GROUP BY o_custkey
) d ON c_custkey = d.k
"""


# ------------------------------------------------------------ aggregates

def q_pricing_summary(spark, sf_dir):
    """Grouped pricing rollup with map-side partial aggregation (the engine's
    Q1-style headline agg; reference QA gates SURVEY §2.5)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2) AS sum_qty,
       round(SUM(l_extendedprice), 2) AS sum_base,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(AVG(l_quantity), 4) AS avg_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_quality_gate(spark, sf_dir):
    """Validation-gate aggregates: distinct/null/count matrix
    (sisab/relatorio_validacao_producao/verificacao.py:15-98)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("null_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
    )


SQL_QUALITY = """
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
       strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
       strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
FROM lineitem
"""


def q_salted_agg(spark, sf_dir):
    """Two-phase salted aggregation for hot keys (SURVEY §4 skew policy):
    partial sums per (key, salt) then final combine — result identical to a
    plain groupBy, shape survives a 1000× hot key."""
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("__salt", F.pmod(F.col("event_id"), F.lit(8)))
    partial = salted.groupBy("event_type", "__salt").agg(
        F.sum("value").alias("pv"), F.count(F.lit(1)).alias("pc")
    )
    return (
        partial.groupBy("event_type")
        .agg(F.round(F.sum("pv"), 2).alias("sum_value"), F.sum("pc").alias("n"))
    )


SQL_SALTED = """
SELECT event_type, round(SUM(value), 2) AS sum_value, COUNT(*) AS n
FROM events GROUP BY event_type
"""


# --------------------------------------------------------- M7: reshape

def q_melt_metrics(spark, sf_dir):
    """Wide→long unpivot (sisab/producao.py:1016-1045 equivalent)."""
    li = _t(spark, sf_dir, "lineitem")
    return melt(
        li, ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        var_name="metric", value_name="qty",
    )


SQL_MELT = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS qty FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


def q_group_nest(spark, sf_dir):
    """Group-and-nest to a canonical sorted string
    (scnes/estabelecimentos_horarios/tratamento.py:41-70 equivalent)."""
    o = _t(spark, sf_dir, "orders")
    return group_nest_sorted(
        o, ["o_custkey"], ("o_orderkey", "o_orderstatus"), out_col="orders_nested"
    )


SQL_GROUP_NEST = """
SELECT o_custkey,
       string_agg(concat(CAST(o_orderkey AS VARCHAR), ':', o_orderstatus), ';'
                  ORDER BY concat(CAST(o_orderkey AS VARCHAR), ':', o_orderstatus))
         AS orders_nested
FROM orders GROUP BY o_custkey
"""


def q_param_fanout(spark, sf_dir):
    """Parameter cross-product fan-out (itertools.product equivalent,
    sisab/utilitarios_sisab_relatorio_producao.py:133-158)."""
    r = _t(spark, sf_dir, "region")
    quarters = spark.range(1, 5).select(F.col("id").alias("q"))
    return r.crossJoin(F.broadcast(quarters)).select("r_regionkey", "r_name", "q")


SQL_FANOUT = """
SELECT r_regionkey, r_name, q
FROM region CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS q)
"""


def q_union_evolution(spark, sf_dir):
    """Additive schema evolution on union: old vintage lacks a column,
    back-filled as typed NULL (aih_rd.py:362-377 + unionByName)."""
    li = _t(spark, sf_dir, "lineitem")
    old = li.filter(F.col("l_linenumber") <= 3).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    new = li.filter(F.col("l_linenumber") > 3).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_tax"
    )
    old = with_additive_columns(old, {"l_tax": "double"})
    return old.unionByName(new)


SQL_UNION_EVO = """
SELECT l_orderkey, l_linenumber, l_quantity, CAST(NULL AS DOUBLE) AS l_tax
FROM lineitem WHERE l_linenumber <= 3
UNION ALL
SELECT l_orderkey, l_linenumber, l_quantity, l_tax
FROM lineitem WHERE l_linenumber > 3
"""


# ----------------------------------------------- dedup / fingerprinting

def q_dedup_exact(spark, sf_dir):
    """Exact dedup via hash-groupBy (training-data op)."""
    d = _t(spark, sf_dir, "documents")
    return exact_dedup_groups(d, "doc_id", "text")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_members
FROM documents GROUP BY md5(text)
"""

# Portable tokenization shared by the dedup/text oracles: split on runs of
# whitespace, drop empties (mirrors etl_spark.functions.text.tokens).
_SQL_TOKS = (
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
)
# 3-word shingles from those tokens (mirrors word_shingles(k=3); MinHash and
# Jaccard are insensitive to the array_distinct because they are set ops).
_SQL_SHINGLE3 = f"""
  SELECT doc_id, concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]) AS s
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents) t,
       LATERAL (SELECT unnest(range(1, len(toks) - 1)) AS i) r
"""


def q_doc_fingerprint(spark, sf_dir):
    """Deterministic document fingerprint (min portable hash of 3-shingles)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint("text", 3).alias("fingerprint"))


SQL_FINGERPRINT = f"""
SELECT doc_id, MIN({_h60("s")}) AS fingerprint
FROM ({_SQL_SHINGLE3}) sh
GROUP BY doc_id
"""


def _minhash_sql(num_hashes: int) -> str:
    from etl_spark.operators.dedup import minhash_xor_salt

    # mirror of minhash_signature: one md5-based 60-bit hash per shingle,
    # then the XOR-permutation family per signature slot
    mins = ",\n       ".join(
        f"MIN(xor(h, {minhash_xor_salt(i)})) AS m{i}" for i in range(num_hashes)
    )
    return (
        f"SELECT doc_id, {mins} FROM "
        f"(SELECT doc_id, {_h60('s')} AS h FROM ({_SQL_SHINGLE3}) sh) hs "
        f"GROUP BY doc_id"
    )


def q_minhash_lsh_buckets(spark, sf_dir):
    """MinHash+LSH banding (near-dup candidate generation at corpus scale)."""
    d = _t(spark, sf_dir, "documents")
    sig = minhash_signature(d, "text", num_hashes=16, shingle_k=3)
    return lsh_buckets(sig, "doc_id", bands=4, rows_per_band=4)


def _lsh_union_sql(bands: int = 4, rows: int = 4) -> str:
    parts = []
    for b in range(bands):
        cols = ", ".join(
            f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        parts.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws(',', {cols})) AS bucket\n"
            f"FROM mh"
        )
    return "\nUNION ALL\n".join(parts)


def _lsh_sql(bands: int = 4, rows: int = 4) -> str:
    return (f"WITH mh AS ({_minhash_sql(bands * rows)})\n"
            + _lsh_union_sql(bands, rows))


SQL_MINHASH_LSH = _lsh_sql(4, 4)


def q_simhash_groups(spark, sf_dir):
    """SimHash near-dup clusters (12-bit)."""
    d = _t(spark, sf_dir, "documents")
    return simhash_groups(d, "doc_id", "text", bits=12)


def _simhash_sql(bits: int = 12) -> str:
    votes = ",\n       ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tk FROM documents
), hashed AS (
  SELECT doc_id, {_h60("tk")} AS h FROM tok
), votes AS (
  SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
), fp AS (
  SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes
)
SELECT simhash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_members
FROM fp GROUP BY simhash
"""


SQL_SIMHASH = _simhash_sql(12)


def _lsh_pairs(d, max_bucket: int = 1000):
    """Shared scale-safe candidate generator for the near-dup gates:
    MinHash → LSH band buckets → within-bucket pairs with the
    ``max_bucket`` skew guard. No blocking-key self-join anywhere — the
    pair space is O(Σ bucket²) with buckets bounded, not O(n²/blocks)."""
    from etl_spark.operators.dedup import lsh_candidate_pairs

    sig = minhash_signature(d, "text", num_hashes=16, shingle_k=3)
    buckets = lsh_buckets(sig, "doc_id", bands=4, rows_per_band=4)
    # materialized: candidate pairs are tiny (near-linear in corpus) and
    # every consumer (exact Jaccard sets x2, clustering rounds) would
    # otherwise re-run the whole MinHash/LSH pipeline per reference
    return lsh_candidate_pairs(
        buckets, "doc_id", max_bucket=max_bucket
    ).localCheckpoint(eager=True)


# DuckDB replica of _lsh_pairs: same 16 minhashes, 4 bands, bucket-size
# guard, distinct (a < b) pairs.
def _lsh_pairs_sql(max_bucket: int = 1000) -> str:
    return f"""
mh AS ({_minhash_sql(16)}),
lsh AS ({_lsh_union_sql(4, 4)}),
sized AS (
  SELECT band, bucket FROM lsh
  GROUP BY band, bucket HAVING COUNT(*) BETWEEN 2 AND {max_bucket}
),
cand_pairs AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM lsh x JOIN lsh y USING (band, bucket) JOIN sized USING (band, bucket)
  WHERE x.doc_id < y.doc_id
)"""


def q_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard scores for LSH candidate pairs — the scale
    pipeline: per-row MinHash, bucketed banding with a skew guard, exact
    verification only within candidates (never a blocked self-join)."""
    d = _t(spark, sf_dir, "documents")
    pairs = _lsh_pairs(d)
    return ngram_jaccard_pairs(d, pairs, "doc_id", "text", shingle_k=3, threshold=0.15)


SQL_NGRAM_JACCARD = f"""
WITH {_lsh_pairs_sql(1000)},
sets AS (
  SELECT doc_id, list_distinct(list(s)) AS sh
  FROM ({_SQL_SHINGLE3}) g GROUP BY doc_id
)
SELECT a, b,
       round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(x.sh, y.sh))), 6) AS jaccard
FROM cand_pairs JOIN sets x ON x.doc_id = a JOIN sets y ON y.doc_id = b
WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(x.sh, y.sh))), 6) >= 0.15
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: connected components over the Jaccard-verified
    LSH candidate pairs via large-star/small-star contraction (O(log n)
    rounds regardless of component diameter — the corpus-scale algorithm;
    min-label propagation remains available for tiny-diameter graphs);
    verified against a recursive-CTE closure."""
    from etl_spark.operators.dedup import connected_components_star

    d = _t(spark, sf_dir, "documents")
    pairs = _lsh_pairs(d)
    edges = ngram_jaccard_pairs(d, pairs, "doc_id", "text", shingle_k=3,
                                threshold=0.15).select("a", "b")
    return connected_components_star(edges)


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_lsh_pairs_sql(1000)},
sets AS (
  SELECT doc_id, list_distinct(list(s)) AS sh
  FROM ({_SQL_SHINGLE3}) g GROUP BY doc_id
), edges AS (
  SELECT a, b
  FROM cand_pairs JOIN sets x ON x.doc_id = a JOIN sets y ON y.doc_id = b
  WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(x.sh, y.sh))), 6) >= 0.15
), und AS (
  SELECT a, b FROM edges UNION SELECT b, a FROM edges
), reach(node, r) AS (
  SELECT DISTINCT a, a FROM und
  UNION
  SELECT reach.node, und.b FROM reach JOIN und ON reach.r = und.a
)
SELECT node, MIN(r) AS component FROM reach GROUP BY node
"""


# ------------------------------------------------------- text analysis

def q_text_quality(spark, sf_dir):
    """Quality-score features: token count, stopword ratio, keep-flag."""
    d = _t(spark, sf_dir, "documents")
    stop_r = F.round(stopword_ratio("text"), 4)
    n_tok = token_count("text")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_r.alias("stopword_r"),
        ((n_tok >= 10) & (stop_r < F.lit(0.4))).alias("keep"),
    )


_SQL_STOPS = ", ".join(f"'{w}'" for w in STOPWORDS_EN)

SQL_TEXT_QUALITY = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
f AS (
  SELECT doc_id, len(toks) AS n_tokens,
         round(CASE WHEN len(toks) = 0 THEN 0.0
               ELSE CAST(len(list_filter(toks, x -> lower(x) IN ({_SQL_STOPS})))
                    AS DOUBLE) / len(toks) END, 4) AS stopword_r
  FROM t
)
SELECT doc_id, n_tokens, stopword_r,
       (n_tokens >= 10 AND stopword_r < 0.4) AS keep
FROM f
"""


def q_lang_id(spark, sf_dir):
    """Heuristic language ID: stopword votes per language, argmax with
    deterministic tie-break to 'und'."""
    d = _t(spark, sf_dir, "documents")
    ts = tokens("text")
    wordlists = {
        "en": ["the", "a", "of", "and", "is"],
        "pt": ["de", "da", "do", "em", "para"],
        "es": ["el", "la", "los", "en", "por"],
    }
    def _hits(ws: list[str]):
        # one-arg closure (a default arg would break pyspark lambda arity)
        return F.size(F.filter(ts, lambda t: F.lower(t).isin(ws)))

    votes = {lg: _hits(ws) for lg, ws in wordlists.items()}
    en, pt, es = votes["en"], votes["pt"], votes["es"]
    pred = (
        F.when((en > pt) & (en > es), F.lit("en"))
        .when((pt > en) & (pt > es), F.lit("pt"))
        .when((es > en) & (es > pt), F.lit("es"))
        .otherwise(F.lit("und"))
    )
    return d.select("doc_id", en.alias("en_hits"), pred.alias("pred_lang"))


SQL_LANG_ID = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
v AS (
  SELECT doc_id,
    len(list_filter(toks, x -> lower(x) IN ('the','a','of','and','is'))) AS en,
    len(list_filter(toks, x -> lower(x) IN ('de','da','do','em','para'))) AS pt,
    len(list_filter(toks, x -> lower(x) IN ('el','la','los','en','por'))) AS es
  FROM t
)
SELECT doc_id, en AS en_hits,
       CASE WHEN en > pt AND en > es THEN 'en'
            WHEN pt > en AND pt > es THEN 'pt'
            WHEN es > en AND es > pt THEN 'es'
            ELSE 'und' END AS pred_lang
FROM v
"""


def q_token_stats(spark, sf_dir):
    """Per-source corpus stats (token counting rollup)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", token_count("text").alias("nt"), "n_chars")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


SQL_TOKEN_STATS = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS total_tokens,
       round(AVG(n_chars), 2) AS avg_chars
FROM documents GROUP BY source
"""


def q_token_stats_bpe(spark, sf_dir):
    """BPE-ish token budgeting: whitespace vs pre-tokenizer counts per
    source (the training-token budget a curation pipeline actually tracks —
    whitespace counting under-counts punctuation/numbers)."""
    from etl_spark.functions.text import token_count_bpe

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", token_count("text").alias("nw"),
                 token_count_bpe("text").alias("nb"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nw").alias("ws_tokens"),
            F.sum("nb").alias("bpe_tokens"),
        )
    )


def _token_stats_bpe_sql() -> str:
    from etl_spark.functions.text import BPE_PRETOKEN_RE

    pat = BPE_PRETOKEN_RE.replace("'", "''")  # the pattern itself contains '
    return f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{pat}'))) AS BIGINT)
         AS bpe_tokens
FROM documents GROUP BY source
"""


SQL_TOKEN_STATS_BPE = _token_stats_bpe_sql()


def q_text_ratios(spark, sf_dir):
    """Quality-score character features: punctuation ratio, digit ratio,
    distinct char-trigram count (the char-n-gram basis for fingerprinting)
    — all JVM-side array/regex expressions."""
    from etl_spark.functions import char_ngrams, digit_ratio, punct_ratio

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(punct_ratio("text"), 4).alias("punct_r"),
        F.round(digit_ratio("text"), 4).alias("digit_r"),
        F.size(char_ngrams("text", 3)).alias("n_char3"),
    )


SQL_TEXT_RATIOS = r"""
SELECT doc_id,
       round(CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(length(text)
                  - length(regexp_replace(text, '[^0-9A-Za-z\s]', '', 'g'))
                  AS DOUBLE) / length(text) END, 4) AS punct_r,
       round(CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST(length(text)
                  - length(regexp_replace(text, '[0-9]', '', 'g'))
                  AS DOUBLE) / length(text) END, 4) AS digit_r,
       CAST(len(list_distinct(list_transform(
         range(1, greatest(length(text) - 1, 1)),
         i -> substr(text, CAST(i AS INTEGER), 3)))) AS INTEGER) AS n_char3
FROM documents
"""


def q_value_percentiles(spark, sf_dir):
    """Per-type value percentiles (QA distribution gate). Uses Spark's
    EXACT ``percentile`` so the DuckDB ``quantile_cont`` oracle matches
    bit-for-bit (both linear-interpolate order statistics). At 100 TB use
    ``approx_percentile`` (t-digest, combinable) — exact percentile
    buffers each group's values and exists here for verifiability."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


SQL_VALUE_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_multimodal_metadata(spark, sf_dir):
    """Opaque-binary multimodal plumbing: payload as binary + typed
    metadata (byte length, digest). The decode stage itself is the
    mapInPandas stub exercised in tests/test_multimodal.py."""
    d = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length("text").alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
        F.lit("text/plain").alias("mime"),
    )


SQL_MULTIMODAL = """
SELECT doc_id, strlen(text) AS n_bytes, sha256(text) AS digest,
       'text/plain' AS mime
FROM documents
"""


def q_frame_sample(spark, sf_dir):
    """Multimodal 1:N fan-out gate: binary payloads through the
    frame-sampling ``mapInPandas`` stage (stub codec — deterministic fake
    frames), frame digests compared hex-exact against a SQL oracle that
    replays the fake's arithmetic. Proves the Arrow plumbing (binary in,
    N rows out, typed metadata) end to end."""
    from etl_spark.operators.multimodal import sample_frames, with_binary_payload

    d = _t(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(d), every_ms=1000)
    return frames.select(
        "doc_id", "frame_idx", "ts_ms",
        F.lower(F.hex("frame")).alias("frame_digest"),
    )


SQL_FRAME_SAMPLE = """
SELECT doc_id, CAST(j AS INTEGER) AS frame_idx,
       CAST(j * 1000 AS BIGINT) AS ts_ms,
       sha256(text || '|frame:' || CAST(j AS VARCHAR)) AS frame_digest
FROM documents,
     LATERAL (SELECT unnest(range(0, 1 + strlen(text) % 4)) AS j) r
"""


# -------------------------------------------------- similarity search

def q_ann_bruteforce(spark, sf_dir):
    """Exact cosine top-k neighbours (brute-force baseline)."""
    e = _t(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    queries = (
        e.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    return brute_force_topk(queries, corpus, k=5)


SQL_ANN_BRUTE = """
SELECT q_id, c_id, sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 4) AS sim,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                 CAST(c.embedding AS DOUBLE[])), 4) DESC,
                    c.vec_id) AS rank
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
) WHERE rank <= 5
"""


_NEARDUP_TABLES = 4      # hyperplane-LSH tables (multi-probe recall)
_NEARDUP_BITS = 4        # bits per table
_NEARDUP_SEED = 7


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs over hyperplane-LSH candidates:
    ``_NEARDUP_TABLES`` independent sign-bit sketches (multi-table =
    recall; the reference of one table misses even high-cosine pairs),
    within-bucket candidate pairs guarded by ``max_bucket``, exact cosine
    only on candidates. The bucket count scales with corpus size via
    n_bits, so the pair space stays near-linear — no label/block
    self-join (which is quadratic within a block at 100×)."""
    from etl_spark.operators.dedup import lsh_candidate_pairs
    from etl_spark.operators.similarity import cosine, hyperplane_bucket

    e = _t(spark, sf_dir, "embeddings")
    per_table = [
        e.select(
            F.col("vec_id"),
            F.lit(t).alias("band"),
            hyperplane_bucket(F.col("embedding"), _NEARDUP_BITS,
                              seed=_NEARDUP_SEED + t).cast("string").alias("bucket"),
        )
        for t in range(_NEARDUP_TABLES)
    ]
    buckets = per_table[0]
    for df in per_table[1:]:
        buckets = buckets.unionByName(df)
    pairs = lsh_candidate_pairs(buckets, "vec_id", max_bucket=1000)
    va = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    vb = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    sim = F.round(cosine(F.col("va"), F.col("vb")), 4)
    return (
        pairs.join(va, "a").join(vb, "b")
        .select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.25)
        .select("a", "b", "sim")
    )


def _hyperplane_sql(n_bits: int, seed: int) -> tuple[str, str]:
    """(projection select-list, bucket expression) replicating
    operators.similarity.hyperplane_bucket for the DuckDB oracle."""
    projs = []
    for b in range(n_bits):
        w = portable_hash60_sql("CAST(d - 1 AS VARCHAR)", salt=seed * 1000 + b)
        projs.append(
            f"SUM(e[d] * (CASE WHEN ({w}) & 1 = 1 THEN 1.0 ELSE -1.0 END)) AS p{b}"
        )
    bucket = " + ".join(
        f"(CASE WHEN p{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(n_bits)
    )
    return ", ".join(projs), bucket


def _embed_neardup_sql(tables: int, n_bits: int, seed: int,
                       max_bucket: int = 1000, threshold: float = 0.25) -> str:
    table_sqls = []
    for t in range(tables):
        projs, bucket = _hyperplane_sql(n_bits, seed + t)
        table_sqls.append(f"""
  SELECT vec_id, {t} AS band, CAST(CAST({bucket} AS INTEGER) AS VARCHAR) AS bucket
  FROM (
    SELECT vec_id, {projs}
    FROM v, LATERAL (SELECT unnest(range(1, len(e) + 1)) AS d) dims
    GROUP BY vec_id
  ) p{t}""")
    union = "\n  UNION ALL\n".join(table_sqls)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), bkt AS ({union}
), sized AS (
  SELECT band, bucket FROM bkt
  GROUP BY band, bucket HAVING COUNT(*) BETWEEN 2 AND {max_bucket}
), cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM bkt x JOIN bkt y USING (band, bucket) JOIN sized USING (band, bucket)
  WHERE x.vec_id < y.vec_id
)
SELECT a, b, round(list_cosine_similarity(xa.e, yb.e), 4) AS sim
FROM cand JOIN v xa ON xa.vec_id = a JOIN v yb ON yb.vec_id = b
WHERE round(list_cosine_similarity(xa.e, yb.e), 4) >= {threshold}
"""


SQL_EMBED_NEARDUP = _embed_neardup_sql(_NEARDUP_TABLES, _NEARDUP_BITS,
                                       _NEARDUP_SEED)


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-k (scale path: hyperplane sketch
    prunes the candidate space, over-full buckets dropped by the
    ``max_bucket`` skew guard, bounded two-phase top-k; verified exactly
    by a SQL oracle that replays the same deterministic hyperplanes and
    guard)."""
    e = _t(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    queries = (
        e.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    return lsh_ann_topk(queries, corpus, k=5, n_bits=4, seed=7, max_bucket=10000)


def _ann_lsh_sql(n_bits: int = 4, seed: int = 7, k: int = 5,
                 max_bucket: int = 10000) -> str:
    projs = []
    for b in range(n_bits):
        w = portable_hash60_sql("CAST(d - 1 AS VARCHAR)", salt=seed * 1000 + b)
        projs.append(
            f"SUM(e[d] * (CASE WHEN ({w}) & 1 = 1 THEN 1.0 ELSE -1.0 END)) AS p{b}"
        )
    bucket = " + ".join(f"(CASE WHEN p{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(n_bits))
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), proj AS (
  SELECT vec_id, {", ".join(projs)}
  FROM v, LATERAL (SELECT unnest(range(1, len(e) + 1)) AS d) dims
  GROUP BY vec_id
), bkt AS (
  SELECT vec_id, CAST({bucket} AS INTEGER) AS bucket FROM proj
), sz AS (
  SELECT bucket, COUNT(*) AS n FROM bkt GROUP BY bucket
), joined AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         round(list_cosine_similarity(qv.e, cv.e), 4) AS sim
  FROM bkt q JOIN bkt c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  JOIN sz ON sz.bucket = c.bucket AND sz.n <= {max_bucket}
  JOIN v qv ON qv.vec_id = q.vec_id
  JOIN v cv ON cv.vec_id = c.vec_id
  WHERE q.vec_id < 20
)
SELECT q_id, c_id, sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
  FROM joined
) WHERE rank <= {k}
"""


SQL_ANN_LSH = _ann_lsh_sql(4, 7, 5, 10000)


def q_ann_multiprobe(spark, sf_dir):
    """Multi-probe ANN top-k: candidates unioned across two independent
    hyperplane tables (recall dial — a single sign-bit table misses even
    high-cosine neighbours), skew-guarded, ranked by the bounded two-phase
    top-k. Verified exactly by a SQL oracle replaying both tables."""
    from etl_spark.operators.similarity import lsh_ann_topk_multiprobe

    e = _t(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    queries = (
        e.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    return lsh_ann_topk_multiprobe(queries, corpus, k=5, n_bits=4,
                                   seeds=(7, 8), max_bucket=10000)


def _ann_multiprobe_sql(seeds=(7, 8), n_bits: int = 4, k: int = 5,
                        max_bucket: int = 10000) -> str:
    tables = []
    for t, seed in enumerate(seeds):
        projs, bucket = _hyperplane_sql(n_bits, seed)
        tables.append(f"""
  SELECT vec_id, {t} AS band, CAST({bucket} AS INTEGER) AS bucket
  FROM (
    SELECT vec_id, {projs}
    FROM v, LATERAL (SELECT unnest(range(1, len(e) + 1)) AS d) dims
    GROUP BY vec_id
  ) p{t}""")
    union = "\n  UNION ALL\n".join(tables)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), bkt AS ({union}
), sz AS (
  SELECT band, bucket FROM bkt
  GROUP BY band, bucket HAVING COUNT(*) <= {max_bucket}
), cand AS (
  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
  FROM bkt q JOIN bkt c ON q.band = c.band AND q.bucket = c.bucket
  JOIN sz ON sz.band = c.band AND sz.bucket = c.bucket
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
), scored AS (
  SELECT q_id, c_id, round(list_cosine_similarity(qv.e, cv.e), 4) AS sim
  FROM cand JOIN v qv ON qv.vec_id = q_id JOIN v cv ON cv.vec_id = c_id
)
SELECT q_id, c_id, sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


SQL_ANN_MULTIPROBE = _ann_multiprobe_sql((7, 8), 4, 5, 10000)


def q_ann_ivf(spark, sf_dir):
    """IVF-flat ANN top-k (the inverted-file scale path beside the
    hyperplane LSH one): deterministic sampled centroids → per-row cell
    assignment (broadcast centroids + combinable max_by) → n_probe nearest
    cells per query → exact cosine only within probed cells, bounded
    two-phase top-k. Verified exactly by a SQL oracle replaying the same
    centroids, assignment and probes."""
    from etl_spark.operators.similarity import ivf_ann_topk

    e = _t(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    queries = (
        e.filter(F.col("vec_id") < 20)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    return ivf_ann_topk(queries, corpus, k=5, n_centroids=16, n_probe=4,
                        seed=11, max_cell=100000)


def _ann_ivf_sql(n_centroids: int = 16, n_probe: int = 4, k: int = 5,
                 seed: int = 11, max_cell: int = 100000) -> str:
    cent_h = portable_hash60_sql("CAST(vec_id AS VARCHAR)", salt=seed)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), cent AS (
  SELECT vec_id AS cent_id, e AS ce FROM v
  ORDER BY {cent_h}, vec_id LIMIT {n_centroids}
), asgn AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT v.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY round(list_cosine_similarity(v.e, c.ce), 4) DESC,
                      c.cent_id) AS rn
    FROM v CROSS JOIN cent c
  ) WHERE rn = 1
), sized AS (
  SELECT cell FROM asgn GROUP BY cell HAVING COUNT(*) <= {max_cell}
), probes AS (
  SELECT vec_id AS q_id, cent_id AS cell FROM (
    SELECT v.vec_id, c.cent_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY round(list_cosine_similarity(v.e, c.ce), 4) DESC,
                      c.cent_id) AS rn
    FROM v CROSS JOIN cent c WHERE v.vec_id < 20
  ) WHERE rn <= {n_probe}
), scored AS (
  SELECT p.q_id, a.vec_id AS c_id,
         round(list_cosine_similarity(qv.e, cv.e), 4) AS sim
  FROM probes p
  JOIN sized USING (cell)
  JOIN asgn a USING (cell)
  JOIN v qv ON qv.vec_id = p.q_id
  JOIN v cv ON cv.vec_id = a.vec_id
  WHERE p.q_id <> a.vec_id
)
SELECT q_id, c_id, sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


SQL_ANN_IVF = _ann_ivf_sql(16, 4, 5, 11, 100000)


def q_tumbling_window_agg(spark, sf_dir):
    """Tumbling event-time windows (the Structured Streaming windowed-agg
    shape, run batch here): per hour x event_type counts and sums."""
    ev = _t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        ev.groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


SQL_TUMBLING = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type, COUNT(*) AS n, round(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_session_windows(spark, sf_dir):
    """Per-user session windows (30-minute inactivity gap) via Spark's
    native ``session_window`` aggregate — the same expression works under
    Structured Streaming with a watermark (dynamic gap state merging);
    verified against a DuckDB islands-and-gaps formulation (lag + running
    sum of session breaks)."""
    ev = _t(spark, sf_dir, "events")
    w = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(w.alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n", "sum_value",
        )
    )


SQL_SESSION_WINDOWS = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
), numbered AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n, round(SUM(value), 2) AS sum_value
FROM numbered GROUP BY user_id, sid
"""


def q_embedding_quantize(spark, sf_dir):
    """Embedding maintenance: L2 norm + max-abs int8 quantization (the
    storage-shrink pass an ANN index build runs); emitted as scalar
    checksums so the comparison is engine-portable."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(v, lambda x: F.round(x / scale * 127, 0).cast("int"))
    return e.select(
        "vec_id",
        F.round(norm, 4).alias("l2_norm"),
        F.round(scale, 6).alias("scale"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
    )


SQL_EMBED_QUANT = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (
  SELECT vec_id, e,
         sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm,
         list_max(list_transform(e, x -> abs(x))) AS scl
  FROM v
)
SELECT vec_id, round(nrm, 4) AS l2_norm, round(scl, 6) AS scale,
       CAST(list_sum(list_transform(e, x -> CAST(round(x / scl * 127) AS INTEGER))) AS BIGINT) AS q_sum,
       CAST(list_min(list_transform(e, x -> CAST(round(x / scl * 127) AS INTEGER))) AS INTEGER) AS q_min,
       CAST(list_max(list_transform(e, x -> CAST(round(x / scl * 127) AS INTEGER))) AS INTEGER) AS q_max
FROM s
"""


def q_curation_pipeline(spark, sf_dir):
    """End-to-end training-data curation: quality-filter documents, then
    broadcast-join their embeddings — the composed filter→enrich pipeline
    a data-curation job runs per shard."""
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    n_tok = token_count("text")
    stop_r = stopword_ratio("text")
    kept = d.select("doc_id", n_tok.alias("n_tokens"), stop_r.alias("sr")).filter(
        (F.col("n_tokens") >= 20) & (F.col("sr") < 0.4)
    )
    vecs = e.select(F.col("vec_id").alias("doc_id"), "label")
    out = kept.join(F.broadcast(vecs), "doc_id", "inner")
    return out.select("doc_id", "n_tokens", F.round("sr", 4).alias("stopword_r"), "label")


SQL_CURATION = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
q AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> lower(x) IN ({_SQL_STOPS})))
                   AS DOUBLE) / len(toks) END AS sr
  FROM t
)
SELECT q.doc_id, n_tokens, round(sr, 4) AS stopword_r, e.label
FROM q JOIN embeddings e ON q.doc_id = e.vec_id
WHERE n_tokens >= 20 AND sr < 0.4
"""


# ------------------------------------ ingest adapters / long-tail scalars

def q_csv_report_ingest(spark, sf_dir):
    """Scraped-report CSV ingest (sisab/comum.py:398-438 semantics): junk
    banner rows, ';' separator, ISO-8859-1, comma decimals, 'Fonte:'
    footer. The report payload is rendered deterministically from the
    ``nation`` dim (control-plane-sized) so the DuckDB oracle can verify
    the full parse round-trip."""
    from etl_spark.sources.adapters import read_report_csv

    rows = _t(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
    lines = ["Relatório consolidado de saúde", "gerado pelo sistema;;"]
    lines.append("Cod;Nome;Regiao;Indice")
    for r in rows:
        cents = r["n_nationkey"] * 100 + r["n_regionkey"]
        lines.append(
            f"{r['n_nationkey']};{r['n_name']};{r['n_regionkey']};"
            f"{cents // 100},{cents % 100:02d}"
        )
    lines.append("Fonte: Ministério da Saúde")
    d = _tmpdir("etl_spark_csv_")
    path = os.path.join(d, "report.csv")
    with open(path, "w", encoding="ISO-8859-1") as fh:
        fh.write("\n".join(lines) + "\n")
    df = read_report_csv(
        spark, path, sep=";", encoding="ISO-8859-1",
        decimal_comma_cols=["Indice"], skip_leading=2, footer_prefix="Fonte:",
    )
    return df.select(
        F.col("Cod").cast("bigint").alias("n_nationkey"),
        F.col("Nome").alias("n_name"),
        F.col("Regiao").cast("bigint").alias("n_regionkey"),
        F.col("Indice").alias("indice"),
    )


SQL_CSV_REPORT = """
SELECT n_nationkey, n_name, n_regionkey,
       (n_nationkey * 100 + n_regionkey) / 100.0 AS indice
FROM nation
"""


def q_json_flatten_ingest(spark, sf_dir):
    """REST-landed JSON ingest with nested-struct flattening
    (scnes/extracao_lista_cnes.py:18-71, brasilapi/cep.py:97-107): records
    rendered deterministically from the ``region`` dim, read back through
    the adapter, nested ``meta`` struct flattened to columns."""
    import json as _json

    from etl_spark.sources.adapters import read_json_records

    rows = _t(spark, sf_dir, "region").orderBy("r_regionkey").collect()
    records = [
        {
            "id": r["r_regionkey"],
            "name": r["r_name"],
            "meta": {"name_len": len(r["r_name"]), "upper": r["r_name"].upper()},
        }
        for r in rows
    ]
    d = _tmpdir("etl_spark_json_")
    path = os.path.join(d, "records.json")
    with open(path, "w") as fh:
        fh.write(_json.dumps(records))
    df = read_json_records(spark, path, flatten=True)
    return df.select(
        F.col("id").alias("r_regionkey"),
        F.col("name").alias("r_name"),
        F.col("meta_name_len").alias("name_len"),
        F.col("meta_upper").alias("name_upper"),
    )


SQL_JSON_FLATTEN = """
SELECT r_regionkey, r_name,
       CAST(strlen(r_name) AS BIGINT) AS name_len,
       upper(r_name) AS name_upper
FROM region
"""


def q_competencia_parse(spark, sf_dir):
    """AAAAMM competência parsing with coerce semantics
    (procedimentos.py:293-300): '202401' → first of month, garbage → NULL."""
    o = _t(spark, sf_dir, "orders")
    s6 = F.date_format("o_orderdate", "yyyyMM")
    return o.select(
        "o_orderkey",
        s6.alias("s6"),
        parse_aaaamm(s6).cast("string").alias("month_start"),
        parse_aaaamm(F.lit("2024xx")).cast("string").alias("bad"),
    )


SQL_COMPETENCIA = """
SELECT o_orderkey, strftime(o_orderdate, '%Y%m') AS s6,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(NULL AS VARCHAR) AS bad
FROM orders
"""


def q_roman_codes(spark, sf_dir):
    """Roman-numeral health-region codes → int (habilitacoes.py:246-250):
    codes synthesized from the nation dim, decoded by the when-chain
    parser; the oracle carries the ground-truth integer independently."""
    from etl_spark.functions.cleaning import _int_to_roman

    n = _t(spark, sf_dir, "nation")
    num = (F.col("n_nationkey") % 25 + 1).cast("int")
    roman = F.lit(None).cast("string")
    for i in range(25, 0, -1):
        roman = F.when(num == i, F.lit(_int_to_roman(i))).otherwise(roman)
    return n.select(
        "n_nationkey", roman.alias("roman"), roman_to_int(roman).alias("decoded")
    )


def _roman_sql() -> str:
    from etl_spark.functions.cleaning import _int_to_roman

    cases = " ".join(
        f"WHEN {i} THEN '{_int_to_roman(i)}'" for i in range(1, 26)
    )
    return f"""
SELECT n_nationkey,
       CASE n_nationkey % 25 + 1 {cases} END AS roman,
       CAST(n_nationkey % 25 + 1 AS INTEGER) AS decoded
FROM nation
"""


SQL_ROMAN = _roman_sql()


def q_month_pt(spark, sf_dir):
    """PT-BR month name → number (modelo_sisab_producao.py:31-44 MESES):
    names synthesized from order dates, decoded by month_pt_to_num; the
    oracle carries the ground-truth month independently."""
    from etl_spark.functions.cleaning import MESES_PT

    by_num = {v: k for k, v in sorted(MESES_PT.items(), key=lambda kv: kv[1])
              if k != "março"}  # canonical unaccented spellings
    o = _t(spark, sf_dir, "orders")
    m = F.month("o_orderdate")
    name = F.lit(None).cast("string")
    for i in range(12, 0, -1):
        name = F.when(m == i, F.lit(by_num[i])).otherwise(name)
    return o.select(
        "o_orderkey", name.alias("mes"), month_pt_to_num(name).alias("mes_num")
    )


def _month_pt_sql() -> str:
    from etl_spark.functions.cleaning import MESES_PT

    by_num = {v: k for k, v in sorted(MESES_PT.items(), key=lambda kv: kv[1])
              if k != "março"}
    cases = " ".join(f"WHEN {i} THEN '{by_num[i]}'" for i in range(1, 13))
    return f"""
SELECT o_orderkey,
       CASE month(o_orderdate) {cases} END AS mes,
       CAST(month(o_orderdate) AS INTEGER) AS mes_num
FROM orders
"""


SQL_MONTH_PT = _month_pt_sql()


def q_sentinel_blank_zeros(spark, sf_dir):
    """Blank / all-zeros sentinel nulling (procedimentos.py:302-327) —
    complements the all-nines case in ``cleaning_sentinels``."""
    from etl_spark.functions import null_if_blank, null_if_all_zeros

    o = _t(spark, sf_dir, "orders")
    code = (
        F.when(F.col("o_orderkey") % 4 == 0, F.lit(""))
        .when(F.col("o_orderkey") % 4 == 1, F.lit("0000"))
        .when(F.col("o_orderkey") % 4 == 2, F.lit("   "))
        .otherwise(F.lpad((F.col("o_custkey") % 997).cast("string"), 4, "0"))
    )
    return o.select(
        "o_orderkey",
        code.alias("code"),
        null_if_blank(code).alias("nb"),
        null_if_all_zeros(code).alias("nz"),
    )


SQL_SENTINEL_BZ = """
WITH c AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 4 = 0 THEN ''
              WHEN o_orderkey % 4 = 1 THEN '0000'
              WHEN o_orderkey % 4 = 2 THEN '   '
              ELSE lpad(CAST(o_custkey % 997 AS VARCHAR), 4, '0') END AS code
  FROM orders
)
SELECT o_orderkey, code,
       CASE WHEN trim(code) = '' THEN NULL ELSE code END AS nb,
       CASE WHEN regexp_matches(code, '^0+$') THEN NULL ELSE code END AS nz
FROM c
"""


def q_content_key(spark, sf_dir):
    """Deterministic surrogate keys replacing the reference's uuid7 row ids
    (procedimentos.py:387-389): sha256 over '|'-joined content columns, so
    replay mints byte-identical keys."""
    from etl_spark.functions import content_key

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        content_key("user_id", "event_type", "props").alias("row_key"),
    )


SQL_CONTENT_KEY = """
SELECT event_id,
       sha256(concat_ws('|', CAST(user_id AS VARCHAR), event_type, props))
         AS row_key
FROM events
"""


def q_period_lead(spark, sf_dir):
    """Period → next-period lookup (obter_proximo_periodo,
    datas.py:94-128): quarter calendar derived from orders, successor via
    ``lead`` on the broadcast-sized dim, facts enriched by broadcast join."""
    from etl_spark.operators import period_lead

    o = _t(spark, sf_dir, "orders")
    dim = (
        o.select(F.to_date(F.date_trunc("quarter", "o_orderdate")).alias("q_start"))
        .distinct()
    )
    led = period_lead(dim, "q_start", "next_q_start")
    out = broadcast_lookup(
        o.withColumn("q_start", F.to_date(F.date_trunc("quarter", "o_orderdate"))),
        led, "q_start",
    )
    return out.select(
        "o_orderkey",
        F.col("q_start").cast("string").alias("q_start"),
        F.col("next_q_start").cast("string").alias("next_q_start"),
    )


SQL_PERIOD_LEAD = """
WITH dim AS (
  SELECT DISTINCT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q
  FROM orders
), led AS (
  SELECT q, lead(q) OVER (ORDER BY q) AS nq FROM dim
)
SELECT o_orderkey, strftime(q, '%Y-%m-%d') AS q_start,
       strftime(nq, '%Y-%m-%d') AS next_q_start
FROM orders JOIN led ON CAST(date_trunc('quarter', o_orderdate) AS DATE) = q
"""


def q_cdc_change_feed(spark, sf_dir):
    """CDC *out*: the LakeTable change feed across a multi-commit range
    with auto-compaction firing mid-range (the round-1 bug class —
    commit-level ``added`` provenance must keep compacted-away merge
    deltas in the feed). Reference contract: the incremental
    capture-history ledger, scripts/geral.py:92-109.

    Six epoch merges land on a small-bucket table with
    ``compact_threshold=4``, so threshold compaction rewrites every bucket
    strictly inside the requested range (after the 5th merge); ``changes(0)``
    must still equal exactly the union of the per-epoch LWW-deduped batches
    (delete winners carried as ``_op='D'`` tombstones with nulled
    payload)."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(6)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_feed_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"compact_threshold": "4"},
    )
    return table.changes(0).select(
        "user_id", "event_id", "ts", "event_type", "value", "props", "_op"
    )


SQL_CDC_CHANGE_FEED = """
SELECT user_id, event_id, ts,
       CASE WHEN is_del THEN NULL ELSE event_type END AS event_type,
       CASE WHEN is_del THEN NULL ELSE value END AS value,
       CASE WHEN is_del THEN NULL ELSE props END AS props,
       CASE WHEN is_del THEN 'D' ELSE 'U' END AS _op
FROM (
  SELECT *, (event_type = 'error') AS is_del,
         row_number() OVER (
           PARTITION BY event_id % 6, user_id
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_cdc_incremental_sync(spark, sf_dir):
    """Incremental downstream materialization (the reference's consumers
    re-deriving tables from capture history, scripts/geral.py:92-109):
    upstream replays epochs in two waves with auto-compaction in between;
    after each wave ``sync_changes`` merges only the new change-feed range
    into a DIFFERENTLY-bucketed destination, advancing a crash-safe cursor
    in the same atomic commit. Final destination state must equal the full
    LWW replay of all events — the DuckDB oracle."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events
    from etl_spark.cdc.sync import sync_changes
    from etl_spark.lake import LakeTable

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(6)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_sync_")
    waves = [os.path.join(tmp, "w0"), os.path.join(tmp, "w1")]
    write_event_epochs(wal.filter(F.col("epoch") < 3), waves[0])
    write_event_epochs(wal.filter(F.col("epoch") >= 3), waves[1])

    src_path = os.path.join(tmp, "src")
    src, _ = replay_events(
        spark, waves[0], src_path, n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"compact_threshold": "2"},
    )
    dst = LakeTable.create(
        spark, os.path.join(tmp, "dst"), src.current_snapshot().schema,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        n_buckets=4, props={"cursor_prefixes": "sync"},
    )
    # side effects outside asserts: the gate must run identically under -O
    round1 = sync_changes(src, dst)                # wave 1 (bootstrap)
    src, _ = replay_events(                        # wave 2 (+compaction)
        spark, waves[1], src_path,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
    )
    round2 = sync_changes(src, dst)
    round3 = sync_changes(src, dst)                # caught up: no-op
    if not (round1.applied and round2.applied and round3 is None):
        raise AssertionError("sync rounds deviated from the expected "
                             "applied/applied/caught-up sequence")
    return dst.read().select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


SQL_CDC_SYNC = SQL_CDC_REPLAY  # destination == full LWW replay, live rows


def q_incremental_agg_sync(spark, sf_dir):
    """Incremental aggregate maintenance (materialized-view sync): a
    per-event-type rollup (count + cent-exact value sum) kept equal to
    GROUP BY over upstream state using ONLY the change feed — changed keys
    resolved against the old and new snapshots via bucket-pruned reads,
    signed integer deltas, affected-group read-modify-write, cursor
    advanced in the same atomic commit. Two waves with auto-compaction in
    between; final rollup must equal the one-shot aggregate — the DuckDB
    oracle. Reference: aggregated QA tables re-derived per capture slice
    (scripts/geral.py:92-109, sisab/relatorio_validacao_producao)."""
    from etl_spark.cdc.agg_sync import create_aggregate_table, sync_aggregate
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(6)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_aggsync_")
    waves = [os.path.join(tmp, "w0"), os.path.join(tmp, "w1")]
    write_event_epochs(wal.filter(F.col("epoch") < 3), waves[0])
    write_event_epochs(wal.filter(F.col("epoch") >= 3), waves[1])

    src_path = os.path.join(tmp, "src")
    src, _ = replay_events(
        spark, waves[0], src_path, n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"compact_threshold": "2"},
    )
    dst = create_aggregate_table(
        spark, os.path.join(tmp, "dst"), src,
        group_cols=["event_type"], sum_names=["sum_value_c2"], n_buckets=4,
    )
    sums = {"sum_value_c2": F.round(F.col("value") * 100).cast("bigint")}
    r1 = sync_aggregate(src, dst, ["event_type"], sums)  # bootstrap
    src, _ = replay_events(                              # wave 2 (+compaction)
        spark, waves[1], src_path,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
    )
    r2 = sync_aggregate(src, dst, ["event_type"], sums)  # incremental
    r3 = sync_aggregate(src, dst, ["event_type"], sums)  # caught up
    if not (r1.applied and r2.applied and r3 is None):
        raise AssertionError("aggregate-sync rounds deviated from the "
                             "expected applied/applied/caught-up sequence")
    return dst.read().select("event_type", "n_rows", "sum_value_c2")


SQL_INCREMENTAL_AGG_SYNC = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c2
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
GROUP BY event_type
"""


def q_join_view_sync(spark, sf_dir):
    """Incremental JOIN-view maintenance (delta-join IVM): a denormalized
    fact⋈dim destination kept equal to ``fact LEFT JOIN dim`` from TWO
    change feeds — the fact leg bucket-prunes changed keys, the dim leg
    finds affected fact rows with a broadcast semi join (no fact shuffle)
    and re-emits them against the new dim values. Rounds: bootstrap (some
    fact rows dangle), fact-only wave with auto-compaction upstream, then
    a mixed wave (dim tier updates + dim deletes + new fact events in the
    same round). Final view must equal the LEFT join of both final states
    — the DuckDB oracle. Reference: dimension enrichment at capture time
    (comum/geografias.py, comum/datas.py periodo_por_data), re-run per
    slice there, maintained incrementally here."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.join_sync import create_join_table, sync_join
    from etl_spark.cdc.replay import replay_events
    from etl_spark.lake import LakeTable
    from pyspark.sql.types import StructType

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value",
        F.pmod(F.col("event_id"), F.lit(6)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_jsync_")
    waves = [os.path.join(tmp, "w0"), os.path.join(tmp, "w1")]
    write_event_epochs(wal.filter(F.col("epoch") < 3), waves[0])
    write_event_epochs(wal.filter(F.col("epoch") >= 3), waves[1])

    src_path = os.path.join(tmp, "src")
    fact, _ = replay_events(
        spark, waves[0], src_path, n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"compact_threshold": "2"},
    )
    users = wal.select("user_id").distinct()
    uid = F.col("user_id")
    t1, t2 = F.lit("2024-01-01").cast("timestamp"), \
        F.lit("2024-01-02").cast("timestamp")
    dim = LakeTable.create(
        spark, os.path.join(tmp, "dim"),
        StructType.fromDDL(
            "d_ts timestamp, user_id bigint, tier string, score bigint"),
        key_cols=["user_id"], version_cols=["d_ts"], n_buckets=4,
    )
    dim.merge(  # only even users exist as dims → odd fact rows dangle
        users.filter(uid % 2 == 0).select(
            t1.alias("d_ts"), uid, F.lit("base").alias("tier"),
            (uid % 97).alias("score"), F.lit("I").alias("op")),
        "d:0")

    dst = create_join_table(
        spark, os.path.join(tmp, "view"), fact, dim, dim_on=["user_id"],
        n_buckets=4,
    )
    r1 = sync_join(fact, dim, dst, dim_on=["user_id"])     # bootstrap
    fact, _ = replay_events(                               # fact-only wave
        spark, waves[1], src_path,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
    )
    r2 = sync_join(fact, dim, dst, dim_on=["user_id"])
    dim.merge(  # mixed wave, dim side: tier upgrades + erasures
        users.filter(uid % 10 == 0).select(
            t2.alias("d_ts"), uid, F.lit("hot").alias("tier"),
            (uid % 97).alias("score"), F.lit("U").alias("op"))
        .unionByName(users.filter(uid % 20 == 4).select(
            t2.alias("d_ts"), uid, F.lit(None).cast("string").alias("tier"),
            F.lit(None).cast("long").alias("score"),
            F.lit("D").alias("op"))),
        "d:1")
    r3 = sync_join(fact, dim, dst, dim_on=["user_id"])     # dim-only leg
    r4 = sync_join(fact, dim, dst, dim_on=["user_id"])     # caught up
    if not ([s.applied for s in r1] == [True, True]
            and [s.applied for s in r2] == [True]
            and [s.applied for s in r3] == [True] and r4 == []):
        raise AssertionError("join-sync rounds deviated from the expected "
                             "bootstrap/fact/dim/caught-up sequence")
    return dst.read().select(
        "user_id", "event_id", "ts", "event_type", "value", "tier", "score"
    )


SQL_JOIN_VIEW_SYNC = """
WITH winners AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND event_type <> 'error'
),
dim AS (
  SELECT user_id,
         CASE WHEN user_id % 10 = 0 THEN 'hot' ELSE 'base' END AS tier,
         CAST(user_id % 97 AS BIGINT) AS score
  FROM (SELECT DISTINCT user_id FROM events)
  WHERE user_id % 2 = 0 AND user_id % 20 <> 4
)
SELECT w.user_id, w.event_id, w.ts, w.event_type, w.value, d.tier, d.score
FROM winners w LEFT JOIN dim d ON w.user_id = d.user_id
"""


def q_rollup_recompute_sync(spark, sf_dir):
    """Recompute-affected-groups rollup maintenance: MIN/MAX and
    COUNT(DISTINCT) are not subtractable, so the incremental plan
    re-aggregates exactly the groups the change feed touched from the new
    snapshot (IN-list pushdown when the affected set is small). Two waves
    with auto-compaction in between; the maintained rollup must equal the
    one-shot GROUP BY over live upstream state — the DuckDB oracle.
    Reference: per-slice min/max QA re-derivations the capture-history
    contract implies (scripts/geral.py:92-109)."""
    from etl_spark.cdc.agg_sync import (
        create_rollup_table, sync_aggregate_recompute,
    )
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(6)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_rollupsync_")
    waves = [os.path.join(tmp, "w0"), os.path.join(tmp, "w1")]
    write_event_epochs(wal.filter(F.col("epoch") < 3), waves[0])
    write_event_epochs(wal.filter(F.col("epoch") >= 3), waves[1])

    src_path = os.path.join(tmp, "src")
    src, _ = replay_events(
        spark, waves[0], src_path, n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"compact_threshold": "2"},
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    aggs = {
        "min_value_c2": F.min(cents),
        "max_value_c2": F.max(cents),
        "n_users": F.countDistinct("user_id"),
    }
    dst = create_rollup_table(
        spark, os.path.join(tmp, "dst"), src,
        group_cols=["event_type"], agg_exprs=aggs, n_buckets=4,
    )
    r1 = sync_aggregate_recompute(src, dst, ["event_type"], aggs)
    src, _ = replay_events(                              # wave 2 (+compaction)
        spark, waves[1], src_path,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
    )
    r2 = sync_aggregate_recompute(src, dst, ["event_type"], aggs)
    r3 = sync_aggregate_recompute(src, dst, ["event_type"], aggs)
    if not (r1.applied and r2.applied and r3 is None):
        raise AssertionError("rollup-recompute rounds deviated from the "
                             "expected applied/applied/caught-up sequence")
    return dst.read().select(
        "event_type", "min_value_c2", "max_value_c2", "n_users"
    )


SQL_ROLLUP_RECOMPUTE_SYNC = """
SELECT event_type,
       CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS min_value_c2,
       CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS max_value_c2,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM (
  SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
GROUP BY event_type
"""


def q_rollup_cascade(spark, sf_dir):
    """Hierarchical materialized views (continuous-aggregate cascade):
    events → hourly rollup → daily rollup, each tier maintained
    incrementally by `sync_aggregate` and the SECOND tier consuming the
    FIRST tier's own change feed — the hourly table is itself a LakeTable,
    so its merges emit the same CDC-out provenance the raw table does and
    retractions (an hourly group vanishing under LWW churn) propagate as
    tombstones that the daily tier subtracts. Two waves with compaction;
    the daily rollup must equal the one-shot two-level GROUP BY over live
    state — the DuckDB oracle. Reference: per-slice aggregated QA tables
    layered over the capture history (scripts/geral.py:92-109)."""
    from etl_spark.cdc.agg_sync import create_aggregate_table, sync_aggregate
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.pmod(F.col("event_id"), F.lit(6)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_cascade_")
    waves = [os.path.join(tmp, "w0"), os.path.join(tmp, "w1")]
    write_event_epochs(wal.filter(F.col("epoch") < 3), waves[0])
    write_event_epochs(wal.filter(F.col("epoch") >= 3), waves[1])

    src_path = os.path.join(tmp, "src")
    src, _ = replay_events(
        spark, waves[0], src_path, n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"compact_threshold": "2"},
    )
    hourly = create_aggregate_table(
        spark, os.path.join(tmp, "hourly"), src,
        group_cols=["event_type", "hour", "day"],
        sum_names=["sum_value_c2"], n_buckets=4,
    )
    daily = create_aggregate_table(
        spark, os.path.join(tmp, "daily"), hourly,
        group_cols=["event_type", "day"],
        sum_names=["sum_value_c2"], count_col="n_hours", n_buckets=4,
    )
    sums = {"sum_value_c2": F.round(F.col("value") * 100).cast("bigint")}
    # the daily tier re-aggregates the hourly tier's own measures
    fold = {"sum_value_c2": F.col("sum_value_c2")}

    for wave in (None, waves[1]):
        if wave is not None:
            src, _ = replay_events(
                spark, wave, src_path,
                key_cols=["user_id"], version_cols=["ts", "event_id"],
            )
        r_h = sync_aggregate(src, hourly, ["event_type", "hour", "day"],
                             sums)
        r_d = sync_aggregate(hourly, daily, ["event_type", "day"], fold,
                             count_col="n_hours")
        if not (r_h.applied and r_d.applied):
            raise AssertionError("cascade round unexpectedly a no-op")
    if sync_aggregate(hourly, daily, ["event_type", "day"], fold,
                      count_col="n_hours") is not None:
        raise AssertionError("caught-up cascade was not a no-op")
    return daily.read().select(
        "event_type", "day", "n_hours", "sum_value_c2"
    )


SQL_ROLLUP_CASCADE = """
SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(sum_value_c2) AS BIGINT) AS sum_value_c2
FROM (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         date_trunc('day', ts) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_value_c2
  FROM (
    SELECT *, row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND event_type <> 'error'
  GROUP BY 1, 2, 3
)
GROUP BY event_type, day
"""


def q_scd2_history(spark, sf_dir):
    """Batch SCD Type-2 derivation (the reference's ``%s_versoes``
    per-row change-tracking intent, bd.py:77-84 / sisab/modelos.py:29,
    as the warehouse-standard interval product): every non-delete event
    opens an interval the key's next event closes; deletes close without
    a successor. One shuffle (hash by key) + per-key sort — a window is
    correct here because a key's interval chain is inherently
    sequential and bounded by per-key churn."""
    from etl_spark.cdc.scd2 import scd2_history

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
    )
    out = scd2_history(wal, ["user_id"], ["ts", "event_id"])
    return out.select(
        "user_id", "event_id", F.col("ts").alias("valid_from"),
        "valid_to", "event_type", "value", "props", "is_current",
    )


SQL_SCD2_HISTORY = """
SELECT user_id, event_id, ts AS valid_from, valid_to,
       event_type, value, props, (valid_to IS NULL) AS is_current
FROM (
  SELECT user_id, event_id, ts, event_type, value, props,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM events
) WHERE op <> 'D'
"""


def q_scd2_incremental(spark, sf_dir):
    """Incrementally maintained SCD2 (current + history LakeTable pair,
    cdc/scd2.py): five week-partitioned epochs applied one at a time —
    each round closes affected open intervals via a bucket-pruned point
    read of the entity-keyed current table (never a history scan),
    appends them to history, then LWW-merges the epoch winners, under
    docs-before-state manifest ordering. The replay is run TWICE; the
    second pass must be all metadata no-ops. The full view must equal
    the one-shot SQL derivation over per-epoch winners — the DuckDB
    oracle. Reference: the capture-history contract (geral.py:92-109)
    plus the versioned-table intent (bd.py:77-84)."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.scd2 import replay_scd2, scd2_view

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        # weekly epochs anchored to a fixed date: GLOBALLY monotone in ts
        # (week-of-month is not — it resets at month boundaries, and a
        # non-monotone epoch makes per-epoch winners stop advancing each
        # key's version, silently dropping them as stale)
        F.floor(F.datediff(F.col("ts"), F.to_date(F.lit("2024-01-01"))) / 7)
        .cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_scd2_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    root = os.path.join(tmp, "scd2")
    cur, hist, stats = replay_scd2(
        spark, wal_dir, root, key_cols=["user_id"],
        version_cols=["ts", "event_id"], n_buckets=8,
    )
    if not all(h.applied and c.applied for h, c in stats):
        raise AssertionError("first SCD2 replay had unexpected no-ops")
    _, _, again = replay_scd2(
        spark, wal_dir, root, key_cols=["user_id"],
        version_cols=["ts", "event_id"], n_buckets=8,
    )
    if any(h.applied or c.applied for h, c in again):
        raise AssertionError("SCD2 replay was not exactly-once")
    return scd2_view(cur, hist).select(
        "user_id", "event_id", F.col("ts").alias("valid_from"),
        "valid_to", "event_type", "value", "props", "is_current",
    )


SQL_SCD2_INCREMENTAL = """
WITH winners AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts, event_type, value, props,
           CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                AS BIGINT) AS epoch,
           row_number() OVER (
             PARTITION BY user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT)
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
), seq AS (
  SELECT *, lead(ts) OVER (PARTITION BY user_id ORDER BY epoch) AS valid_to
  FROM winners
)
SELECT user_id, event_id, ts AS valid_from, valid_to,
       event_type, value, props, (valid_to IS NULL) AS is_current
FROM seq WHERE op <> 'D'
"""


def q_scd2_purge_erasure(spark, sf_dir):
    """Right-to-erasure across the SCD2 pair (cdc/scd2.py::purge_scd2):
    the subject's OPEN interval is tombstoned out of the entity-keyed
    current table and every CLOSED interval out of the append-only
    history table (keyed by entity + opening version, so the lookup is
    one map-side semi-join scan — batch erasure requests), then targeted
    compaction + snapshot expiry + vacuum scrub the files of both. The
    surviving view must equal the one-shot SCD2 derivation minus the
    purged subjects. Reference: the versioned-table intent (bd.py:77-84)
    over sensitive SINAN microdata (sinan/violencia.py) — exactly the
    state an LGPD erasure request must defeat."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.scd2 import purge_scd2, replay_scd2, scd2_view

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        # fixed-anchor weekly epochs: globally monotone in ts (see
        # q_scd2_incremental)
        F.floor(F.datediff(F.col("ts"), F.to_date(F.lit("2024-01-01"))) / 7)
        .cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_scd2purge_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    cur, hist, _ = replay_scd2(
        spark, wal_dir, os.path.join(tmp, "scd2"), key_cols=["user_id"],
        version_cols=["ts", "event_id"], n_buckets=8,
    )
    subjects = ev.select("user_id").filter(
        F.col("user_id") % 97 == 0).distinct()
    report = purge_scd2(cur, hist, subjects, manifest_key="purge:gate",
                        vacuum_grace_sec=0.0)
    if report["history_residual_live"] or report["current_residual_live"]:
        raise AssertionError(f"SCD2 purge left live residual rows: {report}")
    return scd2_view(cur, hist).select(
        "user_id", "event_id", F.col("ts").alias("valid_from"),
        "valid_to", "event_type", "value", "props", "is_current",
    )


SQL_SCD2_PURGE = """
WITH winners AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts, event_type, value, props,
           CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                AS BIGINT) AS epoch,
           row_number() OVER (
             PARTITION BY user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT)
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
), seq AS (
  SELECT *, lead(ts) OVER (PARTITION BY user_id ORDER BY epoch) AS valid_to
  FROM winners
)
SELECT user_id, event_id, ts AS valid_from, valid_to,
       event_type, value, props, (valid_to IS NULL) AS is_current
FROM seq WHERE op <> 'D' AND user_id % 97 <> 0
"""


def q_snapshot_audit_diff(spark, sf_dir):
    """Semantic snapshot diff (lake/diff.py): the state delta between two
    snapshots computed from the data itself — one union + ONE combinable
    aggregate (max-per-side payload struct), no join — returning
    added/removed/changed keys with the payload as of each side. The
    independent verifier for the commit-provenance change feed (and the
    feed-recovery path once old snapshots expire). Reference: re-derived
    capture-slice comparisons, scripts/geral.py:92-109."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events
    from etl_spark.lake import snapshot_diff

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_diff_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, stats = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"compact_threshold": "2"},  # maintenance mid-range
    )
    v_mid = stats[1].version  # snapshot the epoch-1 merge committed
    return snapshot_diff(table, v_mid).select(
        "user_id", "change",
        "old_event_id", "old_ts", "old_event_type", "old_value", "old_props",
        "new_event_id", "new_ts", "new_event_type", "new_value", "new_props",
    )


SQL_SNAPSHOT_AUDIT_DIFF = """
WITH oldst AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts, event_type, value, props,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE event_id % 4 < 2
  ) WHERE rn = 1 AND event_type <> 'error'
), newst AS (
  SELECT * FROM (
    SELECT user_id, event_id, ts, event_type, value, props,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.user_id IS NULL THEN 'added'
            WHEN n.user_id IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       o.event_id AS old_event_id, o.ts AS old_ts,
       o.event_type AS old_event_type, o.value AS old_value,
       o.props AS old_props,
       n.event_id AS new_event_id, n.ts AS new_ts,
       n.event_type AS new_event_type, n.value AS new_value,
       n.props AS new_props
FROM oldst o FULL OUTER JOIN newst n ON o.user_id = n.user_id
WHERE o.user_id IS NULL OR n.user_id IS NULL OR o.event_id <> n.event_id
"""


def q_cdc_purge_erasure(spark, sf_dir):
    """Right-to-erasure purge (LGPD/GDPR; the deletion side of the §1.1
    versioned-table intent, bd.py:77-84): tombstone a key set through the
    normal MERGE (version-bumped, change-feed-visible), compact ONLY the
    affected buckets, expire snapshots, vacuum — then the final table
    state must equal the LWW replay minus the purged subjects. The purge
    tombstones keep suppressing late duplicates of the erased data."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events
    from etl_spark.lake import purge_keys

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_purge_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
    )
    subjects = ev.select("user_id").filter(
        F.col("user_id") % 97 == 0).distinct()
    report = purge_keys(table, subjects, manifest_key="purge:gate",
                        vacuum_grace_sec=0.0)
    if report["residual_live"] != 0:
        raise AssertionError(f"purge left live residual rows: {report}")
    return table.read().select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


SQL_CDC_PURGE = """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error' AND user_id % 97 <> 0
"""


def q_pending_capture_scan(spark, sf_dir):
    """Distributed pending-work discovery (scripts/geral.py:61-65:
    ``capturas_agendamentos`` minus ``capturas_historico``): schedule
    DataFrame anti-joined against the applied-manifest history — BOTH the
    bounded recent window and the folded per-prefix watermark ranges
    (``manifest_window=2`` forces epochs 0-1 into the watermark, so the
    scan must consult both). Non-canonical ('epoch:02') and non-sequence
    ('adhoc:x') keys were never applied and must survive the scan."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events
    from etl_spark.pipeline import pending_scan

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 7)
    wal = ev.select(
        "event_id", F.lit("U").alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_pend_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"manifest_window": "2"},
    )
    sched = spark.createDataFrame(
        [(f"epoch:{i}",) for i in range(8)] + [("epoch:02",), ("adhoc:x",)],
        "manifest_key string",
    )
    return pending_scan(sched, table)


SQL_PENDING_SCAN = """
WITH sched AS (
  SELECT 'epoch:' || CAST(i AS VARCHAR) AS manifest_key
  FROM (SELECT unnest(range(8)) AS i)
  UNION ALL SELECT 'epoch:02' UNION ALL SELECT 'adhoc:x'
), applied AS (
  SELECT DISTINCT 'epoch:' || CAST(event_id % 4 AS VARCHAR) AS k
  FROM events WHERE user_id % 10 = 7
)
SELECT manifest_key FROM sched
WHERE manifest_key NOT IN (SELECT k FROM applied)
"""


def q_value_percentiles_approx(spark, sf_dir):
    """The SCALE variant of ``value_percentiles``: ``approx_percentile``
    (t-digest sketch — map-side combinable, constant memory per group, the
    operator actually run at 100 TB where exact ``percentile`` would
    buffer every group's values). The sketch is not bit-reproducible in
    DuckDB, so this entry has no SQL oracle (the driver records the
    weaker rows-only check); tests/test_functions.py asserts its error
    against the exact gate is bounded at accuracy=10000."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 4).alias("p50"),
        F.round(F.expr("approx_percentile(value, 0.9, 10000)"), 4).alias("p90"),
        F.round(F.expr("approx_percentile(value, 0.99, 10000)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def q_lww_compact_parity(spark, sf_dir):
    """Batch-verifiable gate for the stateful streaming compactor
    (applyInPandasWithState, streaming/stateful.py): stream the events
    table through in-flight LWW compaction, then LWW-dedup the survivors —
    which must equal the plain LWW latest state (the compactor only drops
    events that can never win; which stale events it drops in-flight
    depends on arrival order, the surviving winners do not)."""
    import uuid as _uuid

    from etl_spark.cdc.lww import lww_dedup
    from etl_spark.streaming.stateful import lww_compact_stream

    # the file streaming source wants a directory: expose the events file
    # through a temp dir (symlink = zero copy)
    src = os.path.join(sf_dir, "events.parquet")
    stream_dir = _tmpdir("etl_spark_lwwc_src_")
    try:
        os.symlink(src, os.path.join(stream_dir, "events.parquet"))
    except OSError:
        import shutil as _shutil

        _shutil.copy(src, stream_dir)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    compacted = lww_compact_stream(stream, ["user_id"], ts_col="ts",
                                   id_col="event_id")
    name = "lwwc_" + _uuid.uuid4().hex[:8]
    q = (
        compacted.writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
                _tmpdir("etl_spark_lwwc_"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    out = lww_dedup(spark.table(name), ["user_id"], ["ts", "event_id"])
    return out.select("user_id", "event_id", "ts", "event_type", "value", "props")


# survivors of in-flight compaction reduce to exactly the LWW latest state
SQL_LWW_COMPACT_PARITY = SQL_CDC_LWW


def q_cdc_time_travel(spark, sf_dir):
    """Snapshot time travel (SURVEY §1.1: the reference's per-row
    change-tracking intent — ``%s_versoes`` history tables with
    transaction ids, bd.py:77-84 / sisab/modelos.py:29 — realized as
    snapshot reads): replay four epochs as four commits, then read the
    table AS OF the snapshot the epoch-2 merge committed. Epoch-3 events
    must be invisible; delete winners inside the range stay filtered.
    Robust to any later maintenance commits by construction (the mid
    version is taken from the merge's own MergeStats, and historical
    snapshots are immutable)."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 5)
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_tt_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, stats = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
    )
    v_mid = stats[2].version  # the snapshot the epoch-2 merge committed
    return table.read(version=v_mid).select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


SQL_CDC_TIME_TRAVEL = """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events WHERE user_id % 10 = 5 AND event_id % 4 < 3
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_state_range_read(spark, sf_dir):
    """Zone-map data skipping (Iceberg per-file min/max stats analogue,
    lake/stats.py): the WAL replays into a stats-enabled LakeTable as
    five week-partitioned epoch merges — five un-compacted delta files
    per bucket with disjoint ``ts`` ranges — then the read applies an
    upward-closed ``ts >= cutoff`` predicate. File pruning refutes ~3/5
    of the files from footer stats before any data I/O (sound under
    merge-on-read because the predicate is upward-closed on the LWW
    version column — see ``stats.prunable_predicates``); the residual
    filter selects on the per-key winner, so the result is exactly
    ``final state WHERE ts >= cutoff``. Reference analogue: re-reading
    only the periods a re-capture touched (scripts/geral.py:61-65)."""
    import datetime as dt

    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        # week-of-month epochs: each delta wave covers a disjoint ts range,
        # so per-file [min,max] bounds are actually selective
        F.floor((F.dayofmonth("ts") - 1) / 7).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_prune_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=8,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        # high threshold keeps every delta un-compacted: the read exercises
        # the HARD (merge-on-read) pruning-soundness path, not the easy
        # compacted one
        table_props={"stats_cols": "ts", "compact_threshold": "100"},
    )
    cut = dt.datetime(2024, 1, 22)
    plan = table.scan_counts(where=[("ts", ">=", cut)])
    assert plan["files_pruned"] > 0, f"zone maps did not prune: {plan}"
    return table.read(where=[("ts", ">=", cut)]).select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


SQL_CDC_RANGE_READ = """
SELECT user_id, event_id, ts, event_type, value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
  AND ts >= TIMESTAMP '2024-01-22'
"""


def q_cdc_state_zorder_read(spark, sf_dir):
    """Multi-dimension clustering (``cluster_order: "zorder"``,
    lake/zorder.py — Iceberg ``zorder()`` sort-order / Delta OPTIMIZE
    ZORDER parity; reference analogue: two-dimensional UF x month slice
    pruning, procedimentos.py:210-219): events replay as an append-only
    fact table (key = event_id) in five weekly delta waves, compaction
    rewrites each bucket in MORTON order over (ts, value) with small
    parquet row groups, and the gate PROVES second-dimension pruning
    from the written footers — a band predicate on ``value`` must
    refute a real fraction of row groups, which the lexicographic
    (ts-first) order cannot do (every ts-run spans ~the whole value
    domain; pinned comparatively in tests/test_zorder.py). The returned
    rows exercise the read path under the reordered layout: a two-
    dimensional predicate, exact residual semantics."""
    import datetime as dt

    import pyarrow.parquet as _pq

    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id", F.lit("I").alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.floor((F.dayofmonth("ts") - 1) / 7).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_zorder_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=2,
        key_cols=["event_id"], version_cols=["ts"],
        table_props={
            "cluster_cols": "ts,value",
            "cluster_order": "zorder",
            "stats_cols": "ts",
            "compact_threshold": "100",
        },
    )
    # small row groups for the rewrite so the footer audit sees several
    # per file (the 100 TB shape in miniature); restored afterwards
    hconf = spark._jsc.hadoopConfiguration()
    saved = {k: hconf.get(k) for k in
             ("parquet.block.size", "parquet.page.size")}
    hconf.set("parquet.block.size", "16384")
    hconf.set("parquet.page.size", "4096")
    try:
        assert table.compact() > 0
    finally:
        for k, v in saved.items():
            (hconf.set(k, v) if v is not None else hconf.unset(k))
    # the value dimension is exponentially skewed; min/max cell scaling
    # (Iceberg-fixed-transform semantics, lake/zorder.py docstring) puts
    # the bulk in the low cells, so the honest pruning demonstration is
    # a selective band ABOVE the bulk — the "rare expensive events"
    # slice a real consumer asks for
    lo, hi = 250.0, 500.0
    snap = table.current_snapshot()
    refuted = total = 0
    for fl in snap.buckets.values():
        for f in fl:
            md = _pq.ParquetFile(os.path.join(table.path, f)).metadata
            rg0 = md.row_group(0)
            vi = {rg0.column(i).path_in_schema: i
                  for i in range(rg0.num_columns)}["value"]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(vi).statistics
                total += 1
                if st is not None and st.has_min_max and \
                        (st.max < lo or st.min > hi):
                    refuted += 1
    assert total >= 4, f"expected several row groups, got {total}"
    # with only a handful of groups each curve segment spans most of the
    # value domain and refutes nothing — the pruning evidence needs real
    # volume (driver sf0.01 + bench sf0.1 both exercise it)
    if total >= 8:
        assert refuted > total // 4, (
            f"z-order gave no second-dimension row-group pruning "
            f"({refuted}/{total})")
    cut = dt.datetime(2024, 1, 8)
    return table.read(
        where=[("ts", ">=", cut), ("value", "between", lo, hi)]
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")


SQL_CDC_ZORDER_READ = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE ts >= TIMESTAMP '2024-01-08' AND value BETWEEN 250.0 AND 500.0
"""


def q_wap_publish(spark, sf_dir):
    """Write-audit-publish (lake/wap.py — Iceberg WAP / the reference's
    savepoint-then-commit posture, utilitarios/bd.py:224-257): wave 2
    arrives first in a POISONED form (negated values); the audit gate
    runs against the STAGED post-merge state and rejects it, leaving the
    table at its seed version with the manifest key unclaimed — both
    asserted. The clean wave 2 then re-captures under the SAME key and
    publishes as an O(1) metadata flip of its staged files. The returned
    rows are the final state: seed ∪ clean wave 2, nothing of the
    poisoned stage."""
    from etl_spark.lake import LakeTable, audit_capture
    from etl_spark.pipeline import expect

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 7)
    tmp = _tmpdir("etl_spark_wap_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"),
        ev.select("event_id", "ts", "user_id", "event_type",
                  "value", "props").schema,
        key_cols=["event_id"], version_cols=["ts"], n_buckets=8,
    )
    wave = ev.select("event_id", F.lit("I").alias("op"), "ts", "user_id",
                     "event_type", "value", "props")
    table.merge(wave.filter(F.col("event_id") % 3 == 0),
                manifest_key="wave:0")
    v_seed = table.current_version()
    gates = [expect("value >= 0", "negative value in published state")]
    poisoned = (
        wave.filter(F.col("event_id") % 3 == 1)
        .withColumn("value", -F.col("value") - F.lit(1.0))
    )
    res = audit_capture(table, poisoned, manifest_key="wave:1",
                        gates=gates)
    assert res.status == "rejected", res
    assert table.current_version() == v_seed, "rejected stage mutated table"
    assert not table.current_snapshot().has_applied("wave:1")
    res2 = audit_capture(table, wave.filter(F.col("event_id") % 3 == 1),
                         manifest_key="wave:1", gates=gates)
    assert res2.status == "applied" and res2.stats.version == v_seed + 1
    return table.read().select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


SQL_WAP_PUBLISH = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE user_id % 10 = 7 AND event_id % 3 <= 1
"""


def q_snapshot_ref_read(spark, sf_dir):
    """Named snapshot refs (lake/refs.py — Iceberg tag/branch parity;
    reference analogue: the savepoint table copies of
    utilitarios/bd.py:224-257, same pin-a-vintage guarantee with zero
    data movement): waves 0-1 land and get TAGGED ``audited`` plus a
    consumer BRANCH ``stable`` at the same version; wave 2 commits after.
    The gate then proves the three ref properties end-to-end —
    (a) *decoupling*: the branch-pinned read still shows the audited
    state while the head has moved; (b) *retention force*:
    ``expire_snapshots(keep_last=1)`` + ``vacuum(0)`` reclaim everything
    EXCEPT the pinned vintage, which still reads in full; (c) *feed
    anchoring*: ``changes("audited")`` is exactly wave 2. Returned rows
    are the tagged vintage — time travel by NAME."""
    from etl_spark.lake import LakeTable

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 3)
    wave = ev.select("event_id", F.lit("I").alias("op"), "ts", "user_id",
                     "event_type", "value", "props")
    tmp = _tmpdir("etl_spark_refs_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"),
        ev.select("event_id", "ts", "user_id", "event_type",
                  "value", "props").schema,
        key_cols=["event_id"], version_cols=["ts"], n_buckets=8,
    )
    table.merge(wave.filter(F.col("event_id") % 3 == 0), "wave:0")
    table.merge(wave.filter(F.col("event_id") % 3 == 1), "wave:1")
    table.tag("audited").branch("stable")
    v_tag = table.resolve_ref("audited")
    table.merge(wave.filter(F.col("event_id") % 3 == 2), "wave:2")

    audited_n = table.read(version="audited").count()
    wave2_n = table.read().count() - audited_n
    assert wave2_n > 0, "wave 2 must land rows for the gate to mean anything"
    # (a) the branch consumer still sees the audited state post-commit
    assert table.read(version="stable").count() == audited_n
    # (c) the feed from the tag is exactly wave 2
    assert table.changes("audited").count() == wave2_n
    # (b) retention: expiry skips the pinned version, vacuum keeps its files
    expired = table.expire_snapshots(keep_last=1)
    assert v_tag not in expired and v_tag in table.versions()
    table.vacuum(older_than_sec=0)
    assert table.read(version="audited").count() == audited_n
    # promotion is an O(1) pointer move; rewind is equally legal
    assert table.move_branch("stable") == table.current_version()
    assert table.read(version="stable").count() == audited_n + wave2_n
    return table.read(version="audited").select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


SQL_SNAPSHOT_REF_READ = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE user_id % 10 = 3 AND event_id % 3 <= 1
"""


def q_lake_metadata_audit(spark, sf_dir):
    """Metadata tables (lake/meta.py — Iceberg's ``tbl.files`` /
    ``tbl.snapshots`` / ``tbl.refs`` surface; reference analogue: the
    capture-history bookkeeping queries of scripts/geral.py:92-109):
    events land, a fifth of the keys are deleted, and compaction with a
    tombstone watermark folds every dirty bucket. The gate answers an
    OPS question from the metadata plane alone — no data scan — and the
    oracle checks the answer against the data: the per-file footer row
    counts (``meta("files")``) must sum to exactly the live row count,
    and the zone maps (``meta("stats")``) must bound exactly the live
    ``ts`` domain, both true only because compacted unique files hold
    precisely the LWW winners. Cross-view consistency (partitions vs
    files vs snapshot JSON, ledger coverage of both waves, maintenance
    flag on the compaction commit) is asserted in-gate."""
    import json as _json

    from etl_spark.lake import LakeTable
    from etl_spark.lake.stats import decode_bound

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 4)
    wave = ev.select("event_id", F.lit("I").alias("op"), "ts", "user_id",
                     "event_type", "value", "props")
    tmp = _tmpdir("etl_spark_meta_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"),
        ev.select("event_id", "ts", "user_id", "event_type",
                  "value", "props").schema,
        key_cols=["event_id"], version_cols=["ts"], n_buckets=8,
        props={"stats_cols": "ts"},
    )
    table.merge(wave, "wave:0")
    dels = wave.filter(F.col("event_id") % 5 == 0).withColumns({
        "op": F.lit("D"),
        "ts": F.col("ts") + F.expr("INTERVAL 1 DAY"),  # outrank the insert
    })
    table.merge(dels, "wave:1")
    import datetime as _dt

    assert table.compact(
        expire_tombstones_before=_dt.datetime(2030, 1, 1)) > 0

    snap = table.current_snapshot()
    files = table.meta("files").collect()
    by_bucket: dict[int, list] = {}
    for r in files:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert {f for fl in snap.buckets.values() for f in fl} == \
        {r["file"] for r in files}
    parts = {r["bucket"]: r for r in table.meta("partitions").collect()}
    for b, rs in by_bucket.items():
        assert parts[b]["files"] == len(rs)
        assert parts[b]["rows"] == sum(r["row_count"] for r in rs)
    snaps = {r["version"]: r for r in table.meta("snapshots").collect()}
    assert snaps[table.current_version()]["is_maintenance"]
    assert snaps[table.current_version()]["applied_count"] == 2
    ledger = table.meta("ledger").collect()
    window = {r["entry"] for r in ledger if r["kind"] == "window"}
    folded = {r["entry"]: (r["wm_lo"], r["wm_hi"]) for r in ledger
              if r["kind"] in ("folded", "cursor")}
    for i in (0, 1):
        assert f"wave:{i}" in window or (
            "wave" in folded and folded["wave"][0] <= i <= folded["wave"][1])
    assert table.meta("refs").count() == 0

    live_rows = sum(r["row_count"] for r in files)
    bounds = [
        (decode_bound(_json.loads(r["min_json"])),
         decode_bound(_json.loads(r["max_json"])))
        for r in table.meta("stats").collect()
        if r["column"] == "ts" and not r["is_bloom"]
    ]
    assert bounds, "stats_cols=ts zone maps must surface in meta('stats')"
    return spark.createDataFrame(
        [(live_rows, min(b[0] for b in bounds), max(b[1] for b in bounds))],
        "live_rows bigint, min_ts timestamp, max_ts timestamp",
    )


SQL_LAKE_METADATA_AUDIT = """
SELECT CAST(COUNT(*) AS BIGINT) AS live_rows,
       MIN(ts) AS min_ts, MAX(ts) AS max_ts
FROM events
WHERE user_id % 10 = 4 AND event_id % 5 <> 0
"""


def q_metadata_agg_pushdown(spark, sf_dir):
    """Metadata-accelerated aggregates (lake/fastagg.py — Iceberg
    answers ``SELECT count(*)`` / column min-max from manifest metadata;
    reference analogue: the row-count bookkeeping the reference runs
    around every load, scripts/geral.py:92-109, which at lake scale must
    not cost a table scan): events replay as a WAL (error=D, signup=I,
    else U) into a bucketed table, then the layout is deliberately
    staged into all three soundness tiers — one slice of buckets
    compacted WITH the tombstone watermark (footer stats prove all-live:
    zero data I/O), one compacted WITHOUT it (tombstones retained: the
    single-boolean-column scan tier), the rest left as raw deltas (the
    bucket-pruned LWW resolve tier). ``fast_count`` / ``fast_min_max``
    must equal the fully resolved state exactly; the oracle recomputes
    both from the raw event stream. The gate raises if any tier goes
    inert (a degenerate layout would silently stop testing the
    merge-on-read soundness split). The delete wave KEEPS the doomed
    rows' payloads, so a mixed file's footer physically carries values
    the resolved table must not report — the scan tier is what excludes
    them."""
    import datetime as _dt

    from etl_spark.lake import LakeTable
    from etl_spark.lake.fastagg import fast_count, fast_min_max

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 7)
    wave = ev.select("event_id", F.lit("I").alias("op"), "ts", "user_id",
                     "event_type", "value", "props")
    tmp = _tmpdir("etl_spark_fastagg_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"),
        ev.select("event_id", "ts", "user_id", "event_type",
                  "value", "props").schema,
        key_cols=["event_id"], version_cols=["ts"], n_buckets=8,
        props={"compact_threshold": "100"},
    )
    table.merge(wave, "wave:0")
    # delete every 5th event, payload kept — outranked by ts + 1 day
    table.merge(
        wave.filter(F.col("event_id") % 5 == 0).withColumns({
            "op": F.lit("D"),
            "ts": F.col("ts") + F.expr("INTERVAL 1 DAY"),
        }),
        "wave:1",
    )
    buckets = sorted(table.current_snapshot().buckets)
    far = _dt.datetime(2100, 1, 1)
    table.compact(buckets=buckets[:3], expire_tombstones_before=far)
    table.compact(buckets=buckets[3:6])  # tombstones retained => mixed

    n, brk = fast_count(table)
    vals, brk2 = fast_min_max(table, ["user_id", "value"])
    for b in (brk, brk2):
        assert b["files_footer"] >= 1, f"footer tier inert: {b}"
        assert b["files_scanned"] >= 1, f"column-scan tier inert: {b}"
        assert b["buckets_resolved"] >= 1, f"resolve tier inert: {b}"
    out = spark.createDataFrame(
        [(n, vals["user_id"][0], vals["user_id"][1],
          vals["value"][0], vals["value"][1])],
        "live_rows bigint, min_user bigint, max_user bigint, "
        "min_value double, max_value double",
    )
    return out.select(
        "live_rows", "min_user", "max_user",
        F.round("min_value", 6).alias("min_value"),
        F.round("max_value", 6).alias("max_value"),
    )


SQL_METADATA_AGG_PUSHDOWN = """
SELECT CAST(COUNT(*) AS BIGINT) AS live_rows,
       CAST(MIN(user_id) AS BIGINT) AS min_user,
       CAST(MAX(user_id) AS BIGINT) AS max_user,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value
FROM events
WHERE user_id % 10 = 7 AND event_id % 5 <> 0
"""


def q_constraint_merge_gate(spark, sf_dir):
    """Table-level CHECK constraints (lake/constraints.py — Delta
    ``ADD CONSTRAINT`` parity; reference analogue: the per-loader
    validation steps every impulsoetl loader runs before its Postgres
    load — declared on the TABLE here, so no write path can forget
    them): the table declares ``value >= 0`` at create time; wave 0
    lands clean; wave 1 arrives POISONED (negated values) and the merge
    itself refuses it — zero-extra-pass enforcement: the guard is folded
    into the write's own projection, the first violating row aborts the
    job, nothing publishes, the manifest key stays unclaimed (all
    asserted). The repaired wave 1 re-captures under the SAME key.
    Unlike WAP (which audits a staged state a caller chose to stage),
    the constraint refuses even a caller that never heard of gates."""
    from etl_spark.lake import ConstraintViolation, LakeTable
    from etl_spark.lake.constraints import violation_counts

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 6)
    wave = ev.select("event_id", F.lit("I").alias("op"), "ts", "user_id",
                     "event_type", "value", "props")
    tmp = _tmpdir("etl_spark_cons_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"),
        ev.select("event_id", "ts", "user_id", "event_type",
                  "value", "props").schema,
        key_cols=["event_id"], version_cols=["ts"], n_buckets=8,
        props={"check_constraints": '{"nonneg": "value >= 0"}'},
    )
    table.merge(wave.filter(F.col("event_id") % 2 == 0), "wave:0")
    v0 = table.current_version()
    poisoned = (
        wave.filter(F.col("event_id") % 2 == 1)
        .withColumn("value", -F.col("value") - F.lit(1.0))
    )
    # the audit face prices the damage without touching the table
    assert violation_counts(poisoned, {"nonneg": "value >= 0"})["nonneg"] > 0
    try:
        table.merge(poisoned, "wave:1")
        raise AssertionError("poisoned merge must refuse")
    except ConstraintViolation:
        pass
    assert table.current_version() == v0, "refused merge mutated the table"
    assert not table.current_snapshot().has_applied("wave:1")
    st = table.merge(wave.filter(F.col("event_id") % 2 == 1), "wave:1")
    assert st.applied
    return table.read().select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


SQL_CONSTRAINT_MERGE_GATE = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE user_id % 10 = 6
"""


def q_constraint_quarantine(spark, sf_dir):
    """Dead-letter posture for CHECK constraints
    (lake/constraints.py::merge_quarantine — the envelope router's
    reasoned-DLQ shape applied at the merge layer): one wave arrives
    with a poisoned MINORITY (every 4th row's value negated); instead
    of stalling the stream the merge SPLITS — violators land in a
    parquet dead-letter directory with the failing constraint's name,
    the clean remainder lands under the same manifest key, and a re-run
    of the same key is a table no-op with the DLQ intact (all
    asserted). Returns the table state: exactly the clean rows."""
    from etl_spark.lake import LakeTable, merge_quarantine

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 9)
    tmp = _tmpdir("etl_spark_consq_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"),
        ev.select("event_id", "ts", "user_id", "event_type",
                  "value", "props").schema,
        key_cols=["event_id"], version_cols=["ts"], n_buckets=8,
        props={"check_constraints": '{"nonneg": "value >= 0"}'},
    )
    wave = ev.select(
        "event_id", F.lit("I").alias("op"), "ts", "user_id", "event_type",
        F.when(F.col("event_id") % 4 == 3, -F.col("value") - F.lit(1.0))
        .otherwise(F.col("value")).alias("value"),
        "props",
    )
    dlq = os.path.join(tmp, "dlq")
    stats, n_bad = merge_quarantine(table, wave, "wave:0", dlq)
    assert stats.applied and n_bad > 0
    dl = spark.read.parquet(os.path.join(dlq, "wave_0"))
    assert dl.filter(F.col("_violation") != "nonneg").count() == 0
    assert dl.count() == n_bad
    stats2, n2 = merge_quarantine(table, wave, "wave:0", dlq)
    assert not stats2.applied and n2 == 0
    return table.read().select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


SQL_CONSTRAINT_QUARANTINE = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE user_id % 10 = 9 AND event_id % 4 <> 3
"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic class-balanced downsampling (pretraining-mix
    curation): cut 'en' to 25% and 'zh' to 50% while keeping every other
    language, with membership a pure function of (salt, doc_id) — replay-
    stable, resumable, zero-shuffle (single codegen'd scan). The RNG-free
    analogue of the reference's per-UF work splitting
    (utilitarios/repetidores.py:23-87)."""
    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, key="doc_id", strata="lang",
        rates_permille={"en": 250, "zh": 500},
    )
    return out.select("doc_id", "lang", "source", "n_chars")


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {hash_permille_sql('doc_id', 'strat')}
      < (CASE WHEN lang = 'en' THEN 250
              WHEN lang = 'zh' THEN 500
              ELSE 1000 END)
"""


def q_train_test_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by key hash —
    every row lands in exactly one split, independent of the sampling
    draw (distinct salt), reproducible across engines and re-runs.
    Returns the per-(lang, split) document and character counts a
    training-data pipeline reports as its mix manifest."""
    docs = _t(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id",
                     [("train", 800), ("val", 100), ("test", 100)])
    return out.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


SQL_TRAIN_TEST_SPLIT = f"""
SELECT lang, split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT lang, n_chars,
         CASE WHEN draw < 800 THEN 'train'
              WHEN draw < 900 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT lang, n_chars, {hash_permille_sql('doc_id', 'split')} AS draw
    FROM documents
  )
) GROUP BY lang, split
"""


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination (the curation step between dedup and
    training): flag training documents sharing any 3-word shingle with a
    deterministic held-out eval slice (doc_id % 97 == 0), returning the
    distinct overlapping-shingle count per flagged doc. The eval shingle
    set is broadcast (a benchmark suite stays broadcast-sized at any
    corpus scale); the training corpus streams through one explode +
    broadcast semi-join + combinable groupBy — never shuffled by
    shingle, so hot shingles cannot skew."""
    from etl_spark.operators.dedup import eval_contamination

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tr = docs.filter(F.col("doc_id") % 97 != 0)
    return eval_contamination(tr, ev, "doc_id", "text",
                              shingle_k=3, keep_cols=["lang"])


SQL_DECONTAMINATION = f"""
WITH sh AS ({_SQL_SHINGLE3}),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
SELECT t.doc_id, d.lang, COUNT(DISTINCT t.s) AS n_hits
FROM tr t JOIN ev USING (s) JOIN documents d ON d.doc_id = t.doc_id
GROUP BY t.doc_id, d.lang
"""


def q_pack_budget(spark, sf_dir):
    """Deterministic sequence packing for training-shard assembly: hash
    documents into 8 independent streams, order by doc_id within each,
    and cut greedily into ~20k-char shards (a shard may overshoot by at
    most one document — the streaming-packing contract). One shuffle
    into n_buckets sort partitions; no global order, so packing is
    embarrassingly parallel across buckets at any scale."""
    from etl_spark.operators.reshape import pack_budget

    docs = _t(spark, sf_dir, "documents")
    out = pack_budget(docs, "doc_id", "n_chars", budget=20000, n_buckets=8)
    return out.select("doc_id", "pack_bucket", "pack_shard")


SQL_PACK_BUDGET = f"""
SELECT doc_id, pack_bucket, CAST(floor(cum0 / 20000) AS BIGINT) AS pack_shard
FROM (
  SELECT doc_id, pack_bucket,
         COALESCE(SUM(n_chars) OVER (
           PARTITION BY pack_bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum0
  FROM (
    SELECT doc_id, n_chars,
           CAST({portable_hash60_sql("CAST(doc_id AS VARCHAR)")} % 8 AS INT)
             AS pack_bucket
    FROM documents
  )
)
"""


def q_cdc_dedup_ingest(spark, sf_dir):
    """Dedup-gated CDC ingest (the engine's two halves fused): documents
    arrive in three batches (doc_id % 3, in order); each batch passes
    exact dedup, LSH-candidate + Jaccard-verified within-batch dedup,
    and a verified near-dup check against the stored sketch state of
    everything ingested so far — survivors merge exactly-once into the
    docs table, their sketches into the state table, under one manifest
    key. Returns the final docs table. The corpus text is never
    re-scanned: cross-batch candidates come from band keys derived from
    stored signatures, verification from stored shingle-hash sets."""
    from pyspark.sql.types import StructType

    from etl_spark.cdc.dedup_ingest import (create_dedup_state,
                                            dedup_gated_merge)
    from etl_spark.lake import LakeTable

    src = _t(spark, sf_dir, "documents")
    tmp = _tmpdir("etl_spark_dedup_ingest_")
    docs = LakeTable.create(
        spark, os.path.join(tmp, "docs"),
        StructType.fromDDL("doc_id bigint, text string, n_chars bigint, v bigint"),
        key_cols=["doc_id"], version_cols=["v"], n_buckets=8,
    )
    state = create_dedup_state(spark, os.path.join(tmp, "state"), n_buckets=8)
    for k in range(3):
        batch = src.filter(F.pmod(F.col("doc_id"), F.lit(3)) == k).select(
            "doc_id", "text", "n_chars",
            F.lit(k).cast("long").alias("v"), F.lit("I").alias("op"),
        )
        dedup_gated_merge(docs, state, batch, f"ingest:{k}",
                          threshold=0.5, collect_stats=False)
    return docs.read().select("doc_id", "v", "n_chars")


# the same decision function DuckDB-side: |∩| / |∪| of the shingle-hash
# sets, one double division (bit-identical to _jaccard_ok)
def _jac_sql(a: str, b: str) -> str:
    return (f"CAST(len(list_intersect({a}, {b})) AS DOUBLE)"
            f" / len(list_distinct(list_concat({a}, {b})))")


def _cross_drop_sql(batch: int, st: str, sz: str) -> str:
    """One unrolled round of the incremental gate: batch ``batch``'s
    within-survivor bucket rows vs corpus state ``st`` (guarded by
    ``sz``), Jaccard-verified."""
    return f"""
  SELECT DISTINCT n.doc_id
  FROM (SELECT lx.doc_id, lx.band, lx.bucket
        FROM lshx lx JOIN w ON w.doc_id = lx.doc_id AND w.b = {batch}) n
  JOIN {st} c ON n.band = c.band AND n.bucket = c.bucket
  JOIN {sz} z ON z.band = n.band AND z.bucket = n.bucket
  JOIN shs sa ON sa.doc_id = n.doc_id
  JOIN shs sb ON sb.doc_id = c.doc_id
  WHERE z.n <= 1000 AND n.doc_id <> c.doc_id
    AND {_jac_sql('sa.sh', 'sb.sh')} >= 0.5
"""


SQL_CDC_DEDUP_INGEST = f"""
WITH mh AS ({_minhash_sql(16)}),
lsh AS ({_lsh_union_sql(4, 4)}),
shs AS (
  SELECT doc_id, list_distinct(list({_h60('s')})) AS sh
  FROM ({_SQL_SHINGLE3}) g GROUP BY doc_id
),
ex AS (
  SELECT doc_id, doc_id % 3 AS b FROM (
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY doc_id % 3, md5(text)) AS m
    FROM documents
  ) WHERE doc_id = m
),
lshx AS (
  SELECT l.doc_id, e.b, l.band, l.bucket
  FROM lsh l JOIN ex e ON l.doc_id = e.doc_id
),
szw AS (
  SELECT b, band, bucket, COUNT(*) AS n FROM lshx GROUP BY b, band, bucket
),
wdrop AS (
  SELECT DISTINCT y.doc_id
  FROM lshx x
  JOIN lshx y ON x.b = y.b AND x.band = y.band AND x.bucket = y.bucket
             AND x.doc_id < y.doc_id
  JOIN szw s ON s.b = x.b AND s.band = x.band AND s.bucket = x.bucket
  JOIN shs sa ON sa.doc_id = x.doc_id
  JOIN shs sb ON sb.doc_id = y.doc_id
  WHERE s.n BETWEEN 2 AND 1000
    AND {_jac_sql('sa.sh', 'sb.sh')} >= 0.5
),
w AS (
  SELECT e.doc_id, e.b FROM ex e
  WHERE e.doc_id NOT IN (SELECT doc_id FROM wdrop)
),
k0 AS (SELECT doc_id FROM w WHERE b = 0),
st1 AS (SELECT l.band, l.bucket, l.doc_id FROM lsh l JOIN k0 USING (doc_id)),
sz1 AS (SELECT band, bucket, COUNT(*) AS n FROM st1 GROUP BY band, bucket),
x1 AS ({_cross_drop_sql(1, 'st1', 'sz1')}),
k1 AS (SELECT doc_id FROM w
       WHERE b = 1 AND doc_id NOT IN (SELECT doc_id FROM x1)),
st2 AS (SELECT * FROM st1 UNION ALL
        SELECT l.band, l.bucket, l.doc_id FROM lsh l JOIN k1 USING (doc_id)),
sz2 AS (SELECT band, bucket, COUNT(*) AS n FROM st2 GROUP BY band, bucket),
x2 AS ({_cross_drop_sql(2, 'st2', 'sz2')}),
k2 AS (SELECT doc_id FROM w
       WHERE b = 2 AND doc_id NOT IN (SELECT doc_id FROM x2)),
kept AS (
  SELECT doc_id, 0 AS b FROM k0
  UNION ALL SELECT doc_id, 1 FROM k1
  UNION ALL SELECT doc_id, 2 FROM k2
)
SELECT d.doc_id, CAST(k.b AS BIGINT) AS v, d.n_chars
FROM kept k JOIN documents d ON d.doc_id = k.doc_id
"""


def q_cdc_patch_upsert(spark, sf_dir):
    """Partial-image CDC replay (``update_semantics="patch"``): the events
    WAL re-cut as Debezium-style partial rows — each non-insert update
    carries ONE of the three payload columns (a deterministic
    ``event_id % 3`` rule; signups carry full rows), NULL meaning "keep
    the previous value" — merged epoch-by-epoch through LakeTable with
    per-column LWW resolution (lake/table.py::_patch_rows). Final state:
    each column holds the latest value that actually set it, reset by any
    newer tombstone; a key exists iff a non-delete row outlives its last
    delete. Deltas land raw (no batch fold can represent delete-then-set),
    read-time resolution stays one combinable aggregate — the same
    single-shuffle skew story as row-LWW. Reference: per-field REST
    detail re-capture over previously captured records
    (/root/reference/src/impulsoetl/scnes/estabelecimentos_identificados/
    tratamento.py — field-subset updates folded onto earlier vintages)."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    full = F.col("event_type") == "signup"
    pick = F.pmod(F.col("event_id"), F.lit(3))
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        "ts", "user_id",
        F.when(full | (pick == 0), F.col("event_type"))
        .alias("event_type"),
        F.when(full | (pick == 1), F.col("value")).alias("value"),
        F.when(full | (pick == 2), F.col("props")).alias("props"),
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_patch_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=16,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"update_semantics": "patch",
                     "write_metrics": "coarse"},
    )
    return table.read().select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


# Scalar version key: zero-padded (epoch_ms, event_id) concatenation is
# lexicographically ordered exactly like the engine's struct(ts, event_id)
# comparison, and is bit-identical across engines (no struct-compare
# dialect risk). Per column: the winner is the max-versioned non-delete
# row that SET the column, alive only if newer than the last tombstone.
SQL_CDC_PATCH = """
WITH wal AS (
  SELECT user_id, ts, event_id,
         (event_type = 'error') AS is_del,
         printf('%018d%012d', epoch_ms(ts), event_id) AS vk,
         CASE WHEN event_type='signup' OR event_id % 3 = 0
              THEN event_type END AS etp,
         CASE WHEN event_type='signup' OR event_id % 3 = 1
              THEN value END AS vp,
         CASE WHEN event_type='signup' OR event_id % 3 = 2
              THEN props END AS pp
  FROM events
),
agg AS (
  SELECT user_id,
         max_by(ts, vk) AS ts, max_by(event_id, vk) AS event_id,
         max(vk) AS latest,
         max(vk) FILTER (WHERE is_del) AS dv,
         max(vk) FILTER (WHERE NOT is_del AND etp IS NOT NULL) AS ev_v,
         max_by(etp, vk) FILTER (WHERE NOT is_del AND etp IS NOT NULL)
           AS ev_x,
         max(vk) FILTER (WHERE NOT is_del AND vp IS NOT NULL) AS va_v,
         max_by(vp, vk) FILTER (WHERE NOT is_del AND vp IS NOT NULL)
           AS va_x,
         max(vk) FILTER (WHERE NOT is_del AND pp IS NOT NULL) AS pr_v,
         max_by(pp, vk) FILTER (WHERE NOT is_del AND pp IS NOT NULL)
           AS pr_x
  FROM wal GROUP BY user_id
)
SELECT user_id, event_id, ts,
       CASE WHEN dv IS NULL OR ev_v > dv THEN ev_x END AS event_type,
       CASE WHEN dv IS NULL OR va_v > dv THEN va_x END AS value,
       CASE WHEN dv IS NULL OR pr_v > dv THEN pr_x END AS props
FROM agg
WHERE dv IS NULL OR latest > dv
"""


def q_cdc_envelope_ingest(spark, sf_dir):
    """Debezium-envelope wire ingest (cdc/envelope.py): the events table
    serialized to per-change JSON envelopes (error→``d`` carrying only
    the key in ``before``; signup→``c``; rest→``u``; ``lsn=event_id``),
    with three poison messages and a Kafka tombstone spliced into the
    stream, then normalized back to the engine's flat I/U/D shape by
    ``parse_envelopes``. Output = the good-side events (op mapping,
    delete-payload-from-before, ms-precision version, lsn seq); the
    poison rows must land in quarantine (not here) and the tombstone in
    neither. One codegen'd projection — no shuffle, no Python.
    Reference: every upstream transport normalized into one tratamento
    shape before loading (/root/reference/src/impulsoetl/scripts/
    geral.py:36-116)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_spark.cdc.envelope import make_envelope, parse_envelopes

    payload_schema = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    )
    ev = _t(spark, sf_dir, "events")
    is_del = F.col("event_type") == "error"
    full = F.struct("user_id", "event_type", "value", "props")
    key_only = F.struct(
        F.col("user_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    wire = ev.select(
        make_envelope(
            op=F.when(is_del, F.lit("d"))
            .when(F.col("event_type") == "signup", F.lit("c"))
            .otherwise(F.lit("u")),
            before=F.when(is_del, key_only),
            after=F.when(~is_del, full),
            # ts is TIMESTAMP_NTZ; session tz is pinned UTC, so the cast
            # is the identity DuckDB's epoch_ms applies to naive values
            ts_ms=F.unix_millis(F.col("ts").cast("timestamp")),
            source=F.named_struct(
                F.lit("table"), F.lit("events"),
                F.lit("lsn"), F.col("event_id"),
            ),
        ).alias("value")
    )
    poison = spark.createDataFrame(
        [
            ("{not json",),                            # unparseable
            ('{"op":"z","ts_ms":1,"after":{"user_id":1}}',),  # bad op
            ('{"op":"c","after":{"user_id":2}}',),     # missing ts
            (None,),                                   # Kafka tombstone
        ],
        "value string",
    )
    good, _bad = parse_envelopes(
        wire.unionAll(poison), payload_schema, table="events"
    )
    return good.select(
        "op",
        F.unix_millis("op_ts").alias("ts_ms"),
        "seq",
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "props",
    )


SQL_CDC_ENVELOPE = """
SELECT CASE WHEN event_type = 'error' THEN 'D'
            WHEN event_type = 'signup' THEN 'I'
            ELSE 'U' END AS op,
       epoch_ms(ts) AS ts_ms,
       event_id AS seq,
       user_id,
       CASE WHEN event_type = 'error' THEN NULL ELSE event_type END
         AS event_type,
       CASE WHEN event_type = 'error' THEN NULL ELSE round(value, 2) END
         AS value,
       CASE WHEN event_type = 'error' THEN NULL ELSE props END AS props
FROM events
"""


def q_envelope_route_fanout(spark, sf_dir):
    """Multi-table envelope routing (cdc/router.py): orders and customer
    re-cut as one interleaved Debezium wire stream — orders as creates
    (plus a later delete per 'F'-status order, lsn-disambiguated),
    customer as updates, two poison messages and one unknown-table
    envelope spliced in — routed by the ``source.table`` header probe
    into two LakeTables under per-table exactly-once merges. Output =
    both final states, discriminated by ``tbl``: deleted orders gone,
    poison dead-lettered, neither table sees the other's rows."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from etl_spark.cdc.envelope import make_envelope
    from etl_spark.cdc.router import apply_envelope_batch
    from etl_spark.lake import LakeTable

    orders_schema = StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_totalprice", DoubleType()),
        ]
    )
    cust_schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_acctbal", DoubleType()),
        ]
    )
    schemas = {"orders": orders_schema, "customer": cust_schema}

    o = _t(spark, sf_dir, "orders")
    ts_ms = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    creates = o.select(
        make_envelope(
            op=F.lit("c"),
            before=None,
            after=F.struct("o_orderkey", "o_custkey", "o_totalprice"),
            ts_ms=ts_ms,
            source=F.named_struct(
                F.lit("table"), F.lit("orders"),
                F.lit("lsn"), F.col("o_orderkey"),
            ),
        ).alias("value")
    )
    deletes = o.filter(F.col("o_orderstatus") == "F").select(
        make_envelope(
            op=F.lit("d"),
            before=F.struct(
                F.col("o_orderkey"),
                F.lit(None).cast("long").alias("o_custkey"),
                F.lit(None).cast("double").alias("o_totalprice"),
            ),
            after=None,
            ts_ms=ts_ms + F.lit(86_400_000),
            source=F.named_struct(
                F.lit("table"), F.lit("orders"),
                F.lit("lsn"), F.col("o_orderkey") + F.lit(1_000_000_000),
            ),
        ).alias("value")
    )
    c = _t(spark, sf_dir, "customer")
    cust = c.select(
        make_envelope(
            op=F.lit("u"),
            before=None,
            after=F.struct("c_custkey", "c_name", "c_acctbal"),
            ts_ms=F.lit(1000),
            source=F.named_struct(
                F.lit("table"), F.lit("customer"),
                F.lit("lsn"), F.col("c_custkey"),
            ),
        ).alias("value")
    )
    poison = spark.createDataFrame(
        [
            ("{broken",),
            ('{"op":"q","ts_ms":1,"source":{"table":"orders"}}',),
            ('{"op":"c","ts_ms":1,"source":{"table":"lineitem"},'
             '"after":{"x":1}}',),
        ],
        "value string",
    )
    wire = creates.unionAll(deletes).unionAll(cust).unionAll(poison)

    def versioned(payload):
        return StructType(
            [StructField("op_ts", TimestampType()),
             StructField("seq", LongType())] + list(payload.fields)
        )

    tmp = _tmpdir("etl_spark_route_")
    tables = {
        "orders": LakeTable.create(
            spark, os.path.join(tmp, "orders"), versioned(orders_schema),
            key_cols=["o_orderkey"], version_cols=["op_ts", "seq"],
            n_buckets=8,
        ),
        "customer": LakeTable.create(
            spark, os.path.join(tmp, "customer"), versioned(cust_schema),
            key_cols=["c_custkey"], version_cols=["op_ts", "seq"],
            n_buckets=8,
        ),
    }
    apply_envelope_batch(
        wire, schemas, tables, "route:0",
        quarantine_dir=os.path.join(tmp, "dead"),
    )
    out_o = tables["orders"].read().select(
        F.lit("orders").alias("tbl"),
        F.col("o_orderkey").alias("k"),
        F.round("o_totalprice", 2).alias("v"),
    )
    out_c = tables["customer"].read().select(
        F.lit("customer").alias("tbl"),
        F.col("c_custkey").alias("k"),
        F.round("c_acctbal", 2).alias("v"),
    )
    return out_o.unionAll(out_c)


SQL_ENVELOPE_ROUTE = """
SELECT 'orders' AS tbl, o_orderkey AS k, round(o_totalprice, 2) AS v
FROM orders WHERE o_orderstatus <> 'F'
UNION ALL
SELECT 'customer' AS tbl, c_custkey AS k, round(c_acctbal, 2) AS v
FROM customer
"""


def q_snapshot_reconcile(spark, sf_dir):
    """Anti-entropy repair (cdc/reconcile.py): a lake table replayed from
    a WAL with a silently dropped slice (every third event missing —
    connector-bug drift) is reconciled against one fresh full snapshot of
    the upstream truth; the diff becomes corrective I/U/D events through
    the normal exactly-once MERGE (so the change feed carries the repair
    downstream), and the repaired state must equal the truth exactly."""
    from datetime import datetime

    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.cdc.lww import lww_dedup
    from etl_spark.cdc.reconcile import reconcile_snapshot
    from etl_spark.cdc.replay import replay_events

    ev = _t(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
    )
    # the drifted tail: a third of the WAL never arrived
    wal = ev.filter(F.pmod(F.col("event_id"), F.lit(3)) != 0).select(
        "event_id", op.alias("op"), "ts", "user_id", "event_type",
        "value", "props",
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_reconcile_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    table, _ = replay_events(
        spark, wal_dir, os.path.join(tmp, "tbl"), n_buckets=16,
        key_cols=["user_id"], version_cols=["ts", "event_id"],
        table_props={"write_metrics": "coarse"},
    )
    # one consistent full read of the upstream truth
    truth = (
        lww_dedup(ev, ["user_id"], ["ts", "event_id"])
        .filter(F.col("event_type") != "error")
        .select("user_id", "event_type", "value", "props")
    )
    reconcile_snapshot(
        table, truth,
        version={"ts": datetime(2100, 1, 1), "event_id": 0},
        manifest_key="reconcile:0",
    )
    return table.read().select(
        "user_id", "event_type", F.round("value", 2).alias("value"), "props"
    )


SQL_SNAPSHOT_RECONCILE = """
SELECT user_id, event_type, round(value, 2) AS value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_bootstrap_handoff(spark, sf_dir):
    """Chunked initial-snapshot bootstrap with live-tail handoff
    (cdc/bootstrap.py — the DBLog / Debezium incremental-snapshot shape):
    the events table is a source whose position IS event_id; a full
    snapshot read at position CUT loads in 4 bucket-aligned exactly-once
    chunks (each row stamped with its own last position) while the live
    tail — started BEFORE the cut, so the overlap exercises
    at-least-once re-delivery — keeps merging around it. The handoff is
    pure LWW: no watermark-window dedup pass exists anywhere, yet the
    final state must equal a replay of the WHOLE history."""
    from etl_spark.cdc.bootstrap import bootstrap_snapshot
    from etl_spark.cdc.lww import lww_dedup
    from etl_spark.lake import LakeTable

    ev = _t(spark, sf_dir, "events")
    cut = int(ev.agg(F.max("event_id")).collect()[0][0] * 3 // 5)
    overlap = cut - cut // 10
    op = (
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
    )
    # one consistent source read at position `cut`: per-key winners by
    # position, deleted keys absent, each row carrying its own last
    # position as the version stamp (the faithful per-row-stamp form)
    snapshot = (
        lww_dedup(ev.filter(F.col("event_id") <= cut), ["user_id"],
                  ["event_id"])
        .filter(F.col("event_type") != "error")
        .select("user_id", "event_id", "ts", "event_type", "value",
                "props")
    )
    tail = ev.filter(F.col("event_id") > overlap).select(
        op.alias("op"), "user_id", "event_id", "ts", "event_type",
        "value", "props",
    )
    tmp = _tmpdir("etl_spark_bootstrap_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"), snapshot.schema,
        key_cols=["user_id"], version_cols=["event_id"], n_buckets=16,
        props={"write_metrics": "coarse"},
    )
    # tail wave A → snapshot chunks → tail wave B (true interleave: the
    # bootstrap lands between live merges, LWW decides every race)
    table.merge(tail.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0),
                manifest_key="tail:0")
    bootstrap_snapshot(table, snapshot, None, tag="init", n_chunks=4)
    table.merge(tail.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1),
                manifest_key="tail:1")
    return table.read().select(
        "user_id", "event_id", "ts", "event_type",
        F.round("value", 2).alias("value"), "props",
    )


SQL_CDC_BOOTSTRAP = """
SELECT user_id, event_id, ts, event_type, round(value, 2) AS value, props
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_consistent_read_group(spark, sf_dir):
    """Consistent cross-table read group (cdc/consistent.py): orders and
    customer arrive as a routed fan-out in 3 wire batches; the live tail
    runs one batch AHEAD on orders (the mid-wave / crash shape). A join
    at "latest" would see a torn wave; read_group pins each table to the
    snapshot that FIRST applied batch 1's manifest key — metadata-only
    resolution, ordinary pruned time-travel reads — so the join sees
    exactly batches ≤ 1 on both sides."""
    from etl_spark.cdc.consistent import read_group, route_keys
    from etl_spark.lake import LakeTable

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    tmp = _tmpdir("etl_spark_group_")
    t_ord = LakeTable.create(
        spark, os.path.join(tmp, "orders"),
        orders.select("o_orderkey", "o_custkey", "o_totalprice").schema
        .add("v", "long"),
        key_cols=["o_orderkey"], version_cols=["v"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )
    t_cust = LakeTable.create(
        spark, os.path.join(tmp, "customer"),
        customer.select("c_custkey", "c_mktsegment").schema.add("v", "long"),
        key_cols=["c_custkey"], version_cols=["v"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )
    for i in range(3):
        o = orders.filter(F.pmod("o_orderkey", F.lit(3)) == i).select(
            F.lit("I").alias("op"), "o_orderkey", "o_custkey",
            "o_totalprice", F.lit(i).cast("long").alias("v"),
        )
        t_ord.merge(o, manifest_key=f"env:s:{i}:orders")
        if i < 2:  # customer's batch 2 hasn't landed yet
            c = customer.filter(F.pmod("c_custkey", F.lit(3)) == i).select(
                F.lit("I").alias("op"), "c_custkey", "c_mktsegment",
                F.lit(i).cast("long").alias("v"),
            )
            t_cust.merge(c, manifest_key=f"env:s:{i}:customer")
    group = read_group(
        {"orders": t_ord, "customer": t_cust},
        route_keys(["orders", "customer"], "s", 1),
    )
    return (
        group["orders"]
        .join(group["customer"],
              group["orders"]["o_custkey"] == group["customer"]["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("orders_n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("revenue_cents"),
        )
    )


SQL_CONSISTENT_GROUP = """
SELECT c_mktsegment, count(*) AS orders_n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey % 3 <= 1 AND c_custkey % 3 <= 1
GROUP BY c_mktsegment
"""


def q_wire_gap_audit(spark, sf_dir):
    """Wire sequence-gap audit (cdc/gaps.py): the events table re-cut as
    a Kafka-shaped wire (partition = event_id % 4, offset = event_id/4 —
    dense per partition) with a connector fault injected (a contiguous
    dropped window plus scattered losses); the audit must report every
    maximal missing offset run per partition — found without any global
    sort (windows run only within coarse seq buckets; cross-bucket runs
    come from the tiny per-bucket summary)."""
    from etl_spark.cdc.gaps import sequence_gaps

    ev = _t(spark, sf_dir, "events")
    wire = ev.select(
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("src_part"),
        F.floor(F.col("event_id") / 4).cast("long").alias("seq_off"),
    ).where(
        (F.pmod(F.col("event_id"), F.lit(97)) >= 3)
        & ~F.col("event_id").between(1000, 1400)
    )
    return sequence_gaps(wire, "seq_off", ["src_part"], bucket_span=256)


SQL_WIRE_GAPS = """
WITH w AS (
  SELECT DISTINCT event_id % 4 AS src_part, event_id // 4 AS seq_off
  FROM events
  WHERE event_id % 97 >= 3 AND event_id NOT BETWEEN 1000 AND 1400
), g AS (
  SELECT src_part, seq_off,
         lag(seq_off) OVER (PARTITION BY src_part ORDER BY seq_off) AS prev
  FROM w
)
SELECT src_part, prev + 1 AS gap_lo, seq_off - 1 AS gap_hi,
       seq_off - prev - 1 AS missing
FROM g WHERE seq_off - prev > 1
"""


def q_type_promotion_read(spark, sf_dir):
    """Column type promotion (LakeTable.alter_column_type — Iceberg type
    promotion): a table born with an INT measure is widened to BIGINT as
    a METADATA-ONLY commit (the parquet vectorized reader converts old
    files on the fly — probed and pinned), then a post-drift wave lands
    values an INT can't hold; the evolved read resolves LWW across both
    vintages without any rewrite."""
    from etl_spark.lake import LakeTable
    from pyspark.sql.types import LongType

    ev = _t(spark, sf_dir, "events")
    tmp = _tmpdir("etl_spark_widen_")
    pre = ev.filter(F.pmod("event_id", F.lit(2)) == 0).select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("I")).alias("op"),
        "user_id", "event_id",
        F.round("value").cast("int").alias("x"),
    )
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"), pre.drop("op").schema,
        key_cols=["user_id"], version_cols=["event_id"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )
    table.merge(pre, manifest_key="e:0")
    table.alter_column_type("x", LongType())  # metadata-only widening
    post = ev.filter(F.pmod("event_id", F.lit(2)) == 1).select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("I")).alias("op"),
        "user_id", "event_id",
        (F.round(F.col("value") * 1000).cast("long")
         + F.lit(1) * F.lit(2**40)).alias("x"),
    )
    table.merge(post, manifest_key="e:1")
    return table.read().select("user_id", "event_id", "x")


SQL_TYPE_PROMOTION = """
SELECT user_id, event_id,
       CASE WHEN event_id % 2 = 0
            THEN CAST(CAST(round(value) AS INT) AS BIGINT)
            ELSE CAST(round(value * 1000) AS BIGINT) + (1 * 1099511627776)
       END AS x
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_rename_evolution_read(spark, sf_dir):
    """Column rename evolution (LakeTable.alter_rename_column — Iceberg
    ``RENAME COLUMN``): a table born with measure ``x`` takes a first
    wave, is renamed ``x -> val`` as a METADATA-ONLY commit (the prior
    physical name is recorded; nothing rewritten), then a post-rename
    wave lands under the new wire name; the read coalesces both physical
    vintages under ``val`` and resolves LWW across the rename boundary."""
    from etl_spark.lake import LakeTable

    ev = _t(spark, sf_dir, "events")
    tmp = _tmpdir("etl_spark_rename_")
    pre = ev.filter(F.pmod("event_id", F.lit(2)) == 0).select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("I")).alias("op"),
        "user_id", "event_id",
        F.round("value").cast("long").alias("x"),
    )
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"), pre.drop("op").schema,
        key_cols=["user_id"], version_cols=["event_id"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )
    table.merge(pre, manifest_key="e:0")
    table.alter_rename_column("x", "val")  # metadata-only rename
    post = ev.filter(F.pmod("event_id", F.lit(2)) == 1).select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("I")).alias("op"),
        "user_id", "event_id",
        F.round(F.col("value") * 10).cast("long").alias("val"),
    )
    table.merge(post, manifest_key="e:1")
    return table.read().select("user_id", "event_id", "val")


SQL_RENAME_EVOLUTION = """
SELECT user_id, event_id,
       CASE WHEN event_id % 2 = 0
            THEN CAST(round(value) AS BIGINT)
            ELSE CAST(round(value * 10) AS BIGINT)
       END AS val
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_spj_cobucket_join(spark, sf_dir):
    """Storage-partitioned join (lake/spj.cobucket_join — Spark's
    SPARK-37375 SPJ re-expressed for this format): two LakeTables
    sharing key hashing and bucket count are joined with ZERO shuffle —
    one task per bucket Arrow-reads both sides' bucket files where they
    lie, resolves merge-on-read LWW, drops tombstones, and joins
    vectorized. The plan is Range -> mapInPandas: no Exchange on either
    side at any scale (tests/test_spj.py pins that, plus task count ==
    n_buckets)."""
    from etl_spark.lake import LakeTable, cobucket_join

    ev = _t(spark, sf_dir, "events")
    tmp = _tmpdir("etl_spark_spj_")
    lrows = ev.filter(F.pmod("event_id", F.lit(2)) == 0).select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("I")).alias("op"),
        "user_id", "event_id",
        F.round("value").cast("long").alias("val_l"),
    )
    rrows = ev.filter(F.pmod("event_id", F.lit(3)) == 0).select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("I")).alias("op"),
        "user_id", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("val_r"),
    )
    left = LakeTable.create(
        spark, os.path.join(tmp, "l"), lrows.drop("op").schema,
        key_cols=["user_id"], version_cols=["event_id"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )
    right = LakeTable.create(
        spark, os.path.join(tmp, "r"), rrows.drop("op").schema,
        key_cols=["user_id"], version_cols=["event_id"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )
    left.merge(lrows, manifest_key="l:0")
    right.merge(rrows, manifest_key="r:0")
    return cobucket_join(left, right).select(
        "user_id", "event_id", "val_l",
        F.col("event_id_r"), "val_r")


SQL_SPJ_COBUCKET = """
WITH l AS (
  SELECT user_id, event_id, CAST(round(value) AS BIGINT) AS val_l
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM events WHERE event_id % 2 = 0
  ) WHERE rn = 1 AND event_type <> 'error'
), r AS (
  SELECT user_id, event_id AS event_id_r,
         CAST(round(value * 100) AS BIGINT) AS val_r
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM events WHERE event_id % 3 = 0
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT l.user_id, l.event_id, l.val_l, r.event_id_r, r.val_r
FROM l JOIN r ON l.user_id = r.user_id
"""


def q_bucket_rescale_read(spark, sf_dir):
    """Incremental bucket rescale (LakeTable.start_rescale /
    rescale_step): grow the hash layout 8 -> 16 WITHOUT an O(table)
    rewrite — a metadata-only start, then budget-bounded per-bucket
    migration steps that interleave with live merges (routing follows
    the split watermark: lake/table.py::_route_of), a finalize that
    flips n_buckets in the last step's commit, and a metadata-only
    shrink back to 4 (a divisor: file lists merge, zero data I/O).
    Iceberg partition-spec-evolution analogue; the atomic rebucket()
    stays for arbitrary counts. Final state must equal a plain replay —
    the layout is invisible to query results."""
    from etl_spark.cdc.events import write_event_epochs
    from etl_spark.lake import LakeTable

    ev = _t(spark, sf_dir, "events")
    wal = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "ts", "user_id", "event_type", "value", "props",
        F.pmod(F.col("event_id"), F.lit(4)).cast("long").alias("epoch"),
    )
    tmp = _tmpdir("etl_spark_rescale_")
    wal_dir = os.path.join(tmp, "wal")
    write_event_epochs(wal, wal_dir)
    from pyspark.sql.types import StructType

    user = StructType([f for f in wal.schema.fields
                       if f.name not in ("op", "epoch")])
    t = LakeTable.create(
        spark, os.path.join(tmp, "tbl"), user, key_cols=["user_id"],
        version_cols=["ts", "event_id"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )

    def ep(e):
        t.merge(spark.read.parquet(os.path.join(wal_dir, f"epoch={e}")),
                f"epoch:{e}")

    ep(0); ep(1)
    t.start_rescale(16)
    t.rescale_step(max_buckets=3)       # partial migration...
    ep(2)                               # ...merge routes mid-flight
    while t.rescale_status():
        t.rescale_step(max_buckets=99)  # finalize flips n_buckets
    ep(3)
    assert t.current_snapshot().n_buckets == 16
    t.start_rescale(4)                  # divisor: metadata-only shrink
    assert t.current_snapshot().n_buckets == 4
    return t.read().select(
        "user_id", "event_id", "ts", "event_type", "value", "props"
    )


SQL_BUCKET_RESCALE = SQL_CDC_REPLAY


def q_integrity_audit(spark, sf_dir):
    """Table fsck (lake/fsck.check_integrity — the reference's post-load
    verification posture at the lake layer, sisab/relatorio_validacao_
    producao/verificacao.py:15-98): a healthy bloomed + zone-mapped table
    audits clean on all three planes (metadata invariants, executor-side
    footer sweep, deep row-placement); physically deleting one referenced
    data file is then caught BY NAME, and restoring it audits clean
    again. The returned live state is oracled — proving the audited
    metadata belongs to a table whose answers are right."""
    import shutil as _sh

    from etl_spark.lake import LakeTable, check_integrity

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 7)
    wave = ev.select("event_id", F.lit("I").alias("op"), "ts", "user_id",
                     "event_type", "value", "props")
    tmp = _tmpdir("etl_spark_fsck_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"),
        ev.select("event_id", "ts", "user_id", "event_type",
                  "value", "props").schema,
        key_cols=["event_id"], version_cols=["ts"], n_buckets=8,
        props={"stats_cols": "ts", "bloom_cols": "event_id"},
    )
    table.merge(wave, "wave:0")
    table.compact()

    rep = check_integrity(table, deep=True)
    assert rep["ok"] and rep["files_checked"] > 0, rep
    assert rep["misplaced_rows"] == []

    snap = table.current_snapshot()
    victim = next(f for fl in snap.buckets.values() for f in fl)
    vp = os.path.join(table.path, victim)
    _sh.move(vp, vp + ".hidden")
    damaged = check_integrity(table)
    assert not damaged["ok"]
    assert {m["file"] for m in damaged["missing_files"]} == {victim}
    _sh.move(vp + ".hidden", vp)
    assert check_integrity(table)["ok"]
    return table.read().select("event_id", "ts", "user_id",
                               "event_type", "value", "props")


SQL_INTEGRITY_AUDIT = """
SELECT event_id, ts, user_id, event_type, value, props
FROM events WHERE user_id % 10 = 7
"""


def q_default_column_read(spark, sf_dir):
    """ADD COLUMN with an initial DEFAULT (LakeTable.alter_add_column —
    Iceberg initial-default semantics; reference analogue: the
    ADICIONAIS backfill columns the DE-PARA layer adds with constant
    values, plans/depara.py): wave 1 lands, the column is added
    metadata-only with default 'bronze', wave 2 lands carrying physical
    values. Pre-alter rows must read the default, post-alter rows their
    own values — with zero rewrite (the read groups files by vintage and
    coalesces)."""
    from etl_spark.lake import LakeTable

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 3)
    base = ev.select("event_id", F.lit("I").alias("op"), "ts", "user_id",
                     "event_type", "value", "props")
    tmp = _tmpdir("etl_spark_defcol_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"),
        ev.select("event_id", "ts", "user_id", "event_type",
                  "value", "props").schema,
        key_cols=["event_id"], version_cols=["ts"], n_buckets=8,
    )
    table.merge(base.filter(F.col("event_id") % 2 == 0), "wave:0")
    table.alter_add_column("tier", "string", default="bronze")
    table.merge(
        base.filter(F.col("event_id") % 2 == 1)
        .withColumn("tier", F.col("event_type")),
        "wave:1")
    return table.read().select(
        "event_id", "ts", "user_id", "event_type", "value", "props",
        "tier")


SQL_DEFAULT_COLUMN = """
SELECT event_id, ts, user_id, event_type, value, props,
       CASE WHEN event_id % 2 = 0 THEN 'bronze' ELSE event_type END AS tier
FROM events WHERE user_id % 10 = 3
"""


def q_sketch_distinct_sync(spark, sf_dir):
    """HLL sketch-maintained approx distinct rollup (cdc/sketch_sync.py):
    distinct-ever users per event_type kept from the change feed alone —
    three incremental rounds over a replayed upstream, each folding only
    the changed keys' values into the stored per-group sketch (one
    union, no history re-read). No DuckDB oracle by design: DataSketches
    HLL registers aren't replayable in SQL — the error-envelope and
    semantics gates live in tests/test_sketch_sync.py; the driver
    records the rows-only check."""
    from pyspark.sql.types import StringType, StructField

    from etl_spark.cdc.sketch_sync import (
        create_sketch_table,
        sync_aggregate_sketch,
    )
    from etl_spark.lake import LakeTable

    ev = _t(spark, sf_dir, "events")
    tmp = _tmpdir("etl_spark_sketch_")
    src = LakeTable.create(
        spark, os.path.join(tmp, "src"),
        ev.select("event_id", "user_id", "event_type").schema
        .add("v", "long"),
        key_cols=["event_id"], version_cols=["v"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )
    dst = create_sketch_table(
        spark, os.path.join(tmp, "dst"),
        [StructField("event_type", StringType())], ["users"], n_buckets=4,
        props={"write_metrics": "coarse"},
    )
    for i in range(3):
        batch = ev.filter(F.pmod("event_id", F.lit(3)) == i).select(
            F.lit("I").alias("op"), "event_id", "user_id", "event_type",
            F.lit(i).cast("long").alias("v"),
        )
        src.merge(batch, manifest_key=f"e:{i}")
        sync_aggregate_sketch(src, dst, ["event_type"],
                              {"users": F.col("user_id")})
    return dst.read().select("event_type", "users")


def _dml_table(spark, sf_dir, prefix):
    """Shared DML fixture: every event landed as an insert (version =
    event_id), value kept as a double payload."""
    from etl_spark.lake import LakeTable

    ev = _t(spark, sf_dir, "events")
    tmp = _tmpdir(prefix)
    base = ev.select(F.lit("I").alias("op"), "user_id", "event_id",
                     "event_type", "value", "props")
    table = LakeTable.create(
        spark, os.path.join(tmp, "tbl"), base.drop("op").schema,
        key_cols=["user_id"], version_cols=["event_id"], n_buckets=8,
        props={"write_metrics": "coarse"},
    )
    table.merge(base, manifest_key="e:0")
    stamp = ev.agg(F.max("event_id")).collect()[0][0] + 1
    return table, stamp


def q_dml_delete_where(spark, sf_dir):
    """Predicate DELETE (lake/dml.py): ``DELETE FROM state WHERE
    event_type = 'error'`` lands as version-stamped tombstones through
    the exactly-once MERGE — feed-visible, LWW-outranking (a late event
    older than the edit still loses), O(affected rows) via the same
    pruned read every query uses."""
    from etl_spark.lake.dml import delete_where

    table, stamp = _dml_table(spark, sf_dir, "etl_spark_dmld_")
    delete_where(table, [("event_type", "=", "error")],
                 {"event_id": stamp}, manifest_key="dml:1")
    return table.read().select(
        "user_id", "event_id", "event_type",
        F.round("value", 2).alias("value"),
    )


SQL_DML_DELETE = """
SELECT user_id, event_id, event_type, round(value, 2) AS value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_dml_update_where(spark, sf_dir):
    """Predicate UPDATE (lake/dml.py): ``UPDATE state SET value = value
    * 2 WHERE event_type = 'click'`` — matched rows rewritten at an
    outranking stamp through the normal MERGE, untouched rows keep their
    original versions, and the whole edit is one exactly-once commit."""
    from etl_spark.lake.dml import update_where

    table, stamp = _dml_table(spark, sf_dir, "etl_spark_dmlu_")
    update_where(table, [("event_type", "=", "click")],
                 {"value": F.col("value") * 2},
                 {"event_id": stamp}, manifest_key="dml:1")
    return table.read().select(
        "user_id", "event_id", "event_type",
        F.round("value", 2).alias("value"),
    )


SQL_DML_UPDATE = """
SELECT user_id,
       CASE WHEN event_type = 'click'
            THEN (SELECT max(event_id) FROM events) + 1
            ELSE event_id END AS event_id,
       event_type,
       round(CASE WHEN event_type = 'click' THEN value * 2
                  ELSE value END, 2) AS value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_txn_boundary_gate(spark, sf_dir):
    """Transaction-boundary gating (cdc/txn.py): the events wire re-cut
    so even event_ids ride in source transactions of 5-consecutive-id
    groups (odd ids are autocommit); END markers — carrying each
    transaction's true row count — exist only for groups with
    ``group % 3 != 0``. The gate releases autocommit rows plus whole
    completed transactions; rows of markerless transactions stay
    buffered and MUST NOT appear — a consumer never observes half an
    upstream transaction."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_spark.cdc.envelope import make_envelope, parse_envelopes
    from etl_spark.cdc.txn import create_txn_gate

    ev = _t(spark, sf_dir, "events")
    is_txn = F.pmod(F.col("event_id"), F.lit(2)) == 0
    gid = F.floor(F.col("event_id") / F.lit(5)).cast("long")
    rows = ev.select(
        make_envelope(
            op=F.lit("c"),
            before=None,
            after=F.struct("user_id", "event_type", "value"),
            ts_ms=F.unix_millis(F.col("ts").cast("timestamp")),
            source=F.named_struct(
                F.lit("table"), F.lit("events"),
                F.lit("lsn"), F.col("event_id"),
            ),
            transaction=F.when(
                is_txn,
                F.named_struct(
                    F.lit("id"), F.concat(F.lit("t"), gid),
                    F.lit("total_order"), F.col("event_id"),
                ),
            ),
        ).alias("value")
    )
    markers = (
        ev.filter(is_txn)
        .groupBy(gid.alias("gid"))
        .agg(F.count("*").alias("n"))
        .filter(F.pmod(F.col("gid"), F.lit(3)) != 0)
        .select(
            F.to_json(
                F.named_struct(
                    F.lit("status"), F.lit("END"),
                    F.lit("id"), F.concat(F.lit("t"), F.col("gid")),
                    F.lit("event_count"), F.col("n"),
                )
            ).alias("value")
        )
    )
    gate = create_txn_gate(spark, os.path.join(_tmpdir("etl_spark_txn_"),
                                               "gate"), n_buckets=8)
    released, _stats = gate.apply_wave(rows.unionAll(markers), wave=0)
    payload = StructType(
        [
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
        ]
    )
    good, _bad = parse_envelopes(released, payload)
    return good.select(
        "seq", "user_id", "event_type",
        F.round("value", 2).alias("value"),
    )


SQL_TXN_GATE = """
SELECT event_id AS seq, user_id, event_type, round(value, 2) AS value
FROM events
WHERE event_id % 2 = 1
   OR CAST(floor(event_id / 5) AS BIGINT) % 3 <> 0
"""


def q_envelope_schema_drift(spark, sf_dir):
    """Wire-schema drift (cdc/envelope.py::infer_payload_schema): odd
    event_ids carry an ``event_type`` payload key the base schema lacks;
    the consensus inference pass discovers it (string, by veto), the
    parse applies the evolved schema, and even rows surface NULL for the
    column they never sent — the ADICIONAIS late-vintage column flow at
    wire level."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from etl_spark.cdc.envelope import (
        infer_payload_schema,
        make_envelope,
        parse_envelopes,
    )

    base = StructType(
        [
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    ev = _t(spark, sf_dir, "events")
    odd = F.pmod(F.col("event_id"), F.lit(2)) == 1
    wire = ev.select(
        make_envelope(
            op=F.lit("c"),
            before=None,
            after=F.struct(
                F.col("user_id"),
                F.col("value"),
                F.when(odd, F.col("event_type")).alias("event_type"),
            ),
            ts_ms=F.unix_millis(F.col("ts").cast("timestamp")),
            source=F.named_struct(
                F.lit("table"), F.lit("events"),
                F.lit("lsn"), F.col("event_id"),
            ),
        ).alias("value")
    )
    evolved = infer_payload_schema(wire, base)
    good, _bad = parse_envelopes(wire, evolved)
    return good.select(
        "seq",
        "user_id",
        F.round("value", 2).alias("value"),
        "event_type",
    )


SQL_ENVELOPE_DRIFT = """
SELECT event_id AS seq, user_id, round(value, 2) AS value,
       CASE WHEN event_id % 2 = 1 THEN event_type END AS event_type
FROM events
"""


def q_quality_repetition(spark, sf_dir):
    """Gopher-style repetition quality gate: per-document duplicate-line
    fraction, duplicate-line character fraction, and top-bigram
    occupancy, plus the keep verdict. Two word-count-shaped
    aggregations; map-side combine absorbs the repetition itself (the
    more repetitive a document, the fewer distinct keys it shuffles)."""
    from etl_spark.operators.quality import repetition_signals

    docs = _t(spark, sf_dir, "documents")
    return repetition_signals(docs, "doc_id", "text")


SQL_QUALITY_REPETITION = f"""
WITH lines AS (
  SELECT doc_id, l AS line
  FROM (SELECT doc_id, unnest(string_split_regex(text, '\n')) AS l
        FROM documents)
  WHERE l <> ''
),
lc AS (
  SELECT doc_id, line, COUNT(*) AS c FROM lines GROUP BY doc_id, line
),
ls AS (
  SELECT doc_id,
         SUM(c) AS n_lines,
         round(1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 6)
           AS dup_line_frac,
         round(SUM(CASE WHEN c > 1 THEN length(line) * c ELSE 0 END)
               / CAST(SUM(length(line) * c) AS DOUBLE), 6)
           AS dup_line_char_frac
  FROM lc GROUP BY doc_id
),
bg AS (
  SELECT doc_id, concat(toks[i], ' ', toks[i + 1]) AS b
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents) t,
       LATERAL (SELECT unnest(range(1, len(toks))) AS i) r
),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
bs AS (
  SELECT doc_id,
         round(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_bigram_frac
  FROM bc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(ls.n_lines, 0) AS BIGINT) AS n_lines,
       COALESCE(ls.dup_line_frac, 0.0) AS dup_line_frac,
       COALESCE(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
       COALESCE(bs.top_bigram_frac, 0.0) AS top_bigram_frac,
       (COALESCE(ls.dup_line_frac, 0.0) <= 0.30
        AND COALESCE(bs.top_bigram_frac, 0.0) <= 0.20) AS keep
FROM documents d
LEFT JOIN ls ON d.doc_id = ls.doc_id
LEFT JOIN bs ON d.doc_id = bs.doc_id
"""


def q_incremental_dedup(spark, sf_dir):
    """Incremental near-dup gate (the CDC-flavored dedup): candidates of
    an incoming batch (doc_id % 5 == 0) against the already-ingested
    corpus via stored LSH bucket state — at 100 TB the batch joins its
    own per-row banded keys against a (band, bucket)-bucketed state
    table and never re-scans or re-shingles the corpus."""
    from etl_spark.operators.dedup import incremental_lsh_matches

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signature(docs, "text", num_hashes=16, shingle_k=3)
    buckets = lsh_buckets(sig, "doc_id", bands=4, rows_per_band=4)
    newb = buckets.filter(F.col("doc_id") % 5 == 0)
    corpus = buckets.filter(F.col("doc_id") % 5 != 0)
    return incremental_lsh_matches(newb, corpus, "doc_id", max_bucket=1000)


SQL_INCREMENTAL_DEDUP = f"""
WITH mh AS ({_minhash_sql(16)}),
lsh AS ({_lsh_union_sql(4, 4)}),
corpus AS (SELECT * FROM lsh WHERE doc_id % 5 <> 0),
newb AS (SELECT * FROM lsh WHERE doc_id % 5 = 0),
sized AS (
  SELECT band, bucket FROM corpus
  GROUP BY band, bucket HAVING COUNT(*) <= 1000
)
SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS dup_id
FROM newb n
JOIN corpus c ON n.band = c.band AND n.bucket = c.bucket
JOIN sized s ON n.band = s.band AND n.bucket = s.bucket
WHERE n.doc_id <> c.doc_id
"""


def q_salient_terms(spark, sf_dir):
    """Top-5 salient terms per document (tf-idf topic profile). Row
    selection is integer-deterministic (tf desc, corpus doc-frequency
    asc, term asc); the conventional smooth tf*ln(N/df) score rides
    along rounded."""
    from etl_spark.operators.quality import topk_salient_terms

    d = _t(spark, sf_dir, "documents")
    return topk_salient_terms(d, "doc_id", "text", k=5)


SQL_SALIENT_TERMS = f"""
WITH tf AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS t FROM documents)
  GROUP BY doc_id, t
),
dfq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.doc_freq,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfq.doc_freq ASC, tf.term ASC
         ) AS "rank"
  FROM tf JOIN dfq USING (term)
)
SELECT doc_id, term, "rank", tf, doc_freq,
       round(tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                     / doc_freq), 4) AS score
FROM ranked WHERE "rank" <= 5
"""


def q_chunk_documents(spark, sf_dir):
    """Sliding-window token chunking (64-token chunks, 8-token overlap):
    one output row per chunk — pure per-row expression work, zero
    shuffles, with the token array materialized once per document."""
    from etl_spark.operators.reshape import chunk_documents

    d = _t(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", size=64, overlap=8)


SQL_CHUNK_DOCUMENTS = f"""
WITH tk AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
st AS (
  SELECT doc_id, toks, CAST(s AS BIGINT) AS start
  FROM tk,
       LATERAL (SELECT unnest(range(1, greatest(len(toks) - 8, 1) + 1, 56))
                AS s) r
)
SELECT doc_id,
       (start - 1) // 56 AS chunk_id,
       CAST(least(64, len(toks) - start + 1) AS BIGINT) AS n_tokens,
       array_to_string(toks[start : least(start + 63, len(toks))], ' ')
         AS chunk_text
FROM st
"""


#: target mix for the sampler gate (lang -> share); en is cut hardest,
#: de is the binding group (smallest count/share => keeps 100%)
_MIX_SHARES = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}


def q_mix_sample(spark, sf_dir):
    """Training-mix rebalancing: deterministically downsample each
    language toward the target share distribution. Group counts are
    control-plane; membership is a pure hash-threshold filter — zero
    data-plane shuffles."""
    from etl_spark.operators.sampling import mix_sample

    d = _t(spark, sf_dir, "documents")
    return mix_sample(d, "doc_id", "lang", _MIX_SHARES, salt="mix") \
        .select("doc_id", "lang")


def _mix_share_case() -> str:
    whens = " ".join(
        f"WHEN '{g}' THEN CAST({s} AS DOUBLE)" for g, s in _MIX_SHARES.items()
    )
    return f"CASE lang {whens} END"


SQL_MIX_SAMPLE = f"""
WITH n AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
s AS (SELECT lang, n, {_mix_share_case()} AS share FROM n),
tm AS (SELECT MIN(n / share) AS t FROM s WHERE share IS NOT NULL),
r AS (
  SELECT lang,
         LEAST(1000, CAST(floor(CAST(1000.0 AS DOUBLE) * share
                                * (SELECT t FROM tm) / n) AS BIGINT)) AS pm
  FROM s WHERE share IS NOT NULL
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON d.lang = r.lang
WHERE {hash_permille_sql('d.doc_id', 'mix')} < r.pm
"""


def q_pii_scrub(spark, sf_dir):
    """PII redaction gate (training-data curation): scrub emails / IPv4s /
    long digit runs and emit per-category hit counts beside the cleaned
    text. PII is injected deterministically from doc_id first (the
    synthetic corpus carries none), so the scrubber has real work to
    verify. Pure per-row regexp work — zero shuffles, whole-stage
    codegen'd; patterns live in the Java∩RE2 regex intersection so the
    oracle replays the scrub exactly."""
    from etl_spark.functions.pii import scrub_pii

    d = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" at 10."), (F.col("doc_id") % 200).cast("string"),
                     F.lit(".0."), (F.col("doc_id") % 250).cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" card 4111222233"),
                     F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    return (
        d.select("doc_id", scrub_pii(injected).alias("p"))
        .select(
            "doc_id",
            F.col("p.n_email").alias("n_email"),
            F.col("p.n_ipv4").alias("n_ipv4"),
            F.col("p.n_longnum").alias("n_longnum"),
            F.md5(F.col("p.clean")).alias("clean_md5"),
            F.length(F.col("p.clean")).cast("bigint").alias("clean_len"),
        )
    )


def _pii_scrub_sql() -> str:
    from etl_spark.functions.pii import PII_PATTERNS

    (_, em, emt), (_, ip, ipt), (_, num, numt) = PII_PATTERNS
    return f"""
WITH inj AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         || CASE WHEN doc_id % 3 = 0
                 THEN ' at 10.' || CAST(doc_id % 200 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 250 AS VARCHAR)
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' card 4111222233'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '{em}')) AS INTEGER) AS n_email,
         regexp_replace(t, '{em}', '{emt}', 'g') AS t
  FROM inj
), s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t, '{ip}')) AS INTEGER) AS n_ipv4,
         regexp_replace(t, '{ip}', '{ipt}', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         CAST(len(regexp_extract_all(t, '{num}')) AS INTEGER) AS n_longnum,
         regexp_replace(t, '{num}', '{numt}', 'g') AS t
  FROM s2
)
SELECT doc_id, n_email, n_ipv4, n_longnum,
       md5(t) AS clean_md5, CAST(length(t) AS BIGINT) AS clean_len
FROM s3
"""


SQL_PII_SCRUB = _pii_scrub_sql()


_KMEANS_K = 8
_KMEANS_SEED = 23


def q_kmeans_clusters(spark, sf_dir):
    """Spherical k-means corpus clustering (2 Lloyd iterations, k=8,
    deterministic smallest-hash init) — the domain-discovery /
    cluster-balanced-mixing step of a training pipeline. Per iteration the
    corpus is never shuffled: broadcast centroids, combinable argmax,
    constant-size (cluster, dim) centroid update."""
    from etl_spark.operators.similarity import kmeans_spherical

    e = _t(spark, sf_dir, "embeddings")
    pts = e.select(F.col("vec_id"), F.col("embedding"))
    return kmeans_spherical(pts, k=_KMEANS_K, iters=2,
                            id_col="vec_id", vec_col="embedding",
                            seed=_KMEANS_SEED)


SQL_KMEANS = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
seeds AS (
  SELECT vec_id AS cl, list_transform(e, x -> round(x, 6)) AS cv
  FROM (SELECT vec_id, e,
               {portable_hash60_sql("CAST(vec_id AS VARCHAR)", salt=_KMEANS_SEED)} AS h
        FROM v ORDER BY h, vec_id LIMIT {_KMEANS_K})
), a1 AS (
  SELECT vec_id, cl, e FROM (
    SELECT p.vec_id, s.cl, p.e,
           row_number() OVER (PARTITION BY p.vec_id
             ORDER BY round(list_cosine_similarity(p.e, s.cv), 4) DESC, s.cl
           ) AS rn
    FROM v p CROSS JOIN seeds s) WHERE rn = 1
), c1 AS (
  SELECT cl, list(m ORDER BY d) AS cv FROM (
    SELECT cl, d, round(avg(x), 6) AS m FROM (
      SELECT cl, unnest(e) AS x, generate_subscripts(e, 1) AS d FROM a1)
    GROUP BY cl, d) GROUP BY cl
)
SELECT vec_id, cl AS cluster, s AS sim FROM (
  SELECT p.vec_id, c.cl,
         round(list_cosine_similarity(p.e, c.cv), 4) AS s,
         row_number() OVER (PARTITION BY p.vec_id
           ORDER BY round(list_cosine_similarity(p.e, c.cv), 4) DESC, c.cl
         ) AS rn
  FROM v p CROSS JOIN c1 c) WHERE rn = 1
"""


def q_order_revenue_topk(spark, sf_dir):
    """Fact⋈fact⋈dim join with per-group top-k — the one query shape the
    registry lacked: two large tables equi-joined on their key (shuffle
    join; AQE picks broadcast only when a side measures small), revenue in
    exact integer cent math (engine-portable, no float-sum drift), then
    top-3 orders per market segment. The rank<=k filter compiles to
    WindowGroupLimit: each task keeps a running top-k per group BEFORE the
    per-segment shuffle, so a segment with a billion orders never
    materializes in one sort."""
    from pyspark.sql.window import Window

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("bigint")
        * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
    )
    per_order = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment", "o_orderkey")
        .agg(F.sum(rev).alias("revenue_c4"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue_c4").desc(), F.col("o_orderkey").asc())
    return (
        per_order.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "o_orderkey", "revenue_c4",
                F.col("rnk").cast("int").alias("rnk"))
    )


SQL_ORDER_REVENUE_TOPK = """
SELECT c_mktsegment, o_orderkey, revenue_c4, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT c_mktsegment, o_orderkey, revenue_c4,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY revenue_c4 DESC, o_orderkey) AS rnk
  FROM (
    SELECT c.c_mktsegment, o.o_orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2))
WHERE rnk <= 3
"""


# ------------------------------------------------------------- registry

QUERIES = {
    # ORDER IS EVIDENCE: the driver's correctness gate runs the FIRST 50
    # entries, so the flagship CDC/consumer/dedup/ANN operators lead and
    # the long-stable scalar/cleaning gates follow. Keep ORACLES aligned.
    "cdc_replay_final_state": q_cdc_replay_final_state,
    "cdc_lww_latest_state": q_cdc_lww_latest_state,
    "cdc_point_lookup": q_cdc_point_lookup,
    "bloom_point_lookup": q_bloom_point_lookup,
    "bloom_pair_lookup": q_bloom_pair_lookup,
    "cdc_state_range_read": q_cdc_state_range_read,
    "cdc_state_zorder_read": q_cdc_state_zorder_read,
    "wap_publish": q_wap_publish,
    "snapshot_ref_read": q_snapshot_ref_read,
    "lake_metadata_audit": q_lake_metadata_audit,
    "metadata_agg_pushdown": q_metadata_agg_pushdown,
    "constraint_merge_gate": q_constraint_merge_gate,
    "cdc_time_travel": q_cdc_time_travel,
    "cdc_change_feed": q_cdc_change_feed,
    "cdc_incremental_sync": q_cdc_incremental_sync,
    "incremental_agg_sync": q_incremental_agg_sync,
    "join_view_sync": q_join_view_sync,
    "rollup_recompute_sync": q_rollup_recompute_sync,
    "rollup_cascade": q_rollup_cascade,
    "scd2_history": q_scd2_history,
    "scd2_incremental": q_scd2_incremental,
    "scd2_purge_erasure": q_scd2_purge_erasure,
    "snapshot_audit_diff": q_snapshot_audit_diff,
    "cdc_purge_erasure": q_cdc_purge_erasure,
    "cdc_dedup_ingest": q_cdc_dedup_ingest,
    "cdc_patch_upsert": q_cdc_patch_upsert,
    "cdc_envelope_ingest": q_cdc_envelope_ingest,
    "envelope_route_fanout": q_envelope_route_fanout,
    "envelope_schema_drift": q_envelope_schema_drift,
    "snapshot_reconcile": q_snapshot_reconcile,
    "cdc_bootstrap_handoff": q_cdc_bootstrap_handoff,
    "wire_gap_audit": q_wire_gap_audit,
    "consistent_read_group": q_consistent_read_group,
    "sketch_distinct_sync": q_sketch_distinct_sync,
    "type_promotion_read": q_type_promotion_read,
    "rename_evolution_read": q_rename_evolution_read,
    "spj_cobucket_join": q_spj_cobucket_join,
    "bucket_rescale_read": q_bucket_rescale_read,
    "integrity_audit": q_integrity_audit,
    "default_column_read": q_default_column_read,
    "dml_delete_where": q_dml_delete_where,
    "dml_update_where": q_dml_update_where,
    "txn_boundary_gate": q_txn_boundary_gate,
    "pending_capture_scan": q_pending_capture_scan,
    "lww_compact_parity": q_lww_compact_parity,
    # kmeans_clusters + pii_scrub promoted into the first-50 window in
    # round 5: the only two oracled queries never driver-verified in any
    # round (displacing period_lead + order_revenue_topk, driver-green
    # r1-r4)
    "kmeans_clusters": q_kmeans_clusters,
    "pii_scrub": q_pii_scrub,
    "dedup_exact": q_dedup_exact,
    "minhash_lsh_buckets": q_minhash_lsh_buckets,
    "ngram_jaccard": q_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "simhash_groups": q_simhash_groups,
    "incremental_dedup": q_incremental_dedup,
    "decontamination": q_decontamination,
    "stratified_sample": q_stratified_sample,
    "pack_budget": q_pack_budget,
    "chunk_documents": q_chunk_documents,
    "quality_repetition": q_quality_repetition,
    "salient_terms": q_salient_terms,
    "token_stats_bpe": q_token_stats_bpe,
    "ann_bruteforce": q_ann_bruteforce,
    "ann_lsh": q_ann_lsh,
    "ann_multiprobe": q_ann_multiprobe,
    "ann_ivf": q_ann_ivf,
    "embedding_neardup": q_embedding_neardup,
    "embedding_quantize": q_embedding_quantize,
    "asof_join_rules": q_asof_join_rules,
    # ---- positions 50+: outside the driver's first-50 window; still
    # verified every round by tools/check_correctness.py's full sweep.
    # range_join_period + anti_join_fill moved below in round 5 (driver-
    # green r1-r4) to make room for snapshot_ref_read + lake_metadata_audit;
    # metadata_agg_pushdown later displaced pack_budget (driver-green
    # r3-r4) past the boundary.
    "range_join_period": q_range_join_period,
    "anti_join_fill": q_anti_join_fill,
    "constraint_quarantine": q_constraint_quarantine,
    "period_lead": q_period_lead,
    "order_revenue_topk": q_order_revenue_topk,
    "train_test_split": q_train_test_split,
    "mix_sample": q_mix_sample,
    "doc_fingerprint": q_doc_fingerprint,
    "text_quality": q_text_quality,
    "dim_broadcast_enrich": q_dim_broadcast_enrich,
    "pricing_summary": q_pricing_summary,
    "depara_projection": q_depara_projection,
    "cleaning_sentinels": q_cleaning_sentinels,
    "date_roundtrip": q_date_roundtrip,
    "money_parse": q_money_parse,
    "code_array_clean": q_code_array_clean,
    "normalize_names": q_normalize_names,
    "quality_gate": q_quality_gate,
    "salted_agg": q_salted_agg,
    "melt_metrics": q_melt_metrics,
    "group_nest": q_group_nest,
    "param_fanout": q_param_fanout,
    "union_evolution": q_union_evolution,
    "token_stats": q_token_stats,
    "text_ratios": q_text_ratios,
    "value_percentiles": q_value_percentiles,
    "multimodal_metadata": q_multimodal_metadata,
    "frame_sample": q_frame_sample,
    "tumbling_window_agg": q_tumbling_window_agg,
    "session_windows": q_session_windows,
    "curation_pipeline": q_curation_pipeline,
    "csv_report_ingest": q_csv_report_ingest,
    "json_flatten_ingest": q_json_flatten_ingest,
    "competencia_parse": q_competencia_parse,
    "roman_codes": q_roman_codes,
    "month_pt": q_month_pt,
    "sentinel_blank_zeros": q_sentinel_blank_zeros,
    "content_key": q_content_key,
    "lang_id": q_lang_id,
    "value_percentiles_approx": q_value_percentiles_approx,
}

ORACLES = {
    "cdc_replay_final_state": SQL_CDC_REPLAY,
    "cdc_lww_latest_state": SQL_CDC_LWW,
    "cdc_point_lookup": SQL_POINT_LOOKUP,
    "bloom_point_lookup": SQL_BLOOM_LOOKUP,
    "bloom_pair_lookup": SQL_BLOOM_PAIR_LOOKUP,
    "cdc_state_range_read": SQL_CDC_RANGE_READ,
    "cdc_state_zorder_read": SQL_CDC_ZORDER_READ,
    "wap_publish": SQL_WAP_PUBLISH,
    "snapshot_ref_read": SQL_SNAPSHOT_REF_READ,
    "lake_metadata_audit": SQL_LAKE_METADATA_AUDIT,
    "metadata_agg_pushdown": SQL_METADATA_AGG_PUSHDOWN,
    "constraint_merge_gate": SQL_CONSTRAINT_MERGE_GATE,
    "constraint_quarantine": SQL_CONSTRAINT_QUARANTINE,
    "cdc_time_travel": SQL_CDC_TIME_TRAVEL,
    "cdc_change_feed": SQL_CDC_CHANGE_FEED,
    "cdc_incremental_sync": SQL_CDC_SYNC,
    "incremental_agg_sync": SQL_INCREMENTAL_AGG_SYNC,
    "join_view_sync": SQL_JOIN_VIEW_SYNC,
    "rollup_recompute_sync": SQL_ROLLUP_RECOMPUTE_SYNC,
    "rollup_cascade": SQL_ROLLUP_CASCADE,
    "scd2_history": SQL_SCD2_HISTORY,
    "scd2_incremental": SQL_SCD2_INCREMENTAL,
    "scd2_purge_erasure": SQL_SCD2_PURGE,
    "snapshot_audit_diff": SQL_SNAPSHOT_AUDIT_DIFF,
    "cdc_purge_erasure": SQL_CDC_PURGE,
    "cdc_dedup_ingest": SQL_CDC_DEDUP_INGEST,
    "cdc_patch_upsert": SQL_CDC_PATCH,
    "cdc_envelope_ingest": SQL_CDC_ENVELOPE,
    "envelope_route_fanout": SQL_ENVELOPE_ROUTE,
    "envelope_schema_drift": SQL_ENVELOPE_DRIFT,
    "snapshot_reconcile": SQL_SNAPSHOT_RECONCILE,
    "cdc_bootstrap_handoff": SQL_CDC_BOOTSTRAP,
    "wire_gap_audit": SQL_WIRE_GAPS,
    "type_promotion_read": SQL_TYPE_PROMOTION,
    "rename_evolution_read": SQL_RENAME_EVOLUTION,
    "spj_cobucket_join": SQL_SPJ_COBUCKET,
    "bucket_rescale_read": SQL_BUCKET_RESCALE,
    "integrity_audit": SQL_INTEGRITY_AUDIT,
    "default_column_read": SQL_DEFAULT_COLUMN,
    "dml_delete_where": SQL_DML_DELETE,
    "dml_update_where": SQL_DML_UPDATE,
    "consistent_read_group": SQL_CONSISTENT_GROUP,
    "txn_boundary_gate": SQL_TXN_GATE,
    "pending_capture_scan": SQL_PENDING_SCAN,
    "lww_compact_parity": SQL_LWW_COMPACT_PARITY,
    "period_lead": SQL_PERIOD_LEAD,
    "dedup_exact": SQL_DEDUP_EXACT,
    "minhash_lsh_buckets": SQL_MINHASH_LSH,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "simhash_groups": SQL_SIMHASH,
    "incremental_dedup": SQL_INCREMENTAL_DEDUP,
    "decontamination": SQL_DECONTAMINATION,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "train_test_split": SQL_TRAIN_TEST_SPLIT,
    "mix_sample": SQL_MIX_SAMPLE,
    "pack_budget": SQL_PACK_BUDGET,
    "chunk_documents": SQL_CHUNK_DOCUMENTS,
    "quality_repetition": SQL_QUALITY_REPETITION,
    "salient_terms": SQL_SALIENT_TERMS,
    "pii_scrub": SQL_PII_SCRUB,
    "doc_fingerprint": SQL_FINGERPRINT,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "token_stats_bpe": SQL_TOKEN_STATS_BPE,
    "kmeans_clusters": SQL_KMEANS,
    "ann_bruteforce": SQL_ANN_BRUTE,
    "ann_lsh": SQL_ANN_LSH,
    "ann_multiprobe": SQL_ANN_MULTIPROBE,
    "ann_ivf": SQL_ANN_IVF,
    "embedding_neardup": SQL_EMBED_NEARDUP,
    "embedding_quantize": SQL_EMBED_QUANT,
    "asof_join_rules": SQL_ASOF,
    "range_join_period": SQL_RANGE_JOIN,
    "anti_join_fill": SQL_ANTI_FILL,
    "dim_broadcast_enrich": SQL_DIM_ENRICH,
    "pricing_summary": SQL_PRICING,
    "depara_projection": SQL_DEPARA,
    "cleaning_sentinels": SQL_CLEANING,
    "date_roundtrip": SQL_DATES,
    "money_parse": SQL_MONEY,
    "code_array_clean": SQL_CODE_ARRAY,
    "normalize_names": SQL_NORMALIZE,
    "quality_gate": SQL_QUALITY,
    "salted_agg": SQL_SALTED,
    "melt_metrics": SQL_MELT,
    "group_nest": SQL_GROUP_NEST,
    "param_fanout": SQL_FANOUT,
    "union_evolution": SQL_UNION_EVO,
    "token_stats": SQL_TOKEN_STATS,
    "text_ratios": SQL_TEXT_RATIOS,
    "value_percentiles": SQL_VALUE_PERCENTILES,
    "multimodal_metadata": SQL_MULTIMODAL,
    "frame_sample": SQL_FRAME_SAMPLE,
    "tumbling_window_agg": SQL_TUMBLING,
    "session_windows": SQL_SESSION_WINDOWS,
    "curation_pipeline": SQL_CURATION,
    "csv_report_ingest": SQL_CSV_REPORT,
    "json_flatten_ingest": SQL_JSON_FLATTEN,
    "competencia_parse": SQL_COMPETENCIA,
    "roman_codes": SQL_ROMAN,
    "month_pt": SQL_MONTH_PT,
    "sentinel_blank_zeros": SQL_SENTINEL_BZ,
    "content_key": SQL_CONTENT_KEY,
    "order_revenue_topk": SQL_ORDER_REVENUE_TOPK,
}


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The driver's ``entry`` smoke query: full CDC replay at sf0.001."""
    return q_cdc_replay_final_state(spark, sf_dir)
