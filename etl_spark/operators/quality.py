"""Repetition-based document quality signals (Gopher-style filters).

The reference's QA gates compare raw-vs-transformed aggregates per batch
(/root/reference/src/impulsoetl/sisab/relatorio_validacao_producao/
verificacao.py:15-44); a training-data curation pipeline needs the
document-level analogue: repetition signals that flag boilerplate and
degenerate (looping) text before it enters a pretraining mix. This module
implements the standard trio used by Gopher/FineWeb-class filters:

- ``dup_line_frac``      — fraction of (non-empty) lines that are repeats
                           of another line in the same document;
- ``dup_line_char_frac`` — fraction of line characters inside duplicated
                           lines (all occurrences counted, per Gopher);
- ``top_bigram_frac``    — fraction of word-bigram occurrences taken by
                           the document's single most frequent bigram.

Scale shape: two word-count-shaped aggregations — explode to
``(doc, line)`` / ``(doc, bigram)``, combinable partial counts, then a
per-doc rollup. Both shuffles key on the doc id plus a within-doc value,
so there is no skew beyond a single document's own line/bigram count and
map-side combine absorbs the repetition itself (the more repetitive a
document, the *fewer* distinct keys it shuffles). Every arithmetic step
is engine-portable (counts, lengths, round-6 doubles), so the DuckDB
oracle verifies the signals bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.functions.text import tokens

__all__ = ["repetition_signals", "topk_salient_terms"]


def _lines(text_col: str):
    return F.filter(F.split(F.col(text_col), r"\n"), lambda x: x != F.lit(""))


def _word_bigrams(text_col: str):
    """Non-distinct word bigrams in document order (counts matter here, so
    this intentionally does NOT share word_shingles' array_distinct)."""
    ts = tokens(text_col)
    n = F.size(ts)
    shifted = F.slice(ts, 2, F.greatest(n - F.lit(1), F.lit(0)))
    z = F.zip_with(ts, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(z, lambda x: x.isNotNull())


def repetition_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
) -> DataFrame:
    """Per-document repetition signals + a ``keep`` verdict.

    Output columns: ``(id_col, n_lines, dup_line_frac,
    dup_line_char_frac, top_bigram_frac, keep)``. Documents with no
    non-empty line (or fewer than two tokens) get 0.0 for the respective
    signals, never NULL, so the keep-flag is total.
    """
    base = df.select(id_col)

    per_line = (
        df.select(id_col, F.explode(_lines(text_col)).alias("__line"))
        .groupBy(id_col, "__line")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    chars = F.length(F.col("__line")) * F.col("__c")
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("__c").alias("n_lines"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("__c").cast("double"), 6
        ).alias("dup_line_frac"),
        F.round(
            F.sum(F.when(F.col("__c") > 1, chars).otherwise(F.lit(0)))
            / F.sum(chars).cast("double"),
            6,
        ).alias("dup_line_char_frac"),
    )

    per_bigram = (
        df.select(id_col, F.explode(_word_bigrams(text_col)).alias("__bg"))
        .groupBy(id_col, "__bg")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    bigram_stats = per_bigram.groupBy(id_col).agg(
        F.round(F.max("__c") / F.sum("__c").cast("double"), 6).alias(
            "top_bigram_frac"
        )
    )

    dup_line = F.coalesce("dup_line_frac", F.lit(0.0))
    top_bg = F.coalesce("top_bigram_frac", F.lit(0.0))
    return (
        base.join(line_stats, id_col, "left")
        .join(bigram_stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            dup_line.alias("dup_line_frac"),
            F.coalesce("dup_line_char_frac", F.lit(0.0)).alias(
                "dup_line_char_frac"
            ),
            top_bg.alias("top_bigram_frac"),
            (
                (dup_line <= F.lit(max_dup_line_frac))
                & (top_bg <= F.lit(max_top_bigram_frac))
            ).alias("keep"),
        )
    )


def topk_salient_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 5,
) -> DataFrame:
    """Top-k salient terms per document — the tf-idf-style topic profile a
    curation pipeline uses for domain tagging and mix audits (the
    reference profiles batches by coded dimensions instead,
    sisab/relatorio_validacao_producao/verificacao.py:15-44; free text
    needs the term-level analogue).

    Output: ``(id_col, term, rank, tf, doc_freq, score)`` with ``rank`` 1..k.
    Ranking is INTEGER-deterministic — ``tf`` desc (salience within the
    doc), then ``doc_freq`` asc (rarer corpus-wide first), then term asc — so
    the DuckDB oracle reproduces row selection bit-for-bit; the smooth
    tf-idf ``score = tf * ln(N / doc_freq)`` (rounded) rides along as the
    conventional weight. This is tf-idf order whenever tf ties, and
    avoids float comparisons deciding WHICH rows survive.

    Scale shape: two word-count aggregations (per-(doc,term) tf and
    per-term df, both with map-side combine), one shuffle join on term
    (df side has one row per term — hot stopword terms imbalance
    partitions but never explode; AQE splits them), then the bounded
    per-doc top-k (WindowGroupLimit: partial per-partition limit before
    the final rank)."""
    from pyspark.sql import Window

    n_docs = df.count()  # control-plane scalar (one combinable count)
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("doc_freq").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col, "term", "rank", "tf", "doc_freq",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("doc_freq")),
                4,
            ).alias("score"),
        )
    )
