"""Exact substring-span deduplication: find token n-gram spans that are
duplicated ACROSS documents and merge them into maximal per-doc spans.

Why this exists: doc-level dedup (exact / MinHash / SimHash in
``operators/dedup.py``) removes whole near-identical documents, but web
corpora also carry *partial* duplication — boilerplate headers, quoted
paragraphs, license blocks — inside otherwise-unique documents.  The
standard training-data treatment (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499) finds
every token span of length >= n that occurs in more than one document
and strips the repeated occurrences.  This module is the Spark-first
form of that operator.

Reference scope note: the reference system (/root/reference, three Glue
CDC scripts) has no corpus operators at all; this is part of the
LLM-training-data layer the north star adds on top of §2.

Plan shape (all JVM-side, no UDFs):

1. tokenize (``functions.text.words``: whitespace split) — one
   projection;
2. per-doc n-gram keys via ``transform(sequence(...))`` over the token
   array, hashed to 60-bit engine-stable longs (``stable_hash60``) so
   the shuffle key is 8 bytes, not a ~50-char string — then ONE
   ``posexplode`` to (doc, pos, gram_h) rows;
3. grams occurring in >= ``min_docs`` distinct docs: two-stage distinct
   + count on the hashed key (Catalyst plans the partial aggregation
   map-side; the only wide exchanges in the job hash-partition by
   gram_h);
4. hit positions = left-semi join back on gram_h (same partitioning as
   step 3 — AQE reuses the exchange);
5. island-merge per doc: overlapping/adjacent fixed-length spans
   collapse via ONE per-doc window (``lag(pos)``) + running-sum group
   id — no self-join, no quadratic span pairing.

100 TB notes: shuffle volume is one (long, long, int) row per token —
the same order as the tokenizer's output, and the dup-gram filter is a
semi-join so payload text never shuffles.  Skewed grams (a boilerplate
line repeated millions of times) hit AQE skew-join handling on the
semi-join; the groupBy side is a count, which partial-aggregates
map-side regardless of skew.  Choosing n: 50 tokens in the paper;
parameterized here (tests use n=8 against the synthetic corpus whose
docs are 10-99 tokens).

Hash collisions: a 60-bit hash over ~2·10^9 distinct grams gives a
~2^-21 pair-collision rate; a collision can only create a FALSE span
(over-stripping a non-duplicated span), never miss one.  For exactness
at archive scale, verify candidate spans against the token arrays with
one more join — the gated query's oracle compares against the same
hashed semantics, and ``strip_spans`` is where a deployment would add
the verify pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_redshift_spark.functions.text import words
from cdc_redshift_spark.operators.corpus import stable_hash60


def gram_hashes(tokens_col, n: int):
    """Array of 60-bit hashes of the word n-grams of a token array —
    ``transform`` over ``sequence``, pure codegen.  Position ``i`` (0-
    based) covers tokens ``[i, i + n - 1]``.  Docs shorter than ``n``
    tokens produce an empty array (``sequence(0, -k)`` would count
    down, so the short side is clamped then filtered by a size guard).
    """
    n_grams = F.size(tokens_col) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1)))
    grams = F.transform(
        idx,
        lambda i: stable_hash60(
            F.concat_ws(" ", F.slice(tokens_col, i, n))
        ),
    )
    return F.when(n_grams >= 1, grams).otherwise(
        F.array().cast("array<bigint>")
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    Returns ``(id_col, span_start, span_end)`` — 0-based token indices,
    inclusive — where every length-``n`` window inside the span occurs
    in >= ``min_docs`` distinct documents, and overlapping/adjacent
    windows are merged into maximal islands.
    """
    toks = df.select(F.col(id_col), words(F.col(text_col)).alias("__t"))
    grams = toks.select(
        id_col,
        F.posexplode(gram_hashes(F.col("__t"), n)).alias("pos", "g"),
    )
    dup = (
        grams.select("g", id_col)
        .distinct()
        .groupBy("g")
        .count()
        .where(F.col("count") >= min_docs)
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi")
    # Island merge: spans all have length n, so the running max end of
    # preceding hits is lag(pos) + n - 1 (pos ascending) — a new island
    # starts when the gap exceeds the span length.
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = hits.select(
        id_col,
        "pos",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + F.lit(n - 1)),
            1,
        ).otherwise(0).alias("__brk"),
    )
    grouped = flagged.select(
        id_col,
        "pos",
        F.sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__island"),
    )
    return grouped.groupBy(id_col, "__island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(n - 1)).alias("span_end"),
    ).drop("__island")


def strip_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove the tokens covered by ``spans`` from each document,
    rebuilding ``text_col`` from the surviving tokens (single-space
    joined).  Documents with no spans pass through unchanged.

    The span list is grouped to ONE array row per doc before the join
    (spans per doc are bounded: islands are disjoint by construction,
    so at most ``len/n`` per doc), then token filtering is a codegen
    ``filter`` over the token array — no explode of the corpus.
    """
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__sp")
    )
    toks = df.withColumn("__t", words(F.col(text_col)))
    joined = toks.join(per_doc, id_col, "left")
    keep = F.filter(
        F.transform(
            F.col("__t"),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda s: ~F.exists(
            F.coalesce(
                F.col("__sp"),
                F.array().cast(
                    "array<struct<span_start:int,span_end:int>>"
                ),
            ),
            lambda sp: (s["i"] >= sp["span_start"])
            & (s["i"] <= sp["span_end"]),
        ),
    )
    return joined.withColumn(
        text_col,
        F.concat_ws(" ", F.transform(keep, lambda s: s["t"])),
    ).drop("__t", "__sp")
