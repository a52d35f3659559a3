"""Text-analysis queries over the documents table, with DuckDB oracles.

Every expression is a built-in-function Column (functions/text.py) —
no Python UDFs — so these run at codegen speed and scale linearly with
executors over a 100 TB corpus (documents are embarrassingly parallel;
only the by-source aggregation shuffles, on a low-cardinality key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.functions import text as TX
from cdc_redshift_spark.sources.tables import load_table


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + character-class ratios + quality,
    plus heuristic language ID against the labeled lang column
    (round-6 registry fold: absorbs text_lang_id — same doc_id grain,
    identical function coverage, one pass instead of two)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(t).alias("n_tokens"),
        TX.bpe_token_count(t).alias("n_bpe_tokens"),
        F.round(TX.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(TX.digit_ratio(t), 6).alias("digit_ratio"),
        F.round(TX.stopword_ratio(t), 6).alias("stop_ratio"),
        TX.quality_score(t).alias("quality"),
        F.col("lang").alias("labeled_lang"),
        TX.lang_id(t).alias("pred_lang"),
    )


def _duck_lang_case() -> str:
    s = {lg: TX.duck_stop_hits("text", sw) for lg, sw in TX.STOPWORDS.items()}
    return f"""
CASE WHEN {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']}
          AND {s['en']} >= {s['es']} AND {s['en']} > 0 THEN 'en'
     WHEN {s['de']} >= {s['fr']} AND {s['de']} >= {s['es']} AND {s['de']} > 0 THEN 'de'
     WHEN {s['fr']} >= {s['es']} AND {s['fr']} > 0 THEN 'fr'
     WHEN {s['es']} > 0 THEN 'es'
     ELSE 'und' END"""


ORACLE_TEXT_STATS = f"""
SELECT doc_id,
       {TX.DUCK_TOKEN_COUNT.format(c='text')} AS n_tokens,
       {TX.DUCK_BPE_COUNT.format(c='text')} AS n_bpe_tokens,
       round({TX.DUCK_PUNCT_RATIO.format(c='text')}, 6) AS punct_ratio,
       round({TX.DUCK_DIGIT_RATIO.format(c='text')}, 6) AS digit_ratio,
       round({TX.duck_stop_ratio('text')}, 6) AS stop_ratio,
       round(0.4 * {TX.duck_stop_ratio('text')}
             + 0.3 * (1 - ({TX.DUCK_PUNCT_RATIO.format(c='text')}))
             + 0.3 * least({TX.DUCK_TOKEN_COUNT.format(c='text')} / 50.0, 1.0), 6)
         AS quality,
       lang AS labeled_lang,
       {_duck_lang_case()} AS pred_lang
FROM documents
"""


def q_text_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation view: quality distribution per source feed."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        docs.select("source", TX.quality_score(t).alias("q"), TX.token_count(t).alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
            F.round(F.min("q"), 6).alias("min_quality"),
            F.sum("nt").alias("total_tokens"),
        )
        .orderBy("source")
    )


ORACLE_QUALITY_BY_SOURCE = f"""
WITH q AS (
  SELECT source,
         round(0.4 * {TX.duck_stop_ratio('text')}
               + 0.3 * (1 - ({TX.DUCK_PUNCT_RATIO.format(c='text')}))
               + 0.3 * least({TX.DUCK_TOKEN_COUNT.format(c='text')} / 50.0, 1.0), 6) AS q,
         {TX.DUCK_TOKEN_COUNT.format(c='text')} AS nt
  FROM documents
)
SELECT source, count(*) AS n_docs,
       round(avg(q), 6) AS avg_quality,
       round(min(q), 6) AS min_quality,
       CAST(sum(nt) AS BIGINT) AS total_tokens
FROM q GROUP BY source ORDER BY source
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text, with each
    fingerprint's canonical (min) doc_id — the exact-dedup primitive."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc"))
    )


ORACLE_FINGERPRINT = r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
       count(*) AS n_docs, min(doc_id) AS canonical_doc
FROM documents GROUP BY 1
"""


WIN_K, WIN_W = 8, 4
# normalized text — the DuckDB mirror of functions/text.normalize_text
DUCK_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"


def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting via winnowing (k=8 grams,
    w=4 windows): per document, the size and value-summary of its
    winnowed fingerprint set.  Two shared fingerprints ⇔ a shared
    substring ≥ k+w-1 = 11 chars — the plagiarism/near-copy primitive
    that whole-doc md5 (`text_fingerprint`) can't express."""
    docs = load_table(spark, sf_dir, "documents")
    winnowed = TX.winnow_fingerprints_df(docs, k=WIN_K, w=WIN_W)
    fps = F.col("fps")
    return winnowed.select(
        F.col("id").alias("doc_id"),
        F.size(fps).alias("n_fps"),
        F.array_min(fps).alias("min_fp"),
        F.array_max(fps).alias("max_fp"),
        F.aggregate(fps, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "sum_fp"
        ),
    )


ORACLE_WINNOW = rf"""
WITH n AS (
  SELECT doc_id, {DUCK_NORM} AS norm FROM documents
), h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(norm) - {WIN_K - 1}, 1) + 1),
                        i -> ('0x' || substr(md5(substr(norm, i, {WIN_K})), 1, 7))::BIGINT)
           AS hs
  FROM n
), wn AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(hs) - {WIN_W - 1}, 1) + 1),
           p -> list_min(hs[p:p + {WIN_W - 1}]))) AS fps
  FROM h
)
SELECT doc_id, len(fps) AS n_fps, list_min(fps) AS min_fp,
       list_max(fps) AS max_fp, CAST(list_sum(fps) AS BIGINT) AS sum_fp
FROM wn
"""


def q_pii_redaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction gate: deterministic PII-bearing text is synthesized
    per customer (one email + one phone each), redacted with the
    codegen regex chain, and audited — counts and redacted-length sums
    are exact integers, and the DuckDB oracle applies the same regexes
    (both engines' dialects agree on these patterns)."""
    cust = load_table(spark, sf_dir, "customer")
    text = F.concat(
        F.lit("user"),
        F.col("c_custkey").cast("string"),
        F.lit("@ex"),
        (F.col("c_custkey") % 7).cast("string"),
        F.lit(".com call 415-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" re "),
        F.col("c_name"),
    )
    red = TX.redact_pii(text)
    cnt = TX.pii_counts(text, kinds=["email", "phone"])
    return (
        cust.select(
            F.col("c_custkey").alias("id"),
            F.length(text).alias("raw_len"),
            F.length(red).alias("red_len"),
            cnt.getField("email").alias("n_email"),
            cnt.getField("phone").alias("n_phone"),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("raw_len").alias("sum_raw_len"),
            F.sum("red_len").alias("sum_red_len"),
            F.sum("n_email").alias("total_email"),
            F.sum("n_phone").alias("total_phone"),
        )
    )


def _oracle_pii() -> str:
    """Derive the mirror from TX.PII_PATTERNS so the oracle and the
    Spark chain can only evolve together (one source of truth for the
    regexes; a pattern uses no syntax the two dialects disagree on)."""
    red = "text"
    for kind, pat in TX.PII_PATTERNS.items():
        lit = pat.replace("'", "''")
        red = f"regexp_replace({red}, '{lit}', '[{kind.upper()}]', 'g')"
    counts = {
        k: f"len(regexp_extract_all(text, '{TX.PII_PATTERNS[k].replace(chr(39), chr(39) * 2)}'))"
        for k in ("email", "phone")
    }
    return f"""
WITH t AS (
  SELECT c_custkey AS id,
         'user' || c_custkey || '@ex' || (c_custkey % 7)
          || '.com call 415-555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
          || ' re ' || c_name AS text
  FROM customer
), r AS (
  SELECT id, length(text) AS raw_len,
         length({red}) AS red_len,
         {counts['email']} AS n_email,
         {counts['phone']} AS n_phone
  FROM t
)
SELECT count(*) AS n_rows,
       CAST(sum(raw_len) AS BIGINT) AS sum_raw_len,
       CAST(sum(red_len) AS BIGINT) AS sum_red_len,
       CAST(sum(n_email) AS BIGINT) AS total_email,
       CAST(sum(n_phone) AS BIGINT) AS total_phone
FROM r
"""


ORACLE_PII = _oracle_pii()


def q_pii_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (operators/quality.k_anonymity_violations):
    quasi-identifier classes of (nation, market segment, account-
    balance band) shared by fewer than k=5 customers — the privacy
    gate's re-identification report (Sweeney 2002).  The band is the
    floor-1000 coarsening of c_acctbal (k-anonymity is a property OF a
    generalization, so the QI projection is explicit here).  ONE hash
    aggregation on the QI tuple, map-side combined; output bounded by
    the violator count regardless of table size."""
    from cdc_redshift_spark.operators.quality import k_anonymity_violations

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
    )
    return k_anonymity_violations(
        cust, ["nation", "segment", "bal_band"], k=5
    ).orderBy("nation", "segment", "bal_band")


ORACLE_K_ANONYMITY = """
SELECT CAST(c_nationkey AS BIGINT) AS nation,
       c_mktsegment AS segment,
       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
       count(*) AS n
FROM customer
GROUP BY 1, 2, 3
HAVING count(*) < 5
ORDER BY nation, segment, bal_band
"""


def q_pii_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (operators/quality.
    l_diversity_violations): (nation, account-balance band) classes
    where fewer than l=3 distinct market segments occur — the
    homogeneity report k-anonymity misses (Machanavajjhala 2007: a
    5-anonymous class whose members all share one segment still
    discloses it; the privacy gate runs BOTH audits).  Same explicit
    QI generalization stance as pii_k_anonymity; two map-side-combined
    hash aggregations — (QI, segment) then QI — output bounded by the
    violating classes."""
    from cdc_redshift_spark.operators.quality import l_diversity_violations

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
        F.col("c_mktsegment").alias("segment"),
    )
    return l_diversity_violations(
        cust, ["nation", "bal_band"], "segment", l=3
    ).orderBy("nation", "bal_band")


ORACLE_L_DIVERSITY = """
WITH g AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         c_mktsegment AS segment,
         count(*) AS c
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT nation, bal_band,
       CAST(sum(c) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS l_vals
FROM g
GROUP BY 1, 2
HAVING count(*) < 3
ORDER BY nation, bal_band
"""


def q_pii_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness report (operators/quality.t_closeness_report):
    per-(nation, balance-band) total-variation distance between the
    class's market-segment distribution and the whole table's — the
    skewness-attack audit completing the privacy triad with
    pii_k_anonymity and pii_l_diversity (Li et al. 2007; EMD ==
    variational distance for nominal attributes).  One (QI, segment)
    cell aggregation + two broadcast-sized re-aggregations; the
    absent-value algebra keeps the class x value grid virtual.  The
    oracle recomputes the same identity in SQL."""
    from cdc_redshift_spark.operators.quality import t_closeness_report

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
        F.col("c_mktsegment").alias("segment"),
    )
    return t_closeness_report(
        cust, ["nation", "bal_band"], "segment", t=0.3
    ).orderBy("nation", "bal_band")


ORACLE_T_CLOSENESS = """
WITH cells AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         c_mktsegment AS sv,
         CAST(count(*) AS BIGINT) AS c
  FROM customer
  GROUP BY 1, 2, 3
), class_tot AS (
  SELECT nation, bal_band, CAST(sum(c) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2
), global_tot AS (
  SELECT sv, CAST(sum(c) AS BIGINT) AS g FROM cells GROUP BY 1
), big_n AS (
  SELECT CAST(sum(c) AS BIGINT) AS tot FROM cells
), scored AS (
  SELECT cells.nation, cells.bal_band, n,
         abs(c / CAST(n AS DOUBLE) - g / CAST(tot AS DOUBLE))
           - g / CAST(tot AS DOUBLE) AS term
  FROM cells
  JOIN global_tot ON cells.sv IS NOT DISTINCT FROM global_tot.sv
  JOIN class_tot ON cells.nation IS NOT DISTINCT FROM class_tot.nation
               AND cells.bal_band IS NOT DISTINCT FROM class_tot.bal_band
  CROSS JOIN big_n
)
SELECT nation, bal_band,
       CAST(max(n) AS BIGINT) AS n,
       round(0.5 * (1.0 + sum(term)), 6) AS tvd,
       round(0.5 * (1.0 + sum(term)), 6) > 0.3 AS leaks
FROM scored
GROUP BY 1, 2
ORDER BY nation, bal_band
"""


def q_pii_t_closeness_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered t-closeness (operators/quality.
    t_closeness_ordered_report): per-nation EMD between the nation's
    ACCOUNT-BALANCE BAND distribution and the table's, under the
    ordered ground distance |i-j|/(m-1) — the paper's second
    distance, completing pii_t_closeness (Li et al. 2007: a nation
    skewed one band up is NOT the same leak as one skewed into the
    far tail, which the nominal TVD cannot see).  The sensitive
    attribute is the explicit floor-1000 banding — ordered audits
    run on banded values, the same generalization stance as the QI
    projection.  One cell aggregation, an m-row broadcast value
    table, a |classes| x m grid and one per-class prefix-sum window
    over it; the oracle recomputes the identical prefix-sum identity
    in SQL."""
    from cdc_redshift_spark.operators.quality import (
        t_closeness_ordered_report,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_band"),
    )
    return t_closeness_ordered_report(
        cust, ["nation"], "bal_band", t=0.05
    ).orderBy("nation")


ORACLE_T_CLOSENESS_ORDERED = """
WITH cells AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS sv,
         CAST(count(*) AS BIGINT) AS c
  FROM customer
  WHERE c_acctbal IS NOT NULL  -- mirror the operator's NULL-sensitive
                               -- exclusion (no order position)
  GROUP BY 1, 2
), vals AS (
  SELECT sv, CAST(sum(c) AS BIGINT) AS g,
         row_number() OVER (ORDER BY sv) AS i
  FROM cells GROUP BY sv
), classes AS (
  SELECT nation, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1
), big AS (
  SELECT CAST(sum(g) AS BIGINT) AS tot, count(*) AS m FROM vals
), cum AS (
  SELECT cl.nation, cl.n, v.i, big.m,
         sum(coalesce(ce.c, 0) / CAST(cl.n AS DOUBLE)
             - v.g / CAST(big.tot AS DOUBLE))
           OVER (PARTITION BY cl.nation ORDER BY v.i) AS pcum
  FROM classes cl
  CROSS JOIN vals v
  LEFT JOIN cells ce ON cl.nation = ce.nation AND v.sv = ce.sv
  CROSS JOIN big
)
SELECT nation,
       CAST(max(n) AS BIGINT) AS n,
       round(CASE WHEN max(m) > 1
                  THEN sum(abs(pcum)) / (max(m) - 1)
                  ELSE 0.0 END, 6) AS emd,
       round(CASE WHEN max(m) > 1
                  THEN sum(abs(pcum)) / (max(m) - 1)
                  ELSE 0.0 END, 6) > 0.05 AS leaks
FROM cum
GROUP BY 1
ORDER BY nation
"""


QUERIES = {
    "text_stats": q_text_stats,
    "text_quality_by_source": q_text_quality_by_source,
    "text_fingerprint": q_text_fingerprint,
    "text_winnow": q_text_winnow,
    "pii_redaction_report": q_pii_redaction_report,
    "pii_k_anonymity": q_pii_k_anonymity,
    "pii_l_diversity": q_pii_l_diversity,
    "pii_t_closeness": q_pii_t_closeness,
    "pii_t_closeness_ordered": q_pii_t_closeness_ordered,
}

ORACLES = {
    "text_stats": ORACLE_TEXT_STATS,
    "text_quality_by_source": ORACLE_QUALITY_BY_SOURCE,
    "text_fingerprint": ORACLE_FINGERPRINT,
    "text_winnow": ORACLE_WINNOW,
    "pii_redaction_report": ORACLE_PII,
    "pii_k_anonymity": ORACLE_K_ANONYMITY,
    "pii_l_diversity": ORACLE_L_DIVERSITY,
    "pii_t_closeness": ORACLE_T_CLOSENESS,
    "pii_t_closeness_ordered": ORACLE_T_CLOSENESS_ORDERED,
}
