"""Corpus-pipeline queries (decontamination, repetition rules,
stratified sampling) with full DuckDB value oracles.

The gram hashing mirrors bit-for-bit (60-bit md5 prefix, the
`token_hashes` construction); every ratio is int/int division rounded
to 6 dp, which IEEE doubles evaluate identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.corpus import (
    bm25_topk,
    corpus_split,
    chunk_documents,
    decontaminate,
    pack_token_stream,
    repetition_stats,
    source_cap,
    stratified_sample,
    weighted_sample,
)
from cdc_redshift_spark.sources.tables import load_table
from cdc_redshift_spark.functions import text as TXQ

# ---- DuckDB fragments mirroring operators/corpus.py ----------------------

DUCK_NORM = r"trim(regexp_replace(lower({c}), '\s+', ' ', 'g'))"
DUCK_HASH60 = "('0x' || substr(md5({c}), 1, 15))::BIGINT"


def duck_word_grams(tokens: str, n: int) -> str:
    """Non-distinct word n-grams over a token list — mirrors
    operators/corpus.py `word_ngrams(distinct=False)` including the
    shorter-than-n clamp."""
    return (
        f"list_transform(range(1, greatest(len({tokens}) - {n - 1}, 1) + 1),"
        f" i -> array_to_string(list_slice({tokens}, i, i + {n - 1}), ' '))"
    )


# ---- decontamination ------------------------------------------------------

# Production decontamination uses 8-13-word grams; the synthetic
# fixture corpus has almost no natural 8-gram overlap (1 doc at
# sf0.01), so the GATED config uses 4-grams against a 10% benchmark
# slice — 75 contaminated docs at sf0.01, a real correctness signal
# over the same plan shape.
DECON_N, DECON_MAX_GRAM_DF, DECON_EVAL_MOD = 4, 10, 10


def q_corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the corpus is split deterministically
    into train (doc_id % 10 != 0) and a "benchmark" slice
    (doc_id % 10 == 0), then every train doc sharing a word n-gram
    with the benchmark is reported with its overlap counts.  Grams
    seen in more than DECON_MAX_GRAM_DF eval docs are boilerplate and
    ignored."""
    docs = load_table(spark, sf_dir, "documents")
    ev = F.col("doc_id") % DECON_EVAL_MOD == 0
    return decontaminate(
        docs.where(~ev),
        docs.where(ev),
        n=DECON_N,
        max_gram_df=DECON_MAX_GRAM_DF,
    )


ORACLE_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, string_split({DUCK_NORM.format(c='text')}, ' ') AS w
  FROM documents
), gh AS (
  SELECT doc_id,
         list_distinct(list_transform({duck_word_grams('w', DECON_N)},
                                      g -> {DUCK_HASH60.format(c='g')})) AS hs
  FROM toks
), tg AS (
  SELECT doc_id AS tid, unnest(hs) AS g FROM gh WHERE doc_id % {DECON_EVAL_MOD} <> 0
), eg AS (
  SELECT doc_id AS eid, unnest(hs) AS g FROM gh WHERE doc_id % {DECON_EVAL_MOD} = 0
), keep AS (
  SELECT g FROM eg GROUP BY g HAVING count(DISTINCT eid) <= {DECON_MAX_GRAM_DF}
)
SELECT tid AS doc_id,
       count(DISTINCT tg.g) AS contaminated_grams,
       count(DISTINCT eid) AS eval_docs_hit
FROM tg JOIN keep USING (g) JOIN eg USING (g)
GROUP BY tid
"""


# ---- repetition stats ------------------------------------------------------


def q_corpus_doc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation metrics (round-6 registry fold of
    corpus_repetition_stats + corpus_novelty, identical function
    coverage, shared doc_id grain): repetition (type-token ratio,
    duplicate-line fraction, top unigram/bigram mass) joined with
    within-corpus novelty (fraction of the doc's distinct word 4-grams
    not seen in any lower-doc_id document).  Plans compose unchanged:
    the repetition side is one Arrow-free per-doc pass, the novelty
    side one gram shuffle + one doc shuffle, joined on doc_id."""
    from cdc_redshift_spark.operators.corpus import word_ngram_hash_rows

    docs = load_table(spark, sf_dir, "documents")
    gh = word_ngram_hash_rows(docs, NOV_N, out_id="doc_id")
    first = gh.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novelty = (
        gh.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
        .withColumn("novelty", F.round(F.col("n_novel") / F.col("n_grams"), 6))
    )
    return repetition_stats(docs).join(novelty, "doc_id").orderBy("doc_id")


ORACLE_DOC_METRICS = f"""
WITH norm AS (
  SELECT doc_id, text, {DUCK_NORM.format(c='text')} AS t FROM documents
), toks AS (
  SELECT doc_id, text, string_split(t, ' ') AS w FROM norm
), base AS (
  SELECT doc_id,
         len(w) AS tokens,
         round(len(list_distinct(w))::DOUBLE / len(w), 6) AS ttr,
         round((len(string_split(text, chr(10)))
                - len(list_distinct(string_split(text, chr(10)))))::DOUBLE
               / len(string_split(text, chr(10))), 6) AS dup_line_frac
  FROM toks
), u AS (
  SELECT doc_id, unnest(w) AS g FROM toks
), uc AS (
  SELECT doc_id, g, count(*) AS c FROM u GROUP BY doc_id, g
), uf AS (
  SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS top_unigram_frac
  FROM uc GROUP BY doc_id
), b AS (
  SELECT doc_id, unnest({duck_word_grams('w', 2)}) AS g FROM toks
), bc AS (
  SELECT doc_id, g, count(*) AS c FROM b GROUP BY doc_id, g
), bf AS (
  SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac
  FROM bc GROUP BY doc_id
), gh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform({{dwg}},
                               g -> {DUCK_HASH60.format(c='g')})) AS g
  FROM toks
), firstg AS (
  SELECT g, min(doc_id) AS first_doc FROM gh GROUP BY g
), nov AS (
  SELECT doc_id, count(*) AS n_grams,
         CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel,
         round(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 6) AS novelty
  FROM gh JOIN firstg USING (g)
  GROUP BY doc_id
)
SELECT base.doc_id, tokens, ttr, dup_line_frac, top_unigram_frac,
       top_bigram_frac, n_grams, n_novel, novelty
FROM base JOIN uf USING (doc_id) JOIN bf USING (doc_id)
          JOIN nov USING (doc_id)
ORDER BY doc_id
"""


# ---- stratified sampling ---------------------------------------------------

# Training-mix rates (parts per million) by source; everything else
# falls back to DEFAULT_PPM.  Integer thresholds — nothing to straddle.
SAMPLE_RATES_PPM = {"src0": 800_000, "src1": 500_000, "src2": 250_000}
DEFAULT_PPM = 100_000


def q_corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, SAMPLE_RATES_PPM, strata_col="source", default_ppm=DEFAULT_PPM
    )


def _oracle_sample() -> str:
    cases = " ".join(
        f"WHEN source = '{k}' THEN {v}"
        for k, v in sorted(SAMPLE_RATES_PPM.items())
    )
    bucket = DUCK_HASH60.format(c="CAST(doc_id AS VARCHAR)")
    return f"""
SELECT doc_id, text, lang, source, n_chars
FROM documents
WHERE {bucket} % 1000000 < (CASE {cases} ELSE {DEFAULT_PPM} END)
"""


NOV_N = 4  # novelty gram width

# the novelty gram expression needs NOV_N, defined here — substitute
# the one placeholder the f-string above left literal
ORACLE_DOC_METRICS = ORACLE_DOC_METRICS.format(
    dwg=duck_word_grams("w", NOV_N)
)


QMIN = 0.55  # quality cutoff for the composed pipeline


def _clean_stage(docs: DataFrame) -> DataFrame:
    """Shared stage chain: exact dedup (keep canonical doc per
    fingerprint) → quality filter (score ≥ QMIN) → benchmark
    decontamination (drop any survivor sharing a 4-gram with the
    doc_id % DECON_EVAL_MOD eval slice).  Returns survivors with
    their 6-dp quality score ``q``."""
    from cdc_redshift_spark.functions import text as TX
    from cdc_redshift_spark.operators.dedup import exact_dedup

    evm = F.col("doc_id") % DECON_EVAL_MOD == 0
    train, ev = docs.where(~evm), docs.where(evm)
    canon = (
        exact_dedup(train)
        .where("is_duplicate = 0")
        .select(F.col("id").alias("doc_id"))
    )
    surv = train.join(canon, "doc_id", "left_semi")
    scored = surv.withColumn("q", TX.quality_score(F.col("text"))).where(
        F.col("q") >= QMIN
    )
    cont = decontaminate(
        scored, ev, n=DECON_N, max_gram_df=DECON_MAX_GRAM_DF
    ).select("doc_id")
    return scored.join(cont, "doc_id", "left_anti")


def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition — a full training-corpus cleaning
    pipeline in one query: exact dedup (keep canonical doc per
    fingerprint) → quality filter (score ≥ 0.55) → benchmark
    decontamination (drop any survivor sharing a 4-gram with the eval
    slice) → per-source manifest.  Every stage is the already-gated
    operator; the oracle recomposes the same chain in SQL, so the
    check covers the stages AND their composition order."""
    from cdc_redshift_spark.functions import text as TX

    docs = load_table(spark, sf_dir, "documents")
    clean = _clean_stage(docs)
    # avg over EXACT integer micro-units: q is 6-dp-rounded per doc, so
    # round(q*1e6) is an integer both engines compute identically; the
    # integer sum is order-independent, unlike a float avg whose
    # partition-order summation could flip the 6-dp rounding
    q_micro = F.round(F.col("q") * 1e6, 0).cast("long")
    return (
        clean.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(TX.token_count(F.col("text"))).alias("total_tokens"),
            F.round(F.sum(q_micro) / F.count(F.lit(1)) / 1e6, 6).alias(
                "avg_quality"
            ),
        )
        .orderBy("source")
    )


_DUCK_QUALITY = (
    f"round(0.4 * {{stop}} + 0.3 * (1 - ({{punct}}))"
    f" + 0.3 * least({{tok}} / 50.0, 1.0), 6)"
)


def _clean_ctes() -> str:
    """The clean-chain CTE block (train .. clean) shared by the
    clean-pipeline oracle and the pretrain-manifest oracle — one
    definition, so the two mirrors cannot drift."""
    from cdc_redshift_spark.functions import text as TX

    quality = _DUCK_QUALITY.format(
        stop=TX.duck_stop_ratio("text"),
        punct=TX.DUCK_PUNCT_RATIO.format(c="text"),
        tok=TX.DUCK_TOKEN_COUNT.format(c="text"),
    )
    norm = DUCK_NORM.format(c="text")
    return f"""train AS (
  SELECT * FROM documents WHERE doc_id % {DECON_EVAL_MOD} <> 0
), fp AS (
  SELECT doc_id, md5({norm}) AS f FROM train
), canon AS (
  SELECT f, min(doc_id) AS cid FROM fp GROUP BY f
), surv AS (
  SELECT t.* FROM train t
  WHERE t.doc_id IN (SELECT cid FROM canon)
), scored AS (
  SELECT *, {quality} AS q FROM surv WHERE {quality} >= {QMIN}
), toks AS (
  SELECT doc_id, string_split({norm}, ' ') AS w FROM documents
), gh AS (
  SELECT doc_id,
         list_distinct(list_transform({duck_word_grams('w', DECON_N)},
                                      g -> {DUCK_HASH60.format(c='g')})) AS hs
  FROM toks
), tg AS (
  SELECT gh.doc_id AS tid, unnest(hs) AS g
  FROM gh JOIN scored s ON gh.doc_id = s.doc_id
), eg AS (
  SELECT doc_id AS eid, unnest(hs) AS g FROM gh
  WHERE doc_id % {DECON_EVAL_MOD} = 0
), keep AS (
  SELECT g FROM eg GROUP BY g HAVING count(DISTINCT eid) <= {DECON_MAX_GRAM_DF}
), cont AS (
  SELECT DISTINCT tid FROM tg JOIN keep USING (g)
), clean AS (
  SELECT * FROM scored WHERE doc_id NOT IN (SELECT tid FROM cont)
)"""


def _oracle_clean_pipeline() -> str:
    from cdc_redshift_spark.functions import text as TX

    return f"""
WITH {_clean_ctes()}
SELECT source, count(*) AS n_docs,
       CAST(sum({TX.DUCK_TOKEN_COUNT.format(c='text')}) AS BIGINT)
         AS total_tokens,
       round(sum(CAST(round(q * 1e6, 0) AS BIGINT)) / count(*) / 1e6, 6)
         AS avg_quality
FROM clean GROUP BY source ORDER BY source
"""


def q_corpus_pretrain_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END pretrain data pipeline in one gated query:
    exact dedup -> quality filter -> benchmark decontamination (the
    certified clean chain, `_clean_stage`) -> SemDeDup semantic dedup
    (corpus-level embedding duplicates; documents and embeddings
    share the id space) -> deterministic hash-stable train/val/test
    split -> per-(split, source) token manifest.  Every stage is an
    individually gated operator; this row certifies their COMPOSITION
    — stage order and interfaces — which is what a user actually runs
    over 100 TB.  The oracle chains the same five mirrors."""
    from cdc_redshift_spark.functions.text import token_count
    from cdc_redshift_spark.operators.similarity import semantic_dedup
    from cdc_redshift_spark.queries.similarity import SEM_CELLS, SEM_TAU

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    clean = _clean_stage(docs)
    kept = (
        semantic_dedup(emb, n_cells=SEM_CELLS, tau=SEM_TAU, refine_iters=1)
        .where("kept")
        .select(F.col("vec_id").alias("doc_id"))
    )
    final = clean.join(kept, "doc_id", "left_semi")
    split = corpus_split(final, {"train": 0.9, "val": 0.05, "test": 0.05})
    return (
        split.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text"))).alias("total_tokens"),
        )
        .orderBy("split", "source")
    )


def _oracle_pretrain_manifest() -> str:
    from cdc_redshift_spark.functions import text as TX
    from cdc_redshift_spark.queries.similarity import (
        DUCK_COSINE,
        DUCK_V,
        SEM_CELLS,
        SEM_TAU,
        _ivf_ctes,
    )

    return f"""
WITH {_clean_ctes()},
v AS ({DUCK_V}),
{_ivf_ctes(SEM_CELLS, 1, "sd", refined=True)},
homesd AS (SELECT id, cell FROM assignedsd WHERE cell_rank = 1),
pairsd AS (
  SELECT a.id AS id_a, b.id AS id_b
  FROM homesd a JOIN homesd b ON a.cell = b.cell AND a.id < b.id
  JOIN v va ON va.id = a.id
  JOIN v vb ON vb.id = b.id
  WHERE {DUCK_COSINE} >= {SEM_TAU}
),
keptsd AS (
  SELECT h.id FROM homesd h
  LEFT JOIN (SELECT DISTINCT id_b FROM pairsd) d ON h.id = d.id_b
  WHERE d.id_b IS NULL
),
final AS (
  SELECT c.* FROM clean c JOIN keptsd k ON c.doc_id = k.id
),
assigned_split AS (
  SELECT *, CASE WHEN b < 900000 THEN 'train'
                 WHEN b < 950000 THEN 'val'
                 ELSE 'test' END AS split
  FROM (
    SELECT *,
           ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             % 1000000 AS b
    FROM final
  )
)
SELECT split, source, count(*) AS n_docs,
       CAST(sum({TX.DUCK_TOKEN_COUNT.format(c='text')}) AS BIGINT)
         AS total_tokens
FROM assigned_split GROUP BY split, source ORDER BY split, source
"""


SHARD_TOKEN_BUDGET = 2_000


def q_corpus_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous token-budget sharding: documents are laid out in
    deterministic (source, doc_id) order and cut into training shards
    of ~SHARD_TOKEN_BUDGET whitespace tokens by the running total —
    shard id = exclusive-prefix-sum div budget, the distributable
    formulation of sequential shard packing (one window shuffle per
    source; a doc whose tokens straddle a boundary belongs to the
    shard its FIRST token falls in).  Returns per-shard manifests."""
    from cdc_redshift_spark.functions.text import token_count
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = docs.select(
        "source",
        "doc_id",
        token_count(F.col("text")).alias("nt"),
    ).withColumn("prior", F.coalesce(F.sum("nt").over(w), F.lit(0)))
    sharded = toks.withColumn(
        "shard", F.expr(f"prior div {SHARD_TOKEN_BUDGET}").cast("int")
    )
    return (
        sharded.groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "shard")
    )


ORACLE_TOKEN_SHARDS = f"""
WITH t AS (
  SELECT source, doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS nt
  FROM documents
), p AS (
  SELECT source, doc_id, nt,
         COALESCE(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), 0) AS prior
  FROM t
)
SELECT source, CAST(prior // {SHARD_TOKEN_BUDGET} AS INTEGER) AS shard,
       count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS shard_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM p GROUP BY 1, 2 ORDER BY source, shard
"""


SOURCE_CAP = 400


def q_corpus_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (operators/corpus.py source_cap) — the
    domain-cap primitive bounding any one source's share of the
    training mix.  Deterministic hash-priority selection; the report
    proves WHICH rows were kept (id-sum fingerprint), not just how
    many.  Run through the salted two-phase form so the skew path is
    the one the oracle certifies (exactness vs the plain window is
    also pytest-pinned)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = source_cap(docs, cap=SOURCE_CAP, salt=8)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("id_sum"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("source")
    )


ORACLE_SOURCE_CAP = f"""
WITH r AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {DUCK_HASH60.format(c="CAST(doc_id AS VARCHAR)")} ASC,
                    doc_id ASC) AS rn
  FROM documents
)
SELECT source, count(*) AS n_kept,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       min(doc_id) AS min_id, max(doc_id) AS max_id
FROM r WHERE rn <= {SOURCE_CAP}
GROUP BY source ORDER BY source
"""


# ---- chunking / packing / weighted sampling -------------------------------

CHUNK_MAX, CHUNK_OVERLAP = 24, 4
CHUNK_STRIDE = CHUNK_MAX - CHUNK_OVERLAP


def q_corpus_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget chunking with overlap (operators/corpus.py
    `chunk_documents`) — context-window prep; pure scan-side flatMap."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=CHUNK_MAX, overlap=CHUNK_OVERLAP)


ORACLE_CHUNK = f"""
WITH t AS (
  SELECT doc_id, string_split({DUCK_NORM.format(c='text')}, ' ') AS w
  FROM documents
), c AS (
  SELECT doc_id, w,
         CASE WHEN len(w) <= {CHUNK_MAX} THEN 1
              ELSE (len(w) - {CHUNK_MAX} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1
         END AS nch
  FROM t
), e AS (
  SELECT doc_id,
         unnest(list_transform(range(nch), i -> struct_pack(
           chunk_id := i,
           chunk_text := array_to_string(
             list_slice(w, i*{CHUNK_STRIDE} + 1, i*{CHUNK_STRIDE} + {CHUNK_MAX}), ' '),
           n_tokens := CAST(len(
             list_slice(w, i*{CHUNK_STRIDE} + 1, i*{CHUNK_STRIDE} + {CHUNK_MAX})) AS BIGINT)
         ))) AS u
  FROM c
)
SELECT doc_id, u.chunk_id AS chunk_id, u.chunk_text AS chunk_text,
       u.n_tokens AS n_tokens
FROM e
"""

PACK_BUDGET, PACK_SHARDS = 512, 8


def q_corpus_pack_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chop sequence-packing manifest
    (operators/corpus.py `pack_token_stream`): every doc's position in
    fixed-budget training sequences; per-shard windows bound the
    ordered-window parallelism."""
    docs = load_table(spark, sf_dir, "documents")
    return pack_token_stream(docs, budget=PACK_BUDGET, n_shards=PACK_SHARDS)


ORACLE_PACK = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split({DUCK_NORM.format(c='text')}, ' ')) AS BIGINT) AS n_tokens,
         -- pmod mirror: ((x % n) + n) % n keeps negative ids in [0, n)
         CAST(((doc_id % {PACK_SHARDS}) + {PACK_SHARDS}) % {PACK_SHARDS} AS INT) AS shard
  FROM documents
), c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, shard, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_first,
       CAST((cum - 1) // {PACK_BUDGET} AS BIGINT) AS seq_last
FROM c
"""

WSAMPLE_K = 100


def q_corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted Efraimidis-Spirakis sample of WSAMPLE_K=100 docs
    (operators/corpus.py `weighted_sample`): priority u^(1/n_tokens)
    on the engine-stable 60-bit hash — deterministic weighted
    sampling with no RNG state; plan is scan + TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, k=WSAMPLE_K)


ORACLE_WSAMPLE = f"""
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split({DUCK_NORM.format(c='text')}, ' ')) AS BIGINT) AS n_tokens,
         ({DUCK_HASH60.format(c="CAST(doc_id AS VARCHAR) || ':' || text")} + 1)
           / 1152921504606846976.0 AS u
  FROM documents
)
SELECT doc_id, n_tokens
FROM d
ORDER BY pow(u, 1.0 / n_tokens) DESC, doc_id
LIMIT {WSAMPLE_K}
"""


# ---------------------------------------------------------------------------
# BM25 keyword retrieval
# ---------------------------------------------------------------------------

BM25_TERMS = ["merge", "spark", "stream", "window"]
BM25_K = 25


def q_docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k keyword retrieval over the corpus
    (operators/corpus.bm25_topk) — the sparse-retrieval baseline next
    to the dense ANN path, with corpus stats as one broadcast scalar,
    the tf explode filtered to query terms BEFORE its shuffle, and the
    top-k as TakeOrderedAndProject.  Scores rounded to 6 dp in both
    engines (the established float-hash discipline)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=BM25_K)


#: the one DuckDB mirror of functions.text.regex_words — every oracle
#: tokenizing like BM25 must use THIS, not a re-typed copy
_RW = TXQ.DUCK_REGEX_WORDS.format(c="text")

ORACLE_BM25 = f"""
WITH toks AS (
  SELECT doc_id,
         len({_RW}) AS dl,
         list_filter({_RW},
                     t -> t IN ('merge', 'spark', 'stream', 'window')) AS qt
  FROM documents
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM toks
), tf AS (
  SELECT doc_id, dl, t AS term, count(*) AS tf
  FROM toks, unnest(qt) AS u(t)
  GROUP BY 1, 2, 3
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
)
SELECT doc_id,
       round(sum( ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                  * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) ),
             6) AS score
FROM tf JOIN dft USING (term), stats
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {BM25_K}
"""


PHRASE = ["part", "filter"]


def q_docs_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search as ONE codegen scan — no shuffle, no UDF,
    no explode: every token position is tested with O(1) array
    ``element_at`` (NOT slice-in-transform, the O(n·L) vs O(n²) trap
    in SCALE.md), so the whole predicate runs inside WholeStageCodegen
    and a 100 TB scan is embarrassingly parallel with zero data
    movement.  Returns (doc_id, n_hits) for documents containing the
    phrase; the oracle replays positions with DuckDB list lambdas over
    the same tokenization."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TXQ.regex_words(F.col("text"))
    L = len(PHRASE)

    def match(j):
        cond = F.element_at(toks, j) == F.lit(PHRASE[0])
        for i, w in enumerate(PHRASE[1:], start=1):
            cond = cond & (F.element_at(toks, j + i) == F.lit(w))
        return cond

    n_hits = (
        F.when(
            F.size(toks) >= L,
            F.size(
                F.filter(
                    F.sequence(F.lit(1), F.size(toks) - L + 1), match
                )
            ),
        )
        .otherwise(F.lit(0))
        .alias("n_hits")
    )
    # no orderBy: the gate compare is order-insensitive, and the
    # point of the plan is filter+project with ZERO Exchange
    return docs.select("doc_id", n_hits).where(F.col("n_hits") > 0)


ORACLE_PHRASE_SEARCH = f"""
WITH t AS (
  SELECT doc_id,
         {_RW} AS w
  FROM documents
), h AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2 THEN
           CAST(len(list_filter(range(1, len(w)),
                    j -> w[j] = 'part' AND w[j+1] = 'filter'))
                AS INTEGER)
         ELSE 0 END AS n_hits
  FROM t
)
SELECT doc_id, n_hits FROM h WHERE n_hits > 0
"""


RRF_C, RRF_POOL, RRF_TOPK = 60, 50, 20


def q_docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion (Cormack et al.,
    SIGIR 2009): the BM25 sparse top-50 and the dense cosine top-50
    (query = the min-vec_id embedding; documents and embeddings share
    the id space) fuse by ``sum 1/(60 + rank)`` — the standard
    score-free way to combine retrievers with incomparable scales.
    Both rank lists are tiny (pool-sized windows, not corpus-sized);
    the fusion is one full-outer join over <= 100 rows.  The oracle
    mirrors both retrievers AND the fusion arithmetic."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    from cdc_redshift_spark.operators.similarity import cosine_topk_query

    qvec = [
        float(x)
        for x in emb.orderBy("vec_id").select("embedding").first()[0]
    ]
    sparse = bm25_topk(docs, BM25_TERMS, k=RRF_POOL).select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("r_s"),
    )
    dense = cosine_topk_query(emb, qvec, k=RRF_POOL).select(
        F.col("vec_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cosine"), F.asc("vec_id")))
        .alias("r_d"),
    )
    fused = sparse.join(dense, "id", "full_outer").select(
        F.col("id").alias("doc_id"),
        F.col("r_s").alias("r_sparse"),
        F.col("r_d").alias("r_dense"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_C) + F.col("r_s")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_C) + F.col("r_d")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK)


ORACLE_HYBRID_RRF = f"""
WITH toks AS (
  SELECT doc_id,
         len({_RW}) AS dl,
         list_filter({_RW},
                     t -> t IN ('merge', 'spark', 'stream', 'window')) AS qt
  FROM documents
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM toks
), tf AS (
  SELECT doc_id, dl, t AS term, count(*) AS tf
  FROM toks, unnest(qt) AS u(t)
  GROUP BY 1, 2, 3
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), bm AS (
  SELECT doc_id,
         round(sum( ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                    * (tf * 2.2)
                    / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) ),
               6) AS score
  FROM tf JOIN dft USING (term), stats
  GROUP BY doc_id
  ORDER BY score DESC, doc_id
  LIMIT {RRF_POOL}
), sparse AS (
  SELECT doc_id AS id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
              AS INTEGER) AS r_s
  FROM bm
), q AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS qe
  FROM embeddings ORDER BY vec_id LIMIT 1
), v AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings
), cos AS (
  SELECT vec_id,
         round(list_sum(list_transform(range(1, len(e) + 1),
                                       i -> e[i] * qe[i]))
               / (sqrt(list_sum(list_transform(e, x -> x*x)))
                  * sqrt(list_sum(list_transform(qe, x -> x*x)))), 6)
           AS cosine
  FROM v, q
  ORDER BY cosine DESC, vec_id ASC
  LIMIT {RRF_POOL}
), dense AS (
  SELECT vec_id AS id,
         CAST(row_number() OVER (ORDER BY cosine DESC, vec_id)
              AS INTEGER) AS r_d
  FROM cos
), f AS (
  SELECT coalesce(s.id, d.id) AS doc_id, r_s, r_d
  FROM sparse s FULL JOIN dense d ON s.id = d.id
)
SELECT doc_id, r_s AS r_sparse, r_d AS r_dense,
       round(coalesce(1.0 / ({RRF_C} + r_s), 0)
             + coalesce(1.0 / ({RRF_C} + r_d), 0), 6) AS rrf
FROM f ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}
"""


def q_corpus_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split manifest
    (operators/corpus.corpus_split): hash-stable 90/5/5 assignment
    (a document keeps its split forever as the corpus grows — no RNG,
    no row numbers), aggregated to per-(split, lang) doc counts and
    char volumes.  Zero shuffles before the manifest aggregate; the
    oracle mirrors the 60-bit-md5 bucket math bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    out = corpus_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return (
        out.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "lang")
    )


ORACLE_CORPUS_SPLIT = """
WITH assigned AS (
  SELECT lang, n_chars,
         ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 1000000 AS b
  FROM documents
)
SELECT CASE WHEN b < 900000 THEN 'train'
            WHEN b < 950000 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM assigned
GROUP BY 1, 2
ORDER BY split, lang
"""


def q_corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-AWARE split (operators/corpus.corpus_split_leakage_safe):
    exact-duplicate documents (same normalized fingerprint) must land
    in the SAME train/val/test split — the per-doc hash split would
    let a duplicate of an eval doc leak into train.  Pairs come from
    the fingerprint generator (rep -> member star edges), connected
    components elect the min-id representative, and the split hash is
    taken on the representative.  The no-leakage invariant is ALSO
    asserted in-query (any fingerprint spanning two splits raises);
    the oracle mirrors rep election (one window) + the 60-bit bucket
    math bit-for-bit."""
    from cdc_redshift_spark.functions.text import fingerprint
    from cdc_redshift_spark.operators.corpus import (
        corpus_split_leakage_safe,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from pyspark.sql import Window

    fps = docs.select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    ).withColumn(
        "rep", F.min("doc_id").over(Window.partitionBy("fp"))
    )
    pairs = fps.where(F.col("doc_id") != F.col("rep")).select(
        F.col("rep").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    out = corpus_split_leakage_safe(
        fps.select("doc_id", "fp"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        pairs,
    )
    leaks = (
        out.groupBy("fp")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .limit(1)
        .count()
    )
    if leaks:
        raise RuntimeError("duplicate cluster spans two splits — leakage")
    return out.select("doc_id", "split").orderBy("doc_id")


ORACLE_SPLIT_LEAKAGE = f"""
WITH fp AS (
  SELECT doc_id, md5({DUCK_NORM.format(c='text')}) AS fp FROM documents
), rep AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS rep FROM fp
), b AS (
  SELECT doc_id,
         ('0x' || substr(md5('split:' || CAST(rep AS VARCHAR)), 1, 15))::BIGINT
           % 1000000 AS b
  FROM rep
)
SELECT doc_id,
       CASE WHEN b < 800000 THEN 'train'
            WHEN b < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id
"""


def q_corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-BUDGETED curation (operators/corpus.corpus_budget_select):
    keep the maximal quality-desc prefix of the corpus fitting a
    budget of 1/4 of total tokens — the fixed-compute data-mix
    selection.  The operator runs the two-phase histogram plan (no
    global-order window: only the boundary quality value is
    cumsummed); the oracle runs the NAIVE global running-sum mirror,
    so a green row proves the scale plan computes exactly the greedy
    prefix."""
    from cdc_redshift_spark.functions import text as TX
    from cdc_redshift_spark.operators.corpus import corpus_budget_select

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = docs.select(
        "doc_id",
        TX.quality_score(F.col("text")).alias("quality"),
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    total = scored.agg(F.sum("n_tokens")).collect()[0][0]
    budget = int(total) // 4
    out = corpus_budget_select(scored, budget)
    return out.select("doc_id", "quality", "n_tokens").orderBy("doc_id")


ORACLE_BUDGET_SELECT = f"""
WITH scored AS (
  SELECT doc_id,
         round(0.4 * {TXQ.duck_stop_ratio('text')}
               + 0.3 * (1 - ({TXQ.DUCK_PUNCT_RATIO.format(c='text')}))
               + 0.3 * least({TXQ.DUCK_TOKEN_COUNT.format(c='text')} / 50.0, 1.0), 6)
           AS quality,
         CAST({TXQ.DUCK_TOKEN_COUNT.format(c='text')} AS BIGINT) AS n_tokens
  FROM documents
), tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) // 4 AS b FROM scored
), ordered AS (
  SELECT *,
         sum(n_tokens) OVER (
           ORDER BY quality DESC,
             ('0x' || substr(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
             doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM scored
)
SELECT doc_id, quality, n_tokens
FROM ordered WHERE cum <= (SELECT b FROM tot)
ORDER BY doc_id
"""


DSIR_BUCKETS = 4096
DSIR_ALPHA = 1.0


def q_corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (operators/corpus.dsir_logweights,
    Xie et al. 2023): target distribution = the English slice of the
    corpus, raw distribution = everything; every doc scored by the
    hashed unigram+bigram likelihood ratio.  The oracle replays the
    engine-stable bucket hash, the smoothed bucket counts and the
    per-doc log-sum in SQL at 6 dp — the same discipline as the BM25
    and PageRank float mirrors."""
    from cdc_redshift_spark.operators.corpus import dsir_logweights

    docs = load_table(spark, sf_dir, "documents")
    return dsir_logweights(
        docs,
        target_flag=F.col("lang") == "en",
        n_buckets=DSIR_BUCKETS,
        alpha=DSIR_ALPHA,
    ).orderBy("doc_id")


ORACLE_DSIR_WEIGHTS = f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS tgt,
         string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, tgt, g,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, tgt, unnest(list_concat(
      t,
      list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
    )) AS g
    FROM toks
  )
  WHERE g <> ''
),
tcnt AS (SELECT b, count(*) AS ct FROM grams WHERE tgt GROUP BY b),
scnt AS (SELECT b, count(*) AS cs FROM grams GROUP BY b),
stats AS (
  SELECT count(*) FILTER (tgt) AS nt, count(*) AS ns FROM grams
),
perdoc AS (
  SELECT g.doc_id,
         count(*) AS n_grams,
         sum(ln(coalesce(tc.ct, 0) + {DSIR_ALPHA})
             - ln(sc.cs + {DSIR_ALPHA})) AS s
  FROM grams g
  LEFT JOIN tcnt tc USING (b)
  JOIN scnt sc USING (b)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       coalesce(
         round(p.s + p.n_grams
               * (ln(st.ns + {DSIR_ALPHA * DSIR_BUCKETS})
                  - ln(st.nt + {DSIR_ALPHA * DSIR_BUCKETS})), 6),
         0.0) AS logw
FROM documents d
LEFT JOIN perdoc p USING (doc_id), stats st
ORDER BY d.doc_id
"""


def q_corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (operators/corpus.
    temperature_mix, the mBERT/XLM-R alpha-smoothing rule): a global
    budget of 1/3 of corpus tokens allocated across sources by
    sqrt-scaled token mass, each source keeping its hash-ordered
    document prefix.  The operator runs the bucket-histogram plan
    (whole high-order-bit buckets pass; only the boundary bucket is
    cumsummed); the oracle runs the NAIVE per-source running-sum
    mirror, so a green row proves the scale plan computes exactly the
    per-source greedy prefix AND the budget arithmetic matches."""
    from cdc_redshift_spark.functions import text as TX
    from cdc_redshift_spark.operators.corpus import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    total = toks.agg(F.sum("n_tokens")).collect()[0][0]
    return temperature_mix(toks, int(total) // 3, alpha=0.5).orderBy(
        "doc_id"
    )


ORACLE_TEMPERATURE_MIX = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST({TXQ.DUCK_TOKEN_COUNT.format(c='text')} AS BIGINT) AS n_tokens
  FROM documents
),
m AS (
  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS mass
  FROM toks GROUP BY source
),
w AS (SELECT source, sqrt(CAST(mass AS DOUBLE)) AS wt FROM m),
bud AS (
  SELECT source,
         CAST(floor(((SELECT sum(mass) FROM m) // 3)
                    * round(wt / (SELECT sum(wt) FROM w), 6))
              AS BIGINT) AS src_budget
  FROM w
),
ordered AS (
  SELECT t.doc_id, t.source, t.n_tokens, b.src_budget,
         sum(t.n_tokens) OVER (
           PARTITION BY t.source
           ORDER BY ('0x' || substr(md5('mix:' || CAST(t.doc_id AS VARCHAR)), 1, 15))::BIGINT,
             t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum
  FROM toks t JOIN bud b USING (source)
)
SELECT doc_id, source, n_tokens, src_budget
FROM ordered WHERE cum <= src_budget
ORDER BY doc_id
"""


LM_BUCKETS = 4096
LM_ALPHA = 0.5
#: the "reads like the reference corpus" slice the bigram LM trains on
LM_TRAIN_SOURCES = ("src0", "src1", "src2")


def q_corpus_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style hashed-bigram LM fluency scores
    (operators/corpus.ngram_lm_nll, Wenzek et al. 2020): the LM trains
    on three sources standing in for the curated reference corpus and
    every document is scored by average per-transition negative
    log-likelihood.  The oracle replays the bucket hash, the smoothed
    train counts and the 6-dp per-doc average in SQL — the DSIR/BM25
    float-mirror discipline."""
    from cdc_redshift_spark.operators.corpus import ngram_lm_nll

    docs = load_table(spark, sf_dir, "documents")
    return ngram_lm_nll(
        docs,
        train_flag=F.col("source").isin(*LM_TRAIN_SOURCES),
        n_buckets=LM_BUCKETS,
        alpha=LM_ALPHA,
    ).orderBy("doc_id")


_LM_SRCS = ", ".join(f"'{s}'" for s in LM_TRAIN_SOURCES)

ORACLE_LM_PERPLEXITY = f"""
WITH toks AS (
  SELECT doc_id, source IN ({_LM_SRCS}) AS tr,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x <> '') AS t
  FROM documents
),
trans AS (
  SELECT doc_id, tr,
         ('0x' || substr(md5(t[i]), 1, 15))::BIGINT % {LM_BUCKETS} AS bc,
         ('0x' || substr(md5(t[i] || ' ' || t[i + 1]), 1, 15))::BIGINT
           % {LM_BUCKETS} AS bg
  FROM toks, UNNEST(range(1, len(t))) AS u(i)
),
c1 AS (SELECT bc, count(*) AS c FROM trans WHERE tr GROUP BY bc),
c2 AS (SELECT bg, count(*) AS c FROM trans WHERE tr GROUP BY bg),
perdoc AS (
  SELECT t.doc_id, count(*) AS n_trans,
         round(avg(ln(coalesce(c1.c, 0) + {LM_ALPHA * LM_BUCKETS})
                   - ln(coalesce(c2.c, 0) + {LM_ALPHA})), 6) AS nll
  FROM trans t
  LEFT JOIN c1 USING (bc)
  LEFT JOIN c2 USING (bg)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_trans, 0) AS BIGINT) AS n_trans,
       coalesce(p.nll, 0.0) AS nll
FROM documents d
LEFT JOIN perdoc p USING (doc_id)
ORDER BY d.doc_id
"""


def q_corpus_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 BPE merge candidates over the documents corpus — the
    distributed inner step of tokenizer training (operators/corpus.
    bpe_pair_counts): ONE corpus scan folds words to frequency-
    weighted types; pair statistics run vocab-sized.  The oracle
    mirrors the char+'</w>' decomposition, the weighted pair counts
    and the (cnt desc, lsym, rsym) ranking."""
    from cdc_redshift_spark.operators.corpus import bpe_pair_counts

    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, k=30).select(
        F.col("left").alias("lsym"),
        F.col("right").alias("rsym"),
        "cnt",
    )


ORACLE_BPE_PAIRS = r"""
WITH w AS (
  SELECT word, count(*) AS wc FROM (
    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
    FROM documents
  ) WHERE word <> '' GROUP BY word
),
v AS (
  SELECT wc, list_append(string_split(word, ''), '</w>') AS syms FROM w
),
p AS (
  SELECT syms[i] AS lsym, syms[i + 1] AS rsym, wc
  FROM v, UNNEST(range(1, len(syms))) AS u(i)
),
c AS (
  SELECT lsym, rsym, CAST(sum(wc) AS BIGINT) AS cnt
  FROM p GROUP BY lsym, rsym
)
SELECT lsym, rsym, cnt FROM c
ORDER BY cnt DESC, lsym ASC, rsym ASC
LIMIT 30
"""


TFIDF_TOPK = 3


def q_docs_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword EXTRACTION by TF-IDF — the tagging/
    faceting complement of BM25 (which scores documents against a
    query; this scores terms against their document).  Smoothed
    ``idf = ln((N+1)/(df+1)) + 1`` (the sklearn convention), top-k
    terms per doc by (score desc, term asc).

    Plan shape: one explode->(doc, term) count shuffle over the
    shared `regex_words` tokenizer (terms of length >= 3), the
    vocab-sized df table BROADCAST back (never a big-big join), and
    one per-doc ranking window.  Scores round at 6 dp after ln — the
    certified BM25 float discipline."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id",
        F.explode(TXQ.regex_words(F.col("text"))).alias("term"),
    ).where(F.length("term") >= 3)
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # N as a lazy 1-row broadcast (the bm25_topk pattern) — an eager
    # count() here would cost a separate full scan per call
    stats = docs.agg((F.count(F.lit(1)) + 1).cast("double").alias("__n1"))
    scored = tf.join(F.broadcast(df_t), "term").crossJoin(
        F.broadcast(stats)
    ).select(
        "doc_id",
        "term",
        # round BEFORE ranking (the certified BM25 discipline): ln()
        # is only cross-engine-identical at 6 dp, and the term
        # tiebreak must fire on the ROUNDED ties both engines agree on
        F.round(
            F.col("tf") * (F.log(F.col("__n1") / (F.col("df") + 1)) + F.lit(1.0)),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "rank", "term", "score")
        .orderBy("doc_id", "rank")
    )


ORACLE_TFIDF = f"""
WITH terms AS (
  SELECT doc_id, t.term
  FROM documents, unnest({_RW}) AS t(term)
  WHERE length(t.term) >= 3
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM terms GROUP BY doc_id, term
), dft AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (SELECT CAST(count(*) + 1 AS DOUBLE) AS n1 FROM documents),
scored AS (
  SELECT doc_id, term,
         round(tf * (ln(n1 / (df + 1)) + 1.0), 6) AS score
  FROM tf JOIN dft USING (term), n
), ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, score
FROM ranked WHERE rank <= {TFIDF_TOPK}
ORDER BY doc_id, rank
"""


TOKEN_DRIFT_V = 50  # reference vocabulary size per source
TOKEN_DRIFT_CELLS = TOKEN_DRIFT_V + 1  # + the OOV bucket
# tokens come from a \s+ split, so no token can contain a space —
# a spaced sentinel can never collide with a real corpus token
# (a bare "__oov__" can, which would double-count that grid cell)
TOKEN_DRIFT_OOV = " oov "


def token_drift_vocab(ref_counts: DataFrame) -> DataFrame:
    """Top-V reference vocabulary per source from ``(source, tok,
    __c)`` reference-half counts — count desc, token asc tie-break.
    Factored out (round 13) so the batch monitor and the streaming
    face (``cdc_stream_token_drift``) certify the IDENTICAL ranking,
    mirroring ``psi_bin_expr``'s role for the value monitor: a
    tie-break change here changes both faces together or not at
    all."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.desc("__c"), F.asc("tok")
    )
    return (
        ref_counts.select(
            "source", "tok", F.row_number().over(w).alias("__rn")
        )
        .where(F.col("__rn") <= TOKEN_DRIFT_V)
        .select("source", "tok")
    )


def token_drift_grid_score(
    cells: DataFrame, vocab: DataFrame, sources: DataFrame
) -> DataFrame:
    """Score observed ``(source, cell, __cr, __cc)`` cells over the
    vocab ∪ OOV grid with the shared :func:`psi_score` — the back
    half both token-drift faces run.  ``sources`` supplies every
    source SEEN ANYWHERE (not just vocab sources): a source whose
    documents all fall in the current half — a brand-new source, the
    strongest drift there is — must surface as an all-OOV
    forced-drift row, not silently vanish."""
    from cdc_redshift_spark.operators.quality import psi_score

    grid = vocab.select(
        "source", F.col("tok").alias("cell")
    ).unionByName(
        sources.select("source")
        .distinct()
        .select("source", F.lit(TOKEN_DRIFT_OOV).alias("cell"))
    )
    full = grid.join(cells, ["source", "cell"], "left").select(
        F.col("source").alias("__k"),
        F.col("cell").alias("__b"),
        F.coalesce("__cr", F.lit(0)).alias("__c_ref"),
        F.coalesce("__cc", F.lit(0)).alias("__c_cur"),
    )
    return psi_score(full, "source", bins=TOKEN_DRIFT_CELLS)


def q_corpus_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift per source: smoothed PSI between the
    early and late half of the corpus over each source's reference
    unigram vocabulary — the text-modality member of the drift triad
    (`dq_drift_psi` values, `emb_drift_report` embeddings).  The
    reference half (doc_id at or below the exact integer midpoint)
    fixes a top-V vocabulary per source (count desc, token asc
    tie-break — deterministic both engines); every other token maps
    to one OOV cell (a spaced sentinel no \\s+-split token can
    collide with); both halves histogram into the shared V+1 grid.
    A source first seen in the late half — a brand-new source —
    surfaces as an all-OOV row with n_ref=0 (maximal drift), it is
    NOT dropped.  Cells score through the SAME psi_score expressions as the value
    monitor (operators/quality.py), with the Laplace pad fixed at
    (V+1)·0.5 on both sides.

    Scale shape: the token explode is corpus-sized but folds
    map-side into (source, token, half) counts; the per-source
    vocabulary is a window over those counts (|sources|·|vocab|
    rows); the OOV remap joins counts against the tiny vocab
    (broadcast) and the PSI reduction runs over |sources|·(V+1)
    cells.  The wide input shuffles once, as token counts."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx")
    )
    toks = (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            "source",
            F.expr("doc_id <= (__mn + __mx) div 2").alias("__is_ref"),
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
        )
    )
    counts = toks.groupBy("source", "tok").agg(
        F.sum(F.when(F.col("__is_ref"), 1).otherwise(0)).alias("__c_ref"),
        F.sum(F.when(~F.col("__is_ref"), 1).otherwise(0)).alias("__c_cur"),
    )
    # ranking, OOV grid, and scoring are the SHARED helpers the
    # streaming face also runs (token_drift_vocab /
    # token_drift_grid_score) — the two faces cannot drift apart
    vocab = token_drift_vocab(
        counts.where(F.col("__c_ref") > 0).select(
            "source", "tok", F.col("__c_ref").alias("__c")
        )
    )
    cells = (
        counts.join(
            F.broadcast(vocab.withColumn("__in_v", F.lit(True))),
            ["source", "tok"],
            "left",
        )
        .select(
            "source",
            F.when(F.col("__in_v"), F.col("tok"))
            .otherwise(F.lit(TOKEN_DRIFT_OOV))
            .alias("cell"),
            "__c_ref",
            "__c_cur",
        )
        .groupBy("source", "cell")
        .agg(
            F.sum("__c_ref").alias("__cr"),
            F.sum("__c_cur").alias("__cc"),
        )
    )
    return token_drift_grid_score(cells, vocab, counts).orderBy(
        "source"
    )


ORACLE_TOKEN_DRIFT = rf"""
WITH toks AS (
  SELECT source,
         doc_id <= ((SELECT min(doc_id) FROM documents)
                    + (SELECT max(doc_id) FROM documents)) // 2 AS is_ref,
         unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
), counts AS (
  SELECT source, tok,
         sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_ref,
         sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS c_cur
  FROM toks GROUP BY 1, 2
), vocab AS (
  SELECT source, tok FROM (
    SELECT source, tok,
           row_number() OVER (PARTITION BY source
                              ORDER BY c_ref DESC, tok ASC) AS rn
    FROM counts WHERE c_ref > 0
  ) WHERE rn <= {TOKEN_DRIFT_V}
), mapped AS (
  SELECT counts.source,
         CASE WHEN vocab.tok IS NULL THEN ' oov '
              ELSE counts.tok END AS cell,
         sum(c_ref) AS c_ref, sum(c_cur) AS c_cur
  FROM counts LEFT JOIN vocab
    ON counts.source = vocab.source AND counts.tok = vocab.tok
  GROUP BY 1, 2
), grid AS (
  SELECT source, tok AS cell FROM vocab
  UNION ALL
  SELECT DISTINCT source, ' oov ' FROM counts
), filled AS (
  SELECT grid.source, grid.cell,
         coalesce(c_ref, 0) AS c_ref, coalesce(c_cur, 0) AS c_cur
  FROM grid LEFT JOIN mapped
    ON grid.source = mapped.source AND grid.cell = mapped.cell
), tot AS (
  SELECT source, sum(c_ref) AS n_ref, sum(c_cur) AS n_cur
  FROM filled GROUP BY 1
), scored AS (
  SELECT filled.source, n_ref, n_cur,
         ((c_cur + 0.5) / (n_cur + {TOKEN_DRIFT_CELLS} * 0.5)
            - (c_ref + 0.5) / (n_ref + {TOKEN_DRIFT_CELLS} * 0.5))
           * ln(((c_cur + 0.5) / (n_cur + {TOKEN_DRIFT_CELLS} * 0.5))
                / ((c_ref + 0.5) / (n_ref + {TOKEN_DRIFT_CELLS} * 0.5))) AS term
  FROM filled JOIN tot ON filled.source = tot.source
)
SELECT source,
       CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       round(sum(term), 6) AS psi,
       round(sum(term), 6) > 0.2 AS drift
FROM scored
GROUP BY 1, 2, 3
ORDER BY source
"""


QUERIES = {
    "docs_tfidf_keywords": q_docs_tfidf_keywords,
    "corpus_token_drift": q_corpus_token_drift,
    "corpus_bpe_pairs": q_corpus_bpe_pairs,
    "docs_hybrid_rrf": q_docs_hybrid_rrf,
    "docs_phrase_search": q_docs_phrase_search,
    "corpus_temperature_mix": q_corpus_temperature_mix,
    "corpus_lm_perplexity": q_corpus_lm_perplexity,
    "corpus_dsir_weights": q_corpus_dsir_weights,
    "corpus_split_manifest": q_corpus_split_manifest,
    "corpus_split_leakage_safe": q_corpus_split_leakage_safe,
    "corpus_budget_select": q_corpus_budget_select,
    "docs_bm25_topk": q_docs_bm25_topk,
    "corpus_decontaminate": q_corpus_decontaminate,
    "corpus_source_cap": q_corpus_source_cap,
    "corpus_doc_metrics": q_corpus_doc_metrics,
    "corpus_stratified_sample": q_corpus_stratified_sample,
    "corpus_token_shards": q_corpus_token_shards,
    "corpus_clean_pipeline": q_corpus_clean_pipeline,
    "corpus_pretrain_manifest": q_corpus_pretrain_manifest,
    "corpus_chunk_docs": q_corpus_chunk_docs,
    "corpus_pack_stream": q_corpus_pack_stream,
    "corpus_weighted_sample": q_corpus_weighted_sample,
}

ORACLES = {
    "docs_tfidf_keywords": ORACLE_TFIDF,
    "corpus_token_drift": ORACLE_TOKEN_DRIFT,
    "corpus_bpe_pairs": ORACLE_BPE_PAIRS,
    "docs_hybrid_rrf": ORACLE_HYBRID_RRF,
    "docs_phrase_search": ORACLE_PHRASE_SEARCH,
    "corpus_temperature_mix": ORACLE_TEMPERATURE_MIX,
    "corpus_lm_perplexity": ORACLE_LM_PERPLEXITY,
    "corpus_dsir_weights": ORACLE_DSIR_WEIGHTS,
    "corpus_split_manifest": ORACLE_CORPUS_SPLIT,
    "corpus_split_leakage_safe": ORACLE_SPLIT_LEAKAGE,
    "corpus_budget_select": ORACLE_BUDGET_SELECT,
    "docs_bm25_topk": ORACLE_BM25,
    "corpus_decontaminate": ORACLE_DECONTAMINATE,
    "corpus_source_cap": ORACLE_SOURCE_CAP,
    "corpus_doc_metrics": ORACLE_DOC_METRICS,
    "corpus_stratified_sample": _oracle_sample(),
    "corpus_token_shards": ORACLE_TOKEN_SHARDS,
    "corpus_clean_pipeline": _oracle_clean_pipeline(),
    "corpus_pretrain_manifest": _oracle_pretrain_manifest(),
    "corpus_chunk_docs": ORACLE_CHUNK,
    "corpus_pack_stream": ORACLE_PACK,
    "corpus_weighted_sample": ORACLE_WSAMPLE,
}
