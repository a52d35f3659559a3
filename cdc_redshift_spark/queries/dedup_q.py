"""Deduplication queries over documents/embeddings, with DuckDB oracles.

The MinHash oracle mirrors the *exact* signature computation (portable
md5-derived shingle hashes + the same fixed LCG coefficients) and
models LSH candidate generation as band-slice equality — bit-for-bit
the same pair set Spark produces, which buckets on the band's
signature-slice VALUES themselves (collision-free; no hash in the
candidate path).

The SimHash oracle mirrors the md5-derived 60-bit token hashes, the
per-bit votes, the pigeonhole chunks and the hamming filter — every
dedup query now carries a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_redshift_spark.operators.dedup import (
    MINHASH_P,
    exact_dedup,
    incremental_exact_dedup,
    incremental_minhash_pairs,
    minhash_coeffs,
    minhash_frames,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from cdc_redshift_spark.operators.simjoin import jaccard_similarity_join
from cdc_redshift_spark.operators.similarity import rh_lsh_near_dup_pairs
from cdc_redshift_spark.queries.similarity import DUCK_COSINE, duck_lsh_cand_sql
from cdc_redshift_spark.sources.tables import load_table

# ---- DuckDB fragments mirroring operators/dedup.py -----------------------

DUCK_NORM = r"trim(regexp_replace(lower({c}), '\s+', ' ', 'g'))"


def duck_shingles(c: str, n: int = 3) -> str:
    norm = DUCK_NORM.format(c=c)
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(length({norm}) - {n - 1}, 1) + 1),"
        f" i -> substr({norm}, i, {n})))"
    )


def duck_shingle_hashes(c: str, n: int = 3) -> str:
    return (
        f"list_transform({duck_shingles(c, n)},"
        f" s -> ('0x' || substr(md5(s), 1, 7))::BIGINT)"
    )


def duck_minhash_sig(hcol: str, k: int = 32) -> str:
    """k list_min expressions over the same (a,b) LCG coefficients."""
    mins = [
        f"list_min(list_transform({hcol}, h -> (h * {a} + {b}) % {MINHASH_P}))"
        for a, b in minhash_coeffs(k)
    ]
    return "[" + ", ".join(mins) + "]"


# ---- queries -------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs)


ORACLE_DEDUP_EXACT = rf"""
WITH fp AS (
  SELECT doc_id AS id, md5({DUCK_NORM.format(c='text')}) AS fp
  FROM documents
), g AS (
  SELECT fp, min(id) AS canonical_id, count(*) AS group_size
  FROM fp GROUP BY fp
)
SELECT id, fp.fp, canonical_id, group_size,
       CASE WHEN id <> canonical_id THEN 1 ELSE 0 END AS is_duplicate
FROM fp JOIN g USING (fp)
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.6)


ORACLE_NGRAM_JACCARD = f"""
WITH sh AS (
  SELECT doc_id AS id, {duck_shingle_hashes('text')} AS h FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       round(len(list_intersect(a.h, b.h))::DOUBLE
             / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))), 6) AS jaccard
FROM sh a JOIN sh b ON a.id < b.id
WHERE len(list_intersect(a.h, b.h))::DOUBLE
      / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))) >= 0.6
"""


def q_dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup similarity graph (n-gram Jaccard
    ≥ 0.6 edges): triangle count, participating nodes, and the densest
    node's triangle degree — the standard two-join triangle plan over
    ordered edges (a<b<c), each triangle counted exactly once.  Edge
    lists shuffle on their join endpoint; no vertex ever needs global
    adjacency in memory."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint: the edge list is referenced three times (e1, e2,
    # e3) — without severing the lineage the O(Σ bucket²) shingle
    # self-join that produces it would execute three times
    e = (
        ngram_jaccard_pairs(docs, threshold=0.6)
        .select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .localCheckpoint(eager=True)
    )
    e12 = e.alias("e1").join(
        e.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(
        F.col("e1.a").alias("a"), F.col("e1.b").alias("b"),
        F.col("e2.b").alias("c"),
    )
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = e12.join(
        e3, (F.col("a") == F.col("x")) & (F.col("c") == F.col("y"))
    ).select("a", "b", "c")
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("n"))
    deg = nodes.groupBy("n").count()
    return (
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_tri_nodes")))
        .crossJoin(deg.agg(F.max("count").alias("max_node_triangles")))
    )


ORACLE_TRIANGLES = f"""
WITH sh AS (
  SELECT doc_id AS id, {duck_shingle_hashes('text')} AS h FROM documents
), e AS (
  SELECT a.id AS a, b.id AS b
  FROM sh a JOIN sh b ON a.id < b.id
  WHERE len(list_intersect(a.h, b.h))::DOUBLE
        / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))) >= 0.6
), tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1 JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), nodes AS (
  SELECT unnest([a, b, c]) AS n FROM tri
), deg AS (
  SELECT n, count(*) AS cnt FROM nodes GROUP BY n
)
SELECT (SELECT count(*) FROM tri) AS n_triangles,
       (SELECT count(*) FROM deg) AS n_tri_nodes,
       (SELECT max(cnt) FROM deg) AS max_node_triangles
"""


# Active bucket cap for the headline MinHash queries: bounds verify
# FLOPs at cap² per bucket on template-heavy corpora (SCALE.md). 128
# genuinely trims at both test SFs (max natural bucket: 164 at sf0.01,
# 1609 at sf0.1) so the capped path — not a no-op — is what the
# correctness gate certifies.
MINHASH_BUCKET_CAP = 128


def _capped_cand_cte(k: int, bands: int, cap: int) -> str:
    """CTE chain (expects ``sig(id, h, sig)`` upstream) ending in
    ``cand(id_a, id_b)``: pairs whose FIRST colliding band has bucket
    size <= cap — the exact rule of operators/dedup.py
    `_bitmap_verify_fn` (oversized first band claims and drops the
    pair) and the array-fallback ``min_by(bn, band)`` filter."""
    r = k // bands
    slices = ", ".join(
        f"list_slice(sig, {i * r + 1}, {(i + 1) * r})" for i in range(bands)
    )
    return f"""br AS (
  SELECT id, unnest(range({bands})) AS band, unnest([{slices}]) AS slc FROM sig
), bs AS (
  SELECT band, slc, count(*) AS bn FROM br GROUP BY band, slc
), coll AS (
  SELECT a.id AS id_a, b.id AS id_b, a.band, s.bn
  FROM br a JOIN br b ON a.band = b.band AND a.slc = b.slc AND a.id < b.id
  JOIN bs s ON s.band = a.band AND s.slc = a.slc
), cand AS (
  SELECT id_a, id_b FROM coll GROUP BY id_a, id_b
  HAVING min_by(bn, band) <= {cap}
)"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs under BOTH standard shingle units,
    labeled by ``mode``: character 5-gram shingles ('char', the
    noise-sensitive config) and word trigram shingles ('word', the
    large-corpus text-dedup standard — robust to char-level noise,
    unbounded vocabulary handled by the dict probe).  Round-8 registry
    fold of the former ``dedup_minhash_word_lsh`` entry: identical
    function coverage (both ``minhash_lsh_pairs`` configs and both
    oracle mirrors run verbatim), one registry slot."""
    docs = load_table(spark, sf_dir, "documents")
    char_pairs = minhash_lsh_pairs(
        docs,
        k=32,
        bands=8,
        jaccard_threshold=0.6,
        max_bucket_size=MINHASH_BUCKET_CAP,
    )
    word_pairs = minhash_lsh_pairs(
        docs,
        k=32,
        bands=8,
        n=WORD_N,
        jaccard_threshold=WORD_THRESHOLD,
        unit="word",
        max_bucket_size=MINHASH_BUCKET_CAP,
    )
    lab = lambda df, m: df.select(  # noqa: E731
        F.lit(m).alias("mode"), "id_a", "id_b", "jaccard"
    )
    return lab(char_pairs, "char").unionByName(lab(word_pairs, "word"))


def _oracle_minhash(
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
    cap: int = MINHASH_BUCKET_CAP,
) -> str:
    return f"""
WITH sh AS (
  SELECT doc_id AS id, {duck_shingle_hashes('text')} AS h FROM documents
), sig AS (
  SELECT id, h, {duck_minhash_sig('h', k)} AS sig FROM sh
), {_capped_cand_cte(k, bands, cap)}
SELECT c.id_a, c.id_b,
       round(len(list_intersect(a.h, b.h))::DOUBLE
             / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))), 6) AS jaccard
FROM cand c JOIN sig a ON a.id = c.id_a JOIN sig b ON b.id = c.id_b
WHERE len(list_intersect(a.h, b.h))::DOUBLE
      / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))) >= {threshold}
"""


def duck_word_shingle_hashes(c: str, n: int = 3) -> str:
    """Word-n-gram shingle hashes: n consecutive tokens joined with a
    space (mirrors operators/dedup.py `_minhash_frames_fn(unit='word')`)."""
    norm = DUCK_NORM.format(c=c)
    toks = f"string_split({norm}, ' ')"
    grams = (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 1) + 1),"
        f" i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )
    return f"list_transform({grams}, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT)"


WORD_N, WORD_THRESHOLD = 3, 0.5


def _oracle_minhash_word(
    k: int = 32, bands: int = 8, cap: int = MINHASH_BUCKET_CAP
) -> str:
    return f"""
WITH sh AS (
  SELECT doc_id AS id, {duck_word_shingle_hashes('text', WORD_N)} AS h FROM documents
), sig AS (
  SELECT id, h, {duck_minhash_sig('h', k)} AS sig FROM sh
), {_capped_cand_cte(k, bands, cap)}
SELECT c.id_a, c.id_b,
       round(len(list_intersect(a.h, b.h))::DOUBLE
             / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))), 6) AS jaccard
FROM cand c JOIN sig a ON a.id = c.id_a JOIN sig b ON b.id = c.id_b
WHERE len(list_intersect(a.h, b.h))::DOUBLE
      / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))) >= {WORD_THRESHOLD}
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash hamming ≤ 8 with pigeonhole
    blocking; full mirrored oracle (md5-derived 60-bit token hashes
    are identical on both engines), plus the blocking-completeness
    unit test against brute-force hamming."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=8, blocks=4)


def _oracle_simhash(max_hamming: int = 8, blocks: int = 4, n_hex: int = 15) -> str:
    """Mirror of operators/dedup.py simhash_pairs: same token hashes,
    same bit votes, same pigeonhole chunks, same hamming filter."""
    norm = DUCK_NORM.format(c="text")
    n_bits = 4 * n_hex  # 60: bits 60-63 vote -1 everywhere → always 0
    sig_terms = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    width = 64 // blocks
    mask = (1 << width) - 1
    chunk_cols = ", ".join(
        f"((sig >> {j * width}) & {mask}) AS c{j}" for j in range(blocks)
    )
    block_eq = " OR ".join(f"a.c{j} = b.c{j}" for j in range(blocks))
    return f"""
WITH t AS (
  SELECT doc_id AS id, unnest(list_distinct(string_split({norm}, ' '))) AS tok
  FROM documents
), th AS (
  SELECT id, ('0x' || substr(md5(tok), 1, {n_hex}))::BIGINT AS h FROM t
), sig AS (
  SELECT id, {sig_terms} AS sig FROM th GROUP BY id
), ch AS (
  SELECT id, sig, {chunk_cols} FROM sig
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sa, b.sig AS sb
  FROM ch a JOIN ch b ON a.id < b.id AND ({block_eq})
)
SELECT id_a, id_b, bit_count(xor(sa, sb)) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution over MinHash-LSH near-dup pairs: connected
    components labeled by min doc id, one canonical doc per cluster —
    the final step a training-data dedup pipeline actually acts on —
    PLUS each cluster's representative (round-8 fold of the former
    ``dedup_cluster_reps`` entry): instead of blindly keeping the
    min-id doc, the highest-QUALITY member (6-dp-rounded score, min
    doc id on ties) rides every member row alongside the member
    count.  One max_by aggregate over the cluster assignment joined
    back per member — identical function coverage
    (``connected_components`` + rep selection), one registry slot."""
    from cdc_redshift_spark.functions import text as TX
    from cdc_redshift_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs,
        k=32,
        bands=8,
        jaccard_threshold=0.6,
        max_bucket_size=MINHASH_BUCKET_CAP,
    )
    comp = connected_components(docs.select(F.col("doc_id").alias("id")), pairs)
    dq = docs.select(
        F.col("doc_id").alias("id"), TX.quality_score(F.col("text")).alias("q")
    )
    best = F.max_by(
        F.struct(F.col("id").alias("rid"), F.col("q").alias("rq")),
        F.struct(F.col("q").alias("q"), (-F.col("id")).alias("neg_id")),
    )
    reps = (
        comp.join(dq, "id")
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"), best.alias("b"))
        .select(
            "cluster_id",
            "n_members",
            F.col("b.rid").alias("rep_doc"),
            F.col("b.rq").alias("rep_quality"),
        )
    )
    return (
        comp.select(
            "id",
            "cluster_id",
            (F.col("id") == F.col("cluster_id")).cast("int").alias("is_canonical"),
        )
        .join(reps, "cluster_id")
        .select(
            "id",
            "cluster_id",
            "is_canonical",
            "n_members",
            "rep_doc",
            "rep_quality",
        )
        .orderBy("id")
    )


def _oracle_clusters(
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
    cap: int = MINHASH_BUCKET_CAP,
) -> str:
    """Recursive-CTE mirror: same (capped) pair set as the minhash
    oracle, then min-label reachability (undirected edges) per node."""
    return f"""
WITH RECURSIVE sh AS (
  SELECT doc_id AS id, {duck_shingle_hashes('text')} AS h FROM documents
), sig AS (
  SELECT id, h, {duck_minhash_sig('h', k)} AS sig FROM sh
), {_capped_cand_cte(k, bands, cap)}, p AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN sig a ON a.id = c.id_a JOIN sig b ON b.id = c.id_b
  WHERE len(list_intersect(a.h, b.h))::DOUBLE
        / (len(a.h) + len(b.h) - len(list_intersect(a.h, b.h))) >= {threshold}
), e AS (
  SELECT id_a AS s, id_b AS d FROM p
  UNION
  SELECT id_b, id_a FROM p
), reach(id, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.d, r.lab FROM reach r JOIN e ON e.s = r.id
)
SELECT id, min(lab) AS cluster_id,
       CASE WHEN id = min(lab) THEN 1 ELSE 0 END AS is_canonical
FROM reach GROUP BY id
"""


def _oracle_clusters_with_reps() -> str:
    from cdc_redshift_spark.functions import text as TX

    quality = (
        f"round(0.4 * {TX.duck_stop_ratio('text')}"
        f" + 0.3 * (1 - ({TX.DUCK_PUNCT_RATIO.format(c='text')}))"
        f" + 0.3 * least({TX.DUCK_TOKEN_COUNT.format(c='text')} / 50.0, 1.0), 6)"
    )
    base = _oracle_clusters()
    # reuse the recursive reach CTE chain; replace the final projection
    # (the chain ends with ')' so the continuation needs a comma)
    head = base[: base.rindex("SELECT id, min(lab)")].rstrip()
    assert head.endswith(")"), "unexpected _oracle_clusters shape"
    return f"""{head},
cl AS (
  SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id
), dq AS (
  SELECT doc_id AS id, {quality} AS q FROM documents
), j AS (
  SELECT cl.cluster_id, cl.id, dq.q FROM cl JOIN dq USING (id)
), r AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY q DESC, id ASC) AS rk,
         count(*) OVER (PARTITION BY cluster_id) AS n
  FROM j
), reps AS (
  SELECT cluster_id, CAST(n AS BIGINT) AS n_members,
         id AS rep_doc, q AS rep_quality
  FROM r WHERE rk = 1
)
SELECT cl.id, cl.cluster_id,
       CAST(cl.id = cl.cluster_id AS INTEGER) AS is_canonical,
       reps.n_members, reps.rep_doc, reps.rep_quality
FROM cl JOIN reps USING (cluster_id)
ORDER BY cl.id
"""


EMB_THRESHOLD, EMB_PLANES, EMB_TABLES = 0.35, 4, 4


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the bucketed (LSH-screened) plan —
    no cross join in the physical plan; semantics are explicitly
    `collides in ≥1 table AND exact cosine ≥ t`, and the oracle
    mirrors the bucketing with the same plane literals."""
    emb = load_table(spark, sf_dir, "embeddings")
    return rh_lsh_near_dup_pairs(
        emb, threshold=EMB_THRESHOLD, n_planes=EMB_PLANES, n_tables=EMB_TABLES, dim=64
    )


ORACLE_EMB_COSINE = f"""
WITH {duck_lsh_cand_sql(EMB_PLANES, EMB_TABLES, symmetric=True)}
SELECT c.id_a, c.id_b, {DUCK_COSINE} AS cosine
FROM cand c JOIN v va ON va.id = c.id_a JOIN v vb ON vb.id = c.id_b
WHERE {DUCK_COSINE} >= {EMB_THRESHOLD}
"""


def q_dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup clusters: LSH-screened cosine
    near-dup pairs → connected components over vec ids → per-cluster
    census.  The embedding analogue of `dedup_clusters` (text
    MinHash): the composition a semantic-dedup pipeline acts on —
    multi-member clusters are the near-dup sets, the canonical member
    is the min id.  Reuses the pair semantics `dedup_embedding_cosine`
    gates; the oracle replays the same candidate CTE plus min-label
    reachability."""
    from cdc_redshift_spark.operators.dedup import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = rh_lsh_near_dup_pairs(
        emb,
        threshold=EMB_THRESHOLD,
        n_planes=EMB_PLANES,
        n_tables=EMB_TABLES,
        dim=64,
    )
    comp = connected_components(
        emb.select(F.col("vec_id").alias("id")), pairs
    )
    return (
        comp.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"), F.max("id").alias("max_id"))
        .where(F.col("n_members") > 1)  # near-dup sets only
        .orderBy("cluster_id")
    )


def _oracle_embedding_clusters() -> str:
    return f"""
WITH RECURSIVE {duck_lsh_cand_sql(EMB_PLANES, EMB_TABLES, symmetric=True)}, p AS (
  SELECT c.id_a, c.id_b
  FROM cand c JOIN v va ON va.id = c.id_a JOIN v vb ON vb.id = c.id_b
  WHERE {DUCK_COSINE} >= {EMB_THRESHOLD}
), e AS (
  SELECT id_a AS s, id_b AS d FROM p
  UNION
  SELECT id_b, id_a FROM p
), reach(id, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.d, r.lab FROM reach r JOIN e ON e.s = r.id
), comp AS (
  SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id
)
SELECT cluster_id, count(*) AS n_members, max(id) AS max_id
FROM comp GROUP BY cluster_id HAVING count(*) > 1
ORDER BY cluster_id
"""


# ---- prefix-filtered similarity join --------------------------------------

SIMJOIN_TAU = 0.9


def q_dedup_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs word-token-set Jaccard join at tau=0.9 via
    prefix filtering (operators/simjoin.py — SSJoin/PPJoin family).
    The Spark plan never forms the cross product; the oracle is the
    brute-force O(N^2) definition, so a green hash certifies the
    pruning loses nothing."""
    docs = load_table(spark, sf_dir, "documents")
    # eager=True: the ordered-token frame feeds three consumers
    # (prefix rows + both verify sides); without the persist it is
    # recomputed 3x — measured 37 s vs 8 s at sf0.1.  tools/dump_plans
    # renders the eager=False form so the full plan stays reviewable.
    return jaccard_similarity_join(docs, tau=SIMJOIN_TAU)


ORACLE_SIMJOIN = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split({DUCK_NORM.format(c='text')}, ' ')) AS w
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.w, b.w))::DOUBLE
             / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))), 6) AS jaccard
FROM toks a JOIN toks b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.w, b.w))::DOUBLE
      / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= {SIMJOIN_TAU}
"""


# ---- incremental dedup against a persisted index --------------------------

# Deterministic corpus split standing in for "index built yesterday,
# batch arriving today": doc_id % 4 == 0 is the new batch.
INC_BATCH_MOD = 4


def q_dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify a new ingest batch against the persisted fingerprint
    index of the already-accepted corpus (operators/dedup.py
    `incremental_exact_dedup`) — per-batch work never touches the
    corpus text."""
    docs = load_table(spark, sf_dir, "documents")
    from cdc_redshift_spark.functions.text import fingerprint

    ex = docs.where(F.col("doc_id") % INC_BATCH_MOD != 0)
    ba = docs.where(F.col("doc_id") % INC_BATCH_MOD == 0)
    index = ex.select(fingerprint(F.col("text")).alias("fp"))
    return incremental_exact_dedup(index, ba)


ORACLE_INC_EXACT = f"""
WITH fp AS (
  SELECT doc_id AS id, md5({DUCK_NORM.format(c='text')}) AS fp FROM documents
), idx AS (
  SELECT DISTINCT fp FROM fp WHERE id % {INC_BATCH_MOD} != 0
), b AS (
  SELECT id, fp FROM fp WHERE id % {INC_BATCH_MOD} = 0
), canon AS (
  SELECT fp, min(id) AS canonical_id FROM b GROUP BY fp
)
SELECT b.id, b.fp,
       CASE WHEN idx.fp IS NOT NULL THEN 'dup_of_index'
            WHEN b.id != canon.canonical_id THEN 'dup_in_batch'
            ELSE 'new' END AS status,
       canon.canonical_id
FROM b JOIN canon USING (fp) LEFT JOIN idx ON idx.fp = b.fp
"""

INC_MH_K, INC_MH_BANDS, INC_MH_THRESHOLD = 32, 8, 0.5


def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs of the new batch against the already-SIGNED
    corpus (operators/dedup.py `incremental_minhash_pairs`): the
    existing side's (id, sh, sig) frames stand in for the persisted
    signature index — band rows come from stored signatures via pure
    Column ops, the corpus is never re-shingled."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.where(F.col("doc_id") % INC_BATCH_MOD != 0)
    ba = docs.where(F.col("doc_id") % INC_BATCH_MOD == 0)
    # eager=True (round 6): the persisted frames let the operator
    # count the batch side and BROADCAST its shingle arrays into the
    # verify, so the candidate stream never re-shuffles carrying an
    # array — the scale-correct shape.  At sf0.1 the wall is UNCHANGED
    # (15-20 s either way, re-measured): with 1.15M genuinely
    # qualifying pairs at tau=0.5 the cost is the exact
    # array_intersect verify itself (~11 us/pair under codegen), not
    # data movement.  (The r5 eager-vs-lazy gap the old comment cited
    # vanished with the wide-AQE session config.)
    return incremental_minhash_pairs(
        minhash_frames(ex, k=INC_MH_K),
        minhash_frames(ba, k=INC_MH_K),
        k=INC_MH_K,
        bands=INC_MH_BANDS,
        jaccard_threshold=INC_MH_THRESHOLD,
    )


def _oracle_inc_minhash(
    k: int = INC_MH_K, bands: int = INC_MH_BANDS, thr: float = INC_MH_THRESHOLD
) -> str:
    r = k // bands
    return f"""
WITH sh AS (
  SELECT doc_id AS id, {duck_shingle_hashes('text')} AS h FROM documents
), sig AS (
  SELECT id, h, {duck_minhash_sig('h', k)} AS sig FROM sh
), bb AS (
  SELECT id, b, list_slice(sig, b*{r} + 1, b*{r} + {r}) AS key,
         (id % {INC_BATCH_MOD} = 0) AS is_batch
  FROM sig, range({bands}) t(b)
), cand AS (
  SELECT DISTINCT a.id AS batch_id, m.id AS match_id,
         CASE WHEN m.is_batch THEN 'batch' ELSE 'existing' END AS match_side
  FROM bb a JOIN bb m ON a.b = m.b AND a.key = m.key
  WHERE a.is_batch
    AND ((NOT m.is_batch AND m.id != a.id) OR (m.is_batch AND m.id < a.id))
)
SELECT c.batch_id, c.match_id, c.match_side,
       round(len(list_intersect(x.h, y.h))::DOUBLE
             / (len(x.h) + len(y.h) - len(list_intersect(x.h, y.h))), 6) AS jaccard
FROM cand c JOIN sig x ON x.id = c.batch_id JOIN sig y ON y.id = c.match_id
WHERE len(list_intersect(x.h, y.h))::DOUBLE
      / (len(x.h) + len(y.h) - len(list_intersect(x.h, y.h))) >= {thr}
"""


# ---- entity-resolution fuzzy join -----------------------------------------

ER_BLOCK_LEN, ER_MAX_DIST = 16, 1


def q_er_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution shape (operators/joins.py `fuzzy_name_join`):
    customer self-match — blocking on the 16-char name prefix, then
    Levenshtein <= 1 verify; key_a < key_b halves the symmetric pairs.
    The oracle mirrors blocking + verify exactly, so the hash also
    certifies cross-engine Levenshtein agreement."""
    from cdc_redshift_spark.operators.joins import fuzzy_name_join

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_name_join(
        cust,
        cust,
        ("c_custkey", "c_name"),
        ("c_custkey", "c_name"),
        max_dist=ER_MAX_DIST,
        block_len=ER_BLOCK_LEN,
    ).where(F.col("key_a") < F.col("key_b"))


ORACLE_ER_FUZZY = f"""
WITH c AS (
  SELECT c_custkey AS k, {DUCK_NORM.format(c='c_name')} AS nm
  FROM customer
)
SELECT a.k AS key_a, b.k AS key_b, a.nm AS name_a, b.nm AS name_b,
       CAST(levenshtein(a.nm, b.nm) AS INTEGER) AS dist
FROM c a JOIN c b
  ON substr(a.nm, 1, {ER_BLOCK_LEN}) = substr(b.nm, 1, {ER_BLOCK_LEN})
 AND a.k < b.k
WHERE abs(length(a.nm) - length(b.nm)) <= {ER_MAX_DIST}
  AND levenshtein(a.nm, b.nm) <= {ER_MAX_DIST}
"""


SPAN_N = 8  # span window in tokens (Lee et al. use 50; fixture docs are 10-99 tokens)


def q_docs_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup (operators/spandedup.py): every
    maximal token span whose length-8 windows all occur in >= 2
    distinct documents — the partial-duplication complement to the
    doc-level dedups above (boilerplate/quote stripping, Lee et al.
    2022) — PLUS the end-to-end STRIP certification (round-8 fold of
    the former ``docs_substring_strip`` entry): every document's
    reconstructed text after span removal, certified by value (md5
    over the single-space rejoined surviving tokens) riding each of
    its span rows; span-free docs appear once with NULL bounds.  The
    oracle replays tokenization, the engine-stable 60-bit gram hash,
    the distinct-doc gram filter, the island merge AND the
    surviving-token reconstruction in DuckDB SQL, so a green row
    certifies the whole detect→merge→strip pipeline in one slot."""
    from cdc_redshift_spark.functions.text import words
    from cdc_redshift_spark.operators.spandedup import (
        duplicated_spans,
        strip_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    # spans feed two consumers (the strip and the output join) — the
    # span detection is the heavy half, materialize it once
    spans = duplicated_spans(docs, n=SPAN_N).localCheckpoint(eager=False)
    cleaned = strip_spans(docs, spans)
    perdoc = cleaned.select(
        "doc_id",
        # split("") yields [''] — an emptied doc has 0 tokens, not 1
        F.when(F.length("text") == 0, F.lit(0))
        .otherwise(F.size(words(F.col("text"))))
        .cast("long")
        .alias("n_tokens"),
        F.md5(F.col("text")).alias("clean_md5"),
    )
    return (
        perdoc.join(
            spans.select(
                "doc_id",
                F.col("span_start").cast("long").alias("span_start"),
                F.col("span_end").cast("long").alias("span_end"),
            ),
            "doc_id",
            "left",
        )
        .select("doc_id", "span_start", "span_end", "n_tokens", "clean_md5")
        .orderBy("doc_id", "span_start")
    )


# Shared span-detection CTE chain (tokenize -> engine-stable gram
# hash -> cross-doc dup filter -> island merge) — ONE definition so
# the dedup and strip oracles can never drift apart.
SPAN_CTES = f"""
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(t[i:i+{SPAN_N - 1}], ' ')), 1, 15))::BIGINT AS g
  FROM toks, UNNEST(range(1, len(t) - {SPAN_N} + 2)) AS u(i)
),
dup AS (
  SELECT g FROM (
    SELECT g, count(DISTINCT doc_id) AS d FROM grams GROUP BY g
  ) WHERE d >= 2
),
hits AS (SELECT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dup)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {SPAN_N - 1}
              THEN 1 ELSE 0 END AS brk
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grouped AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM flagged
)"""

ORACLE_SUBSTRING_DEDUP = f"""
WITH {SPAN_CTES},
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {SPAN_N - 1} AS e
  FROM grouped GROUP BY doc_id, island
),
kept AS (
  SELECT tk.doc_id, u.i, tk.t[u.i] AS tok
  FROM toks tk, UNNEST(range(1, len(tk.t) + 1)) AS u(i)
  WHERE tk.t[u.i] <> ''
    AND NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = tk.doc_id
      AND u.i - 1 BETWEEN sp.s AND sp.e
  )
),
clean AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         md5(string_agg(tok, ' ' ORDER BY i)) AS clean_md5
  FROM kept GROUP BY doc_id
),
perdoc AS (
  SELECT d.doc_id,
         coalesce(c.n_tokens, 0) AS n_tokens,
         coalesce(c.clean_md5, md5('')) AS clean_md5
  FROM documents d LEFT JOIN clean c USING (doc_id)
)
SELECT p.doc_id,
       CAST(sp.s AS BIGINT) AS span_start,
       CAST(sp.e AS BIGINT) AS span_end,
       p.n_tokens, p.clean_md5
FROM perdoc p LEFT JOIN spans sp USING (doc_id)
ORDER BY p.doc_id, span_start
"""


CONTAIN_TAU = 0.7
CONTAIN_N = 3


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric doc-in-doc detection
    (operators/simjoin.containment_join): directed pairs where >= 70%
    of A's 3-gram shingles occur in B — the quote/boilerplate
    inclusion relation Jaccard misses (a paragraph embedded in a much
    larger page).  Same exactness discipline as ``dedup_simjoin``:
    prefix filtering on the probe side only prunes candidates, and
    the oracle is the brute-force cross join over the same shingle
    sets, so a green row certifies completeness."""
    from cdc_redshift_spark.operators.simjoin import containment_join

    docs = load_table(spark, sf_dir, "documents")
    return containment_join(
        docs, tau=CONTAIN_TAU, n=CONTAIN_N
    ).orderBy("id_a", "id_b")


ORACLE_CONTAINMENT = f"""
WITH toks AS (
  SELECT doc_id AS id,
         string_split_regex({DUCK_NORM.format(c="text")}, ' ') AS t
  FROM documents
),
s AS (
  SELECT id, list_distinct(list_transform(
           range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
  FROM toks WHERE len(t) >= {CONTAIN_N}
)
SELECT a.id AS id_a, b.id AS id_b,
       round(len(list_intersect(a.g, b.g))::DOUBLE / len(a.g), 6)
         AS containment
FROM s a, s b
WHERE a.id <> b.id
  AND len(list_intersect(a.g, b.g))::DOUBLE / len(a.g) >= {CONTAIN_TAU}
ORDER BY id_a, id_b
"""




QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_containment": q_dedup_containment,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_embedding_clusters": q_dedup_embedding_clusters,
    "dedup_clusters": q_dedup_clusters,
    "dedup_graph_triangles": q_dedup_graph_triangles,
    "dedup_simjoin": q_dedup_simjoin,
    "dedup_incremental_exact": q_dedup_incremental_exact,
    "dedup_incremental_minhash": q_dedup_incremental_minhash,
    "er_fuzzy_name_pairs": q_er_fuzzy_name_pairs,
    "docs_substring_dedup": q_docs_substring_dedup,
}

ORACLES = {
    "docs_substring_dedup": ORACLE_SUBSTRING_DEDUP,
    "dedup_containment": ORACLE_CONTAINMENT,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "dedup_minhash_lsh": (
        f"SELECT 'char' AS mode, * FROM ({_oracle_minhash()})\n"
        f"UNION ALL\nSELECT 'word' AS mode, * FROM ({_oracle_minhash_word()})"
    ),
    "dedup_simhash": _oracle_simhash(),
    "dedup_embedding_cosine": ORACLE_EMB_COSINE,
    "dedup_embedding_clusters": _oracle_embedding_clusters(),
    "dedup_clusters": _oracle_clusters_with_reps(),
    "dedup_graph_triangles": ORACLE_TRIANGLES,
    "dedup_simjoin": ORACLE_SIMJOIN,
    "dedup_incremental_exact": ORACLE_INC_EXACT,
    "dedup_incremental_minhash": _oracle_inc_minhash(),
    "er_fuzzy_name_pairs": ORACLE_ER_FUZZY,
}
