"""Document deduplication operators: exact, MinHash-LSH, SimHash, Jaccard.

Training-data-pipeline extensions (no counterpart in the reference,
which only dedups CDC events by key — SURVEY §2.7).  All hot-path math
is built-in Column expressions (hashes, array ops, bit ops) running
inside whole-stage codegen; nothing here drops to Python per row.

Scale design (100 TB corpus):
- exact:   one hash-shuffle on the fingerprint.
- minhash: signatures are computed scan-side (narrow); the LSH
  band-explode multiplies rows by n_bands (small constant) and
  shuffles on band keys — candidate pairs are generated per bucket,
  never the O(N²) cross join.  Verification joins only candidates.
- simhash: narrow signature compute + self-join on rotated bucket
  keys; hamming verify on 64-bit ints is a popcount (bit_count).
- jaccard: explode shingles → shuffle on shingle → pair-count; skew
  guard drops ubiquitous shingles (doc-frequency cap) like a stopword
  filter, which bounds the worst bucket.

Determinism: all hash seeds are fixed constants; md5-derived 32-bit
shingle hashes (portable to the DuckDB oracle), xxhash64 only where
the oracle doesn't need to mirror it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_redshift_spark.functions.text import char_ngrams, normalize_text

# Mersenne prime modulus and fixed LCG-generated coefficients for the
# k minhash permutations h_i(x) = (a_i*x + b_i) mod P  (public
# broadcast-LSH construction, e.g. Leskovec et al., Mining of Massive
# Datasets ch.3).
MINHASH_P = 2_147_483_647  # 2^31 - 1


def minhash_coeffs(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a tiny LCG (no RNG state)."""
    coeffs = []
    x = seed
    for _ in range(k):
        x = (1103515245 * x + 12345) % (2**31)
        a = x % (MINHASH_P - 1) + 1
        x = (1103515245 * x + 12345) % (2**31)
        b = x % MINHASH_P
        coeffs.append((a, b))
    return coeffs


def shingle_hashes(text_col: Column, n: int = 3) -> Column:
    """Distinct char-n-gram shingles → portable 28-bit hashes.

    Hash = first 7 hex chars of md5, parsed as int — identical in
    DuckDB (`('0x' || substr(md5(s),1,7))::BIGINT`), so oracles can
    mirror signatures exactly.  28 bits keeps h*a below 2^59 so the
    minhash permutation (h*a + b) never overflows int64 in either
    engine (Spark would wrap silently; DuckDB throws).
    """
    grams = F.array_distinct(char_ngrams(text_col, n))
    return F.transform(
        grams, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
    )


def minhash_signature_from(hashes: Column, k: int = 32) -> Column:
    """k-wide MinHash signature from a (materialized) shingle-hash array.

    IMPORTANT: pass a *column reference*, not the shingle expression —
    the k permutations each embed their input subtree, so inlining the
    md5/shingle pipeline k times blows the plan up k-fold (Catalyst
    does not CSE across array lambdas).
    """

    def perm_min(a: int, b: int) -> Column:
        return F.array_min(F.transform(hashes, lambda h: (h * a + b) % MINHASH_P))

    return F.array(*[perm_min(a, b) for a, b in minhash_coeffs(k)])


def minhash_signature(text_col: Column, k: int = 32, n: int = 3) -> Column:
    """k-wide MinHash signature over char-n-gram shingles.

    Only for ad-hoc use on small data — materialize
    :func:`shingle_hashes` in a projection and use
    :func:`minhash_signature_from` in real plans (see
    :func:`minhash_lsh_pairs`)."""
    return minhash_signature_from(shingle_hashes(text_col, n), k)


def exploded_shingle_hashes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, h) rows of (non-distinct) shingle hashes — the fast path.

    Evaluation-order matters enormously here: the array-lambda form
    (``transform(sequence(...), i -> substring(normalize(text), i, n))``)
    re-evaluates the whole regexp normalization PER ELEMENT — Spark
    does not hoist loop-invariant subexpressions out of higher-order
    functions, so a 500-shingle doc pays 500 regexp passes.  Projecting
    the normalized text below the explode pins it to once per doc
    (expressions can't collapse across a Generate), and the md5 runs
    once per (doc, position) row.
    """
    normed = df.select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(text_col)).alias("__nt"),
    )
    pos = normed.select(
        "id",
        "__nt",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("__nt") - (n - 1), F.lit(1)))
        ).alias("__i"),
    )
    # distinct GRAMS (not distinct hashes): a 28-bit collision between
    # two different grams must contribute two list entries, exactly as
    # the array_distinct-before-hash form (and the DuckDB oracle) does
    grams = pos.select(
        "id", F.col("__nt").substr(F.col("__i"), F.lit(n)).alias("g")
    ).dropDuplicates(["id", "g"])
    return grams.select(
        "id",
        F.conv(F.substring(F.md5("g"), 1, 7), 16, 10).cast("long").alias("h"),
    )


def shingle_set_frame(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, sh array<long>) distinct shingle-hash sets — fully narrow.

    No explode, no shuffle: normalization is pinned to once per doc by
    projecting it below the array expression (a separate Project whose
    expensive regexp output is referenced more than once is not
    collapsed into the consumer, so it is never re-evaluated per
    element), dedup happens in the array domain (``array_distinct``),
    and the md5 runs once per distinct gram inside one array lambda.
    Callers needing parallelism should repartition the input first —
    a single parquet file otherwise pins the whole pipeline to one
    task.
    """
    normed = df.select(
        F.col(id_col).alias("id"),
        normalize_text(F.col(text_col)).alias("__nt"),
    )
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length("__nt") - (n - 1), F.lit(1))),
            lambda i: F.col("__nt").substr(i, F.lit(n)),
        )
    )
    return normed.select(
        "id",
        F.transform(
            grams, lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long")
        ).alias("sh"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    n: int = 3,
) -> DataFrame:
    """(id, sig array<long>, sh sorted distinct array<long>).

    Both stages are narrow (no shuffle); the k permutation minima are
    k O(|set|) array passes over longs (no md5, no regex) reading the
    materialized ``sh`` attribute.
    """
    sh = shingle_set_frame(df, id_col, text_col, n).select(
        "id", F.array_sort("sh").alias("sh")
    )
    return sh.select(
        "id", minhash_signature_from(F.col("sh"), k).alias("sig"), "sh"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    bitmap_dict_max: int = 4096,
    num_partitions: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    shingle→minhash→band→bucket-join→verify.  Returns (id_a, id_b,
    jaccard) with id_a < id_b and jaccard >= threshold, jaccard exact
    on the candidate pairs' shingle sets.

    Verify strategy (the per-pair cost is what dominates at scale —
    candidate pairs commonly outnumber docs 100-1000×):

    - **bitmap** (default when the corpus' distinct-shingle vocabulary
      fits ``bitmap_dict_max``): a first pass collects the global
      shingle dictionary (char-n-gram vocabularies are bounded — ~50k
      for 3-grams over [a-z0-9 ]); each doc's set becomes a fixed
      ``ceil(|dict|/64)``-word bitmap, and exact intersection is
      ``bit_count(a AND b)`` over flat long columns — pure whole-stage
      codegen, no per-pair hash sets, no array payloads on the pair
      stream.  ~100× cheaper per pair than ``array_intersect``.
    - **array** fallback (unbounded vocabularies, e.g. word n-grams):
      re-attach shingle arrays to surviving pairs and verify with
      ``array_intersect``; join strategy left to AQE (a broadcast
      would ship the whole corpus' sets — the old default, removed).

    The candidate join carries ONLY (band, bucket, id); no arrays ride
    the pair stream.  The operator is EAGER: it materializes the pair
    list via ``localCheckpoint`` and releases its cached intermediates
    before returning, so repeated calls don't leak executor memory
    into later queries.
    """
    spark = df.sparkSession
    rows_per_band = k // bands
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism * 2

    # (id, sh) narrow, persisted: every downstream consumer (dict
    # probe, signatures, bitmap build) reads the materialized arrays.
    # CRITICAL: explode must only ever run over this cached attribute —
    # a Generate whose child is the interpreted shingle expression
    # re-evaluates the whole normalize+md5 pipeline per OUTPUT row
    # (measured 10× slower).
    shd = shingle_set_frame(
        df.repartition(num_partitions), id_col, text_col, n
    ).persist()

    # Vocabulary probe: one tiny job.  Char-n-gram vocabularies are
    # bounded (≤ ~50k for 3-grams of normalized text), so the bitmap
    # plan is the common case; word-n-gram callers fall back.
    dict_rows = (
        shd.select(F.explode("sh").alias("h"))
        .distinct()
        .limit(bitmap_dict_max + 1)
        .collect()
    )
    bitmap = len(dict_rows) <= bitmap_dict_max

    coeffs = minhash_coeffs(k)

    def perm(a: int, b: int) -> Column:
        return F.array_min(F.transform(F.col("sh"), lambda h: (h * a + b) % MINHASH_P))

    # Flat signature columns (no array slicing downstream).
    sig_flat = shd.select(
        "id", *[perm(a, b).alias(f"s{i}") for i, (a, b) in enumerate(coeffs)]
    )

    # LSH banding; the candidate join carries ONLY (band, bucket, id) —
    # no arrays on the pair stream.
    band_keys = [
        F.hash(*[F.col(f"s{b * rows_per_band + j}") for j in range(rows_per_band)])
        for b in range(bands)
    ]
    band_entries = sig_flat.select(
        "id", F.posexplode(F.array(*band_keys)).alias("band", "bucket")
    )
    a = band_entries.select("band", "bucket", F.col("id").alias("id_a"))
    b = band_entries.select("band", "bucket", F.col("id").alias("id_b"))
    raw_pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )

    if bitmap:
        # Dictionary-encoded bitmap sets: each doc's shingle set is
        # ceil(|dict|/64) longs, and exact intersection is
        # bit_count(a AND b) over flat columns — whole-stage codegen,
        # ~100× cheaper per pair than array_intersect.  Because verify
        # is that cheap, band-duplicate pairs flow straight through it
        # and pairs are deduped AFTER the threshold filter, saving a
        # full shuffle of the (much larger) raw candidate stream.
        dict_vals = sorted(r.h for r in dict_rows)
        n_words = max(1, (len(dict_vals) + 63) // 64)

        def _bit(i: int) -> int:
            v = 1 << (i % 64)
            return v - (1 << 64) if v >= (1 << 63) else v  # two's complement

        dic = F.broadcast(
            spark.createDataFrame(
                [(h, i // 64, _bit(i)) for i, h in enumerate(dict_vals)],
                "h long, word int, bit long",
            )
        )
        bm = (
            shd.select("id", F.explode("sh").alias("h"))
            .join(dic, "h")
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).alias("sz"),
                *[
                    F.bit_or(
                        F.when(F.col("word") == w, F.col("bit")).otherwise(
                            F.lit(0).cast("long")
                        )
                    ).alias(f"w{w}")
                    for w in range(n_words)
                ],
            )
            .persist()
        )
        ba = bm.select(
            F.col("id").alias("id_a"),
            F.col("sz").alias("sz_a"),
            *[F.col(f"w{w}").alias(f"aw{w}") for w in range(n_words)],
        )
        bb = bm.select(
            F.col("id").alias("id_b"),
            F.col("sz").alias("sz_b"),
            *[F.col(f"w{w}").alias(f"bw{w}") for w in range(n_words)],
        )
        inter = sum(
            F.bit_count(F.col(f"aw{w}").bitwiseAND(F.col(f"bw{w}")))
            for w in range(n_words)
        )
        out = (
            raw_pairs.join(ba, "id_a")
            .join(bb, "id_b")
            .withColumn("__i", inter)
            .select(
                "id_a",
                "id_b",
                F.round(
                    F.col("__i").cast("double")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("__i")),
                    6,
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= jaccard_threshold)
            .dropDuplicates(["id_a", "id_b"])
        )
        # Materialize eagerly so the cached intermediates can be
        # released NOW instead of leaking into later queries (the
        # result is small — the pair list — while shd/bm hold the
        # corpus' arrays).  localCheckpoint also truncates the lineage,
        # so downstream re-use never re-runs the band join.
        out = out.localCheckpoint(eager=True)
        bm.unpersist()
        shd.unpersist()
        return out

    # Fallback: unbounded vocabulary — dedup candidates BEFORE the
    # (expensive) array verify, and repartition explicitly: AQE would
    # coalesce the byte-small pair stream to a few partitions and
    # serialize a verify that is CPU-bound per row, not byte-bound.
    # Join strategy left to AQE (no broadcast hint: that would ship
    # the whole corpus' sets).
    cands = raw_pairs.dropDuplicates(["id_a", "id_b"]).repartition(
        num_partitions, "id_a", "id_b"
    )
    sh_a = shd.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = shd.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
    )
    out = out.localCheckpoint(eager=True)
    shd.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via shingle inverted index.

    explode(shingles) → self-join on shingle → count pairs.  Exact (no
    LSH miss) but O(sum of bucket²); ``max_doc_freq`` drops shingles
    appearing in more than that many docs (skew guard — a ubiquitous
    shingle otherwise creates a quadratic bucket).
    """
    # distinct hash values per doc (array_distinct-on-hashes parity)
    sh = (
        exploded_shingle_hashes(df, id_col, text_col, n)
        .dropDuplicates(["id", "h"])
        .withColumnRenamed("h", "s")
    )
    if max_doc_freq is not None:
        freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df_"))
        sh = sh.join(F.broadcast(freq.where(F.col("df_") <= max_doc_freq)), "s").drop("df_")

    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("s"), F.col("id").alias("id_a"))
    b = sh.select(F.col("s"), F.col("id").alias("id_b"))
    inter = (
        a.join(b, "s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def simhash64_from(th: Column) -> Column:
    """64-bit SimHash from a (materialized) token-hash array column.

    For each bit position, sum +1/-1 over token hashes' bits; bit set
    where the sum is positive.  Built from bit ops, fully codegen'd.
    Same plan-blowup caveat as :func:`minhash_signature_from`: pass a
    column reference, the 64 bit-votes each embed their input subtree.
    """

    def bit_vote(i: int) -> Column:
        # sum over tokens of (bit_i ? 1 : -1), sign → bit
        mask = F.shiftleft(F.lit(1).cast("long"), i)
        votes = F.aggregate(
            th,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )
        return F.when(votes > 0, mask).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for i in range(64):
        out = out.bitwiseOR(bit_vote(i))
    return out


def token_hashes(text_col: Column) -> Column:
    """xxhash64 of each distinct whitespace token (simhash input)."""
    toks = F.array_distinct(F.split(normalize_text(text_col), " "))
    return F.transform(toks, lambda t: F.xxhash64(t))


def simhash64(text_col: Column) -> Column:
    """64-bit SimHash of a text column (ad-hoc form; see
    :func:`simhash64_from` for the two-step plan used at scale)."""
    return simhash64_from(token_hashes(text_col))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= max_hamming.

    Pigeonhole blocking: split the 64-bit hash into ``blocks`` chunks;
    any pair within distance d < blocks shares at least one exact
    chunk, so join on (block_idx, chunk) finds all such pairs without
    the cross join; verify with bit_count(xor).
    """
    width = 64 // blocks
    sigs = df.select(
        F.col(id_col).alias("id"), token_hashes(F.col(text_col)).alias("th")
    ).select("id", simhash64_from(F.col("th")).alias("sig"))
    mask = (1 << width) - 1
    chunks = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("sig", i * width).bitwiseAND(F.lit(mask).cast("long"))
                    for i in range(blocks)
                ]
            )
        ).alias("blk", "chunk"),
    )
    a = chunks.select("blk", "chunk", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = chunks.select("blk", "chunk", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        a.join(b, ["blk", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on normalized-text fingerprint: keeps min id per
    group, marks the rest as duplicates."""
    from cdc_redshift_spark.functions.text import fingerprint

    fp = df.select(F.col(id_col).alias("id"), fingerprint(F.col(text_col)).alias("fp"))
    canon = fp.groupBy("fp").agg(F.min("id").alias("canonical_id"), F.count(F.lit(1)).alias("group_size"))
    return fp.join(canon, "fp").select(
        "id",
        "fp",
        "canonical_id",
        "group_size",
        (F.col("id") != F.col("canonical_id")).cast("int").alias("is_duplicate"),
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-dup pairs: cosine >= threshold.

    Brute-force O(N²) baseline with JVM-side dot products (zip_with +
    aggregate).  The scale path buckets by random-hyperplane LSH first
    (see operators/similarity.py) so only bucket-local pairs are
    scored.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x)),
    )
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
