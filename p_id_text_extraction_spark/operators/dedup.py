"""Deduplication operators for training-data pipelines.

Four tiers, scale-ordered:
  exact            -- hash groupBy, one shuffle, works at any scale
  ngram_jaccard    -- inverted-index shingle join (the scalable exact-overlap
                      pattern: no O(n^2) cross join; frequency-capped posting
                      lists bound the blowup)
  minhash_lsh      -- banded MinHash: near-dup candidates meet in band
                      buckets; only bucket-mates compare
  simhash          -- 64-bit sign-hash; hamming-ball lookup via band keys

All hashing uses xxhash64 (seed-stable, JVM-side).  exact and
ngram_jaccard have DuckDB oracle mirrors; the two sketches are
Spark-specific (xxhash64 has no DuckDB twin) and are covered by
property tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_text() -> F.Column:
    return F.trim(F.regexp_replace(F.lower("text"), " +", " "))


def _spread(docs: DataFrame) -> DataFrame:
    """Decouple tokenization parallelism from file splits: a small input
    (one parquet file -> one partition) would otherwise run the whole
    shingle subtree single-threaded -- and AQE's broadcast builds execute
    that subtree serially once per broadcast.  The repartition is tiny
    relative to the n-gram work it parallelizes."""
    return docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5 fingerprint; keeps the min doc_id as
    canonical.  One hash-aggregate shuffle; at 100 TB this is the cheapest
    first pass (drops byte-identical crawl copies before anything fuzzy)."""
    fp = docs.select("doc_id", F.md5(_norm_text()).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
    )


def gram_arrays(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram sets as one array per doc: (doc_id, grams)."""
    toks = _spread(docs).select("doc_id", F.split(_norm_text(), " ").alias("toks"))
    # n-gram via transform over 1-based start indices; guard short docs --
    # Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty
    return toks.select(
        "doc_id",
        F.array_distinct(
            F.when(
                F.size("toks") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("grams"),
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Word n-gram shingle sets, one row per distinct (doc_id, shingle)."""
    return gram_arrays(docs, n).select("doc_id", F.explode("grams").alias("shingle"))


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, min_jaccard_milli: int = 100,
                        max_posting: int = 1000) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard, inverted-index style.

    plan: shingle -> self-join on shingle (posting lists capped at
    ``max_posting`` to bound hot shingles -- the skew guard), count common
    shingles per pair, join per-doc set sizes, Jaccard in milli-units.
    Emits (doc_a, doc_b, jaccard_milli) with doc_a < doc_b.
    """
    # PERSIST the gram arrays: the subtree feeds four consumers (sizes,
    # document frequencies, both self-join sides) and -- measured -- Spark
    # re-evaluates an inlined higher-order generator child per OUTPUT
    # element (9s vs 0.2s for this explode at sf0.1).  Materializing the
    # shingle intermediate is also what a production multi-pass dedup does.
    grams = gram_arrays(docs, n).persist()
    sh = grams.select("doc_id", F.explode("grams").alias("shingle"))
    # set sizes from the pre-explode arrays: no second explode+groupBy
    # over every shingle row
    sizes = grams.select("doc_id", F.size("grams").alias("set_size")).filter(F.col("set_size") > 0)

    # frequency cap: a shingle appearing in >max_posting docs is a stopword
    # shingle -- it produces O(k^2) pairs and no discriminative signal
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= max_posting)
    sh_capped = sh.join(freq.select("shingle"), "shingle")

    a = sh_capped.alias("a")
    b = sh_capped.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.floor(
                F.lit(1000) * F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common"))
            ).cast("int").alias("jaccard_milli"),
        )
        .filter(F.col("jaccard_milli") >= min_jaccard_milli)
    )


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = 32) -> DataFrame:
    """MinHash signatures: num_hashes permutations h_i(x) = xxhash64(x, seed=i)
    folded with min().  Returns (doc_id, sig array<bigint>)."""
    sh = gram_arrays(docs, n).persist().select("doc_id", F.explode("grams").alias("shingle"))
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, num_hashes: int = 32,
                      bands: int = 8) -> DataFrame:
    """Banded-LSH candidate pairs: split the signature into ``bands`` rows
    of num_hashes/bands, hash each band, docs sharing any band bucket are
    candidates.  Candidates are then verified with the estimated Jaccard
    (matching signature positions / num_hashes) -- the scale path: only
    bucket-mates ever meet, no all-pairs comparison."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes)
    banded = sig.select(
        "doc_id", "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bidx: F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice("sig", bidx * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ))
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m))
    return cand.select(
        "doc_a", "doc_b",
        F.floor(F.lit(1000) * est / F.lit(num_hashes)).cast("int").alias("est_jaccard_milli"),
    )


def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens: per token xxhash64, sum of bit
    votes, sign -> fingerprint bits.  Pure aggregate composition."""
    toks = _spread(docs).select("doc_id", F.explode(F.split(_norm_text(), " ")).alias("tok"))
    h = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select("doc_id", sig.alias("simhash"))


def embedding_cosine_dups(embeddings: DataFrame, min_cos_milli: int = 950,
                          max_pairs_side: int = 10000) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold.

    Brute-force block here (fine to ~10^4 vectors per group); the 100 TB
    path buckets by LSH sign-bits first (see similarity.lsh_ann) so each
    bucket is small enough for this kernel.
    """
    e = embeddings.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    norm = e.select(
        "vec_id", "v",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)).alias("nrm"),
    )
    a, b = norm.alias("a"), norm.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
            F.floor(F.lit(1000) * dot / (F.col("a.nrm") * F.col("b.nrm"))).cast("int").alias("cos_milli"),
        )
        .filter(F.col("cos_milli") >= min_cos_milli)
    )
