"""Document deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

The reference has only the *seed* of dedup — group-by-first header
extraction (/root/reference/data_profiler/helpers/data_directory.py:419-440)
and `.unique()` universes (data_directory.py:220-290). At training-data
scale dedup is a first-class operator family, so each variant here is a pure
DataFrame pipeline designed around its shuffle:

- exact: one groupBy on a 128-bit fingerprint — map-side combinable,
  AQE-coalesced; the canonical-id window never materializes full text.
- MinHash LSH: shingle explode → per-(doc, band) signature agg →
  self-equi-join on (band_id, band_key). The join key includes the band id,
  so all B bands ride ONE shuffle instead of B.
- SimHash: explode tokens × bit positions, two chained aggs; pairs via a
  pigeonhole-banded equi-join (max_hamming+1 chunks → guaranteed recall
  within the radius), never a cross join.
- n-gram Jaccard: distinct-shingle explode, self-join on shingle, one
  groupBy per pair — exact Jaccard for verification / small-candidate sets;
  LSH is the scale path and Jaccard the refinement on its candidates
  (``lsh_verified_near_dups`` is that composition, candidate-bounded).

All fingerprints use engine-portable md5 hashing (functions/hashing.py) so
every variant is oracle-verifiable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_spark.functions.hashing import portable_hash64, portable_min_shingle_hash
from data_profiler_spark.functions.text import normalize_text, tokens, word_shingles_of


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint, canonical_id, is_dup): md5-of-normalized-text
    grouping; canonical = min id per fingerprint.

    Scale: only (id, fingerprint) crosses the shuffle — text is pruned
    before the exchange. Equivalent SQL: min(id) OVER (PARTITION BY fp).
    """
    fp = df.select(
        F.col(id_col).alias("id"),
        F.md5(normalize_text(text_col)).alias("fingerprint"),
    )
    # agg + equi-join rather than min() OVER (PARTITION BY fingerprint):
    # a window partition IS a task, so a pathological 10^9-copy duplicate
    # cluster (common in web crawls) would funnel through one task — while
    # the join formulation is map-side-combinable on the agg side and AQE
    # skew-splits the join's hot fingerprint partitions.
    canon = fp.groupBy("fingerprint").agg(F.min("id").alias("canonical_id"))
    return (
        fp.join(canon, "fingerprint")
        .withColumn("is_dup", (F.col("id") != F.col("canonical_id")).cast("int"))
        .select("id", "fingerprint", "canonical_id", "is_dup")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: one row per doc, columns h0..h{n-1}.

    One explode + one groupBy: all hash functions are independent ``min``
    aggregates over the same exploded shingle set (map-side combinable), so
    signature width never adds shuffles.
    """
    # tokens materialized behind a projection boundary — see
    # functions/text.py::word_shingles_of (12x: the tokenizer must not be
    # re-inlined into the per-shingle transform loop).
    toks = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("__toks"))
    shingled = toks.select(
        "id",
        F.explode(F.array_distinct(word_shingles_of(F.col("__toks"), shingle_k))).alias("shingle"),
    )
    aggs = [
        F.min(portable_min_shingle_hash(F.col("shingle"), seed)).alias(f"h{seed}")
        for seed in range(num_hashes)
    ]
    return shingled.groupBy("id").agg(*aggs)


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band_id, band_key): every doc's LSH band keys, one row per band.

    bands = num_hashes / rows_per_band; band_key = md5 of the band's
    concatenated min-hashes. Exposed separately from the candidate join so
    callers that need bucket-level metrics (the dedup job's skipped-bucket
    report) compute them from ONE banded frame instead of signing twice.
    """
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    n_bands = num_hashes // rows_per_band
    band_rows = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_rows.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("", *cols)).alias("band_key"))
        )
    return sig.select("id", F.explode(F.array(*band_rows)).alias("band")).select(
        "id", F.col("band.band_id").alias("band_id"), F.col("band.band_key").alias("band_key")
    )


def band_bucket_sizes(banded: DataFrame) -> DataFrame:
    """(band_id, band_key, bucket_n): membership count per band bucket —
    map-side-combinable agg on the same key the candidate self-join uses."""
    return banded.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )


def candidates_from_bands(
    banded: DataFrame,
    max_bucket_size: int | None = None,
    bucket_sizes: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) from a ``minhash_bands`` frame.

    ``max_bucket_size``: the standard LSH scale guard — a band bucket with
    more than this many members contributes NO pairs (a bucket of n docs
    fans out n·(n-1)/2 candidates, so one low-entropy band key — boilerplate
    headers, empty-ish docs — can dominate the whole join quadratically).
    Skipped buckets are a disclosed recall loss: report them via
    ``band_bucket_sizes(banded).filter(bucket_n > cap)`` (the dedup job
    does). A pair whose docs also collide in a small bucket is still found —
    only pairs confined to oversize buckets are lost.

    The size filter joins on the same (band_id, band_key) the self-join
    uses, so it co-partitions with the join it guards; no extra shuffle of
    the banded frame. Callers that ALSO report skip metrics should compute
    ``band_bucket_sizes(banded)`` once, persist it, and pass it via
    ``bucket_sizes`` — otherwise the aggregation over the job's largest
    intermediate runs twice (once here, once for the metrics).
    """
    if bucket_sizes is not None and max_bucket_size is None:
        raise ValueError(
            "candidates_from_bands: bucket_sizes passed without "
            "max_bucket_size — the frame would be silently ignored"
        )
    if max_bucket_size is not None:
        sizes = bucket_sizes if bucket_sizes is not None else band_bucket_sizes(banded)
        ok = sizes.filter(F.col("bucket_n") <= max_bucket_size).select(
            "band_id", "band_key"
        )
        banded = banded.join(ok, ["band_id", "band_key"])
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(right, ["band_id", "band_key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >=1 LSH band.

    The self-join is an equi-join on (band_id, band_key) — co-partitioned
    by construction, skew-safe under AQE because genuinely hot band keys
    are exactly the near-dup clusters we want. ``max_bucket_size`` caps the
    quadratic per-bucket fan-out (see ``candidates_from_bands``); default
    None preserves exact candidate semantics for oracle verification.
    """
    return candidates_from_bands(
        minhash_bands(df, id_col, text_col, num_hashes, rows_per_band, shingle_k),
        max_bucket_size=max_bucket_size,
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash): per-token portable hash, ±1 vote per bit position,
    sign of the vote sum becomes the bit.

    Two chained aggregations: (doc, bit) votes → doc fingerprint. The first
    groupBy is map-side combinable over the token explode; bit fan-out rides
    the same explode (array of bit structs), not a second shuffle.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    # materialize the md5-based hash ONCE per token: referencing the hash
    # expression in all `bits` structs would re-inline (and re-evaluate)
    # the md5 per bit position (functions/text.py boundary note).
    hashed = toks.select("id", portable_hash64(F.col("tok")).alias("__h"))
    h = F.col("__h")
    # Literal per-bit structs: shift amounts must be literals for
    # whole-stage-codegen shiftright, and bits<=64 keeps this tiny.
    entries = [
        F.struct(
            F.lit(b).alias("bit"),
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("vote"),
        )
        for b in range(bits)
    ]
    bit_votes = hashed.select("id", F.explode(F.array(*entries)).alias("bv")).select(
        "id", F.col("bv.bit").alias("bit"), F.col("bv.vote").alias("vote")
    )
    votes = bit_votes.groupBy("id", "bit").agg(F.sum("vote").alias("s"))
    return votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2.0), F.col("bit"))).otherwise(F.lit(0.0))
        )
        .cast("long")
        .alias("simhash")
    )


def simhash_band_chunks(bits: int, max_hamming: int) -> list[tuple[int, int, int]]:
    """Pigeonhole band layout: (band_id, shift, mask) for max_hamming+1
    contiguous chunks covering ``bits``. A pair at hamming ≤ max_hamming has
    at most max_hamming differing bits spread over max_hamming+1 chunks, so
    ≥1 chunk is bit-identical — the equi-join on (band_id, chunk value) is
    guaranteed to produce every qualifying pair (100% recall), unlike a
    2-way split which only guarantees hamming ≤ 1."""
    nb = max_hamming + 1
    if nb > bits:
        raise ValueError(f"need bits >= max_hamming+1 chunks ({nb} > {bits})")
    base, rem = divmod(bits, nb)
    chunks = []
    shift = 0
    for i in range(nb):
        width = base + (1 if i < rem else 0)
        chunks.append((i, shift, (1 << width) - 1))
        shift += width
    return chunks


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 2, bits: int = 16) -> DataFrame:
    """Pairs (id_a, id_b, hamming) with hamming(simhash) <= max_hamming.

    Banded into max_hamming+1 chunks (``simhash_band_chunks``): pigeonhole
    guarantees every qualifying pair collides in at least one band, so the
    candidate join is a single equi-join on (band_id, band_key) — all bands
    ride ONE explode and ONE shuffle, never a cross join. Candidates are
    verified by exact popcount on the full fingerprint, then de-duplicated
    (a pair can agree on several bands)."""
    chunks = simhash_band_chunks(bits, max_hamming)
    entries = [
        F.struct(
            F.lit(i).alias("band_id"),
            F.shiftright(F.col("simhash"), s).bitwiseAND(F.lit(m)).alias("band_key"),
        )
        for i, s, m in chunks
    ]
    banded = sim.select(
        "id", "simhash", F.explode(F.array(*entries)).alias("b")
    ).select(
        "id",
        "simhash",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_key").alias("band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over distinct word-k-shingles for all pairs sharing at
    least one shingle. (id_a, id_b, jaccard rounded to 6dp.)

    At scale this runs on LSH candidates, not the full corpus: the
    shingle-join fan-out is quadratic in per-shingle document frequency, so
    `minhash_lsh_candidates` prunes first and this verifies.

    The shingle-set SIZE rides each exploded row (``size(array_distinct(…))``
    is known before the explode, so it costs nothing) and survives the pair
    groupBy as a grouping key — id functionally determines it. The
    alternative (a separate per-id sizes aggregate joined back onto the
    pairs, twice) re-derives the shingle frame twice more: two extra input
    scans and two extra joins for numbers the rows already carry.
    """
    sh = _shingle_rows(df, id_col, text_col, shingle_k)
    a = sh.alias("a")
    b = sh.alias("b")
    return (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _shingle_rows(
    df: DataFrame, id_col: str, text_col: str, shingle_k: int
) -> DataFrame:
    """(id, n, shingle) rows: one row per distinct word-k-shingle, with the
    document's distinct-shingle count carried on every row (free — computed
    on the array before the explode). Docs with no shingles vanish, exactly
    as the explode always made them."""
    return df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(word_shingles_of(tokens(text_col), shingle_k)).alias("__sh"),
    ).select(
        "id",
        F.size("__sh").alias("n"),
        F.explode("__sh").alias("shingle"),
    )


def lsh_verified_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """The production dedup composition: MinHash-LSH candidate generation
    prunes the pair space (bucketed equi-join, one shuffle for all bands),
    then exact n-gram Jaccard verifies ONLY those candidates — the
    shingle-join fan-out is bounded by |candidates| x shingles-per-doc, never
    corpus-quadratic (the scale contract ``ngram_jaccard_pairs``' docstring
    promises; this function IS that promised pipeline).

    ``candidates``: pass a precomputed/persisted (id_a, id_b) candidate
    frame to skip the internal generation — callers that need the candidate
    count as a metric (the dedup job's per-phase report) compute it once
    and hand it in instead of signing the corpus twice.

    (id_a < id_b, jaccard rounded 6dp) for candidate pairs at or above
    ``threshold``.
    """
    cand = candidates if candidates is not None else minhash_lsh_candidates(
        df, id_col, text_col, num_hashes=num_hashes,
        rows_per_band=rows_per_band, shingle_k=shingle_k,
    )
    sh = _shingle_rows(df, id_col, text_col, shingle_k)
    a = sh.select(F.col("id").alias("id_a"), F.col("n").alias("na"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), F.col("n").alias("nb"), "shingle")
    return (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
