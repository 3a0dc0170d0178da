"""Streaming NEAR-dup marking: MinHash-LSH band keys held in stream state.

``stream_dedup.py`` drops exact re-arrivals (fingerprint equality). This
module marks *near*-duplicates across micro-batches: each arriving document
emits its LSH band keys, band keys claim a first-owner in the state store,
and any later document colliding on a claimed band key within the watermark
produces a marking row (doc_id, matched_doc_id, band_id). Novel documents
produce no rows — consumers anti-join the marking stream (or verify marked
pairs with exact Jaccard inside the micro-batch, where both texts are at
hand).

DESIGN NOTE — approximate semantics (what banding does and does not give):

- This is NOT exact near-dup dedup. A banded collision is a *candidate*
  marking. For a pair with true shingle-Jaccard ``s``, the probability at
  least one of ``b`` bands of ``r`` rows collides is ``1 - (1 - s^r)^b``
  (classic LSH S-curve) — with the defaults (b=4, r=2): s=0.9 → 0.989,
  s=0.7 → 0.93, s=0.5 → 0.68, s=0.2 → 0.15. Recall against genuinely
  near-identical docs is high but not 1; dissimilar pairs are marked at
  rate ≈ b·s^r (precision is bounded by verification, not by banding).
- Recall additionally DECAYS with lateness: a near-dup arriving more than
  ``watermark`` after the original's last collision finds the band state
  evicted and is marked novel — the same watermark contract as
  ``stream_dedup`` (the batch reconciliation pass owns the long tail).
- Marking rows are PER BAND: one near pair colliding in k bands yields k
  rows (different bands are different state groups and cannot coordinate).
  Consumers dedupe with ``dropDuplicates(["doc_id", "matched_doc_id"])``
  per sink batch.
- ``matched_doc_id`` is the band key's FIRST claimant within the live
  state window, not necessarily the transitively-minimal cluster member —
  cluster closure stays a batch concern (operators/cluster.py).

Scale: the signature is computed PER ROW (array_min over the shingle
array) instead of the batch path's explode+groupBy — streaming append mode
forbids a non-windowed aggregation before a stateful operator, and per-row
keeps the plan stateless up to the single keyed shuffle on (band_id,
band_key). State is one (first_id, epoch) pair per live band key: O(b ×
distinct docs per watermark window), evicted by event-time timeout.

Reference seed: the reference has no streaming and no near-dup at all
(SURVEY.md §2.9); band-key construction mirrors
operators/dedup.minhash_lsh_candidates so streamed markings and batch
candidates agree on what "near" means (same md5 band keys).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_profiler_spark.functions.hashing import portable_min_shingle_hash
from data_profiler_spark.functions.text import tokens, word_shingles_of

OUT_SCHEMA = (
    "doc_id string, matched_doc_id string, band_id int, band_key string, "
    "event_time timestamp"
)
STATE_SCHEMA = "first_id string, first_epoch_ms long"

_UNIT_MS = {
    "millisecond": 1, "milliseconds": 1,
    "second": 1000, "seconds": 1000,
    "minute": 60_000, "minutes": 60_000,
    "hour": 3_600_000, "hours": 3_600_000,
    "day": 86_400_000, "days": 86_400_000,
}


def _interval_ms(interval: str) -> int:
    parts = interval.strip().lower().split()
    if len(parts) != 2 or parts[1] not in _UNIT_MS:
        raise ValueError(f"unsupported interval {interval!r} (want e.g. '10 minutes')")
    return int(float(parts[0]) * _UNIT_MS[parts[1]])


def band_keys_per_row(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time_col: str = "event_time",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """(doc_id, event_time, band_id, band_key), one row per band per doc.

    Signature via array_min over the shingle array — per-row, no
    aggregation, so it composes into append-mode streaming plans. Band keys
    are bit-identical to operators/dedup.minhash_lsh_candidates (md5 of the
    concatenated hex min-hashes). The shingle array is materialized behind
    a projection boundary (Catalyst re-inlines referenced subtrees per use
    site — num_hashes transforms over a re-inlined tokenizer would
    re-tokenize per hash). Docs with fewer than ``shingle_k`` tokens have
    no shingles and are dropped, matching the batch path (no signature row
    from an empty explode).
    """
    # doc_id cast to string up front: OUT_SCHEMA declares string, and the
    # stateful function compares incoming ids against state-held strings —
    # an uncast long id would never equal its own stored claim and
    # self-mark. tokens() materialized behind its own projection boundary
    # per word_shingles_of's contract (inlined, the tokenizer re-evaluates
    # once per shingle index — measured 12x).
    toks_df = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(event_time_col).alias("event_time"),
        tokens(text_col).alias("__toks"),
    )
    shingled = toks_df.select(
        "doc_id",
        "event_time",
        F.array_distinct(word_shingles_of(F.col("__toks"), shingle_k)).alias("__sh"),
    ).filter(F.size("__sh") > 0)

    def _hash_at(seed: int):
        # MUST be a one-parameter lambda: F.transform treats a two-parameter
        # callable (e.g. ``lambda s, seed=seed:``) as the (element, index)
        # variant, silently binding the second name to the array-index
        # column — the hash prefix then embeds a Column repr and the band
        # keys become plan-context-dependent garbage.
        return lambda s: portable_min_shingle_hash(s, seed)

    sig = shingled.select(
        "doc_id",
        "event_time",
        *[
            F.array_min(F.transform("__sh", _hash_at(seed))).alias(f"h{seed}")
            for seed in range(num_hashes)
        ],
    )
    n_bands = num_hashes // rows_per_band
    band_rows = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return sig.select("doc_id", "event_time", F.explode(F.array(*band_rows)).alias("band")).select(
        "doc_id",
        "event_time",
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_key").alias("band_key"),
    )


def _make_mark_fn(watermark_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        band_id, band_key = key
        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts).sort_values(["event_time", "doc_id"])
        first_id, first_epoch = state.get if state.exists else (None, None)
        out: list[dict] = []
        max_ep = int(first_epoch or 0)
        for r in batch.itertuples(index=False):
            ep = int(pd.Timestamp(r.event_time).value // 1_000_000)  # ns → ms
            if first_id is None:
                first_id, first_epoch = str(r.doc_id), ep
            elif r.doc_id != first_id:
                out.append(
                    {
                        "doc_id": r.doc_id,
                        "matched_doc_id": first_id,
                        "band_id": band_id,
                        "band_key": band_key,
                        "event_time": r.event_time,
                    }
                )
            max_ep = max(max_ep, ep)
        state.update((first_id, int(first_epoch)))
        # evict once the watermark passes the last collision + the window
        state.setTimeoutTimestamp(max_ep + watermark_ms)
        if out:
            yield pd.DataFrame(out, columns=[
                "doc_id", "matched_doc_id", "band_id", "band_key", "event_time"
            ])

    return fn


def verify_markings(
    markings: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of marking rows — the precision half the
    module design note promises. Batch-side (call it inside foreachBatch,
    where the micro-batch holds the marked docs' texts, or at reconcile
    time against the corpus table): marked pairs are deduped across bands
    and verified through the SAME candidate-bounded pipeline the batch
    dedup uses (``dedup.lsh_verified_near_dups(candidates=...)``), so a
    banded false positive never survives to a drop decision. Returns one
    row per verified UNORDERED pair (id_a = least id, id_b = greatest,
    jaccard) at or above ``threshold``; the boundary is inclusive
    (jaccard == threshold verifies), inherited from
    ``dedup.lsh_verified_near_dups`` so streaming and batch drop decisions
    can never diverge on the boundary.

    ``docs`` must contain both sides' texts; its id column is cast to
    string to match the marking stream's contract.

    Pairs are canonicalized UNORDERED (id_a = least, id_b = greatest)
    before the distinct: band-key ownership can flip after a state
    eviction, so the marking stream may contain both (A, B) and (B, A)
    for one real pair — without canonicalization they would verify as two
    rows. Jaccard is symmetric, so the orientation carries no information.
    """
    from data_profiler_spark.operators import dedup

    pairs = markings.select(
        F.least("doc_id", "matched_doc_id").alias("id_a"),
        F.greatest("doc_id", "matched_doc_id").alias("id_b"),
    ).distinct()
    d = docs.select(
        F.col(id_col).cast("string").alias(id_col), F.col(text_col).alias(text_col)
    )
    return dedup.lsh_verified_near_dups(
        d, id_col, text_col, shingle_k=shingle_k, threshold=threshold, candidates=pairs
    )


def mark_near_dups_stream(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Append-mode stream of near-dup MARKING rows (see module design note).

    One keyed shuffle per micro-batch on (band_id, band_key); state evicted
    by event-time timeout at last-collision + watermark.
    """
    bands = band_keys_per_row(
        stream, id_col, text_col, event_time_col, num_hashes, rows_per_band, shingle_k
    ).withWatermark("event_time", watermark)
    return bands.groupBy("band_id", "band_key").applyInPandasWithState(
        _make_mark_fn(_interval_ms(watermark)),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
