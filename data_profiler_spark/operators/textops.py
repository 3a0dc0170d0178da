"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (regex + array functions), whole-stage-codegen
eligible, and engine-portable — every operator here has a line-for-line SQL
oracle in the corpus. The reference's text surface stops at a regex scrub
(transform_service.py:279-283); these extend the same columnar style to
document analytics.

Each operator is an expression-list builder over one shared base projection
(id, __norm, __toks), so :func:`text_features` can emit ALL per-doc features
in a single pass over the corpus — at 100 TB the difference between one scan
and four.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_profiler_spark.functions.text import normalize_text, tokens

# Tiny stopword marker sets per language — a deterministic n-gram/stopword
# heuristic, not a model. Order matters: ties resolve to the earlier entry.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# BPE-ish lexer: word pieces, digit runs, single non-space symbols.
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _base(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shared projection boundary: normalizer/tokenizer materialized ONCE.
    Referencing them inside downstream array lambdas would re-inline the
    regex per element (functions/text.py note); unused aliases are pruned
    by Catalyst, so ops that need only one of the two pay for one."""
    return df.select(
        F.col(id_col).alias("id"),
        normalize_text(text_col).alias("__norm"),
        tokens(text_col).alias("__toks"),
    )


def _marker_score(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def _lang_cols() -> list[Column]:
    """(lang_pred, score): argmax of per-language stopword hit counts over
    __toks, 'und' when no marker hits. Deterministic tie-break by
    LANG_MARKERS order via strict > comparison against earlier languages."""
    toks = F.col("__toks")
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, markers in LANG_MARKERS.items():
        s = _marker_score(toks, markers)
        take = s > best_score
        best = F.when(take, F.lit(lang)).otherwise(best)
        best_score = F.when(take, s).otherwise(best_score)
    return [best.alias("lang_pred"), best_score.cast("int").alias("score")]


def _quality_cols() -> list[Column]:
    """Per-doc quality features over (__norm, __toks): token count, mean
    token length, stopword ratio, punctuation ratio, alpha ratio, and a
    blended [0,1] score. Mirrors the Describer's conditional-count style
    (data_profiler.py:541-562) applied to text: every feature is one
    expression over the same row — no shuffle at all."""
    norm = F.col("__norm")
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_chars = F.length(norm)
    sw = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_punct = n_chars - F.length(F.regexp_replace(norm, r"[^\w\s]", ""))
    n_alpha = n_chars - F.length(F.regexp_replace(norm, r"[a-z]", ""))
    mean_tok_len = (n_chars - (n_tok - 1)) / F.nullif(n_tok.cast("double"), F.lit(0.0))
    stop_ratio = n_stop / F.nullif(n_tok.cast("double"), F.lit(0.0))
    punct_ratio = n_punct / F.nullif(n_chars.cast("double"), F.lit(0.0))
    alpha_ratio = n_alpha / F.nullif(n_chars.cast("double"), F.lit(0.0))
    # Blend: long-enough, alphabetic, some stopwords, light punctuation.
    score = (
        F.least(n_tok / F.lit(20.0), F.lit(1.0)) * 0.25
        + F.coalesce(alpha_ratio, F.lit(0.0)) * 0.35
        + F.least(F.coalesce(stop_ratio, F.lit(0.0)) * F.lit(4.0), F.lit(1.0)) * 0.25
        + (F.lit(1.0) - F.least(F.coalesce(punct_ratio, F.lit(0.0)) * F.lit(5.0), F.lit(1.0))) * 0.15
    )
    return [
        n_tok.cast("int").alias("n_tokens"),
        n_chars.cast("int").alias("n_chars_norm"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality_score"),
    ]


def _token_count_cols() -> list[Column]:
    """(ws_tokens, bpe_tokens): whitespace tokens and BPE-ish lexer tokens
    (TOKEN_PATTERN matches over normalized text)."""
    return [
        F.size(F.col("__toks")).cast("int").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("__norm"), F.lit(TOKEN_PATTERN), 0))
        .cast("int")
        .alias("bpe_tokens"),
    ]


def _fingerprint_col(window: int, stride: int) -> Column:
    """Winnowing-style fingerprint: min md5 over strided character windows
    of __norm. Robust to local edits outside the minimal window, unlike a
    whole-doc hash."""
    norm = F.col("__norm")
    ln = F.length(norm)
    starts = F.sequence(
        F.lit(1), F.greatest(ln - F.lit(window - 1), F.lit(1)), F.lit(stride)
    )
    hashes = F.transform(starts, lambda i: F.md5(F.substring(norm, i, window)))
    return F.array_min(hashes).alias("fingerprint")


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return _base(df, id_col, text_col).select("id", *_lang_cols())


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return _base(df, id_col, text_col).select("id", *_quality_cols())


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return _base(df, id_col, text_col).select("id", *_token_count_cols())


def fingerprint(
    df: DataFrame, id_col: str, text_col: str, window: int = 16, stride: int = 8
) -> DataFrame:
    return _base(df, id_col, text_col).select("id", _fingerprint_col(window, stride))


def text_features(
    df: DataFrame, id_col: str, text_col: str, window: int = 16, stride: int = 8
) -> DataFrame:
    """All per-doc text features — language ID, quality scores, token
    counts, winnowing fingerprint — in ONE projection over one scan.

    This is the production shape for a 100 TB corpus sweep: the four
    features share the normalizer/tokenizer evaluation and the scan, where
    running the four operators separately would read the corpus four times
    (or force a cache of it)."""
    return _base(df, id_col, text_col).select(
        "id",
        *_lang_cols(),
        *_quality_cols(),
        *_token_count_cols(),
        _fingerprint_col(window, stride),
    )
