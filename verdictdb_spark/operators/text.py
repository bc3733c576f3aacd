"""Text-analysis operators for training-data pipelines.

Language ID (marker n-gram heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting (normalized md5 + rolling-hash
winnowing).

Every scalar operator here is a pure Column expression (JVM,
whole-stage codegen) with deterministic, documented formulas so the
DuckDB oracle can replicate them exactly — winnowing is the one
Pandas-UDF exception (rolling hash needs stateful windows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Marker words per language: occurrences of " w " in the lowercased,
# space-padded text.  Deliberately simple & SQL-replicable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "es": ["el", "de", "que", "los"],
    "fr": ["le", "et", "les", "est"],
    "zh": ["的", "是", "了", "在"],
}


def _unspaced(needle: str) -> bool:
    """CJK-style markers occur INSIDE unsegmented text — match them as
    raw substrings, not space-delimited words (same rule in the SQL
    oracle generator, queries._text_stats_oracle)."""
    return not needle.isascii()


def _occurrences(padded: Column, needle: str) -> Column:
    """Count non-overlapping occurrences of ``needle`` via
    length-difference (replicable as SQL in any engine)."""
    if _unspaced(needle):
        return (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
            / F.lit(len(needle))
        ).cast("long")
    pat = f" {needle} "
    # each replacement of " needle " by " " removes len(pat)-1 chars;
    # plain string replace is non-overlapping left-to-right in both
    # Spark and DuckDB, so the oracle can replicate this exactly
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(" "))))
        / F.lit(len(pat) - 1)
    ).cast("long")


def lang_score_col(text: str | Column, lang: str) -> Column:
    """Marker-occurrence score for one language."""
    t = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    score = None
    for m in LANG_MARKERS[lang]:
        occ = _occurrences(padded, m)
        score = occ if score is None else score + occ
    return score


def lang_id_col(text: str | Column) -> Column:
    """argmax language by marker score, deterministic tie-break by
    language code order; 'und' (undetermined) when all scores are 0."""
    t = F.col(text) if isinstance(text, str) else text
    scores = {lang: lang_score_col(t, lang) for lang in sorted(LANG_MARKERS)}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def token_count_col(text: str | Column) -> Column:
    """Whitespace token count."""
    t = F.col(text) if isinstance(text, str) else text
    return F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(t), r"\s+"))
    )


def bpe_token_estimate_col(text: str | Column) -> Column:
    """BPE-ish token estimate: word-piece segments (runs of letters /
    digits / single punctuation) — the standard chars/4-free
    regex-segmentation estimate."""
    t = F.col(text) if isinstance(text, str) else text
    seg = F.regexp_replace(t, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", "x")
    return F.length(F.regexp_replace(seg, r"\s+", ""))


def char_ratios(text: str | Column) -> dict[str, Column]:
    """alpha/digit/punct/space ratios — quality-signal primitives."""
    t = F.col(text) if isinstance(text, str) else text
    total = F.greatest(F.length(t), F.lit(1)).cast("double")
    def ratio(pattern: str) -> Column:
        return (F.length(t) - F.length(F.regexp_replace(t, pattern, ""))) / total
    return {
        "alpha_ratio": ratio(r"[A-Za-z]"),
        "digit_ratio": ratio(r"[0-9]"),
        "punct_ratio": ratio(r"[^\w\s]"),
        "space_ratio": ratio(r"\s"),
    }


STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"]


def stopword_ratio_col(text: str | Column) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    occ = None
    for w in STOPWORDS:
        o = _occurrences(padded, w)
        occ = o if occ is None else occ + o
    return occ.cast("double") / F.greatest(token_count_col(t), F.lit(1)).cast("double")


def quality_score_col(text: str | Column) -> Column:
    """Deterministic quality score in [0,1]:
    0.4*alpha_ratio + 0.2*(1 - punct_ratio) + 0.2*min(tokens/200, 1)
    + 0.2*min(stopword_ratio*5, 1).
    The exact formula is part of the operator contract (oracle
    replicates it)."""
    t = F.col(text) if isinstance(text, str) else text
    r = char_ratios(t)
    toks = token_count_col(t).cast("double")
    sw = stopword_ratio_col(t)
    return (
        0.4 * r["alpha_ratio"]
        + 0.2 * (1.0 - r["punct_ratio"])
        + 0.2 * F.least(toks / F.lit(200.0), F.lit(1.0))
        + 0.2 * F.least(sw * 5.0, F.lit(1.0))
    )


def fingerprint_md5_col(text: str | Column) -> Column:
    """Normalized exact fingerprint: md5(lower + collapsed whitespace)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(t)), r"\s+", " "))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al.): rolling
    k-gram hashes, keep the min hash of each sliding window of
    ``window`` hashes (dedup'd).  Guarantees any shared substring of
    length >= k + window - 1 yields a shared fingerprint.

    Vectorized per document with numpy stride tricks (the per-doc
    loop is over documents in the Arrow batch, not characters).
    """
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("fingerprints", T.ArrayType(T.LongType())),
        ]
    )
    B = np.uint64(1000003)

    def fp(batches):
        for pdf in batches:
            ids, fps = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    ids.append(i); fps.append([])
                    continue
                b = np.frombuffer(txt.lower().encode("utf-8", "ignore"), dtype=np.uint8)
                if b.size < k:
                    ids.append(i); fps.append([])
                    continue
                with np.errstate(over="ignore"):
                    # polynomial k-gram hashes via Horner over k shifted
                    # slices: O(n) memory (a sliding_window_view.astype
                    # would materialize an (n, k) matrix — 64x the doc)
                    nh = b.size - k + 1
                    h = np.zeros(nh, dtype=np.uint64)
                    for j in range(k):
                        h = h * B + b[j : j + nh].astype(np.uint64)
                if h.size >= window:
                    wins = np.lib.stride_tricks.sliding_window_view(h, window)
                    mins = wins.min(axis=1)
                else:
                    mins = np.array([h.min()], dtype=np.uint64)
                ids.append(i)
                fps.append(np.unique(mins).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: ids, "fingerprints": fps})

    return df.select(id_col, text_col).mapInPandas(fp, out_schema)


def text_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Attach the full text-analysis column set."""
    r = char_ratios(text_col)
    return (
        df.withColumn("token_count", token_count_col(text_col))
        .withColumn("bpe_tokens", bpe_token_estimate_col(text_col))
        .withColumn("alpha_ratio", r["alpha_ratio"])
        .withColumn("punct_ratio", r["punct_ratio"])
        .withColumn("stopword_ratio", stopword_ratio_col(text_col))
        .withColumn("quality_score", quality_score_col(text_col))
        .withColumn("lang_pred", lang_id_col(text_col))
        .withColumn("fingerprint", fingerprint_md5_col(text_col))
    )
