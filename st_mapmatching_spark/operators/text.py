"""Text-analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All pure Spark SQL expressions —
JVM-side, whole-stage codegen, SQL-oracle-able in DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text

# tiny deterministic stopword lists for the n-gram language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "que"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "una", "es"],
}

TOKEN_REGEX = r"\w+|[^\w\s]"

# word -> bitmask of languages containing it (words may sit in several
# lists: "la"/"de"/"que"/"un" are both fr and es). One map-literal lookup
# per token replaces the old per-language array_contains scan, which was
# O(tokens x stopwords x languages) per document — needlessly quadratic-ish
# at 100 TB (round-4 VERDICT item 3). Counting semantics are unchanged
# (occurrences, not distinct words), so the DuckDB oracle twins are
# untouched.
LANG_BIT = {lang: 1 << i for i, lang in enumerate(STOPWORDS)}
_WORD_MASK: dict[str, int] = {}
for _lang, _words in STOPWORDS.items():
    for _w in _words:
        _WORD_MASK[_w] = _WORD_MASK.get(_w, 0) | LANG_BIT[_lang]


def tokens_col(text_col: str = "text") -> F.Column:
    return F.split(normalized_text(text_col), " ")


def _token_masks(toks: F.Column) -> F.Column:
    """array<int> of per-token language bitmasks: a single map-literal
    lookup per token (0 for non-stopwords)."""
    mask_map = F.create_map(*[c for w, m in _WORD_MASK.items()
                              for c in (F.lit(w), F.lit(m))])
    return F.transform(toks, lambda x: F.coalesce(mask_map[x], F.lit(0)))


def _stop_hits(masks: F.Column, lang: str) -> F.Column:
    """Occurrence count of ``lang`` stopwords from the mask array — an
    O(tokens) integer pass, no string comparisons."""
    bit = F.lit(LANG_BIT[lang])
    return F.size(F.filter(masks, lambda m: m.bitwiseAND(bit) != 0))


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document counting stats: chars, whitespace tokens, BPE-ish regex
    tokens, punctuation/digit/space ratios."""
    t = F.col(text_col)
    n_chars = F.length(t)
    ws_tokens = F.size(tokens_col(text_col))
    re_tokens = F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), F.lit(0)))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"]", ""))
    n_digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    n_space = F.length(F.regexp_replace(t, r"[^ \t\n]", ""))
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        ws_tokens.alias("n_tokens_ws"),
        re_tokens.alias("n_tokens_re"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_digit / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (n_space / F.greatest(n_chars, F.lit(1))).alias("space_ratio"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score: length band + stopword density +
    punctuation sanity (the usual pretraining heuristics)."""
    stats = text_stats(docs, id_col, text_col)
    toks = tokens_col(text_col)
    stop_ratio = (_stop_hits(_token_masks(toks), "en")
                  / F.greatest(F.size(toks), F.lit(1)))
    base = docs.select(F.col(id_col), stop_ratio.alias("stop_ratio"))
    j = stats.join(base, id_col)
    len_score = F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(F.col("stop_ratio") * 4.0, F.lit(1.0))
    punct_score = F.when(F.col("punct_ratio") > 0.2, 0.0).otherwise(1.0 - F.col("punct_ratio") * 5.0)
    return j.select(id_col, "n_chars", "stop_ratio",
                    ((len_score + stop_score + punct_score) / 3.0).alias("quality"))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-density language heuristic: per language, the fraction of
    tokens in that language's list; predict the argmax (ties -> 'und')."""
    toks = tokens_col(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    masks = _token_masks(toks)
    cols = [(_stop_hits(masks, lang) / n).alias(f"score_{lang}")
            for lang in STOPWORDS]
    scored = docs.select(F.col(id_col), *cols)
    best = F.greatest(*[F.col(f"score_{l}") for l in STOPWORDS])
    pred = F.when(best <= 0.0, F.lit("und"))
    for lang in STOPWORDS:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.withColumn("lang_pred", pred.otherwise(F.lit("und")))


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stable document fingerprint over normalized text (md5 128-bit) plus
    a 64-bit xxhash for compact joins."""
    norm = normalized_text(text_col)
    return docs.select(F.col(id_col),
                       F.md5(norm).alias("fp_md5"),
                       F.xxhash64(norm).alias("fp_x64"))
