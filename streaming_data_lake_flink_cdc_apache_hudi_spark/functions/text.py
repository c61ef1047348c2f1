"""Text-analysis column functions for large-scale training-data
pipelines (SURVEY.md §7 Phase 4; extension surface beyond the
reference, which only exposes CAST — §2.5).

Everything here is built from JVM-side ``pyspark.sql.functions`` so
it stays inside whole-stage codegen — no Python in the hot path. Each
function returns a Column and composes into scans with pushdown and
pruning intact. All are deterministic, so every derived query has an
exact DuckDB oracle.

At 100 TB these run as map-only operators over the documents table:
no shuffle, no state, trivially partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small fixed stopword inventory per language; marker-hit counting is
# the classic cheap lang-ID heuristic (n-gram/stopword profiles)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-romanized markers
}
STOPWORDS = LANG_MARKERS["en"]

# word-ish tokens: runs of alphanumerics (BPE-ish pre-tokenization);
# same RE works in DuckDB's regexp_extract_all for the oracle
TOKEN_RE = "[A-Za-z0-9]+"


def tokens(col) -> Column:
    """Whitespace tokenization (documents are single-spaced)."""
    return F.split(col, " ")


def token_count(col) -> Column:
    return F.size(tokens(col))


def regex_token_count(col) -> Column:
    """Token count under the BPE-ish regex tokenizer."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_RE), 0))


def stopword_count(col, words: tuple[str, ...] = STOPWORDS) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(wl, t)))


def stopword_ratio(col) -> Column:
    return stopword_count(col) / token_count(col)


def avg_token_len(col) -> Column:
    return (F.length(col) - token_count(col) + 1) / token_count(col)


def quality_score(col) -> Column:
    """Heuristic document quality in [0,1]: length band + stopword
    presence + reasonable mean token length (C4/Gopher-style rules,
    composed from cheap per-doc stats)."""
    n_tok = token_count(col)
    length_ok = (n_tok >= 50) & (n_tok <= 100000)
    stop_ok = stopword_ratio(col) > 0.01
    tok_len = avg_token_len(col)
    tok_len_ok = (tok_len >= 2.5) & (tok_len <= 12.0)
    return (
        length_ok.cast("double") * 0.4
        + stop_ok.cast("double") * 0.3
        + tok_len_ok.cast("double") * 0.3
    )


def lang_marker_hits(col, lang: str) -> Column:
    return stopword_count(col, LANG_MARKERS[lang])


def lang_id(col) -> Column:
    """Predicted language = argmax of marker hits, ties broken by the
    fixed order en>es>fr>de>zh (deterministic; mirrored in SQL)."""
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    # build right-to-left so earlier langs win ties
    best = lang_marker_hits(col, langs[-1])
    for lg in reversed(langs[:-1]):
        hits = lang_marker_hits(col, lg)
        expr = F.when(hits >= best, F.lit(lg)).otherwise(expr)
        best = F.when(hits >= best, hits).otherwise(best)
    return expr


def fingerprint(col) -> Column:
    """Exact-dup fingerprint: md5 of the raw text (same function
    exists in DuckDB → direct oracle)."""
    return F.md5(col)


# --- PII masking (map-only regexes; DuckDB mirrors need the 'g'
# flag — Spark's regexp_replace is global by default, DuckDB's is
# first-match-only) ---

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


def mask_digits(col) -> Column:
    """Redact every digit (phone/account-number masking)."""
    return F.regexp_replace(col, "[0-9]", "X")


def digit_count(col) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, "[0-9]", ""))


def digits_last4(col) -> Column:
    """Last 4 digits kept for operator joins/audit (card-style)."""
    return F.substring(F.regexp_replace(col, "[^0-9]", ""), -4, 4)


def email_count(col) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), 0))


def shingles(col, n: int = 3) -> Column:
    """Word n-gram shingles (for Jaccard/MinHash dedup): array of
    space-joined n-token windows."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(F.size(toks) < n, F.array(col)).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
