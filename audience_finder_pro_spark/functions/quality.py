"""Quality-filter + PII expressions for training-data curation.

The repetition family follows the published Gopher/C4-style heuristics
(mean word length, unique-token fraction, most-frequent-2-gram mass,
repeated-3-gram mass) re-expressed as pure Spark SQL — per-doc numbers
a curation gate thresholds on. The PII family is regex
detect/count/redact for the patterns that appear in web-scraped text
(emails, phone-shaped numbers).

Everything here is a codegen expression (no UDF, no HOF lambdas on hot
paths — the n-gram metrics aggregate over ``shingle_stream``, the
explode+window shape measured ~5× faster than per-row lambda arrays,
see functions/text.py). All patterns are RE2-compatible so the DuckDB
oracles evaluate the identical regex semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe (works identically under Java regex and DuckDB's RE2)
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"  # NANP fictional-range shape used in fixtures


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_count(col: Column | str, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (whole-match group
    0 — the patterns deliberately carry no capture groups)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(pattern), 0))


def redact_pii(col: Column | str) -> Column:
    """Emails → ``[EMAIL]``, phone-shaped numbers → ``[PHONE]`` (all
    occurrences; both engines replace globally)."""
    out = F.regexp_replace(_c(col), EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")
