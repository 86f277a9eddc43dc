"""PII redaction for training corpora: map-side regexp replacement of
emails, IPv4 addresses, and phone-like numbers, plus a per-pattern hit
report. The reference has no analog (harness-superset operator in the
spirit of its string DFL functions, SURVEY §2.8); the patterns are the
standard public ones every corpus-cleaning pipeline ships.

Scale shape: `redact` is a pure Column expression chain — regexp_replace
stacked per pattern, whole-stage-codegen'd, ZERO shuffle and zero Python.
`pii_report` adds one tiny groupBy over pattern-name keys. At 100 TB both
are scan-bound.

Pattern notes (kept deliberately conservative):
- email: RFC-ish local@domain.tld — the dominant PII class in web text.
- ipv4: dotted quad with 0-255 octets, word-bounded so version strings
  like "1.2.3.4000" don't match.
- phone: three shapes, all capped at the E.164 ceiling of 15 digits with
  at most two separator chars between consecutive digits: (a) a "+"
  country prefix (spaces allowed as separators), (b) the parenthesized
  NANP shape `(xxx) xxx-xxxx` — the parens are REQUIRED, since a
  parenless "555 123 4567" is shape-identical to benign 3-3-4 numeric
  lists, (c) bare digit runs joined by `-.()` only — NOT spaces. Space
  separators without a "+" or "(xxx)" anchor are what turned benign
  numeric lists ("2020 2021 2022 ...", scores, ISBNs) into <PHONE>
  spans; those no longer match at all, and the per-gap + total-length
  caps keep any single match from bridging independent numbers.
  Space-separated domestic numbers without an anchor ("call 555 123
  4567") are the documented false-negative — add a locale pattern if
  your corpus carries them.
False positives redact a little too much (safe direction for training
data); false negatives are the tunable part — pass extra patterns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: emails first so their digits don't partially match as phones
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
    # three anchored shapes (see module docstring); each gap <=2 separator
    # chars, 6-15 digits total, so no match bridges unrelated numbers.
    # The NANP branch REQUIRES the area-code parens: without them,
    # "555 123 4567" is indistinguishable from a benign 3-3-4 numeric list
    # (scores, page columns), which is exactly the class this pattern must
    # not eat — parenless forms need -.() separators (bare-run branch).
    "phone": r"(?<![0-9A-Za-z])(?:"
    r"\+[0-9](?:[()\-. ]{0,2}[0-9]){5,14}"  # +international: spaces OK
    r"|\([0-9]{3}\)[-. ]{0,2}[0-9]{3}[-. ][0-9]{4}"  # NANP (xxx) xxx-xxxx
    r"|[0-9](?:[()\-.]{0,2}[0-9]){5,14}"  # bare runs: -.() only, no spaces
    r")(?![0-9A-Za-z])",
}


def _resolve_patterns(
    patterns: dict[str, str] | None, replace_defaults: bool
) -> dict[str, str]:
    """Extra patterns EXTEND the default PII set (applied after it) unless
    `replace_defaults` is explicitly set — silently dropping the email/IP/
    phone defaults because a caller added one custom pattern would be the
    exact PII leak this module exists to prevent."""
    if patterns is None:
        return PII_PATTERNS
    if replace_defaults:
        return patterns
    return {**PII_PATTERNS, **patterns}


def redact_col(
    col: Column,
    patterns: dict[str, str] | None = None,
    replace_defaults: bool = False,
) -> Column:
    """Stacked regexp_replace; each match becomes ``<NAME>`` so downstream
    tokenization sees a stable placeholder instead of a hole. `patterns`
    adds to PII_PATTERNS (see _resolve_patterns)."""
    out = col
    for name, pat in _resolve_patterns(patterns, replace_defaults).items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def redact(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    replace_defaults: bool = False,
) -> DataFrame:
    """Replace PII in `text_col` in place; all other columns pass through."""
    return df.withColumn(
        text_col, redact_col(F.col(text_col), patterns, replace_defaults)
    )


def pii_report(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    replace_defaults: bool = False,
) -> DataFrame:
    """Per-pattern totals: docs hit + total matches. One map-side pass
    (regexp_count per pattern) + a rollup over pattern-count columns."""
    pats = _resolve_patterns(patterns, replace_defaults)
    counts = df.select(
        *[
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(name)
            for name, pat in pats.items()
        ]
    )
    # ONE scan: all totals in a single aggregate row, then stack-unpivot
    agg = counts.agg(
        *[
            F.sum(F.when(F.col(n) > 0, 1).otherwise(0)).alias(f"{n}__docs")
            for n in pats
        ],
        *[F.sum(n).alias(f"{n}__matches") for n in pats],
    )
    stack_args = ", ".join(f"'{n}', {n}__docs, {n}__matches" for n in pats)
    return agg.select(
        F.expr(
            f"stack({len(pats)}, {stack_args}) AS (pattern, n_docs, n_matches)"
        )
    ).orderBy("pattern")
