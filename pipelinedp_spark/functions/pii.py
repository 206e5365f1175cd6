"""PII detection and redaction for pretraining corpora.

The standard pre-release scrub (BigScience/ROOTS-, C4-, RefinedWeb-style):
detect personally identifiable strings with conservative patterns, count
them per document (the audit signal), and rewrite the text with typed
placeholders (the release artifact). Everything here is pure codegen —
`regexp_count`/`regexp_replace` plus an integer Luhn fold — so the scrub
runs at full scan speed with zero Python in the hot path.

Pattern portability contract: every regex uses the common subset of Java
regex (Spark) and RE2 (DuckDB oracle, Go/Rust tooling) — character
classes, bounded repetition, alternation, `\b` anchors; NO lookahead or
lookbehind (RE2 has none). That keeps the corpus scrub reproducible
across engines, which matters because "was this release scrubbed?" is an
audit question answered by rerunning the detector elsewhere.

Credit-card handling: a 13-16 digit run is only COUNTED as a card when it
passes the Luhn checksum (digit fold in integer arithmetic — no false
audit positives from ids/timestamps), but REDACTION replaces every such
run regardless (conservative over-redaction is the accepted trade: a
Luhn-failing 16-digit run is still more likely an identifier than prose).

This module is the FULL audit/scrub surface; `functions.text` keeps
the original minimal 3-pattern scrub (email/ip/ssn — used by the
`doc_pii_scrub` oracle query) for backward compatibility. New pipelines
should use `pii_report` here. Reference repo has no text/PII surface
(net-new per the project north star).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detection patterns (Java-regex & RE2 common subset; see module doc).
# Order matters for redaction: longer/more-specific first so an SSN is
# not half-eaten by the phone pattern.
PII_PATTERNS: "Tuple[Tuple[str, str, str], ...]" = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("card", r"\b[0-9]{13,16}\b", "[CARD]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "[IP]"),
)
_PII_TYPES = tuple(name for name, _, _ in PII_PATTERNS)


def luhn_valid_expr(digits: Column) -> Column:
    """Luhn checksum over a digit STRING column — true iff the
    doubled-every-second-digit-from-the-right sum is divisible by 10.
    Pure integer codegen (reverse, per-char fold), bit-identical in any
    engine with integer arithmetic — the oracle mirrors it as a list
    comprehension."""
    rev = F.reverse(digits)
    ds = F.filter(F.transform(F.split(rev, ""),
                              lambda c: c.cast("int")),
                  lambda c: c.isNotNull())
    total = F.aggregate(
        F.zip_with(ds, F.sequence(F.lit(0),
                                  F.greatest(F.size(ds) - 1, F.lit(0))),
                   lambda d, i: F.when(
                       i % 2 == 1,
                       F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
                   .otherwise(d)),
        F.lit(0), lambda acc, x: acc + x)
    return (F.size(ds) > 0) & (total % 10 == 0)


def pii_signals(text: Column) -> Column:
    """Struct of per-type PII match counts + `card_luhn` (how many of
    the card-shaped runs pass the Luhn checksum). One codegen pass; the
    counts are the release-audit numbers, not the redaction."""
    fields = [F.regexp_count(text, F.lit(pat)).alias(name)
              for name, pat, _ in PII_PATTERNS]
    cards = F.regexp_extract_all(text, F.lit(PII_PATTERNS[1][1]), 0)
    luhn = F.size(F.filter(cards, luhn_valid_expr))
    return F.struct(*fields, luhn.alias("card_luhn"))


def redact_pii(text: Column,
               types: Optional[Sequence[str]] = None) -> Column:
    """Replace every PII match with its typed placeholder, applying the
    patterns in the fixed `PII_PATTERNS` order (specific before general
    so overlapping matches resolve deterministically). Codegen chain of
    regexp_replace — order is part of the contract and mirrored by the
    oracle."""
    wanted = _PII_TYPES if types is None else tuple(types)
    unknown = set(wanted) - set(_PII_TYPES)
    if unknown:
        raise ValueError(f"unknown PII types {sorted(unknown)}; "
                         f"known: {list(_PII_TYPES)}")
    out = text
    for name, pat, placeholder in PII_PATTERNS:
        if name in wanted:
            out = F.regexp_replace(out, F.lit(pat), F.lit(placeholder))
    return out


def pii_report(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, <per-type counts>, card_luhn, any_pii, clean_text) — the
    combined audit + scrub projection. Pure per-row codegen: at corpus
    scale this is a map-only stage, no shuffle."""
    sig = pii_signals(F.col(text_col))
    anyp = None
    for name in _PII_TYPES:
        c = sig[name] > 0
        anyp = c if anyp is None else (anyp | c)
    return df.select(
        F.col(id_col),
        *[sig[name].alias(f"n_{name}") for name in _PII_TYPES],
        sig["card_luhn"].alias("n_card_luhn"),
        anyp.alias("any_pii"),
        redact_pii(F.col(text_col)).alias("clean_text"))
