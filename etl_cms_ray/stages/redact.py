"""PII / secret redaction — vectorized regex scrub over a text column.

The training-data analog of the reference's output-side field cleanup
(dates reformatted, codes normalized before anything is written —
``CMS_SynPuf_ETL_CDM_v5.py:249-252``, SURVEY.md §2.8): before documents
leave the pipeline, well-known sensitive spans (emails, bare IPv4s,
long hex tokens that look like keys) are replaced with typed
placeholder tags, and the number of replacements is reported per row so
a downstream filter can drop pathologically PII-dense docs.

Rules are applied IN ORDER, each on the previous rule's output — the
count for rule k is taken on the text as rule k sees it, which is
exactly what a nested ``regexp_replace`` mirror computes, so the whole
operator is DuckDB-oracle-checkable (both engines run RE2).

Scale shape: a stateless ``map_batches`` over zero-copy Arrow batches;
``pyarrow.compute``'s RE2 kernels do all the work, no Python per row.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class RedactRule:
    name: str
    pattern: str  # RE2, no lookaround (pyarrow and DuckDB both run RE2)
    replacement: str


#: default scrub set.  \b works in RE2; patterns deliberately simple and
#: auditable rather than exhaustive (a production set is configuration).
DEFAULT_RULES: tuple[RedactRule, ...] = (
    RedactRule(
        "email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"
    ),
    RedactRule("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    RedactRule("hexkey", r"\b[0-9a-f]{32,}\b", "<KEY>"),
)


def redact_column(
    col: pa.ChunkedArray | pa.Array, rules: tuple[RedactRule, ...] = DEFAULT_RULES
) -> tuple[pa.Array, pa.Array]:
    """(redacted_text, n_redactions) for one string column.

    ``n_redactions`` counts matches rule-by-rule on that rule's input
    (the nested-replace semantics described in the module docstring)."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    cur = col
    total = None
    for r in rules:
        n = pc.count_substring_regex(cur, r.pattern)
        total = n if total is None else pc.add(total, n)
        cur = pc.replace_substring_regex(cur, pattern=r.pattern, replacement=r.replacement)
    if isinstance(cur, pa.ChunkedArray):
        cur = cur.combine_chunks()
    total = total.cast(pa.int64())
    if isinstance(total, pa.ChunkedArray):
        total = total.combine_chunks()
    return cur, total


def redact_batch(
    t: pa.Table, text_col: str = "text", rules: tuple[RedactRule, ...] = DEFAULT_RULES
) -> pa.Table:
    """map_batches body: replaces ``text_col`` with its redacted form and
    appends ``n_redactions``."""
    red, n = redact_column(t[text_col], rules)
    cols = {name: t[name] for name in t.column_names}
    cols[text_col] = red
    cols["n_redactions"] = n
    return pa.table(cols)


def oracle_redact_sql(expr: str, rules: tuple[RedactRule, ...] = DEFAULT_RULES) -> tuple[str, str]:
    """(redacted_expr, count_expr) — the DuckDB mirror of ``redact_column``
    generated from the SAME rule constants, so the SQL can never drift
    from the engine (the tokenizer-pattern-constant trick)."""

    def esc(p: str) -> str:
        return p.replace("'", "''")

    cur = expr
    counts = []
    for r in rules:
        counts.append(f"len(regexp_extract_all({cur}, '{esc(r.pattern)}'))")
        cur = f"regexp_replace({cur}, '{esc(r.pattern)}', '{r.replacement}', 'g')"
    return cur, " + ".join(counts)
