"""PII detection and redaction over a text column.

The canonical curation stage between quality filtering and packing:
replace emails / SSNs / payment-card numbers / IPv4 addresses / NANP
phone numbers with category tokens, and count what was replaced so a
corpus report (or a drop-threshold filter) can run off the counts.

Engine shape: a plain-function ``map_batches`` stage (fuses with the
read — no actor pool; the "state" is five precompiled RE2 programs,
free to rebuild per task) using ``pyarrow.compute``'s Gandiva-free RE2
kernels. Both pyarrow and DuckDB bind RE2, so the exact same pattern
strings make the SQL twin (`text_pii_redact`) bit-exact — the parity
is measured, not assumed (tests/test_operators.py plants every
category plus the known near-miss edges).

Pattern order is semantic, not cosmetic: each category is counted on
the text as-of its turn and then replaced before the next pattern
runs, so a 16-digit card is never double-reported as two phone
numbers. Counts therefore mirror what redaction actually rewrote.

Reference analog: the tag-scrubbing janitor (osm-merge
utilities/conflation/filter_tags-style regex cleanup) generalized to
content PII; patterns follow the usual public shapes (RFC-5322-lite
email, NANP phones, dotted-quad with octet range check).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement token) — ORDER MATTERS (see module
# docstring). RE2 only: no lookaround, no backreferences, so the same
# strings run identically under pyarrow and DuckDB.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email",
     r"[A-Za-z0-9][A-Za-z0-9._%+\-]*@[A-Za-z0-9][A-Za-z0-9.\-]*\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("card", r"\b[0-9]{4}[ \-]?[0-9]{4}[ \-]?[0-9]{4}[ \-]?[0-9]{4}\b",
     "<CARD>"),
    ("ip",
     r"\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
     r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\b",
     "<IP>"),
    ("phone",
     r"(\+[0-9]{1,2}[ .\-]?)?(\([0-9]{3}\)|\b[0-9]{3})"
     r"[ .\-]?[0-9]{3}[ .\-]?[0-9]{4}\b",
     "<PHONE>"),
)


def _redact_batch(t: pa.Table, text_column: str,
                  patterns=PII_PATTERNS) -> pa.Table:
    cur = t.column(text_column)
    if cur.null_count:
        cur = pc.fill_null(cur, "")
    total = None
    out = t
    for name, pat, tok in patterns:
        n = pc.count_substring_regex(cur, pattern=pat)
        n = pc.cast(n, pa.int64())
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=tok)
        out = out.append_column(f"n_{name}", n)
        total = n if total is None else pc.add(total, n)
    out = out.set_column(out.column_names.index(text_column),
                         text_column, cur)
    return out.append_column("n_pii", total)


def redact_pii(ds, text_column: str = "text", patterns=PII_PATTERNS):
    """Dataset -> Dataset with ``text_column`` redacted in place plus
    one ``n_<category>`` int64 column per pattern and an ``n_pii``
    total. Plain-function stage: fuses with the upstream read."""

    def fn(t: pa.Table) -> pa.Table:
        return _redact_batch(t, text_column, patterns)

    return ds.map_batches(fn, batch_format="pyarrow")
