"""PII detection / redaction over a ``documents(doc_id, text)`` table.

Corpus-prep hygiene: count and redact personally-identifying spans
(emails, IPv4 addresses) before a document enters a training mix. The
patterns are deliberately RE2-compatible (no backreferences, no
lookaround) so the exact same regex runs JVM-side in Spark and in the
DuckDB oracle — cross-engine parity is part of the contract.

Plan shape: pure scan-stage column expressions (``regexp_extract_all``
/ ``regexp_replace`` inside whole-stage codegen) — zero shuffles, zero
Python. At 100 TB this is embarrassingly parallel per input split; the
only knob that matters is keeping the regexes linear-time, which RE2
compatibility guarantees by construction.

No reference counterpart (the reference is a graph library); part of
the engine's LLM-data-pipeline extension surface (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from efficient_graph_algorithms_spark.functions.text import fingerprint60

# RE2-safe (and Java-regex-identical) patterns. Kept simple on purpose:
# the point is the cross-engine-exact pipeline shape, not RFC 5322.
# (?i) is honored identically by Java regex and RE2, so mixed-case
# addresses neither leak nor get partially mangled.
EMAIL_RE = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_emails, n_ips, redacted_fp): per-document PII span
    counts plus the 60-bit fingerprint of the redacted text (emails →
    ``<EMAIL>``, IPv4s → ``<IP>``). The fingerprint lets a downstream
    exact-dedup pass run on redacted content without materializing it,
    and doubles as a byte-exact redaction check against the oracle.

    Counts mirror the sequential redaction exactly: emails are counted
    on the original text, IPs on the EMAIL-REDACTED text — so n_emails
    and n_ips always equal the number of ``<EMAIL>``/``<IP>``
    placeholders actually placed (an IP-shaped local part like
    ``1.2.3.4@x.com`` is one email, zero IPs, in counts AND output)."""
    # NULL text must behave as '' (counts 0, fingerprint of ""), not
    # propagate: non-ANSI size(NULL) is -1 and would corrupt summed counts
    # when the CLI reads arbitrary parquet.
    t = F.coalesce(F.col(text_col), F.lit(""))
    email_red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(email_red, IPV4_RE, "<IP>")
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(email_red, F.lit(IPV4_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        fingerprint60(redacted).alias("redacted_fp"),
    )


def duck_pii_sql(text_expr: str) -> str:
    """DuckDB select-list fragment computing the same three columns
    over ``text_expr`` (used by the oracle builder; mirrors
    functions/text.py's duck_* convention)."""
    # DuckDB single-quoted strings keep backslashes literal, so the
    # patterns embed verbatim.
    email = EMAIL_RE
    ip = IPV4_RE
    email_red = f"regexp_replace({text_expr}, '{email}', '<EMAIL>', 'g')"
    redacted = f"regexp_replace({email_red}, '{ip}', '<IP>', 'g')"
    from efficient_graph_algorithms_spark.functions.text import duck_fingerprint60

    return (
        f"len(regexp_extract_all({text_expr}, '{email}'))::BIGINT AS n_emails, "
        f"len(regexp_extract_all({email_red}, '{ip}'))::BIGINT AS n_ips, "
        f"{duck_fingerprint60(redacted)} AS redacted_fp"
    )
