"""PII detection / redaction over the documents table — a standard
pre-training scrub stage (no reference analogue; the reference's text
normalizers ``fastie/data/uie/utils.py`` motivate the batch shape).

Pure vectorized ``map_batches`` stage: three compiled patterns (email,
IPv4, phone), pandas ``str.count`` / ``str.replace`` kernels — no
per-row Python. Patterns are deliberately RE2-compatible (no
lookaround, no backreferences) so a DuckDB oracle reproduces counts
and redacted lengths EXACTLY with ``regexp_extract_all`` /
``regexp_replace(..., 'g')``.

Scale shape: stateless map — no shuffle, no driver state; streams at
full read bandwidth on any cluster size.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd

if TYPE_CHECKING:
    import ray.data

# RE2-safe (also valid Python re) — keep in sync with the SQL oracle
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"

# replacement order matters: email first (its domain would otherwise
# be partially eaten by later classes), then IP, then phone. The
# placeholder tokens contain no digits, so later patterns can never
# match inside an earlier replacement.
_REDACTIONS = ((EMAIL_RE, "<EMAIL>"), (IP_RE, "<IP>"), (PHONE_RE, "<PHONE>"))


def pii_scrub_batch(
    df: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Per-doc PII counts + redacted text stats (all int64 — SQL-exact)."""
    t = df[text_col]
    n_emails = t.str.count(EMAIL_RE).astype("int64")
    red = t.str.replace(EMAIL_RE, "<EMAIL>", regex=True)
    n_ips = red.str.count(IP_RE).astype("int64")
    red = red.str.replace(IP_RE, "<IP>", regex=True)
    n_phones = red.str.count(PHONE_RE).astype("int64")
    red = red.str.replace(PHONE_RE, "<PHONE>", regex=True)
    return pd.DataFrame(
        {
            id_col: df[id_col],
            "n_emails": n_emails,
            "n_ips": n_ips,
            "n_phones": n_phones,
            "n_pii": n_emails + n_ips + n_phones,
            "redacted_len": red.str.len().astype("int64"),
        }
    )


def pii_redact_batch(
    df: pd.DataFrame, text_col: str = "text"
) -> pd.DataFrame:
    """Same pass, but returns the redacted TEXT (the sink-side variant:
    write the scrubbed corpus, not just the stats)."""
    out = df.copy()
    red = out[text_col]
    for pat, rep in _REDACTIONS:
        red = red.str.replace(pat, rep, regex=True)
    out[text_col] = red
    return out


def pii_scrub(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(pii_scrub_batch, batch_format="pandas")


def pii_redact(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(pii_redact_batch, batch_format="pandas")
