"""Text extraction from Common-Crawl-style pages.

Per-row invariant (BASELINE.json input_hint): the extracted text is
byte-identical per url. Rows arriving with ``text`` already set pass
through untouched (the reference strips only at *eval* time,
``examples/relation_extraction/evaluate.py:13`` — ``predict`` slices
unstripped text, so we do NOT strip here; see SURVEY §7.4).

Rows with ``text`` null carry the page only as ``html`` bytes; we
recover the text from the simple deterministic wrapping the synthetic
corpus uses (``<p>…</p>`` paragraphs, HTML-escaped, joined verbatim).
A production deployment would swap ``html_to_text`` for a real
boilerplate extractor behind the same stage signature.

The wide ``html`` binary column is projected away HERE — immediately
after use — so it never inflates downstream blocks (SURVEY §7.4
"Wide rows").
"""

from __future__ import annotations

import html as _html
import re
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    import ray.data

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)


def html_to_text(raw: bytes) -> str:
    """Recover text from the deterministic paragraph wrapping
    (fastie_ray.synth.wrap_html). Paragraph bodies are HTML-escaped;
    paragraphs were split on newline, so re-join with newline."""
    parts = _P_RE.findall(raw)
    return "\n".join(_html.unescape(p.decode("utf-8")) for p in parts)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    if text.null_count:
        null_mask = pc.is_null(text).to_numpy(zero_copy_only=False)
        texts = text.to_pylist()
        htmls = batch["html"]
        for i in np.flatnonzero(null_mask):
            raw = htmls[i].as_py()
            texts[i] = html_to_text(raw) if raw is not None else ""
        text = pa.array(texts, pa.string())
    cols = {
        "url": batch["url"],
        "text": text,
    }
    for extra in ("warc_ts", "lang"):
        if extra in batch.column_names:
            cols[extra] = batch[extra]
    return pa.table(cols)


def extract_text(ds: "ray.data.Dataset", batch_size: int | None = None) -> "ray.data.Dataset":
    """pages → (url, text, warc_ts, lang); drops ``html``."""
    return ds.map_batches(extract_text_batch, batch_format="pyarrow", batch_size=batch_size)
