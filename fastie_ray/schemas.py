"""Arrow schemas for every logical table in the engine (FIXTURES.md).

The pages schema is fixed by BASELINE.json's input_hint; downstream
schemas are the exploded, relational restatement of the reference's
nested JSON documents (SURVEY.md §1.4).
"""

from __future__ import annotations

import pyarrow as pa

# F1 — primary input (BASELINE.json input_hint)
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# after extract_text (html projected away immediately — wide-row rule, SURVEY §7.4)
PAGES_TEXT = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# F6 chunks — auto_splitter output as explicit columns (replaces the
# reference's in-memory input_mapping dict, SURVEY §2.2 M4)
CHUNKS = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_id", pa.int32()),
        ("chunk_offset", pa.int32()),  # cumulative length of prior chunks
        ("chunk_text", pa.string()),
        ("lang", pa.string()),
    ]
)

# chunk-level mentions (GlobalPointer decode output, offsets chunk-local)
MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_id", pa.int32()),
        ("chunk_offset", pa.int32()),
        ("label", pa.string()),
        ("start", pa.int32()),  # char offsets within chunk_text
        ("end", pa.int32()),  # exclusive
        ("mention", pa.string()),
    ]
)

# chunk-level triples (GPLinker decode output, exploded rows)
CHUNK_TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_id", pa.int32()),
        ("chunk_offset", pa.int32()),
        ("predicate", pa.string()),
        ("subject", pa.string()),
        ("object", pa.string()),
    ]
)

# document-level after rejoin (offsets rebased to the document)
DOC_MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("label", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("mention", pa.string()),
    ]
)

TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("predicate", pa.string()),
        ("subject", pa.string()),
        ("object", pa.string()),
    ]
)

# after entity linking
LINKED_MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("label", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("mention", pa.string()),
        ("entity_id", pa.string()),
        ("link_score", pa.float32()),
    ]
)

# F6 graph tables
NODES = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canonical_name", pa.string()),
        ("component_id", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("subject_id", pa.string()),
        ("predicate", pa.string()),
        ("object_id", pa.string()),
        ("n_support", pa.int64()),
        ("urls", pa.list_(pa.string())),
    ]
)

# F6 manifest — one row per committed output partition (resume)
MANIFEST = pa.schema(
    [
        ("partition_id", pa.string()),
        ("row_count", pa.int64()),
        ("latency_ms", pa.float64()),
        ("n_bytes", pa.int64()),
        ("status", pa.string()),
    ]
)

# F5 alias dictionary
ALIAS_DICT = pa.schema(
    [
        ("alias", pa.string()),
        ("entity_id", pa.string()),
        ("canonical_name", pa.string()),
        ("embedding", pa.list_(pa.float32(), 32)),
    ]
)
