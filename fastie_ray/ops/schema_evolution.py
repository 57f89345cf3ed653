"""Schema-evolution reads — union-by-name over parquet fragments whose
schemas drifted (the multi-year-crawl reality at 100 TB: early shards
lack columns that later ingest added; column order varies by writer).

``ray.data.read_parquet`` over mixed-schema files either fails or
silently misaligns blocks downstream, so:

- ``union_schema`` reads ONLY the parquet footers (driver-side,
  metadata-bounded — no data I/O) and unifies field lists by name,
  rejecting true dtype conflicts instead of guessing;
- ``read_union_by_name`` groups fragments by schema signature, issues
  one column-pruned ``read_parquet`` per group, aligns every batch to
  the union schema (typed nulls for absent columns, canonical column
  order) in a stateless ``map_batches``, and unions the groups — the
  result streams like any other Dataset, no materialization.

Fragment grouping means the alignment map is per-GROUP, not per-file:
a corpus with 10^6 shards but 3 historical schema generations costs 3
read operators.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.parquet as pq

if TYPE_CHECKING:
    import ray.data


def union_schema(paths: list[str]) -> pa.Schema:
    """Union-by-name schema over the fragments' footers. Field order:
    first appearance across ``paths`` (deterministic for a sorted
    list). Dtype conflicts raise — widening policy belongs to the
    caller, not a silent cast."""
    fields: dict[str, pa.Field] = {}
    for p in paths:
        for f in pq.read_schema(p):
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = f
            elif prev.type != f.type:
                raise TypeError(
                    f"schema conflict for column {f.name!r}: "
                    f"{prev.type} vs {f.type} ({p})"
                )
    return pa.schema(list(fields.values()))


def _align_fn(target: pa.Schema):
    def align(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for f in target:
            if f.name in batch.column_names:
                col = batch[f.name]
                if col.type != f.type:
                    col = pa.compute.cast(col, f.type)
                cols.append(col)
            else:
                cols.append(pa.nulls(n, f.type))
        return pa.table(cols, schema=target)

    return align


def read_union_by_name(
    paths: list[str],
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """Read mixed-schema parquet fragments as ONE dataset with the
    union-by-name schema; columns absent in a fragment read back as
    typed nulls. ``columns`` prunes the union schema (fragments missing
    a requested column still contribute null-filled rows)."""
    import ray.data

    target = union_schema(paths)
    if columns is not None:
        target = pa.schema([target.field(c) for c in columns])

    groups: dict[tuple, list[str]] = {}
    for p in paths:
        s = pq.read_schema(p)
        sig = tuple(sorted((f.name, str(f.type)) for f in s))
        groups.setdefault(sig, []).append(p)

    parts = []
    for sig, files in sorted(groups.items()):
        have = {name for name, _ in sig}
        want = [c for c in target.names if c in have]
        ds = ray.data.read_parquet(
            files,
            columns=want or None,
            override_num_blocks=override_num_blocks,
        )
        parts.append(
            ds.map_batches(_align_fn(target), batch_format="pyarrow")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
