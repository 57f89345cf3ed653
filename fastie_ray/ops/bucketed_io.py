"""Bucketed storage layout — pay the shuffle ONCE at write time, then
join co-located tables forever without an exchange (the Hive/Iceberg
bucketing contract, and the concrete form of "pick ONE partitioning
key and reuse it across stages").

``write_bucketed`` hash-buckets rows by a key column (md5-based so the
bucket function is engine-independent and SQL-reproducible) and writes
one parquet directory per bucket. ``bucketed_join`` then joins two
tables bucketed with the SAME key function bucket-by-bucket: each
bucket pair is read and joined inside one task — the only data
movement is the column-pruned read itself. At cluster scale each
bucket-join task schedules wherever its bucket files are; no
repartition, no shuffle, no aggregator actors.

Bucket function: ``int(md5(str(key))[:8], 16) % n_buckets`` — the same
grid ``ops.splits`` uses, hashed once per DISTINCT key per batch.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import TYPE_CHECKING

import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _key_bucket(keys: pd.Series, n_buckets: int) -> pd.Series:
    uniq = pd.unique(keys)
    lut = {
        k: int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % n_buckets
        for k in uniq
    }
    return keys.map(lut)


def write_bucketed(
    ds: "ray.data.Dataset", key: str, n_buckets: int, path: str
) -> dict:
    """Write ``ds`` as ``path/bucket=NN/*.parquet`` hash-bucketed on
    ``key``; a ``_bucketing.json`` manifest records the contract so
    readers can verify key/bucket-count compatibility."""

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _key_bucket(df[key], n_buckets).astype("int64")
        return df

    bucketed = ds.map_batches(add_b, batch_format="pandas")
    bucketed.write_parquet(path, partition_cols=["__bucket"])
    meta = {"key": key, "n_buckets": n_buckets}
    with open(os.path.join(path, "_bucketing.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def bucketed_join(
    path_a: str,
    path_b: str,
    key_a: str,
    key_b: str,
    cols_a: list[str],
    cols_b: list[str],
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Inner-join two bucketed tables bucket-by-bucket with NO
    exchange: one flat_map task per bucket reads both sides' bucket
    directory (column-pruned) and merges locally. Both tables must
    share ``n_buckets`` (verified from the manifests) and be bucketed
    on the join key."""
    import pyarrow.parquet as pq
    import ray.data

    with open(os.path.join(path_a, "_bucketing.json")) as fh:
        ma = json.load(fh)
    with open(os.path.join(path_b, "_bucketing.json")) as fh:
        mb = json.load(fh)
    if ma["n_buckets"] != mb["n_buckets"]:
        raise ValueError(
            f"bucket count mismatch: {ma['n_buckets']} vs {mb['n_buckets']}"
        )
    if ma["key"] != key_a or mb["key"] != key_b:
        raise ValueError("tables are not bucketed on the requested join keys")
    n = ma["n_buckets"]

    out_cols_b = {c: (c + suffix if c in cols_a else c) for c in cols_b}

    # output schema derived from the parquet footers once on the driver
    # — per-task empty results stay TYPED (schema-less zero-row blocks
    # break downstream consumers, NOTES fact 3/12)
    import pyarrow as pa

    sa = pq.read_schema(_first_parquet(path_a))
    sb = pq.read_schema(_first_parquet(path_b))
    fields = [(c, sa.field(c).type) for c in cols_a] + [
        (out_cols_b[c], sb.field(c).type) for c in cols_b if c != key_b
    ]
    out_schema = pa.schema(fields)
    out_names = [f[0] for f in fields]

    def join_buckets(batch: pd.DataFrame) -> "pa.Table":
        frames = []
        for b in batch["bucket"]:
            da = os.path.join(path_a, f"__bucket={int(b)}")
            db = os.path.join(path_b, f"__bucket={int(b)}")
            if not (os.path.isdir(da) and os.path.isdir(db)):
                continue
            a = pq.read_table(da, columns=cols_a).to_pandas()
            bt = pq.read_table(db, columns=cols_b).to_pandas()
            m = a.merge(
                bt.rename(columns=out_cols_b),
                left_on=key_a,
                right_on=out_cols_b[key_b],
            )
            if out_cols_b[key_b] != key_a:
                m = m.drop(columns=[out_cols_b[key_b]])
            frames.append(m[out_names])
        if not frames:
            return out_schema.empty_table()
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    # one task per bucket: the bucket list is the parallelism unit,
    # exactly like a shard list at scale
    buckets = ray.data.from_items(
        [{"bucket": i} for i in range(n)]
    ).repartition(n)
    return buckets.map_batches(
        join_buckets, batch_format="pandas", batch_size=None
    )


def _first_parquet(root: str) -> str:
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(dirpath, f)
    raise FileNotFoundError(f"no parquet files under {root}")


def write_bucketed_sorted(
    ds: "ray.data.Dataset", key: str, n_buckets: int, path: str
) -> dict:
    """Sorted-merge-bucket (SMB) layout: hash-bucket on ``key`` AND
    sort each bucket on it — one exchange at write time buys merge
    joins forever (no hash table on either side at read). One file per
    bucket, written inside the bucket task; the manifest records the
    sort so ``bucketed_merge_join`` can verify the contract."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _key_bucket(df[key], n_buckets).astype("int64")
        return df

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__bucket"].iloc[0])
        g = g.drop(columns="__bucket").sort_values(key, kind="mergesort")
        d = os.path.join(path, f"__bucket={b}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g, preserve_index=False),
            os.path.join(d, "data.parquet"),
        )
        return pd.DataFrame({"bucket": [b], "rows": [len(g)]})

    stats = (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    meta = {"key": key, "n_buckets": n_buckets, "sorted": True,
            "rows": int(stats["rows"].sum())}
    with open(os.path.join(path, "_bucketing.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def _sorted_inner_merge(
    a: pd.DataFrame, b: pd.DataFrame, key_a: str, key_b: str
) -> tuple:
    """Index pairs of the inner join of two KEY-SORTED frames via two
    binary searches + range expansion — no hash table, O((n+m) log m),
    duplicate keys on both sides handled by the [lo, hi) ranges."""
    import numpy as np

    ak = a[key_a].to_numpy()
    bk = b[key_b].to_numpy()
    lo = np.searchsorted(bk, ak, side="left")
    hi = np.searchsorted(bk, ak, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    ai = np.repeat(np.arange(len(ak)), cnt)
    starts = np.repeat(cnt.cumsum() - cnt, cnt)
    bi = np.arange(total) - starts + np.repeat(lo, cnt)
    return ai, bi


def bucketed_merge_join(
    path_a: str,
    path_b: str,
    key_a: str,
    key_b: str,
    cols_a: list[str],
    cols_b: list[str],
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Inner-join two SMB tables bucket-by-bucket with NO exchange and
    NO hash table: both sides stream in key order and merge via binary
    search (``_sorted_inner_merge``). Contracts (same bucket count,
    bucketed AND sorted on the join keys) verified from the manifests."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    with open(os.path.join(path_a, "_bucketing.json")) as fh:
        ma = json.load(fh)
    with open(os.path.join(path_b, "_bucketing.json")) as fh:
        mb = json.load(fh)
    if ma["n_buckets"] != mb["n_buckets"]:
        raise ValueError("bucket count mismatch")
    if not (ma.get("sorted") and mb.get("sorted")):
        raise ValueError("bucketed_merge_join requires SMB (sorted) tables")
    if ma["key"] != key_a or mb["key"] != key_b:
        raise ValueError("tables are not bucketed/sorted on the join keys")
    n = ma["n_buckets"]

    out_cols_b = {c: (c + suffix if c in cols_a else c) for c in cols_b}
    sa = pq.read_schema(_first_parquet(path_a))
    sb = pq.read_schema(_first_parquet(path_b))
    fields = [(c, sa.field(c).type) for c in cols_a] + [
        (out_cols_b[c], sb.field(c).type) for c in cols_b if c != key_b
    ]
    out_schema = pa.schema(fields)
    out_names = [f[0] for f in fields]

    def join_buckets(batch: pd.DataFrame) -> "pa.Table":
        frames = []
        for bkt in batch["bucket"]:
            da = os.path.join(path_a, f"__bucket={int(bkt)}")
            db = os.path.join(path_b, f"__bucket={int(bkt)}")
            if not (os.path.isdir(da) and os.path.isdir(db)):
                continue
            a = pq.read_table(da, columns=cols_a).to_pandas()
            b = pq.read_table(db, columns=cols_b).to_pandas()
            ai, bi = _sorted_inner_merge(a, b, key_a, key_b)
            m = a.iloc[ai].reset_index(drop=True)
            bsel = b.iloc[bi].reset_index(drop=True).rename(columns=out_cols_b)
            for c in cols_b:
                if c != key_b:
                    m[out_cols_b[c]] = bsel[out_cols_b[c]]
            frames.append(m[out_names])
        if not frames:
            return out_schema.empty_table()
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    buckets = ray.data.from_items(
        [{"bucket": i} for i in range(n)], override_num_blocks=n
    )
    return buckets.map_batches(join_buckets, batch_format="pandas", batch_size=1)
