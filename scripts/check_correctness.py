"""Local stand-in for the driver's correctness harness: runs each
``queries()`` callable and its ``oracle_sql()`` side-by-side at sf0.01
(DuckDB views over the same parquet), sorts columns by name and rows by
value, and reports rows/schema/value matches per query.

Usage: python scripts/check_correctness.py [query ...]
"""

from __future__ import annotations

import json
import sys

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:]) or set(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    out = {}
    for name, fn in qs.items():
        if name not in only:
            continue
        try:
            got = canon(to_pandas(fn(SF_DIR)))
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"query failed: {e!r}"}
            print(name, out[name])
            continue
        if name not in oracles:
            out[name] = {"err": "no_oracle", "rows": len(got)}
            print(name, out[name])
            continue
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": f"oracle failed: {e!r}"}
            print(name, out[name])
            continue
        rows_match = len(got) == len(want)
        schema_match = list(got.columns) == list(want.columns)
        vals_match = False
        if rows_match and schema_match:
            try:
                gg, ww = got.copy(), want.copy()
                for c in gg.columns:
                    if gg[c].dtype.kind == "f" or ww[c].dtype.kind == "f":
                        gg[c] = gg[c].astype(float).round(6)
                        ww[c] = ww[c].astype(float).round(6)
                    elif str(gg[c].dtype) != str(ww[c].dtype):
                        gg[c] = gg[c].astype(str)
                        ww[c] = ww[c].astype(str)
                vals_match = gg.equals(ww)
                if not vals_match:
                    diff = (gg != ww).any(axis=1)
                    print(f"--- {name} first diffs:")
                    print(gg[diff].head(3))
                    print(ww[diff].head(3))
            except Exception as e:  # noqa: BLE001
                print(f"--- {name} compare error: {e!r}")
        out[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "vals_match": vals_match,
            "got_rows": len(got),
            "want_rows": len(want),
            "got_schema": [f"{c}:{got[c].dtype}" for c in got.columns],
            "want_schema": [f"{c}:{want[c].dtype}" for c in want.columns],
        }
        status = "OK" if rows_match and schema_match and vals_match else "FAIL"
        print(f"{status} {name}: {json.dumps(out[name])}")
    n_ok = sum(1 for v in out.values() if v.get("vals_match"))
    print(f"\n{n_ok}/{len(out)} green")


if __name__ == "__main__":
    main()
