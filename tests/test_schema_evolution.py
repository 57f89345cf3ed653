"""Union-by-name reads over schema-drifted parquet fragments."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastie_ray.ops.schema_evolution import read_union_by_name, union_schema


def _write(tmp_path, name, df, schema=None):
    p = str(tmp_path / name)
    t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(t, p)
    return p


def test_union_schema_order_and_conflict(tmp_path):
    a = _write(tmp_path, "a.parquet", pd.DataFrame({"x": [1], "y": ["s"]}))
    b = _write(tmp_path, "b.parquet", pd.DataFrame({"y": ["t"], "z": [0.5]}))
    s = union_schema([a, b])
    assert s.names == ["x", "y", "z"]
    assert s.field("z").type == pa.float64()

    c = _write(tmp_path, "c.parquet", pd.DataFrame({"x": ["notint"]}))
    with pytest.raises(TypeError):
        union_schema([a, c])


def test_read_union_by_name_fills_typed_nulls(ray_session, tmp_path):
    a = _write(
        tmp_path, "a.parquet", pd.DataFrame({"id": [1, 2], "v": [10, 20]})
    )
    # different column order AND an extra column
    b = _write(
        tmp_path,
        "b.parquet",
        pd.DataFrame({"lang": ["en", "de"], "id": [3, 4], "v": [30, 40]}),
    )
    ds = read_union_by_name([a, b])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "v", "lang"]
    assert df["lang"].tolist() == [None, None, "en", "de"]
    assert df["v"].tolist() == [10, 20, 30, 40]

    # column pruning keeps null-filled fragments contributing rows
    df2 = (
        read_union_by_name([a, b], columns=["id", "lang"])
        .to_pandas()
        .sort_values("id")
    )
    assert list(df2.columns) == ["id", "lang"]
    assert len(df2) == 4


def test_read_union_groups_by_signature(ray_session, tmp_path):
    # 4 files, 2 schema generations -> downstream agg still exact
    paths = []
    for i in range(4):
        if i % 2:
            df = pd.DataFrame({"id": [i * 10], "v": [i], "lang": ["en"]})
        else:
            df = pd.DataFrame({"id": [i * 10], "v": [i]})
        paths.append(_write(tmp_path, f"f{i}.parquet", df))
    ds = read_union_by_name(sorted(paths))
    df = ds.to_pandas()
    assert len(df) == 4
    assert int(df["v"].sum()) == 6
    assert df["lang"].notna().sum() == 2
