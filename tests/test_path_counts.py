"""Event-path mining (`ops/sequence.path_counts[_scalable]`):
brute-force parity, single-exchange vs two-phase parity across chunk
widths, and n-gram lengths 2/3/4."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.sequence import path_counts, path_counts_scalable


def _events(seed=19, n=1500, users=12):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "event_type": rng.choice(list("ABCD"), n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 12 * 86400, n), unit="s"),
        }
    )


def _ref(df: pd.DataFrame, n: int) -> pd.DataFrame:
    rows = []
    for _, grp in df.sort_values(["user_id", "ts", "event_id"]).groupby(
        "user_id"
    ):
        ts = list(grp["event_type"])
        rows.extend(tuple(ts[i:i + n]) for i in range(len(ts) - n + 1))
    tcols = [f"t{i}" for i in range(n)]
    out = pd.DataFrame(rows, columns=tcols)
    out = out.groupby(tcols, as_index=False).size().rename(
        columns={"size": "n_paths"}
    )
    out["n_paths"] = out["n_paths"].astype("int64")
    return out.sort_values(tcols).reset_index(drop=True)


def test_path_counts_bruteforce(ray_session):
    df = _events()
    ds = ray.data.from_pandas(df).repartition(4)
    for n in (2, 3, 4):
        got = path_counts(ds, n=n, n_buckets=4)
        pd.testing.assert_frame_equal(got, _ref(df, n), check_dtype=False), n


def test_path_counts_scalable_parity(ray_session):
    df = _events(seed=29)
    ds = ray.data.from_pandas(df).repartition(4)
    for n in (2, 3):
        want = _ref(df, n)
        for bucket in ("6h", "1d", "30d"):
            got = path_counts_scalable(ds, n=n, bucket=bucket, n_buckets=4)
            pd.testing.assert_frame_equal(
                got, want, check_dtype=False
            ), (n, bucket)


def test_path_counts_sparse_chunks(ray_session):
    # one event per chunk: every n-gram crosses chunks (pure phase 2)
    df = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "user_id": np.zeros(6, dtype=np.int64),
            "event_type": list("ABABAB"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(np.arange(6) * 5, unit="D"),
        }
    )
    got = path_counts_scalable(
        ray.data.from_pandas(df), n=3, bucket="1d", n_buckets=2
    )
    pd.testing.assert_frame_equal(got, _ref(df, 3), check_dtype=False)


def test_gap_regularity_flags_metronome_not_human(ray_session):
    from fastie_ray.ops.sequence import gap_regularity

    rng = np.random.default_rng(73)
    rows = []
    # bot: exact 30 s cadence
    for i in range(20):
        rows.append((i, 1, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=30 * i)))
    # human: bursty gaps
    t = pd.Timestamp("2024-01-01")
    for i in range(20):
        t += pd.Timedelta(seconds=int(rng.integers(5, 4000)))
        rows.append((100 + i, 2, t))
    # too few events to flag, even though regular
    for i in range(3):
        rows.append((200 + i, 3, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=60 * i)))
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    got = (
        gap_regularity(
            ray.data.from_pandas(df).repartition(3),
            min_gaps=8, cv2_thresh_e6=10_000, n_buckets=4,
        )
        .to_pandas()
        .set_index("user_id")
    )
    assert got.loc[1, "flagged"] == 1 and got.loc[1, "var_num"] == 0
    assert got.loc[2, "flagged"] == 0 and got.loc[2, "cv2_e6"] > 10_000
    assert got.loc[3, "flagged"] == 0 and got.loc[3, "n_gaps"] == 2
    # exact stats vs brute force for the human (seconds from µs)
    tus = (
        df[df["user_id"] == 2].sort_values("ts")["ts"]
        .astype("datetime64[us]").astype("int64").to_numpy()
    )
    gs = np.diff(tus) // 1_000_000
    n, s, ss = len(gs), int(gs.sum()), int((gs.astype(object) ** 2).sum())
    assert got.loc[2, "n_gaps"] == n
    assert got.loc[2, "gap_sum_s"] == s
    assert got.loc[2, "var_num"] == n * ss - s * s
