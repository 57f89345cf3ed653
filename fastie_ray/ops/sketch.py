"""Mergeable distinct-count sketch (HyperLogLog registers) — the
canonical 100-TB cardinality pattern: per shard a FIXED-SIZE register
array, merged by element-wise max, estimate computed once at the end.
An exact distinct count shuffles the vocabulary; the sketch ships
``n_registers`` bytes per shard regardless of corpus size.

Determinism / oracle design: the registers themselves are
integer-exact and engine-independent (md5-derived hash, trailing-zero
rank), so the SKETCH STATE is SQL-verifiable bit-for-bit:

    h        = int(md5(value)[:15 hex], 16)        (60-bit, positive)
    register = h % n_registers
    rho      = trailing_zeros(h // n_registers) + 1
               (SQL: bit_count((x & -x) - 1) + 1)

and the oracle is ``GROUP BY register → max(rho)``. The float HLL
ESTIMATE (harmonic mean + bias constant) is derived from the state on
the driver and pinned by pytest to ≤ a few % relative error — it is
deliberately NOT part of the driver-compared output (cross-engine
float formatting).

Per-batch combiner: values hash vectorized once per DISTINCT value,
registers reduce with ``np.maximum.at``; partial register arrays are
``n_registers`` ints each and merge on the driver (blocks × registers
rows — the bounded-small-side pattern).
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _hash60(values) -> np.ndarray:
    return np.fromiter(
        (int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) for v in values),
        dtype=np.int64,
        count=len(values),
    )


def hll_registers(
    ds: "ray.data.Dataset",
    col: str,
    n_registers: int = 256,
) -> pd.DataFrame:
    """(register, max_rho) sketch state for the distinct values of
    ``col`` — registers never hit by any value are absent (max_rho
    would be 0), matching the SQL GROUP BY."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = pd.unique(df[col].dropna().astype(str))
        if len(v) == 0:
            return pd.DataFrame(
                {"register": pd.Series([], dtype="int64"),
                 "max_rho": pd.Series([], dtype="int64")}
            )
        h = _hash60(v)
        reg = h % n_registers
        rest = h // n_registers
        rho = np.zeros(len(v), dtype=np.int64)
        nz = rest != 0
        low = rest[nz] & -rest[nz]
        # trailing zeros + 1 via log2 of the isolated lowest bit (exact
        # for powers of two)
        rho[nz] = np.log2(low.astype(np.float64)).astype(np.int64) + 1
        rho[~nz] = 61  # all-zero remainder: maximal rank for 60-bit hash
        regs = np.zeros(n_registers, dtype=np.int64)
        np.maximum.at(regs, reg, rho)
        idx = np.nonzero(regs)[0]
        return pd.DataFrame(
            {"register": idx.astype("int64"), "max_rho": regs[idx]}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"register": pd.Series([], dtype="int64"),
             "max_rho": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("register", as_index=False)["max_rho"].max()
    return out.astype("int64").sort_values("register").reset_index(drop=True)


def hll_estimate(registers: pd.DataFrame, n_registers: int = 256) -> float:
    """Standard HLL estimate from the register state (driver-side
    float; pinned by tests, not by the SQL oracle)."""
    m = n_registers
    rho = np.zeros(m, dtype=np.int64)
    if len(registers):
        rho[registers["register"].to_numpy()] = registers["max_rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-rho.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((rho == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def hll_registers_grouped(
    ds: "ray.data.Dataset",
    col: str,
    group_col: str,
    n_registers: int = 256,
) -> pd.DataFrame:
    """(group, register, max_rho) — one sketch per group value. The
    per-batch partial is groups × registers ints; the merge is a
    driver max over blocks × groups × registers rows (group domains
    are bounded; for unbounded groups swap the driver merge for one
    bucketed exchange keyed on (group, register))."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pairs = df[[group_col, col]].dropna().astype(str).drop_duplicates()
        if len(pairs) == 0:
            return pd.DataFrame(
                {"group": pd.Series([], dtype=object),
                 "register": pd.Series([], dtype="int64"),
                 "max_rho": pd.Series([], dtype="int64")}
            )
        h = _hash60(pairs[col])
        rest = h // n_registers
        rho = np.full(len(h), 61, dtype=np.int64)
        nz = rest != 0
        low = rest[nz] & -rest[nz]
        rho[nz] = np.log2(low.astype(np.float64)).astype(np.int64) + 1
        out = pd.DataFrame(
            {
                "group": pairs[group_col].to_numpy(),
                "register": h % n_registers,
                "rho": rho,
            }
        )
        g = out.groupby(["group", "register"], as_index=False)["rho"].max()
        return g.rename(columns={"rho": "max_rho"}).astype(
            {"register": "int64", "max_rho": "int64"}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"group": pd.Series([], dtype=object),
             "register": pd.Series([], dtype="int64"),
             "max_rho": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["group", "register"], as_index=False)["max_rho"].max()
    return out.astype({"register": "int64", "max_rho": "int64"}).sort_values(
        ["group", "register"]
    ).reset_index(drop=True)


# ----------------------------------------------------------- count-min

def cms_token_registers(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
) -> pd.DataFrame:
    """Count-min sketch over the token stream of ``text_col`` — the
    mergeable COUNTER sketch complementing the HLL distinct sketch: a
    fixed ``depth × width`` integer grid per shard, merged by
    element-wise SUM, point-frequency estimated as the min over depth
    rows. At 100 TB each shard ships ``depth*width`` ints regardless
    of vocabulary size; an exact token count shuffles the vocabulary.

    Tokenization matches the repo-wide oracle convention
    (``lower(regexp_extract_all(text, '[A-Za-z0-9]+'))``). Register
    state is integer-exact and SQL-verifiable:

        cell(d, token) = int(md5(f"{d}:{token}")[:15 hex], 16) % width
        register[d][cell] = Σ count(token) over tokens mapping there

    The float-free ESTIMATE (min over rows) is derived on the driver
    and pinned by pytest (upper bound; exact while rows are sparse).

    Per-batch combiner: tokenize vectorized, count with
    ``value_counts``, hash each DISTINCT token depth times, scatter-add
    with ``np.add.at``; partials are (d, cell, count) rows bounded by
    ``depth × width`` per batch and groupby-sum on the driver (the
    bounded-small-side pattern, same as ``hll_registers``)."""

    import re

    token_re = re.compile(r"[A-Za-z0-9]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].dropna().str.lower().str.findall(token_re).explode()
        toks = toks.dropna()
        if len(toks) == 0:
            return pd.DataFrame(
                {"d": pd.Series([], dtype="int64"),
                 "cell": pd.Series([], dtype="int64"),
                 "count": pd.Series([], dtype="int64")}
            )
        counts = toks.value_counts()
        vals = counts.index.to_numpy()
        n = counts.to_numpy(dtype=np.int64)
        frames = []
        for d in range(depth):
            h = _hash60([f"{d}:{v}" for v in vals]) % width
            grid = np.zeros(width, dtype=np.int64)
            np.add.at(grid, h, n)
            idx = np.nonzero(grid)[0]
            frames.append(pd.DataFrame(
                {"d": np.full(len(idx), d, dtype=np.int64),
                 "cell": idx.astype("int64"),
                 "count": grid[idx]}
            ))
        return pd.concat(frames, ignore_index=True)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"d": pd.Series([], dtype="int64"),
             "cell": pd.Series([], dtype="int64"),
             "count": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["d", "cell"], as_index=False)["count"].sum()
    return out.astype("int64").sort_values(["d", "cell"]).reset_index(drop=True)


def cms_estimate(
    registers: pd.DataFrame,
    tokens,
    depth: int = 4,
    width: int = 512,
) -> dict:
    """Point-frequency estimates (min over depth rows) from the sketch
    state — driver-side, pinned by tests, not driver-compared."""
    grid = np.zeros((depth, width), dtype=np.int64)
    if len(registers):
        grid[registers["d"].to_numpy(), registers["cell"].to_numpy()] = (
            registers["count"].to_numpy()
        )
    out = {}
    for tok in tokens:
        cells = _hash60([f"{d}:{tok}" for d in range(depth)]) % width
        out[tok] = int(grid[np.arange(depth), cells].min())
    return out


def kmv_sketch(
    ds: "ray.data.Dataset",
    col: str,
    k: int = 256,
    salt: str = "kmv",
) -> pd.DataFrame:
    """K-MINIMUM-VALUES distinct sketch (Bar-Yossef et al. 2002; the
    Theta-sketch family): the ``k`` smallest 60-bit md5 hashes of the
    DISTINCT values — a fixed-size, MERGEABLE, deterministic state
    (same data → same sketch → SQL-exact, like the HLL/CMS states
    above). Per-batch bottom-k combiner (blocks × k rows merge on the
    driver); returns the sorted (h,) hash frame."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna().drop_duplicates()
        h = _hash60(salt + ":" + v.astype(str))
        return pd.DataFrame({"h": np.sort(h)[:k]})

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    h = np.unique(cand["h"].to_numpy())[:k]
    return pd.DataFrame({"h": h.astype(np.int64)})


def kmv_overlap_estimate(
    sk_a: pd.DataFrame, sk_b: pd.DataFrame, k: int = 256
) -> pd.DataFrame:
    """Set algebra on two KMV sketches, all-integer:

        merged   = k smallest of S_A ∪ S_B (the KMV of A ∪ B)
        union̂    = (k−1) · 2⁶⁰ // merged[k−1]   (k-th minimum inverts
                   the density of distinct hashes)
        jaccard̂  = |merged ∩ S_A ∩ S_B| / k
        inter̂    = ⌊jaccard̂_num · union̂ / k⌋

    Deterministic given the data, so the driver oracle reproduces
    every number from the same ORDER BY hash LIMIT k construction.
    Returns one row (n_common, union_est, inter_est)."""
    a = set(sk_a["h"].to_numpy().tolist())
    b = set(sk_b["h"].to_numpy().tolist())
    merged = np.sort(np.array(sorted(a | b), dtype=np.int64))[:k]
    mset = set(merged.tolist())
    common = len(mset & a & b)
    if len(merged) >= k:
        kth = int(merged[-1])
        union_est = (k - 1) * (1 << 60) // max(kth, 1)
    else:
        # sketch never filled: it IS the exact distinct hash set
        union_est = len(merged)
    inter_est = common * union_est // max(len(merged), 1)
    return pd.DataFrame(
        {
            "n_common": [np.int64(common)],
            "union_est": [np.int64(union_est)],
            "inter_est": [np.int64(inter_est)],
        }
    )


def kmv_distinct_grouped(
    ds: "ray.data.Dataset",
    group_col: str,
    col: str,
    k: int = 64,
    salt: str = "kmvg",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-group KMV distinct-count estimate — the grouped companion of
    ``kmv_sketch`` (distinct users per event type at 100 TB without a
    per-group exact distinct). Returns one row per group
    (group, n_hashes, kth, distinct_est):

        distinct_est = (k−1) · 2⁶⁰ // kth      if the sketch filled,
                       n_hashes (exact)        otherwise

    Deterministic (md5 hashes, integer division) → SQL-exact via the
    same ORDER BY hash LIMIT k construction per group.

    Scale shape: per-batch per-group bottom-k over batch-DISTINCT
    values (each batch ships ≤ k·groups_in_batch rows) → ONE
    group-bucketed exchange → per-group merge + estimate."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = pd.DataFrame({"g": df[group_col], "v": df[col]}).drop_duplicates()
        sub["h"] = _hash60(salt + ":" + sub["v"].astype(str))
        sub = sub.sort_values(["g", "h"]).groupby("g", as_index=False).head(k)
        out = sub[["g", "h"]].drop_duplicates()
        hgr = pd.util.hash_pandas_object(out["g"], index=False).to_numpy()
        out = out.assign(
            __b=(hgr % np.uint64(n_buckets)).astype(np.int64)
        )
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates()
        rows = []
        for grp, sub in g.groupby("g", sort=True):
            h = np.unique(sub["h"].to_numpy(dtype=np.int64))[:k]
            if len(h) >= k:
                kth = int(h[-1])
                est = (k - 1) * (1 << 60) // max(kth, 1)
            else:
                kth = int(h[-1]) if len(h) else 0
                est = len(h)
            rows.append((grp, len(h), kth, est))
        return pd.DataFrame(
            rows, columns=["group", "n_hashes", "kth", "distinct_est"]
        ).astype({"n_hashes": "int64", "kth": "int64", "distinct_est": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def hll_sliding_registers(
    ds: "ray.data.Dataset",
    col: str,
    ts_col: str = "ts",
    window_days: int = 7,
    n_registers: int = 256,
) -> pd.DataFrame:
    """Sliding-window distinct-count sketches: for every day present
    in the data, the HLL register state of the TRAILING
    ``window_days`` days — the "weekly active users per day" shape.
    This is the property that makes HLL the streaming distinct
    counter: daily sketches are built once and window counts are
    register MAX-merges, never a re-scan of the window's raw events
    (an exact trailing-window COUNT DISTINCT must re-touch every
    event ``window_days`` times).

    Scale shape: the per-batch partial is days × registers ints
    (fixed size per batch); daily states merge on the driver (the day
    domain is time-bounded by construction) and the window merge is a
    days × window × registers rolling max — all driver-sized. Returns
    (day, register, max_rho) int64 rows, day = epoch day."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[[ts_col, col]].dropna()
        day = (
            pd.to_datetime(sub[ts_col])
            .to_numpy()
            .astype("datetime64[D]")
            .astype("int64")
        )
        pairs = pd.DataFrame(
            {"day": day, "v": sub[col].astype(str)}
        ).drop_duplicates()
        if len(pairs) == 0:
            return pd.DataFrame(
                {"day": pd.Series([], dtype="int64"),
                 "register": pd.Series([], dtype="int64"),
                 "max_rho": pd.Series([], dtype="int64")}
            )
        h = _hash60(pairs["v"])
        rest = h // n_registers
        rho = np.full(len(h), 61, dtype=np.int64)
        nz = rest != 0
        low = rest[nz] & -rest[nz]
        rho[nz] = np.log2(low.astype(np.float64)).astype(np.int64) + 1
        out = pd.DataFrame(
            {"day": pairs["day"].to_numpy(), "register": h % n_registers,
             "rho": rho}
        )
        g = out.groupby(["day", "register"], as_index=False)["rho"].max()
        return g.rename(columns={"rho": "max_rho"}).astype("int64")

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"day": pd.Series([], dtype="int64"),
             "register": pd.Series([], dtype="int64"),
             "max_rho": pd.Series([], dtype="int64")}
        )
    daily = parts.groupby(["day", "register"], as_index=False)[
        "max_rho"
    ].max()
    rows = []
    for d in sorted(daily["day"].unique()):
        win = daily[
            (daily["day"] >= d - (window_days - 1)) & (daily["day"] <= d)
        ]
        m = win.groupby("register", as_index=False)["max_rho"].max()
        m.insert(0, "day", d)
        rows.append(m)
    out = pd.concat(rows, ignore_index=True)
    return out.astype("int64").sort_values(["day", "register"]).reset_index(
        drop=True
    )


def bloom_fpr(
    members: "ray.data.Dataset",
    probes: "ray.data.Dataset",
    member_col: str,
    probe_col: str,
    m_bits: int = 8192,
    k_hashes: int = 3,
) -> pd.DataFrame:
    """MEASURED Bloom-filter false-positive rate: build an
    ``m_bits``-bit filter from the member keys (k md5-derived
    positions each), probe it with keys KNOWN to be non-members, and
    report the observed FPR next to the filter's fill — the audit that
    tells you whether a planned bloom prefilter (``ops.join``'s
    bloom_join, ``dedup_against``) actually delivers its paper rate on
    YOUR key distribution. md5 positions make it bit-reproducible in
    SQL. Returns one row: (n_probes, n_fp, fpr_e6, n_bits_set).

    Scale shape: the built filter is the DISTINCT position set —
    ≤ m_bits ints — reduced by per-batch combiners and broadcast once;
    probing is an embarrassingly parallel membership map with
    (n, fp) scalar partials."""
    import hashlib

    def positions(v, i: int) -> int:
        return int(
            hashlib.md5(f"b{i}:{v}".encode()).hexdigest()[:15], 16
        ) % m_bits

    def member_pos(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[member_col].drop_duplicates()
        ps = {
            positions(v, i) for v in vals for i in range(k_hashes)
        }
        return pd.DataFrame({"p": sorted(ps)})

    bits = frozenset(
        members.map_batches(member_pos, batch_format="pandas")
        .to_pandas()["p"]
        .unique()
        .tolist()
    )

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        fp = 0
        for v in df[probe_col]:
            if all(positions(v, i) in bits for i in range(k_hashes)):
                fp += 1
        return pd.DataFrame(
            {"n": [np.int64(len(df))], "fp": [np.int64(fp)]}
        )

    parts = probes.map_batches(probe, batch_format="pandas").to_pandas()
    n, fp = int(parts["n"].sum()), int(parts["fp"].sum())
    return pd.DataFrame(
        {
            "n_probes": [n],
            "n_fp": [fp],
            "fpr_e6": [fp * 1_000_000 // max(n, 1)],
            "n_bits_set": [len(bits)],
        }
    ).astype("int64")
