"""Stream-shaped operators over the ordered events log.

Ray Data has no event-time windows; the engine expresses them the
idiomatic way (ray_guide): treat `events` as a partitioned ordered log,
``groupby(key).map_groups`` with the windowing fold over the sorted
group. The partition key (user_id) is the ordering scope — the same
assumption a real streaming shuffle would make.

- as-of join: for each 'click', the most recent strictly-prior 'view'
  by the same user (pd.merge_asof per user group; DuckDB ASOF JOIN
  oracle).
- session windows: per-user sessions split at >30 min gaps.

All outputs are integer-scaled (epoch microseconds / cents) for exact
oracle hashing.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from .util import round_half_away_e

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _events(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/events.parquet",
                           columns=["event_id", "ts", "user_id", "event_type", "value"])


def asof_click_view(sf_dir: str):
    """Inner as-of join: click → latest strictly-prior view, per user.

    Output: click_event_id, user_id, click_ts_us, view_event_id,
    view_value_cents.

    Tie-break contract: among multiple views by the same user sharing
    the maximal prior timestamp, the MAX event_id wins. Equal-ts views
    are deduped to that winner BEFORE the as-of join on both the engine
    and the SQL-oracle side, so the result is deterministic even when
    the events table contains duplicate (user_id, ts) view rows.
    """
    ds = _events(sf_dir)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        clicks = df[df["event_type"] == "click"][["event_id", "ts", "user_id"]]
        views = df[df["event_type"] == "view"][["event_id", "ts", "value"]] \
            .drop_duplicates(subset="ts", keep="last")  # max event_id per ts
        empty = pd.DataFrame({
            "click_event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "click_ts_us": pd.Series([], dtype="int64"),
            "view_event_id": pd.Series([], dtype="int64"),
            "view_value_cents": pd.Series([], dtype="int64")})
        if clicks.empty or views.empty:
            return empty
        merged = pd.merge_asof(
            clicks.rename(columns={"event_id": "click_event_id"}),
            views.rename(columns={"event_id": "view_event_id", "value": "view_value"}),
            on="ts", direction="backward", allow_exact_matches=False)
        merged = merged.dropna(subset=["view_event_id"])
        if merged.empty:
            return empty
        out = pd.DataFrame({
            "click_event_id": merged["click_event_id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "click_ts_us": merged["ts"].astype("int64"),
            "view_event_id": merged["view_event_id"].astype("int64"),
            "view_value_cents": round_half_away_e(
                merged["view_value"].to_numpy(), scale=100),
        })
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def session_windows(sf_dir: str, gap_us: int = SESSION_GAP_US):
    """Per-user session windows (gap-based): a new session starts when
    the gap to the previous event exceeds ``gap_us``.

    Output: user_id, session_idx (1-based), n_events, start_us, end_us.
    """
    ds = _events(sf_dir)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        ts_us = df["ts"].astype("int64")
        brk = (ts_us.diff().isna() | (ts_us.diff() > gap_us)).astype("int64")
        sess = brk.cumsum()
        g = pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                          "session_idx": sess.astype("int64"),
                          "ts_us": ts_us})
        agg = g.groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("ts_us", "size"), start_us=("ts_us", "min"), end_us=("ts_us", "max"))
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
