"""Stream-shaped operators over the ordered events log.

Ray Data has no event-time windows; the engine expresses them the
idiomatic way (ray_guide): treat `events` as a partitioned ordered log
and window inside partitions. The partition key is a HASH BUCKET of
user_id, not user_id itself — ``groupby(user).map_groups`` would pay
one Python/pandas call per user (10^8 calls at web scale), while
bucketing pays one call per bucket and runs the windowing fold
vectorized over every user in the bucket. Bucket count is sized from
the parquet row count (~1M rows/bucket) so a bucket block always fits
a worker's heap; at 100 TB the bucket id is the storage partition key
and this groupby becomes a co-located no-shuffle pass.

- as-of join: for each 'click', the most recent strictly-prior 'view'
  by the same user (vectorized ``pd.merge_asof(by="user_id")`` per
  bucket; DuckDB ASOF JOIN oracle).
- session windows: per-user sessions split at >30 min gaps (vectorized
  break detection: user-change OR gap, one cumsum per bucket).

All outputs are integer-scaled (epoch microseconds / cents) for exact
oracle hashing.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .util import round_half_away_e

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes

ROWS_PER_BUCKET = 1_000_000  # ~dozens of MB per bucket block


def _events_bucketed(sf_dir: str, num_buckets: int | None = None,
                     columns: list[str] | None = None):
    """Events Dataset with a deterministic user-hash ``bucket`` column
    (Knuth multiplicative hash so sequential user_ids still spread).
    ``columns`` prunes the read (must include ``user_id``)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    if num_buckets is None:
        from .util import bucket_count
        n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        num_buckets = bucket_count(n, ROWS_PER_BUCKET)

    from .util import strip_schema_metadata

    # metadata-free blocks keep the bucket groupby on the hashable-
    # schema dedup fast path (util.strip_schema_metadata)
    ds = strip_schema_metadata(rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=columns or ["event_id", "ts", "user_id", "event_type",
                            "value"]))

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = ((uid * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)) % num_buckets
        return batch.append_column("bucket", pa.array(bucket.astype(np.int64)))

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def asof_click_view(sf_dir: str, num_buckets: int | None = None):
    """Inner as-of join: click → latest strictly-prior view, per user.

    Output: click_event_id, user_id, click_ts_us, view_event_id,
    view_value_cents.

    Tie-break contract: among multiple views by the same user sharing
    the maximal prior timestamp, the MAX event_id wins. Equal-ts views
    are deduped to that winner BEFORE the as-of join on both the engine
    and the SQL-oracle side, so the result is deterministic even when
    the events table contains duplicate (user_id, ts) view rows.
    """
    ds = _events_bucketed(sf_dir, num_buckets)

    empty = pd.DataFrame({
        "click_event_id": pd.Series([], dtype="int64"),
        "user_id": pd.Series([], dtype="int64"),
        "click_ts_us": pd.Series([], dtype="int64"),
        "view_event_id": pd.Series([], dtype="int64"),
        "view_value_cents": pd.Series([], dtype="int64")})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized as-of over every user in the bucket: merge_asof
        # with by= does the per-user backward search in C
        df = df.sort_values(["ts", "event_id"], kind="stable")
        clicks = df[df["event_type"] == "click"][["event_id", "ts", "user_id"]]
        views = df[df["event_type"] == "view"][["event_id", "ts", "user_id", "value"]] \
            .drop_duplicates(subset=["user_id", "ts"], keep="last")  # max event_id per ts
        if clicks.empty or views.empty:
            return empty
        merged = pd.merge_asof(
            clicks.rename(columns={"event_id": "click_event_id"}),
            views.rename(columns={"event_id": "view_event_id", "value": "view_value"}),
            on="ts", by="user_id", direction="backward", allow_exact_matches=False)
        merged = merged.dropna(subset=["view_event_id"])
        if merged.empty:
            return empty
        return pd.DataFrame({
            "click_event_id": merged["click_event_id"].astype("int64"),
            "user_id": merged["user_id"].astype("int64"),
            "click_ts_us": merged["ts"].astype("int64"),
            "view_event_id": merged["view_event_id"].astype("int64"),
            "view_value_cents": round_half_away_e(
                merged["view_value"].to_numpy(), scale=100),
        })

    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def session_windows(sf_dir: str, gap_us: int = SESSION_GAP_US,
                    num_buckets: int | None = None):
    """Per-user session windows (gap-based): a new session starts when
    the gap to the previous event exceeds ``gap_us``.

    Output: user_id, session_idx (1-based), n_events, start_us, end_us.
    """
    ds = _events_bucketed(sf_dir, num_buckets)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(dtype=np.int64)
        ts_us = df["ts"].to_numpy(dtype=np.int64)
        new_user = np.empty(len(df), dtype=bool)
        new_user[:1] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(df), dtype=bool)
        gap[:1] = True
        gap[1:] = (ts_us[1:] - ts_us[:-1]) > gap_us
        sid = np.cumsum(new_user | gap)  # global session id within bucket
        g = pd.DataFrame({"user_id": uid, "sid": sid, "ts_us": ts_us})
        agg = g.groupby(["user_id", "sid"], as_index=False).agg(
            n_events=("ts_us", "size"), start_us=("ts_us", "min"),
            end_us=("ts_us", "max"))
        # 1-based per-user session index from the global id
        agg["session_idx"] = (agg["sid"]
                              - agg.groupby("user_id")["sid"].transform("min")
                              + 1).astype("int64")
        agg["n_events"] = agg["n_events"].astype("int64")
        return agg[["user_id", "session_idx", "n_events", "start_us", "end_us"]]

    return ds.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


TRANSITION_END = "END"


HOT_MAX_USERS = 64            # cap on auto-salted keys per run
HOT_SLICES_MIN = 8            # minimum time slices per hot user


def _hot_user_scan(sf_dir: str, num_buckets: int):
    """Hot-key detection for the user-bucket exchange — the ACTING
    counterpart of ``relational.key_skew_report``'s fanout report,
    done as a single narrow (user_id, ts) scan with NO exchange via
    the heavy-hitters pigeonhole: a user with global share > 1/B must
    be locally heavy (count*B > n_b) in at least one batch, so the
    per-batch local heavies (each batch ships <= B candidate rows +
    one stats row) form a driver-foldable superset. The driver keeps
    users whose summed local-heavy counts (a LOWER bound on their true
    count) still exceed rows/B — i.e. keys guaranteed to dominate a
    whole average bucket — capped at ``HOT_MAX_USERS``. Returns
    (sorted hot ids, ts_min, ts_max)."""
    import ray.data as rd

    from .util import strip_schema_metadata

    ds = strip_schema_metadata(rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]))

    def scan(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ts = batch["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, cnts = np.unique(uid, return_counts=True)
        heavy = cnts * num_buckets > len(uid)
        ids, cnts = ids[heavy], cnts[heavy]
        return pa.table({
            "user_id": pa.array(np.r_[ids, [-1]], type=pa.int64()),
            "cnt": pa.array(np.r_[cnts, [len(uid)]], type=pa.int64()),
            "v0": pa.array(np.r_[np.zeros(len(ids), np.int64),
                                 [ts.min() if len(ts) else 0]]),
            "v1": pa.array(np.r_[np.zeros(len(ids), np.int64),
                                 [ts.max() if len(ts) else 0]]),
        })

    rows = pa.concat_tables(
        [b for b in ds.map_batches(scan, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow") if len(b)])
    uid = rows["user_id"].to_numpy(zero_copy_only=False)
    cnt = rows["cnt"].to_numpy(zero_copy_only=False)
    stats = uid == -1
    total = int(cnt[stats].sum())
    ts_min = int(rows["v0"].to_numpy(zero_copy_only=False)[stats].min())
    ts_max = int(rows["v1"].to_numpy(zero_copy_only=False)[stats].max())
    cand = pd.Series(cnt[~stats]).groupby(uid[~stats]).sum()
    cand = cand[cand * num_buckets > total]
    hot = cand.sort_values(ascending=False).head(HOT_MAX_USERS)
    return np.sort(hot.index.to_numpy(np.int64)), ts_min, ts_max


def event_transitions(sf_dir: str, num_buckets: int | None = None,
                      salt_hot: bool | None = None,
                      n_slices: int | None = None):
    """Per-user next-event transition matrix (Markov counts): for each
    event ordered by (ts, event_id) within a user, count the pair
    (event_type, next_event_type); a user's last event transitions to
    the literal ``'END'``.

    Output: event_type, next_event_type, n_pairs — a bounded
    (n_types+1)² table.

    At-scale shape: the lead() is bucket-local (a user's events hash to
    ONE bucket), so each bucket does a single vectorized shift +
    groupby-count; the exchange moves ≤(n_types+1)² partial rows per
    bucket, never events. SQL twin: lead() OVER (PARTITION BY user_id
    ORDER BY ts, event_id) with COALESCE to 'END'.

    SKEW (r5): a hot user breaks the 'a user fits one bucket' sizing —
    one fold serializes behind the exchange while every other worker
    idles. ``salt_hot=None`` (the default) AUTO-detects hot users with
    the pigeonhole scan (``_hot_user_scan`` — the acting form of
    ``key_skew_report``'s fanout measurement) and, when any exist,
    gives each hot user its OWN block of ``n_slices`` time-sliced
    buckets: slice-internal transitions fold in parallel and each
    slice emits ONE boundary row (first/last type), so the exact
    cross-slice pairs are re-derived in the bounded finish (<=
    HOT_MAX_USERS x n_slices rows). Results are bit-identical with
    and without salting (tested); ``salt_hot=False`` forces the plain
    path, ``salt_hot=True`` requires detection to find at least one
    hot user (loud otherwise — a misconfigured forced run should not
    silently fall back).
    """
    import ray

    from .util import bucket_count, finish_grouped

    if num_buckets is None:
        import pyarrow.parquet as pq
        n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
        num_buckets = bucket_count(n, ROWS_PER_BUCKET)

    hot_ids = np.array([], np.int64)
    if salt_hot is not False:
        hot_ids, ts_min, ts_max = _hot_user_scan(sf_dir, num_buckets)
        if salt_hot and not len(hot_ids):
            raise ValueError("event_transitions(salt_hot=True): no hot "
                             "user detected — nothing to salt")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(dtype=np.int64)
        et = df["event_type"].to_numpy()
        nxt = np.full(len(df), TRANSITION_END, dtype=object)
        if len(df) > 1:
            same = uid[1:] == uid[:-1]
            nxt[:-1] = np.where(same, et[1:], TRANSITION_END)
        g = pd.DataFrame({"event_type": et, "next_event_type": nxt})
        out = g.groupby(["event_type", "next_event_type"],
                        as_index=False).size()
        out = out.rename(columns={"size": "n_pairs"})
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return out

    if not len(hot_ids):
        ds = _events_bucketed(sf_dir, num_buckets)
        return finish_grouped(
            ds.groupby("bucket").map_groups(per_bucket,
                                            batch_format="pandas"),
            ["event_type", "next_event_type"])

    # ---- salted path ----
    if n_slices is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        n_slices = max(HOT_SLICES_MIN, cpus)
    span = max(ts_max - ts_min + 1, 1)
    ref = ray.put(hot_ids)

    ds = _events_bucketed(sf_dir, num_buckets)

    def resalt(batch: pa.Table) -> pa.Table:
        hot = ray.get(ref)
        uid = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bucket = batch["bucket"].to_numpy(zero_copy_only=False).copy()
        pos = np.searchsorted(hot, uid)
        pos_c = np.minimum(pos, len(hot) - 1)
        is_hot = hot[pos_c] == uid
        if is_hot.any():
            ts = batch["ts"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sl = np.minimum((ts[is_hot] - ts_min) * n_slices // span,
                            n_slices - 1)
            bucket[is_hot] = num_buckets + pos_c[is_hot] * n_slices + sl
        return batch.set_column(
            batch.schema.get_field_index("bucket"), "bucket",
            pa.array(bucket, pa.int64()))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["bucket"].iat[0])
        if b < num_buckets:
            out = per_bucket(df)
            out["user_id"] = np.int64(-1)
            out["slice"] = np.int64(-1)
            out["kind"] = np.int64(0)
            return out
        # one hot user, one time slice: internal pairs + ONE boundary
        # row carrying (first type -> event_type, last type ->
        # next_event_type) for the exact cross-slice merge
        df = df.sort_values(["ts", "event_id"], kind="stable")
        et = df["event_type"].to_numpy()
        g = pd.DataFrame({"event_type": et[:-1], "next_event_type": et[1:]})
        out = g.groupby(["event_type", "next_event_type"],
                        as_index=False).size() \
            .rename(columns={"size": "n_pairs"})
        out["n_pairs"] = out["n_pairs"].astype("int64")
        out["kind"] = np.int64(0)
        bound = pd.DataFrame({
            "event_type": [et[0]], "next_event_type": [et[-1]],
            "n_pairs": np.int64(0), "kind": np.int64(1)})
        out = pd.concat([out, bound], ignore_index=True)
        out["user_id"] = np.int64((b - num_buckets) // n_slices)
        out["slice"] = np.int64((b - num_buckets) % n_slices)
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        base = df[df["kind"] == 0]
        extra_src, extra_dst = [], []
        for _, g in df[df["kind"] == 1].groupby("user_id"):
            g = g.sort_values("slice")
            firsts = g["event_type"].to_numpy()
            lasts = g["next_event_type"].to_numpy()
            # slice i's last event precedes slice i+1's first event
            # (empty slices emitted no row, so adjacency is exact)
            extra_src.extend(lasts[:-1])
            extra_dst.extend(firsts[1:])
            extra_src.append(lasts[-1])
            extra_dst.append(TRANSITION_END)
        allp = pd.concat([
            base[["event_type", "next_event_type", "n_pairs"]],
            pd.DataFrame({"event_type": extra_src,
                          "next_event_type": extra_dst,
                          "n_pairs": np.ones(len(extra_src), np.int64)})],
            ignore_index=True)
        out = allp.groupby(["event_type", "next_event_type"],
                           as_index=False)["n_pairs"].sum() \
            .sort_values(["event_type", "next_event_type"]) \
            .reset_index(drop=True)
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return out

    partials = ds.map_batches(resalt, batch_format="pyarrow") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")
    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


US_PER_DAY = 86_400_000_000


def retention_cohorts(sf_dir: str, num_buckets: int | None = None):
    """Cohort retention matrix: users cohorted by the epoch-day of
    their FIRST event; for every (cohort_day, offset_days) cell, the
    count of distinct cohort users active offset_days after their
    first event (offset 0 == the cohort's size).

    Output: cohort_day (epoch days), offset_days, n_users — all int64.

    At-scale shape: first-event day and the distinct (user, offset)
    set are bucket-local (user hashed to ONE bucket), so each bucket
    folds its users vectorized (one groupby-min + merge + distinct)
    and emits (cohort_day, offset_days, partial_count) rows; distinct
    users never cross buckets, so summing partials is exact. The
    exchange is bounded by days², never by events or users.
    """
    from .util import finish_grouped

    ds = _events_bucketed(sf_dir, num_buckets)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy(dtype=np.int64) // US_PER_DAY
        t = pd.DataFrame({"user_id": df["user_id"].to_numpy(dtype=np.int64),
                          "day": day})
        first = t.groupby("user_id", as_index=False)["day"].min() \
            .rename(columns={"day": "cohort_day"})
        m = t.drop_duplicates().merge(first, on="user_id")
        m["offset_days"] = m["day"] - m["cohort_day"]
        d = m.drop_duplicates(subset=["user_id", "offset_days"])
        out = d.groupby(["cohort_day", "offset_days"], as_index=False).size()
        out = out.rename(columns={"size": "n_users"})
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return finish_grouped(
        ds.groupby("bucket").map_groups(per_bucket, batch_format="pandas"),
        ["cohort_day", "offset_days"])


def activity_streaks(sf_dir: str, num_buckets: int | None = None):
    """Longest consecutive-active-day streak per user, reported as the
    integer histogram (max_streak, n_users) — the gaps-and-islands
    retention primitive (different lens from ``retention_cohorts``'s
    offset matrix and ``relational.interorder_gaps``'s lag histogram:
    islands measure RUNS, not pairwise gaps).

    At-scale shape: a user's whole event history lands in one
    user-hash bucket, so each bucket folds vectorized — distinct
    (user, epoch-day), one cumcount per user, island id =
    day - run_index (constant within a run of consecutive days),
    max island length per user, then a value-count histogram. The
    exchange is bounded by the distinct streak LENGTHS seen (<= the
    corpus date span in days), never by users or events.
    """
    from .util import finish_grouped

    ds = _events_bucketed(sf_dir, num_buckets, columns=["user_id", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "u": df["user_id"].to_numpy(dtype=np.int64),
            "day": df["ts"].to_numpy(dtype=np.int64) // US_PER_DAY,
        }).drop_duplicates().sort_values(["u", "day"], kind="mergesort")
        isl = d["day"].to_numpy() - d.groupby("u").cumcount().to_numpy()
        runs = pd.DataFrame({"u": d["u"].to_numpy(), "isl": isl}) \
            .groupby(["u", "isl"]).size()
        mx = runs.groupby("u").max()
        vc = mx.value_counts()
        return pd.DataFrame({
            "max_streak": vc.index.to_numpy(dtype=np.int64),
            "n_users": vc.to_numpy(dtype=np.int64)})

    return finish_grouped(
        ds.groupby("bucket").map_groups(per_bucket, batch_format="pandas"),
        ["max_streak"])


FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(sf_dir: str, stages: tuple[str, ...] = FUNNEL_STAGES,
                  num_buckets: int | None = None):
    """Ordered conversion funnel over the events log: a user reaches
    stage i at the MIN timestamp of a stage-i event STRICTLY after
    their stage-(i-1) time (stage 1: min ts of that type overall).

    Output (one row per stage, always all stages): stage (1-based),
    stage_name, n_users reached, sum_lag_us (sum over reaching users
    of t_stage - t_stage1; 0 at stage 1) — all integers, exact.

    Per-user mins are bucket-local (user hashed to ONE bucket), so the
    whole per-user chain folds vectorized inside each bucket — merges
    and groupby-mins over every user at once, one partial row per
    stage per bucket — and the finish sums a bounded len(stages)-key
    table. The exchange moves len(stages) rows per bucket, never
    events.
    """
    from .util import finish_grouped

    ds = _events_bucketed(sf_dir, num_buckets)
    n_stages = len(stages)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].to_numpy(dtype=np.int64)
        e = pd.DataFrame({"user_id": df["user_id"].to_numpy(dtype=np.int64),
                          "event_type": df["event_type"].to_numpy(),
                          "ts_us": ts_us})
        out_stage, out_users, out_lag = [], [], []
        cur = None   # columns: user_id, cur_us (stage time so far)
        t1 = None    # columns: user_id, t1_us
        for i, ev in enumerate(stages):
            sub = e[e["event_type"] == ev]
            if cur is None:
                cur = sub.groupby("user_id", as_index=False)["ts_us"].min() \
                    .rename(columns={"ts_us": "cur_us"})
                t1 = cur.rename(columns={"cur_us": "t1_us"})
                lag = 0
            else:
                m = sub.merge(cur.rename(columns={"cur_us": "prev_us"}),
                              on="user_id")
                m = m[m["ts_us"] > m["prev_us"]]
                cur = m.groupby("user_id", as_index=False)["ts_us"].min() \
                    .rename(columns={"ts_us": "cur_us"})
                j = cur.merge(t1, on="user_id")
                lag = int((j["cur_us"] - j["t1_us"]).sum())
            out_stage.append(i + 1)
            out_users.append(int(len(cur)))
            out_lag.append(lag)
        return pd.DataFrame({"stage": pd.Series(out_stage, dtype="int64"),
                             "n_users": pd.Series(out_users, dtype="int64"),
                             "sum_lag_us": pd.Series(out_lag, dtype="int64")})

    folded = finish_grouped(
        ds.groupby("bucket").map_groups(per_bucket, batch_format="pandas"),
        ["stage"])

    def name_stages(df: pd.DataFrame) -> pd.DataFrame:
        # emit ALL stages even if no bucket reached one (oracle's
        # COALESCE(count,0) rows)
        base = pd.DataFrame({"stage": pd.Series(range(1, n_stages + 1),
                                                dtype="int64")})
        df = base.merge(df, on="stage", how="left").fillna(0)
        df["stage_name"] = [stages[s - 1] for s in df["stage"]]
        df["n_users"] = df["n_users"].astype("int64")
        df["sum_lag_us"] = df["sum_lag_us"].astype("int64")
        return df[["stage", "stage_name", "n_users", "sum_lag_us"]]

    return folded.map_batches(name_stages, batch_format="pandas",
                              batch_size=None)


# ---------------------------------------------------------------------------
# event-type audience overlap (pairwise distinct-user co-occurrence)
# ---------------------------------------------------------------------------

OVERLAP_MAX_TYPES = 62  # per-user int64 bitmask; event_type is a bounded enum


def event_user_overlap(sf_dir: str, num_buckets: int | None = None):
    """Audience overlap: for every unordered pair of event types, how
    many distinct users emitted BOTH (the numerator of the pairwise
    Jaccard), plus each type's own distinct-user count. Output:
    (type_a, type_b, n_both, n_users_a, n_users_b) with type_a <
    type_b, pairs with n_both = 0 omitted.

    Shape at scale: a user's events land in ONE hash bucket, so
    per-bucket distinct (user, type) sets are globally distinct and
    the pair counts are mergeable partial sums. Inside a bucket the
    fold is one drop_duplicates + one groupby-sum that builds a
    per-user TYPE BITMASK (distinct rows make bitwise-or == sum), then
    counts each of the <= T(T-1)/2 pairs with vectorized bit tests —
    never a per-user or per-pair Python pass over rows. The exchange
    out is <= T^2 rows per bucket; the finish sums bounded keys and
    joins the diagonal (per-type totals) back in one driver-side map.
    """
    from .util import finish_grouped

    ds = _events_bucketed(sf_dir, num_buckets,
                          columns=["user_id", "event_type"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        ut = df[["user_id", "event_type"]].drop_duplicates()
        types = np.sort(ut["event_type"].unique())
        T = len(types)
        if T > OVERLAP_MAX_TYPES:
            raise ValueError(
                f"event_user_overlap: {T} event types exceed the int64 "
                f"bitmask bound {OVERLAP_MAX_TYPES}; widen to multi-word "
                "bitmasks before running this corpus")
        tmap = pd.Series(np.arange(T, dtype=np.int64), index=types)
        uid = pd.factorize(ut["user_id"].to_numpy())[0]
        bits = np.int64(1) << tmap[ut["event_type"]].to_numpy()
        # distinct (user, type) rows -> per-user sum of unique bits == OR
        mask = pd.DataFrame({"u": uid, "b": bits}).groupby("u")["b"].sum() \
            .to_numpy()
        rows_a, rows_b, rows_n = [], [], []
        has = [(mask >> np.int64(i)) & np.int64(1) for i in range(T)]
        for i in range(T):
            rows_a.append(types[i]); rows_b.append(types[i])
            rows_n.append(int(has[i].sum()))
            for j in range(i + 1, T):
                both = int(np.count_nonzero(has[i] & has[j]))
                if both:
                    rows_a.append(types[i]); rows_b.append(types[j])
                    rows_n.append(both)
        return pd.DataFrame({"type_a": rows_a, "type_b": rows_b,
                             "n": pd.Series(rows_n, dtype="int64")})

    summed = finish_grouped(
        ds.groupby("bucket").map_groups(fold, batch_format="pandas"),
        ["type_a", "type_b"])

    def attach_totals(df: pd.DataFrame) -> pd.DataFrame:
        solo = df[df["type_a"] == df["type_b"]].set_index("type_a")["n"]
        p = df[df["type_a"] != df["type_b"]].copy()
        p["n_users_a"] = p["type_a"].map(solo).astype("int64")
        p["n_users_b"] = p["type_b"].map(solo).astype("int64")
        p = p.rename(columns={"n": "n_both"})
        return p[["type_a", "type_b", "n_both", "n_users_a", "n_users_b"]] \
            .reset_index(drop=True)

    return summed.map_batches(attach_totals, batch_format="pandas",
                              batch_size=None)


def active_users_window(sf_dir: str, num_buckets: int | None = None):
    """Sliding-window EXACT distinct-user counts over the events log:
    1-hour windows hopping every 15 minutes (the same window grid as
    ``relational.events_hopping``) — (window_start_us,
    n_active_users). The exact COUNT DISTINCT a telemetry dashboard
    reports per overlapping window; ``events_hopping`` counts EVENTS,
    this counts USERS once each.

    Shape at scale: a user's events land in ONE user-hash bucket
    (``_events_bucketed``), so per-bucket distinct (window, user)
    pairs are globally distinct and per-window bucket counts are
    mergeable partial sums. Each batch expands to the hop grid with a
    numpy repeat and immediately dedups (window, user) Arrow-side, so
    the exchange moves at most window/hop x deduped rows; the bucket
    fold is ONE drop_duplicates + groupby size; the finish sums
    bounded keys (windows grow with TIME, not corpus size).
    """
    import pyarrow.compute as pc

    from .relational import HOP_US, HOP_WINDOW_US
    from .util import finish_grouped

    k = HOP_WINDOW_US // HOP_US
    ds = _events_bucketed(sf_dir, num_buckets, columns=["ts", "user_id"])

    def expand(batch: pa.Table) -> pa.Table:
        tus = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        bkt = batch["bucket"].to_numpy(zero_copy_only=False)
        base = (tus // HOP_US) * HOP_US
        starts = np.repeat(base, k) - np.tile(
            np.arange(k, dtype=np.int64) * HOP_US, len(base))
        t = pa.table({
            "bucket": pa.array(np.repeat(bkt, k), pa.int64()),
            "window_start_us": pa.array(starts, pa.int64()),
            "user_id": pa.array(np.repeat(uid, k), pa.int64()),
        })
        # batch-local dedup shrinks the exchange; the bucket fold
        # finishes the global dedup (users never cross buckets)
        return t.group_by(["bucket", "window_start_us", "user_id"]) \
            .aggregate([]).select(["bucket", "window_start_us", "user_id"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["window_start_us", "user_id"]].drop_duplicates() \
            .groupby("window_start_us", as_index=False).size() \
            .rename(columns={"size": "n_active_users"})
        out["n_active_users"] = out["n_active_users"].astype("int64")
        return out

    return finish_grouped(
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby("bucket").map_groups(fold, batch_format="pandas"),
        ["window_start_us"])
