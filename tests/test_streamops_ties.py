"""asof_click_view tie-break contract: duplicate (user_id, ts) view
rows resolve deterministically to the max event_id, matching the
deduped SQL oracle."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import duckdb

from pdf_context_extractor_agent_ray.functions.streamops import asof_click_view


def test_equal_ts_views_resolve_to_max_event_id(ray_session, tmp_path):
    ts = np.datetime64("2024-01-01T10:00:00", "us")
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([ts, ts, ts, ts + np.timedelta64(60, "s")]),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "event_type": pa.array(["view", "view", "view", "click"]),
        "value": pa.array([1.0, 2.0, 3.0, 0.0], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    rows = asof_click_view(str(tmp_path)).take_all()
    assert len(rows) == 1
    assert rows[0]["view_event_id"] == 3  # max event_id among equal-ts views
    assert rows[0]["view_value_cents"] == 300

    # the deduped oracle picks the same winner
    import __ray_entry__ as e
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    df = con.execute(e.oracle_sql()["asof_click_view"]).fetchdf()
    assert len(df) == 1 and df["view_event_id"][0] == 3


def test_events_funnel_strictly_after_and_bucket_invariance(ray_session, tmp_path):
    """Stage i counts only events STRICTLY after stage i-1; a user
    whose click precedes (or ties) their first view never converts;
    result is invariant to the bucket count."""
    from pdf_context_extractor_agent_ray.functions.streamops import events_funnel

    t0 = np.datetime64("2024-01-01T10:00:00", "us")
    m = np.timedelta64(60, "s")
    rows = [
        # user 1: full funnel view->click->purchase
        (1, t0, 1, "view"), (2, t0 + m, 1, "click"), (3, t0 + 2 * m, 1, "purchase"),
        # user 2: click BEFORE view -> stage 1 only
        (4, t0, 2, "click"), (5, t0 + m, 2, "view"),
        # user 3: click ties view ts exactly -> strict > excludes it
        (6, t0, 3, "view"), (7, t0, 3, "click"),
        # user 4: view+click, purchase before click -> stage 2 only
        (8, t0, 4, "view"), (9, t0 + 2 * m, 4, "click"), (10, t0 + m, 4, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    for nb in (1, 4):
        out = {r["stage"]: r for r in events_funnel(str(tmp_path),
                                                    num_buckets=nb).take_all()}
        assert [out[s]["n_users"] for s in (1, 2, 3)] == [4, 2, 1]
        assert out[1]["sum_lag_us"] == 0
        assert out[2]["sum_lag_us"] == 60_000_000 + 120_000_000
        assert out[3]["sum_lag_us"] == 120_000_000
        assert [out[s]["stage_name"] for s in (1, 2, 3)] == ["view", "click", "purchase"]


def test_event_transitions_end_marker_and_bucket_invariance(ray_session, tmp_path):
    """Each user's last event transitions to 'END'; equal-ts events
    order by event_id; counts are invariant to the bucket count."""
    from pdf_context_extractor_agent_ray.functions.streamops import event_transitions

    t0 = np.datetime64("2024-01-01T10:00:00", "us")
    m = np.timedelta64(60, "s")
    rows = [
        # user 1: view -> click -> END (click ties view's ts; event_id orders)
        (1, t0, 1, "view"), (2, t0, 1, "click"),
        # user 2: single event -> END
        (3, t0 + m, 2, "purchase"),
        # user 3: view -> view -> END
        (4, t0, 3, "view"), (5, t0 + m, 3, "view"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    for nb in (1, 4):
        got = {(r["event_type"], r["next_event_type"]): r["n_pairs"]
               for r in event_transitions(str(tmp_path), num_buckets=nb).take_all()}
        assert got == {("view", "click"): 1, ("click", "END"): 1,
                       ("purchase", "END"): 1, ("view", "view"): 1,
                       ("view", "END"): 1}


def test_retention_cohorts_offsets(ray_session, tmp_path):
    """Offset 0 equals cohort size; repeat activity within a day
    counts once; users cohort independently."""
    from pdf_context_extractor_agent_ray.functions.streamops import retention_cohorts

    day0 = np.datetime64("2024-01-01T05:00:00", "us")
    d = np.timedelta64(1, "D")
    h = np.timedelta64(1, "h")
    rows = [
        # user 1: cohort day0; active day0 (twice), day2
        (1, day0, 1), (2, day0 + h, 1), (3, day0 + 2 * d, 1),
        # user 2: cohort day0; active day0 only
        (4, day0 + 3 * h, 2),
        # user 3: cohort day1; active day1 and day2
        (5, day0 + d, 3), (6, day0 + 2 * d, 3),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    base = int(np.datetime64("2024-01-01", "us").astype("int64")
               // 86_400_000_000)
    for nb in (1, 4):
        got = {(r["cohort_day"], r["offset_days"]): r["n_users"]
               for r in retention_cohorts(str(tmp_path), num_buckets=nb).take_all()}
        assert got == {(base, 0): 2, (base, 2): 1,
                       (base + 1, 0): 1, (base + 1, 1): 1}


def test_active_users_window_bucket_invariance_and_bounds(ray_session):
    """Sliding distinct-user counts are invariant to the bucket count
    (users never cross buckets) and bounded by events_hopping's event
    counts per window (a user counts once, an event every time)."""
    from pdf_context_extractor_agent_ray.functions.relational import (
        events_hopping)
    from pdf_context_extractor_agent_ray.functions.streamops import (
        active_users_window)

    sf = "/root/testdata/sf0.01"
    base = active_users_window(sf).to_pandas().reset_index(drop=True)
    one = active_users_window(sf, num_buckets=1).to_pandas() \
        .reset_index(drop=True)
    many = active_users_window(sf, num_buckets=17).to_pandas() \
        .reset_index(drop=True)
    assert len(base) and base.equals(one) and base.equals(many)
    ev = events_hopping(sf).to_pandas() \
        .groupby("window_start_us")["n_events"].sum()
    merged = base.set_index("window_start_us")["n_active_users"]
    assert set(merged.index) == set(ev.index)
    assert (merged <= ev.loc[merged.index]).all()
    assert (merged >= 1).all()


def test_activity_streaks_bucket_invariance_and_recount(ray_session):
    """Histogram is identical under 1 bucket and 64 buckets, user
    totals recount to the distinct-user population, and a direct
    pandas gaps-and-islands recompute agrees row for row."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pdf_context_extractor_agent_ray.functions.streamops import (
        US_PER_DAY, activity_streaks)

    sf = "/root/testdata/sf0.01"
    one = activity_streaks(sf, num_buckets=1).to_pandas()
    many = activity_streaks(sf, num_buckets=64).to_pandas()
    assert len(one) and one.equals(many)

    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    d = pd.DataFrame({
        "u": ev["user_id"].to_numpy(np.int64),
        "day": ev["ts"].astype("int64").to_numpy() // US_PER_DAY,
    }).drop_duplicates().sort_values(["u", "day"])
    isl = d["day"].to_numpy() - d.groupby("u").cumcount().to_numpy()
    mx = pd.DataFrame({"u": d["u"].to_numpy(), "isl": isl}) \
        .groupby(["u", "isl"]).size().groupby("u").max()
    vc = mx.value_counts().sort_index()
    assert list(one["max_streak"]) == list(vc.index)
    assert list(one["n_users"]) == list(vc.values)
    assert int(one["n_users"].sum()) == ev["user_id"].nunique()
