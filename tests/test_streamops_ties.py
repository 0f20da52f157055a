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
