"""r5: key_skew acting, not just reporting — auto hot-key salting on
the event_transitions user-bucket exchange.

A deliberately hot user (60% of all events) would serialize one
bucket's fold behind the exchange; the pigeonhole detector must find
it, the time-slice salting must spread its rows over many buckets,
and the salted result must be bit-identical to the plain fold and to
a sequential pandas recount.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
HOT_USER = 99_999


def _skewed_events(tmp_path) -> str:
    t = pq.read_table(f"{SF}/events.parquet")
    df = t.to_pandas()
    # 60% of rows (deterministic stride) belong to one hot user
    hot_mask = (np.arange(len(df)) % 5) < 3
    df.loc[hot_mask, "user_id"] = HOT_USER
    out = tmp_path / "skewed"
    out.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(out / "events.parquet"))
    return str(out)


def _expected(sf_dir: str) -> pd.DataFrame:
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    nxt = df.groupby("user_id")["event_type"].shift(-1).fillna("END")
    out = pd.DataFrame({"event_type": df["event_type"].to_numpy(),
                        "next_event_type": nxt.to_numpy()}) \
        .groupby(["event_type", "next_event_type"], as_index=False) \
        .size().rename(columns={"size": "n_pairs"})
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values(["event_type", "next_event_type"]) \
        .reset_index(drop=True)


def test_hot_user_detected_and_salted_fold_exact(ray_session, tmp_path):
    from pdf_context_extractor_agent_ray.functions import streamops as S

    sf = _skewed_events(tmp_path)
    num_buckets = 4
    hot, ts_min, ts_max = S._hot_user_scan(sf, num_buckets)
    assert HOT_USER in hot.tolist()

    # the salt spreads the hot user's rows across many time slices —
    # the serialization cause (one bucket = all hot rows) is gone
    df = pq.read_table(f"{sf}/events.parquet").to_pandas()
    ts = df.loc[df["user_id"] == HOT_USER, "ts"].astype("int64").to_numpy()
    span = max(ts_max - ts_min + 1, 1)
    n_slices = 8
    sl = np.minimum((ts - ts_min) * n_slices // span, n_slices - 1)
    assert len(np.unique(sl)) >= 4

    expect = _expected(sf)

    def run(**kw):
        out = S.event_transitions(sf, num_buckets=num_buckets, **kw)
        return out.to_pandas().reset_index(drop=True)

    plain = run(salt_hot=False)
    auto = run()                       # detection fires automatically
    forced = run(salt_hot=True, n_slices=n_slices)
    assert plain.equals(expect)
    assert auto.equals(expect)
    assert forced.equals(expect)


def test_no_hot_user_on_uniform_corpus(ray_session):
    """The stock corpus has no >1/B user, so auto-salting must stay on
    the plain path, and a forced salt run must fail loudly instead of
    silently doing nothing."""
    import pytest

    from pdf_context_extractor_agent_ray.functions import streamops as S

    hot, _, _ = S._hot_user_scan(SF, 4)
    assert len(hot) == 0
    with pytest.raises(ValueError, match="no hot user"):
        S.event_transitions(SF, salt_hot=True)


def test_salted_path_single_event_slices(ray_session, tmp_path):
    """Hot user whose events collapse into sparse slices (single-event
    slices, empty slices in between): boundary-merge adjacency must
    still reproduce the exact chain."""
    from pdf_context_extractor_agent_ray.functions import streamops as S

    base = pq.read_table(f"{SF}/events.parquet").to_pandas().head(40)
    base["user_id"] = HOT_USER        # one user owns EVERYTHING
    out = tmp_path / "onehot"
    out.mkdir()
    pq.write_table(pa.Table.from_pandas(base, preserve_index=False),
                   str(out / "events.parquet"))
    sf = str(out)

    expect = _expected(sf)
    got = S.event_transitions(sf, num_buckets=4, salt_hot=True,
                              n_slices=16).to_pandas() \
        .reset_index(drop=True)
    assert got.equals(expect)
    assert got["n_pairs"].sum() == 40  # every event transitions once
