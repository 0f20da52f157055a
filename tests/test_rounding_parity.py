"""Exact .5-boundary parity between the engine's e6 fraction rounding
and DuckDB's round(1000000.0 * num / den): the operand order matters.

(num/den)*1e6 and 1e6*num/den differ by 1 ulp at exact .5 boundaries
(measured: num=41, den=640 -> 64062 vs 64063); every engine site must
multiply FIRST, mirroring the oracle SQL (ADVICE r3, medium)."""
import duckdb
import numpy as np
import pyarrow as pa

from pdf_context_extractor_agent_ray.functions.text import repetition_stats_batch
from pdf_context_extractor_agent_ray.functions.util import round_half_away_e


def test_round_half_away_multiply_first_matches_duckdb():
    # (num, den) pairs that land exactly on a .5 boundary after *1e6,
    # plus a sweep of non-boundary pairs
    pairs = [(41, 640), (1, 16), (3, 32), (7, 64), (123, 1920)]
    rng = np.random.default_rng(7)
    for _ in range(200):
        den = int(rng.integers(1, 5000))
        num = int(rng.integers(0, den + 1))
        pairs.append((num, den))
    num = np.array([p[0] for p in pairs], dtype=np.int64)
    den = np.array([p[1] for p in pairs], dtype=np.int64)
    eng = round_half_away_e(1e6 * num / den, scale=1.0)
    con = duckdb.connect()
    ora = con.execute(
        "SELECT CAST(round(1000000.0 * n / d) AS BIGINT) "
        "FROM (SELECT unnest(?) AS n, unnest(?) AS d)",
        [num.tolist(), den.tolist()],
    ).fetchnumpy()
    assert (eng == list(ora.values())[0]).all()
    # the divide-first order is genuinely different on the boundary case
    wrong = round_half_away_e(np.array([41 / 640]))
    assert wrong[0] == 64062 and eng[0] == 64063


def test_repetition_stats_boundary_doc_matches_oracle():
    # 599 distinct tokens + 41 extra repeats of one token:
    # n=640, n_distinct=599, dup=41 -> 1e6*41/640 = 64062.5 exactly
    toks = [f"tok{i}" for i in range(599)] + ["tok0"] * 41
    text = " ".join(toks)
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([text], pa.string())})
    out = repetition_stats_batch(batch).to_pydict()
    assert out["n_tokens"] == [640]
    assert out["n_distinct_tokens"] == [599]
    assert out["dup_token_frac_e6"] == [64063]  # half-away, oracle-exact
    con = duckdb.connect()
    got = con.execute(
        "SELECT CAST(round(1000000.0 * (640 - 599) / 640) AS BIGINT)"
    ).fetchone()[0]
    assert got == 64063


def test_quality_gate_rule_precedence():
    """First failing rule wins: a doc that is BOTH too short and
    repetitive reports 'too_short'; boundary values pass."""
    import pyarrow as pa
    from pdf_context_extractor_agent_ray.functions.text import (
        QUALITY_GATE_MIN_TOKENS, quality_gate_batch)

    docs = {
        1: "x " * 5,                       # 5 dup tokens: short AND repetitive
        2: " ".join(f"t{i}" for i in range(QUALITY_GATE_MIN_TOKENS)),  # boundary pass
        3: " ".join(["dup"] * 200),        # long enough, all duplicates
        4: " ".join(f"u{i}" for i in range(100)),                      # clean pass
    }
    out = quality_gate_batch(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())})).to_pydict()
    got = dict(zip(out["doc_id"], out["reason"]))
    assert got == {1: "too_short", 2: "pass", 3: "repetitive", 4: "pass"}
    keeps = dict(zip(out["doc_id"], out["keep"]))
    assert keeps == {1: 0, 2: 1, 3: 0, 4: 1}


def test_disc_percentiles_matches_duckdb_exhaustive():
    """The shared ceil-rank helper == DuckDB percentile_disc on
    deterministic pseudo-random histograms, every q the repo uses,
    n swept over 1..150 rows."""
    import hashlib

    import duckdb
    import numpy as np

    from pdf_context_extractor_agent_ray.functions.util import disc_percentiles

    con = duckdb.connect()
    qs = (25, 50, 75, 90, 99)
    for trial in range(1, 151):
        h = hashlib.md5(f"disc{trial}".encode()).digest()
        k = h[0] % 7 + 1                      # distinct values
        values = np.sort(np.array(
            [int.from_bytes(h[i:i + 2], "big") % 1000 - 500
             for i in range(1, 1 + k)], dtype=np.int64))
        values = np.unique(values)
        counts = np.array([h[8 + i] % 5 + 1 for i in range(len(values))],
                          dtype=np.int64)
        expanded = np.repeat(values, counts).tolist()
        got = disc_percentiles(values, counts, qs)
        want = [con.execute(
            "SELECT percentile_disc(?) WITHIN GROUP (ORDER BY v) "
            "FROM (SELECT unnest(?) AS v)", [q / 100, expanded]
        ).fetchone()[0] for q in qs]
        assert got == want, (trial, values.tolist(), counts.tolist(),
                             got, want)

    # the docstring's full claimed envelope: every TOTAL n in 1..300
    # (dense histograms — counts apportioned to sum exactly n), every
    # q the repo uses
    for n in range(1, 301):
        h = hashlib.md5(f"dense{n}".encode()).digest()
        k = min(n, h[0] % 7 + 1)
        values = np.unique(np.array(
            [int.from_bytes(h[i:i + 2], "big") % 1000 - 500
             for i in range(1, 1 + k)], dtype=np.int64))
        k = len(values)
        counts = np.full(k, n // k, dtype=np.int64)
        counts[:n % k] += 1
        assert counts.sum() == n
        expanded = np.repeat(values, counts).tolist()
        got = disc_percentiles(values, counts, qs)
        want = [con.execute(
            "SELECT percentile_disc(?) WITHIN GROUP (ORDER BY v) "
            "FROM (SELECT unnest(?) AS v)", [q / 100, expanded]
        ).fetchone()[0] for q in qs]
        assert got == want, (n, values.tolist(), counts.tolist(),
                             got, want)
