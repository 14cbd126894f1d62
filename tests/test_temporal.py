"""Temporal operators (as-of join, range join, session windows) vs
their DuckDB oracle SQL — the same comparison the driver runs, pinned
at sf0.001 so a drift in either side fails locally first."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
QUERIES = ["events_asof_order", "purchase_attribution",
           "event_sessions", "event_prop_stats"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["events", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_temporal_matches_oracle(ray_session, duck, name):
    import __ray_entry__ as E
    got = E.queries()[name](SF).to_pandas().reset_index(drop=True)
    want = duck.execute(E.oracle_sql()[name]).df() \
        .reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_event_prop_stats_all_null_group(ray_session, tmp_path):
    """A group whose props never carry an integer ``k`` must yield
    NULL sum/min/max (SQL semantics), not crash the int64 cast
    (ADVICE r3, relational.py combine: 'cannot convert NA to
    integer')."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stanford_relation_extractor_ray.pipelines.relational import \
        event_prop_stats
    t = pa.table({
        "event_type": ["buy", "buy", "view", "view", "view"],
        "props": ['{"k": 3}', '{"k": 5}',
                  '{"other": 1}', '{}', '{"k": "notint"}'],
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = (event_prop_stats(str(tmp_path)).to_pandas()
           .set_index("event_type"))
    assert got.loc["buy", "n"] == 2
    assert got.loc["buy", "sum_k"] == 8
    assert got.loc["buy", "min_k"] == 3
    assert got.loc["view", "n"] == 3
    assert pd.isna(got.loc["view", "sum_k"])
    assert pd.isna(got.loc["view", "min_k"])
    assert pd.isna(got.loc["view", "max_k"])


def test_sessions_cover_all_events(ray_session, duck):
    """Sessionization is a partition of the log: per-session counts
    must sum back to the table's row count."""
    import __ray_entry__ as E
    got = E.queries()["event_sessions"](SF).to_pandas()
    n = duck.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert int(got["n_events"].sum()) == n
    # sessions are numbered 1..k per user with no gaps
    per_user = got.groupby("user_id")["session_id"]
    assert (per_user.min() == 1).all()
    assert (per_user.max() == per_user.count()).all()


@pytest.fixture(scope="module")
def skewed_events_dir(tmp_path_factory):
    """A log where one user owns 50% of events, spread across many
    60-minute chunks — the hot-key case the salted paths exist for."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    rows = []
    eid = 0
    # hot user 7: 2000 events over ~3 days, some sub-second offsets
    offs = np.sort(rng.integers(0, 3 * 86400 * 1_000_000, size=2000))
    for k, off in enumerate(offs):
        rows.append((eid, 7, base + off.item(),
                     ["purchase", "click", "view", "page"][k % 4],
                     round(float(rng.uniform(0, 50)), 2)))
        eid += 1
    # 50 cold users, 40 events each
    for u in range(100, 150):
        offs = np.sort(rng.integers(0, 3 * 86400 * 1_000_000, size=40))
        for k, off in enumerate(offs):
            rows.append((eid, u, base + off.item(),
                         ["purchase", "click", "view", "page"][k % 4],
                         round(float(rng.uniform(0, 50)), 2)))
            eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    d = tmp_path_factory.mktemp("skewed")
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


def test_salted_purchase_attribution_equals_unsalted(
        ray_session, skewed_events_dir):
    """Hot-key salting (time-chunk + boundary-strip replication) is
    byte-identical to the unsalted path: the cents-derived float sums
    are bit-equal because both divide the same int by 100.0."""
    from stanford_relation_extractor_ray.pipelines.temporal import \
        purchase_attribution
    plain = purchase_attribution(skewed_events_dir).to_pandas()
    salted = purchase_attribution(
        skewed_events_dir, salt_chunk_minutes=60).to_pandas()
    pd.testing.assert_frame_equal(plain.reset_index(drop=True),
                                  salted.reset_index(drop=True))


def test_salted_rolling_user_value_equals_unsalted(
        ray_session, skewed_events_dir):
    from stanford_relation_extractor_ray.pipelines.temporal import \
        rolling_user_value
    plain = rolling_user_value(skewed_events_dir).to_pandas()
    salted = rolling_user_value(
        skewed_events_dir, salt_chunk_minutes=90).to_pandas()
    pd.testing.assert_frame_equal(plain.reset_index(drop=True),
                                  salted.reset_index(drop=True))


def test_salted_event_sessions_equals_unsalted(
        ray_session, skewed_events_dir):
    """Sessions stitch across chunk boundaries; sums agree after cents
    rounding (the salted path's int-cent sums are order-exact, the
    unsalted pandas float sum can differ by an ulp before rounding)."""
    import numpy as np
    from stanford_relation_extractor_ray.pipelines.temporal import \
        event_sessions
    plain = event_sessions(skewed_events_dir).to_pandas() \
        .reset_index(drop=True)
    salted = event_sessions(
        skewed_events_dir, salt_chunk_minutes=45).to_pandas() \
        .reset_index(drop=True)
    for df in (plain, salted):
        df["sum_value"] = np.rint(df["sum_value"].to_numpy() * 100) \
            .astype(np.int64)
    pd.testing.assert_frame_equal(plain, salted)


def test_salted_events_asof_order_equals_unsalted(
        ray_session, skewed_events_dir, tmp_path):
    """Two-round salted as-of (local asof + carry-in from the latest
    order-bearing prior chunk) is byte-identical to the unsalted
    single-shuffle path on a skewed log."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stanford_relation_extractor_ray.pipelines.temporal import \
        events_asof_order
    # orders for the hot user and some cold users, sparse in time so
    # many event chunks have no local order (carry-in path exercised)
    rng = np.random.default_rng(7)
    base = np.datetime64("2024-02-25T00:00:00", "us")
    users, keys, dates = [], [], []
    ok = 1
    for u in [7] + list(range(100, 150, 7)):
        for _ in range(6 if u == 7 else 2):
            users.append(u)
            keys.append(ok)
            dates.append(base + rng.integers(
                0, 8 * 86400 * 1_000_000).item())
            ok += 1
    # duplicate-date orders for the tie-break (max key wins)
    users += [7, 7]
    keys += [9001, 9002]
    dates += [dates[0], dates[0]]
    pq.write_table(pa.table({
        "o_custkey": pa.array(users, pa.int64()),
        "o_orderkey": pa.array(keys, pa.int64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
    }), f"{skewed_events_dir}/orders.parquet")
    try:
        plain = events_asof_order(skewed_events_dir).to_pandas()
        salted = events_asof_order(
            skewed_events_dir, salt_chunk_minutes=360).to_pandas()
    finally:
        import os
        os.remove(f"{skewed_events_dir}/orders.parquet")
    assert len(plain) > 0
    pd.testing.assert_frame_equal(plain.reset_index(drop=True),
                                  salted.reset_index(drop=True))
