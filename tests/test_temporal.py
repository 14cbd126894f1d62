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
