"""Sketch operators: HLL accuracy/merge laws, CMS guarantees, exact
heavy hitters and the rolling RANGE window vs their DuckDB oracles."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["events", "documents"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", ["heavy_hitter_tokens",
                                  "rolling_user_value"])
def test_exact_ops_match_oracle(ray_session, duck, name):
    import __ray_entry__ as E
    got = E.queries()[name](SF).to_pandas().reset_index(drop=True)
    want = duck.execute(E.oracle_sql()[name]).df() \
        .reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hll_accuracy_vs_exact(ray_session, duck):
    """p=12 gives σ≈1.6%; demand <5% (3σ) per group, and that the
    distributed merge path equals a single-shot register fold —
    the max-merge commutativity that makes the op parallelism-
    invariant."""
    import ray.data as rd
    from stanford_relation_extractor_ray.stages import sketches as S
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    got = S.hll_distinct(ds, "event_type", "user_id").to_pandas()
    exact = duck.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) d FROM events "
        "GROUP BY event_type ORDER BY event_type").df()
    merged = got.merge(exact, left_on="group", right_on="event_type")
    assert len(merged) == len(exact)
    rel = (merged["approx_distinct"] - merged["d"]).abs() / merged["d"]
    assert (rel < 0.05).all(), merged

    # single-shot fold == distributed (registers merge by max)
    users = duck.execute(
        "SELECT user_id FROM events WHERE event_type='click'") \
        .df()["user_id"].to_numpy()
    single = int(round(S.hll_estimate(S.hll_registers(users))))
    dist = int(merged.loc[merged["group"] == "click",
                          "approx_distinct"].iloc[0])
    assert single == dist


def test_hll_register_merge_law():
    from stanford_relation_extractor_ray.stages import sketches as S
    a = np.arange(0, 7000)
    b = np.arange(5000, 12000)
    ra, rb = S.hll_registers(a), S.hll_registers(b)
    rc = S.hll_registers(np.arange(0, 12000))
    assert np.array_equal(np.maximum(ra, rb), rc)
    est = S.hll_estimate(rc)
    assert abs(est - 12000) / 12000 < 0.05


def test_cms_guarantees():
    """CMS never underestimates; sketching partitions then merging
    equals sketching the whole stream (bit-identical tables)."""
    from stanford_relation_extractor_ray.stages.sketches import \
        CountMinSketch
    rng = np.random.default_rng(7)
    toks = np.array([f"tok{i}" for i in
                     rng.integers(0, 500, size=20000)], dtype=object)
    true = pd.Series(toks).value_counts()

    whole = CountMinSketch().add(toks)
    merged = (CountMinSketch().add(toks[:9000])
              .merge(CountMinSketch().add(toks[9000:])))
    assert np.array_equal(whole.table, merged.table)

    keys = true.index.to_numpy(dtype=object)
    est = whole.query(keys)
    assert (est >= true.to_numpy()).all()
    # width 8192 ≫ 500 distinct: estimates should be near-exact
    assert (est == true.to_numpy()).mean() > 0.95


def test_cms_build_matches_driver_sketch(ray_session):
    import ray.data as rd
    from stanford_relation_extractor_ray.stages import sketches as S
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    sk = S.cms_build(ds, "text")
    texts = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    toks = np.concatenate(
        [np.array(t.split(" "), dtype=object)
         for t in texts["text"]])
    toks = toks[toks != ""]
    local = S.CountMinSketch().add(
        *(lambda vc: (vc.index.to_numpy(dtype=object),
                      vc.to_numpy()))(pd.Series(toks).value_counts()))
    assert np.array_equal(sk.table, local.table)
