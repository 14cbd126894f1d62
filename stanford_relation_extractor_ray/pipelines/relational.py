"""Relational operator implementations over the testdata tables.

Each function is the Ray-Data expression of an operator family from
SURVEY.md §2 (groupby-aggregate with partial pre-aggregation, top-k,
broadcast joins, anti-joins, windowed aggregates, distinct counts,
string/date scalar functions) exercised against the TPC-H-ish tables so
the driver can verify it against a DuckDB oracle (see __ray_entry__).

Conventions: every computed column is explicitly named to match the
oracle SQL; reads prune columns at the source.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# --- groupby-aggregate with in-batch partial pre-aggregation -------------
# (reference analog: bag assembly + feature-count threshold,
#  SURVEY.md §2.6; the partial-combine-then-small-groupby pattern)

def pricing_summary(sf_dir: str):
    """TPC-H-Q1-style pricing summary over lineitem."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch["l_extendedprice"],
            pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t = batch.append_column("disc_price", disc_price)
        # in-batch partial aggregation → tiny shuffle
        import pyarrow.compute as _pc
        tb = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")])
        return tb.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_price",
             "p_disc", "p_cnt"])

    from ray.data.aggregate import Sum
    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("p_qty", alias_name="sum_qty"),
                      Sum("p_price", alias_name="sum_base_price"),
                      Sum("p_disc", alias_name="sum_disc_price"),
                      Sum("p_cnt", alias_name="count_order")))
    return agg.sort(["l_returnflag", "l_linestatus"])


# --- top-k (per-batch partial top-k then global sort-limit) --------------

def top_orders(sf_dir: str, k: int = 10):
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def batch_topk(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch, k=min(k, batch.num_rows),
            sort_keys=[("o_totalprice", "descending"),
                       ("o_orderkey", "ascending")])
        return batch.take(idx)

    return (ds.map_batches(batch_topk, batch_format="pyarrow")
            .sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(k))


# --- broadcast join (small dimension side; reference: known-KB lookup) ---

def revenue_by_nation(sf_dir: str):
    """orders ⨝ customer ⨝ nation via broadcast dicts — no shuffle join.
    (reference analog: getKnownSlotFillsForEntity broadcast lookup,
    KBPIR.java:119)."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]) \
        .to_pandas()
    cust_to_nation = dict(zip(
        cust["c_custkey"],
        cust["c_nationkey"].map(dict(zip(nation["n_nationkey"],
                                         nation["n_name"])))))
    ref = ray.put(cust_to_nation)

    def join_batch(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = batch.column("o_custkey").to_numpy()
        names = pa.array([m.get(k) for k in keys.tolist()], pa.string())
        t = batch.append_column("n_name", names)
        return (t.group_by("n_name")
                .aggregate([("o_totalprice", "sum")])
                .rename_columns(["n_name", "p_rev"]))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    from ray.data.aggregate import Sum
    return (orders.map_batches(join_batch, batch_format="pyarrow",
                               batch_size=65536)
            .groupby("n_name")
            .aggregate(Sum("p_rev", alias_name="revenue"))
            .sort("n_name"))


# --- anti-join via broadcast key set (reference: FilterAlreadyKnownSlots)

def customers_without_urgent_orders(sf_dir: str):
    """Anti-join via broadcast key set, with the filter pushed into the
    read side (only URGENT orders' keys are collected)."""
    import ray

    custkeys = set()
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    for batch in orders.iter_batches(batch_format="pyarrow"):
        mask = pc.equal(batch.column("o_orderpriority"), "1-URGENT")
        custkeys.update(batch.filter(mask).column("o_custkey")
                        .to_pylist())
    ref = ray.put(custkeys)

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = pa.array([int(k) not in keys
                         for k in batch.column("c_custkey").to_pylist()])
        return batch.filter(mask)

    return (_read(sf_dir, "customer", ["c_custkey", "c_name"])
            .map_batches(anti, batch_format="pyarrow")
            .sort("c_custkey"))


# --- per-group top-1 (reference: SINGLE-cardinality keep-best) -----------

def latest_order_per_customer(sf_dir: str):
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate"])

    def top1(group: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            group, k=1, sort_keys=[("o_orderdate", "descending"),
                                   ("o_orderkey", "descending")])
        return group.take(idx)

    return (ds.groupby("o_custkey").map_groups(top1,
                                               batch_format="pyarrow")
            .sort("o_custkey"))


# --- distinct counts (reference: AlternateNamesExtractor nunique) --------

def event_type_diversity(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        return (batch.group_by(["user_id", "event_type"])
                .aggregate([]))

    def count_distinct(group: pa.Table) -> pa.Table:
        uid = group.column("user_id")[0].as_py()
        n = len(set(group.column("event_type").to_pylist()))
        return pa.table({"user_id": pa.array([uid], pa.int64()),
                         "n_event_types": pa.array([n], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(count_distinct, batch_format="pyarrow")
            .sort("user_id"))


# --- tumbling-window aggregate over the events log -----------------------
# (streaming-shaped workload: ordered log → per-key windowed aggregate;
#  Ray Data has no watermarks, so windows are a grouped aggregate on
#  floor(ts); ordering assumption documented in SURVEY.md §2.11)

def hourly_event_value(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def to_window(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = batch.append_column("window_start", hour)
        return (t.group_by(["event_type", "window_start"])
                .aggregate([("value", "sum"), ("value", "count")])
                .rename_columns(["event_type", "window_start",
                                 "p_sum", "p_cnt"]))

    from ray.data.aggregate import Sum
    return (ds.map_batches(to_window, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["event_type", "window_start"])
            .aggregate(Sum("p_sum", alias_name="sum_value"),
                       Sum("p_cnt", alias_name="n_events"))
            .sort(["event_type", "window_start"]))


# --- scalar string/date functions ----------------------------------------

def nation_name_distances(sf_dir: str, max_dist: int = 4):
    """Self-join of nation names at edit distance ≤ max_dist
    (reference scalar: Utils.levenshteinDistance)."""
    from ..functions.text import levenshtein

    rows = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    out = []
    for a in rows:
        for b in rows:
            if a["n_nationkey"] >= b["n_nationkey"]:
                continue
            d = levenshtein(a["n_name"], b["n_name"])
            if d <= max_dist:
                out.append({"name_a": a["n_name"], "name_b": b["n_name"],
                            "dist": d})
    out.sort(key=lambda r: (r["name_a"], r["name_b"]))
    return pa.Table.from_pylist(out) if out else pa.table(
        {"name_a": pa.array([], pa.string()),
         "name_b": pa.array([], pa.string()),
         "dist": pa.array([], pa.int64())})


def orders_per_year(sf_dir: str):
    """Date scalar: extract year, groupby count."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def to_year(batch: pa.Table) -> pa.Table:
        years = pc.utf8_slice_codeunits(
            pc.cast(batch["o_orderdate"], pa.string()), 0, 4)
        t = batch.append_column("year", years)
        return (t.group_by("year").aggregate([("o_orderkey", "count")])
                .rename_columns(["year", "p_cnt"]))

    from ray.data.aggregate import Sum
    return (ds.map_batches(to_year, batch_format="pyarrow")
            .groupby("year").aggregate(Sum("p_cnt", alias_name="n_orders"))
            .sort("year"))


# --- set ops: intersection of two derived sets ---------------------------
# (reference: IntersectSlotFiller — inner join on the triple key)

def high_value_repeat_customers(sf_dir: str, min_orders: int = 15,
                                min_balance: float = 0.0):
    """Customers that appear in BOTH derived sets (intersection via
    broadcast semi-join): ≥ min_orders orders AND positive balance."""
    import ray
    from ray.data.aggregate import Count

    many = (_read(sf_dir, "orders", ["o_custkey"])
            .groupby("o_custkey").aggregate(Count(alias_name="n")))
    keys = {r["o_custkey"] for r in many.take_all()
            if r["n"] >= min_orders}
    ref = ray.put(keys)

    def semi(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([
            k in ks and b > min_balance
            for k, b in zip(batch.column("c_custkey").to_pylist(),
                            batch.column("c_acctbal").to_pylist())])
        return batch.filter(mask)

    return (_read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
            .map_batches(semi, batch_format="pyarrow")
            .select_columns(["c_custkey", "c_acctbal"])
            .sort("c_custkey"))
