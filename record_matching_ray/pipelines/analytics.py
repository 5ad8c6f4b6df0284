"""Relational operator coverage over the TPC-H-ish test tables.

Each function here is one ``queries()`` entry in __ray_entry__ with a
DuckDB oracle — the SQL-expressible slice of SURVEY.md §2 (joins §2.4,
aggregations §2.5, sorts/top-k §2.6, set-ops/anti-joins §2.7), expressed
Ray-Data-first:

- aggregations pre-combine inside ``map_batches`` (partial aggregates) so
  the shuffle moves one row per (key, batch), not one per input row —
  SURVEY.md §4 "push aggregation partial";
- small dimension tables (nation/region) are broadcast via ``ray.put``
  into the batch fn instead of shuffled — broadcast-join pattern;
- float oracle parity: money columns are aggregated as exact integer
  cents (``int64(round(x*100))``); any derived float is computed from the
  same exact operands on both sides (IEEE division is deterministic), so
  the driver's value-hash comparison can't be broken by summation order.

Column prune note: every reader passes ``columns=[...]`` — only the
needed columns leave the parquet files.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from record_matching_ray.stages.util import conformed


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    x = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.rint(x * 100.0).astype(np.int64)


def partial_agg(
    ds: ray.data.Dataset,
    keys: list,
    values: list,
    prep=None,
    count_as: str | None = None,
) -> ray.data.Dataset:
    """The engine's canonical two-level aggregate (VERDICT r3 task 7 —
    this scaffold was hand-repeated ~40x in this file): per-batch Arrow
    groupby PARTIAL (bounds shuffle rows to |groups| x batches) -> ONE
    Ray groupby(keys) re-aggregation with matching Sum/Min/Max -> pinned
    output schema.

    keys:   [(key_col, pa_type), ...] — key columns present after prep.
    values: [(out_name, src, agg, pa_type), ...] — src is a column name
            or a callable(pa.Table) -> pa.Array evaluated per batch;
            agg in {"sum", "min", "max"}.
    prep:   optional callable(pa.Table) -> pa.Table applied per batch
            before key/value extraction (filters, derived key columns).
    count_as: adds a COUNT(*) column of this name (partials summed).
    """
    from ray.data.aggregate import Max, Min, Sum

    key_names = [k for k, _ in keys]
    _RAY = {"sum": Sum, "min": Min, "max": Max}

    def partial(t: pa.Table) -> pa.Table:
        if prep is not None:
            t = prep(t)
        data = {k: t.column(k) for k in key_names}
        for out, src, _agg, _tp in values:
            data[out] = t.column(src) if isinstance(src, str) else src(t)
        spec = [(out, agg) for out, _s, agg, _tp in values]
        if count_as:
            spec.append(([], "count_all"))
        g = pa.TableGroupBy(pa.table(data), key_names).aggregate(spec)
        # Rename by GENERATED name, not position: pyarrow's group-by
        # output order has flipped between releases (keys-first on 16.1,
        # keys-last on others) — a positional rename would silently
        # mislabel every aggregate on the other ordering.
        rename = {f"{out}_{agg}": out for out, _s, agg, _tp in values}
        if count_as:
            rename["count_all"] = count_as
        missing = [n for n in rename if n not in g.schema.names]
        if missing:
            raise RuntimeError(
                f"partial_agg: expected pyarrow group-by columns {missing} "
                f"absent from {g.schema.names}; the generated-name "
                "convention changed — update the rename map"
            )
        g = g.rename_columns([rename.get(n, n) for n in g.schema.names])
        order = key_names + [v[0] for v in values] + (
            [count_as] if count_as else []
        )
        return g.select(order)

    aggs = [_RAY[agg](on=out, alias_name=out) for out, _s, agg, _tp in values]
    if count_as:
        aggs.append(Sum(on=count_as, alias_name=count_as))
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_names if len(key_names) > 1 else key_names[0])
        .aggregate(*aggs)
    )
    fields = list(keys) + [(v[0], v[3]) for v in values]
    if count_as:
        fields.append((count_as, pa.int64()))
    return conformed(out, pa.schema(fields))


# ---------------------------------------------------------------------------
# §2.5 aggregation with partial combine — TPC-H Q1 flavor


def q1_lineitem(sf_dir: str) -> ray.data.Dataset:
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _c(col):
        return lambda t: pa.array(_cents(t.column(col)), pa.int64())

    out = partial_agg(
        ds,
        keys=[("l_returnflag", pa.string()), ("l_linestatus", pa.string())],
        values=[
            ("sum_qty_c", _c("l_quantity"), "sum", pa.int64()),
            ("sum_price_c", _c("l_extendedprice"), "sum", pa.int64()),
            ("sum_disc_c", _c("l_discount"), "sum", pa.int64()),
        ],
        count_as="cnt",
    )

    def derive(t: pa.Table) -> pa.Table:
        # avg derived from exact ints with the same expression as the SQL
        # oracle: round(sum_qty_c / 100.0 / cnt, 6)
        sq = t.column("sum_qty_c").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        avg = np.round(sq / 100.0 / n, 6)
        return t.append_column("avg_qty", pa.array(avg, pa.float64()))

    return out.map_batches(derive, batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT)      AS sum_qty_c,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT)      AS sum_disc_c,
       COUNT(*)                                        AS cnt,
       ROUND(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) / 100.0 / COUNT(*), 6) AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# §2.4 join + §2.6 top-k — revenue per customer


def top_customers(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    per_cust = partial_agg(
        orders,
        keys=[("o_custkey", pa.int64())],
        values=[
            (
                "revenue_c",
                lambda t: pa.array(_cents(t.column("o_totalprice")), pa.int64()),
                "sum",
                pa.int64(),
            )
        ],
        count_as="n_orders",
    )
    joined = per_cust.join(
        customer, join_type="inner", num_partitions=min(8, __import__("record_matching_ray.stages.util", fromlist=["u"]).shuffle_partitions()),
        on=("o_custkey",), right_on=("c_custkey",),
    )
    top = joined.sort(["revenue_c", "o_custkey"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": t.column("c_name"),
                "n_orders": t.column("n_orders"),
                "revenue_c": t.column("revenue_c"),
            }
        ),
        batch_format="pyarrow",
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue_c DESC, c_custkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# broadcast join of small dims (§2.4: "broadcast small sides with ray.put")


def nation_rollup(sf_dir: str) -> ray.data.Dataset:
    customer = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    nation = pa.Table.from_pylist(
        _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).take_all()
    )
    region = pa.Table.from_pylist(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]).take_all()
    )
    n2name = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    n2reg = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_regionkey").to_pylist()))
    r2name = dict(zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()))
    lookup_ref = ray.put((n2name, n2reg, r2name))

    def prep(t: pa.Table) -> pa.Table:
        n2n, n2r, r2n = (
            ray.get(lookup_ref)
            if isinstance(lookup_ref, ray.ObjectRef)
            else lookup_ref
        )
        nk = t.column("c_nationkey").to_pylist()
        return pa.table(
            {
                "r_name": pa.array([r2n[n2r[x]] for x in nk], pa.string()),
                "n_name": pa.array([n2n[x] for x in nk], pa.string()),
                "c_acctbal": t.column("c_acctbal"),
            }
        )

    return partial_agg(
        customer,
        keys=[("r_name", pa.string()), ("n_name", pa.string())],
        values=[
            (
                "acctbal_c",
                lambda t: pa.array(_cents(t.column("c_acctbal")), pa.int64()),
                "sum",
                pa.int64(),
            )
        ],
        prep=prep,
        count_as="n_customers",
    )


NATION_ROLLUP_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_c,
       COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# anti-join (§2.4/§2.7): customers with no orders


def customers_no_orders(sf_dir: str, min_price: float = 400_000.0) -> ray.data.Dataset:
    """Customers with no high-value order (> min_price) — anti-join via
    left join + null filter. The price filter keeps the result non-empty
    at every scale factor (a fully-empty Dataset loses its schema through
    ``to_pandas``, a Ray quirk that would false-fail the oracle compare)."""
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    buyers = partial_agg(
        orders,
        keys=[("o_custkey", pa.int64())],
        values=[],
        prep=lambda t: t.filter(pc.greater(t["o_totalprice"], min_price)),
        count_as="cnt",
    )
    left = customer.join(
        buyers, join_type="left_outer", num_partitions=min(8, __import__("record_matching_ray.stages.util", fromlist=["u"]).shuffle_partitions()),
        on=("c_custkey",), right_on=("o_custkey",),
    )
    return left.map_batches(
        lambda t: t.filter(pc.is_null(t["cnt"])).select(["c_custkey", "c_name"]),
        batch_format="pyarrow",
    )


CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
"""


# ---------------------------------------------------------------------------
# two-level distinct aggregate over events


def events_by_type(sf_dir: str) -> ray.data.Dataset:
    events = _read(sf_dir, "events", ["event_type", "user_id", "ts"])

    base = partial_agg(
        events,
        keys=[("event_type", pa.string())],
        values=[
            ("min_ts", "ts", "min", pa.timestamp("us")),
            ("max_ts", "ts", "max", pa.timestamp("us")),
        ],
        count_as="cnt",
    ).map_batches(
        lambda t: t.select(["event_type", "cnt", "min_ts", "max_ts"]),
        batch_format="pyarrow",
    )

    # COUNT(DISTINCT user_id): two-level groupby — dedup (event_type,
    # user_id) first (partial per batch, then shuffle on the pair), then
    # count per event_type.
    pairs = partial_agg(
        events,
        keys=[("event_type", pa.string()), ("user_id", pa.int64())],
        values=[],
        count_as="c",
    )
    nusers = partial_agg(
        pairs,
        keys=[("event_type", pa.string())],
        values=[],
        count_as="n_users",
    )
    out = base.join(
        nusers, join_type="inner", num_partitions=min(4, __import__("record_matching_ray.stages.util", fromlist=["u"]).shuffle_partitions()), on=("event_type",),
    )
    return conformed(
        out,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("cnt", pa.int64()),
                ("min_ts", pa.timestamp("us")),
                ("max_ts", pa.timestamp("us")),
                ("n_users", pa.int64()),
            ]
        ),
    )


EVENTS_BY_TYPE_SQL = """
SELECT event_type, COUNT(*) AS cnt, MIN(ts) AS min_ts, MAX(ts) AS max_ts,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# filter + temporal bucketing (§2.2 parsers/filters + date functions)


def orders_by_month(sf_dir: str, min_price: float = 100_000.0) -> ray.data.Dataset:
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], min_price))
        return t.append_column(
            "month", pc.floor_temporal(t["o_orderdate"], unit="month")
        )

    return partial_agg(
        orders,
        keys=[("month", pa.timestamp("us"))],
        values=[
            (
                "revenue_c",
                lambda t: pa.array(_cents(t.column("o_totalprice")), pa.int64()),
                "sum",
                pa.int64(),
            )
        ],
        prep=prep,
        count_as="cnt",
    )


ORDERS_BY_MONTH_SQL = """
SELECT date_trunc('month', o_orderdate) AS month,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_c,
       COUNT(*) AS cnt
FROM orders WHERE o_totalprice > 100000
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# min/max aggregate (exact floats) over part


def part_type_stats(sf_dir: str) -> ray.data.Dataset:
    part = _read(sf_dir, "part", ["p_type", "p_retailprice", "p_size"])

    out = partial_agg(
        part,
        keys=[("p_type", pa.string())],
        values=[
            ("min_price", "p_retailprice", "min", pa.float64()),
            ("max_price", "p_retailprice", "max", pa.float64()),
            ("max_size", "p_size", "max", pa.int32()),
        ],
        count_as="cnt",
    )
    # pinned column order predates the helper: cnt sits FIRST among the
    # aggregates in the oracle-hashed schema
    return out.map_batches(
        lambda t: t.select(
            ["p_type", "cnt", "min_price", "max_price", "max_size"]
        ),
        batch_format="pyarrow",
    )


PART_TYPE_STATS_SQL = """
SELECT p_type, COUNT(*) AS cnt, MIN(p_retailprice) AS min_price,
       MAX(p_retailprice) AS max_price, MAX(p_size) AS max_size
FROM part GROUP BY p_type
"""

# ---------------------------------------------------------------------------
# §2.7 distinct (hash-partitioned)


def distinct_part_types(sf_dir: str) -> ray.data.Dataset:
    part = _read(sf_dir, "part", ["p_type", "p_brand"])

    return partial_agg(
        part,
        keys=[("p_type", pa.string()), ("p_brand", pa.string())],
        values=[],
        count_as="c",
    ).map_batches(lambda t: t.select(["p_type", "p_brand"]), batch_format="pyarrow")


DISTINCT_PART_TYPES_SQL = """
SELECT DISTINCT p_type, p_brand FROM part
"""


# ---------------------------------------------------------------------------
# set-op: union of two name relations (Dataset.union)


def all_account_names(sf_dir: str) -> ray.data.Dataset:
    cust = _read(sf_dir, "customer", ["c_name", "c_acctbal"])
    supp = _read(sf_dir, "supplier", ["s_name", "s_acctbal"])

    def c_shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "name": t.column("c_name"),
                "kind": pa.array(["customer"] * t.num_rows, pa.string()),
                "acctbal_c": pa.array(_cents(t.column("c_acctbal")), pa.int64()),
            }
        )

    def s_shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "name": t.column("s_name"),
                "kind": pa.array(["supplier"] * t.num_rows, pa.string()),
                "acctbal_c": pa.array(_cents(t.column("s_acctbal")), pa.int64()),
            }
        )

    return cust.map_batches(c_shape, batch_format="pyarrow").union(
        supp.map_batches(s_shape, batch_format="pyarrow")
    )


ALL_ACCOUNT_NAMES_SQL = """
SELECT c_name AS name, 'customer' AS kind, CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_c FROM customer
UNION ALL
SELECT s_name AS name, 'supplier' AS kind, CAST(ROUND(s_acctbal*100) AS BIGINT) AS acctbal_c FROM supplier
"""


# ---------------------------------------------------------------------------
# per-user activity (int-keyed groupby, min/max timestamps)


def user_activity(sf_dir: str) -> ray.data.Dataset:
    events = _read(sf_dir, "events", ["user_id", "ts"])

    out = partial_agg(
        events,
        keys=[("user_id", pa.int64())],
        values=[
            ("first_ts", "ts", "min", pa.timestamp("us")),
            ("last_ts", "ts", "max", pa.timestamp("us")),
        ],
        count_as="cnt",
    )
    return out.map_batches(
        lambda t: t.select(["user_id", "cnt", "first_ts", "last_ts"]),
        batch_format="pyarrow",
    )


USER_ACTIVITY_SQL = """
SELECT user_id, COUNT(*) AS cnt, MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# filter + sort + top-k on a unique key (deterministic ordering)


def top_lineitems(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["l_discount"], 0.05)
        t = t.filter(keep)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_linenumber": t.column("l_linenumber"),
                "price_c": pa.array(_cents(t.column("l_extendedprice")), pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .sort(["price_c", "l_orderkey", "l_linenumber"], descending=[True, False, False])
        .limit(k)
    )


TOP_LINEITEMS_SQL = """
SELECT l_orderkey, l_linenumber, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c
FROM lineitem WHERE l_discount > 0.05
ORDER BY price_c DESC, l_orderkey, l_linenumber
LIMIT 20
"""


# ---------------------------------------------------------------------------
# fixed-bin histogram (partial counts per batch; exact SQL parity)


def price_histogram(sf_dir: str, bin_width_c: int = 10_000_00) -> ray.data.Dataset:
    """lineitem extendedprice histogram in fixed cent-width bins —
    batch partials then one small int-keyed groupby; bins are exact
    integer arithmetic so the DuckDB oracle matches bit-for-bit."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pa.array(_cents(t.column("l_extendedprice")), pa.int64())
        bins = pc.cast(
            pc.floor(pc.divide(pc.cast(cents, pa.float64()), float(bin_width_c))),
            pa.int64(),
        )
        g = pa.TableGroupBy(pa.table({"bin": bins}), "bin").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["bin", "cnt"])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .sum("cnt")
        .rename_columns({"sum(cnt)": "cnt"})
    )
    return conformed(out, pa.schema([("bin", pa.int64()), ("cnt", pa.int64())]))


PRICE_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(CAST(ROUND(l_extendedprice*100) AS BIGINT) / 1000000.0) AS BIGINT) AS bin,
       COUNT(*) AS cnt
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 flavor: 3-way join (broadcast semi-join + hash join) + top-k


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-15", k: int = 10) -> ray.data.Dataset:
    """Top-k unshipped-revenue orders for one market segment.

    Plan (SURVEY.md §2.4 join guidance): the filtered customer keys are a
    SMALL side — broadcast once via ray.put and applied as a vectorized
    semi-join mask inside the orders scan (no shuffle); lineitem revenue
    pre-aggregates per order key inside map_batches before the single
    hash join against the filtered orders."""
    import datetime as _dt

    import ray as _ray

    cut = _dt.datetime.fromisoformat(cutoff)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def cust_keys(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("c_mktsegment"), segment)
        return t.filter(keep).select(["c_custkey"])

    keys = np.concatenate(
        [
            t.column("c_custkey").to_numpy(zero_copy_only=False)
            for t in cust.map_batches(cust_keys, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if t.num_rows
        ]
        or [np.empty(0, dtype=np.int64)]
    )
    keys_ref = _ray.put(np.sort(keys.astype(np.int64)))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def filt_orders(t: pa.Table) -> pa.Table:
        ks = _ray.get(keys_ref) if isinstance(keys_ref, _ray.ObjectRef) else keys_ref
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ks, ck)
        idx[idx >= len(ks)] = max(len(ks) - 1, 0)
        mask = (len(ks) > 0) & (ks[idx] == ck) if len(ks) else np.zeros(len(ck), bool)
        mask = mask & (
            t.column("o_orderdate").to_numpy(zero_copy_only=False) < np.datetime64(cut)
        )
        return t.filter(pa.array(mask)).select(["o_orderkey", "o_orderdate"])

    f_orders = orders.map_batches(filt_orders, batch_format="pyarrow")

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def revenue_partial(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("l_shipdate"), pa.scalar(cut, pa.timestamp("us")))
        t = t.filter(keep)
        price_c = _cents(t.column("l_extendedprice"))
        disc_c = _cents(t.column("l_discount"))
        # revenue in exact integer micro-units: price_c * (100 - disc_c)
        rev = price_c * (100 - disc_c)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey"),
                    "rev_u": pa.array(rev, pa.int64()),
                }
            ),
            "l_orderkey",
        ).aggregate([("rev_u", "sum")])
        return g.rename_columns(["l_orderkey", "rev_u"])

    rev = (
        li.map_batches(revenue_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("rev_u")
        .rename_columns({"sum(rev_u)": "rev_u"})
    )
    joined = conformed(
        rev, pa.schema([("l_orderkey", pa.int64()), ("rev_u", pa.int64())])
    ).join(
        f_orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("l_orderkey"),
                "o_orderdate": t.column("o_orderdate"),
                "revenue_u": t.column("rev_u"),
            }
        )

    return (
        joined.map_batches(shape, batch_format="pyarrow")
        .sort(["revenue_u", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey AS o_orderkey, o_orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_u
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate  > TIMESTAMP '1998-06-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_u DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# pivot (categories -> columns, conditional aggregation)

ORDER_PRIORITIES = (
    "1-URGENT",
    "2-HIGH",
    "3-MEDIUM",
    "4-NOT SPECIFIED",
    "5-LOW",
)


def orders_priority_pivot(sf_dir: str) -> ray.data.Dataset:
    """Pivot: order counts per month x order priority, one column per
    priority (fixed category set — a pivot's contract). The reference's
    pandas pivots (poc result tables) map to conditional partial
    aggregation: each batch emits one row per month with per-category
    counts, then a single small groupby-sum — the category fan-out never
    shuffles, only (months x batches) partial rows do."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_orderpriority"])
    cols = [f"p{i+1}" for i in range(len(ORDER_PRIORITIES))]

    def prep(t: pa.Table) -> pa.Table:
        data = {"month": pc.floor_temporal(t["o_orderdate"], unit="month")}
        for c, p in zip(cols, ORDER_PRIORITIES):
            data[c] = pc.cast(pc.equal(t["o_orderpriority"], p), pa.int64())
        return pa.table(data)

    return partial_agg(
        orders,
        keys=[("month", pa.timestamp("us"))],
        values=[(c, c, "sum", pa.int64()) for c in cols],
        prep=prep,
    )


ORDERS_PRIORITY_PIVOT_SQL = """
SELECT date_trunc('month', o_orderdate) AS month,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5
FROM orders GROUP BY 1
"""


def orders_running_total(sf_dir: str) -> ray.data.Dataset:
    """Cumulative windowed sum: running total of a customer's order value
    over time (stages/temporal.running_total)."""
    from record_matching_ray.stages.temporal import running_total

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    return conformed(
        running_total(orders),
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("running_cents", pa.int64()),
            ]
        ),
    )


ORDERS_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS running_cents
FROM orders
"""


# ---------------------------------------------------------------------------
# ordered per-group aggregation (array_agg / string_agg)


def customer_names_by_nation(sf_dir: str) -> ray.data.Dataset:
    """Ordered string_agg: per nation, all customer names joined by ','
    in c_custkey order — the reference's array_agg pivot (SURVEY §2.5,
    record_matching/main.py field_vectors array_agg) done as a true
    ordered aggregation rather than the wide-layout analog.

    Shape: hash-partition by nation key (int pk), one lexsort + segment
    join per partition; the group payload (concatenated names) is built
    worker-side, one output row per group crosses the wire. Giant groups
    make giant strings by design — cap upstream if a group can exceed
    worker heap (at TPC-H shape groups are ~customers/nations)."""
    from record_matching_ray.functions.hashing import _U64, mix64
    from record_matching_ray.stages.util import coarse_groupby_partitions

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_name"])
    P = coarse_groupby_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(
                    (mix64(nk.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()
                ),
                "nk": pa.array(nk, pa.int64()),
                "ck": t.column("c_custkey"),
                "name": t.column("c_name"),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        nk = g.column("nk").to_numpy(zero_copy_only=False)
        ck = g.column("ck").to_numpy(zero_copy_only=False)
        names = np.asarray(g.column("name").to_pylist(), dtype=object)
        order = np.lexsort((ck, nk))
        nk_s, names_s = nk[order], names[order]
        starts = np.nonzero(np.concatenate(([True], nk_s[1:] != nk_s[:-1])))[0]
        ends = np.append(starts[1:], len(order))
        return pa.table(
            {
                "c_nationkey": pa.array(nk_s[starts], pa.int64()),
                "names": pa.array(
                    [",".join(names_s[s:e]) for s, e in zip(starts, ends)],
                    pa.string(),
                ),
                "n_customers": pa.array((ends - starts).astype(np.int64), pa.int64()),
            }
        )

    out = (
        cust.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow")
    )
    return conformed(
        out,
        pa.schema(
            [
                ("c_nationkey", pa.int64()),
                ("names", pa.string()),
                ("n_customers", pa.int64()),
            ]
        ),
    )


CUSTOMER_NAMES_BY_NATION_SQL = """
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_custkey) AS names,
       COUNT(*) AS n_customers
FROM customer GROUP BY c_nationkey
"""


def orders_rollup(sf_dir: str) -> ray.data.Dataset:
    """GROUP BY ROLLUP(o_orderstatus, o_orderpriority): the detail level
    plus per-status subtotals plus the grand total, NULL-marked the SQL
    way. Rollup levels re-aggregate the DETAIL AGGREGATE (tens of rows),
    never the fact table — the fact table is read once for the partial
    pass, so the two extra levels are free at any scale."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        prep = pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "o_orderpriority": t.column("o_orderpriority"),
                "price_c": pa.array(_cents(t.column("o_totalprice")), pa.int64()),
            }
        )
        g = pa.TableGroupBy(prep, ["o_orderstatus", "o_orderpriority"]).aggregate(
            [("price_c", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["o_orderstatus", "o_orderpriority", "sum_price_c", "cnt"]
        )

    base = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(
            Sum(on="sum_price_c", alias_name="sum_price_c"),
            Sum(on="cnt", alias_name="cnt"),
        )
        .materialize()
    )

    SCHEMA = pa.schema(
        [
            ("o_orderstatus", pa.string()),
            ("o_orderpriority", pa.string()),
            ("sum_price_c", pa.int64()),
            ("cnt", pa.int64()),
        ]
    )

    def null_priority(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t.column("o_orderstatus"),
                "o_orderpriority": pa.nulls(t.num_rows, pa.string()),
                "sum_price_c": t.column("sum_price_c"),
                "cnt": t.column("cnt"),
            }
        )

    lvl1 = (
        base.groupby("o_orderstatus")
        .aggregate(
            Sum(on="sum_price_c", alias_name="sum_price_c"),
            Sum(on="cnt", alias_name="cnt"),
        )
        .map_batches(null_priority, batch_format="pyarrow")
    )
    totals = base.aggregate(
        Sum(on="sum_price_c", alias_name="sum_price_c"),
        Sum(on="cnt", alias_name="cnt"),
    )
    grand = ray.data.from_arrow(
        pa.table(
            {
                "o_orderstatus": pa.nulls(1, pa.string()),
                "o_orderpriority": pa.nulls(1, pa.string()),
                "sum_price_c": pa.array([totals["sum_price_c"]], pa.int64()),
                "cnt": pa.array([totals["cnt"]], pa.int64()),
            }
        )
    )
    return conformed(base, SCHEMA).union(
        conformed(lvl1, SCHEMA), conformed(grand, SCHEMA)
    )


ORDERS_ROLLUP_SQL = """
WITH p AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
)
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(price_c) AS BIGINT) AS sum_price_c, COUNT(*) AS cnt
FROM p GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def events_props_stats(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured (JSON) field extraction + aggregate: pull the
    integer ``k`` out of the events' JSON ``props`` column and roll up
    per event_type. Extraction stays vectorized — pyarrow's RE2 kernel
    (``pc.extract_regex``) instead of a per-row json.loads loop; for this
    fixed single-key shape the regex IS exact JSON semantics (the DuckDB
    oracle uses real json_extract, so any divergence would fail parity)."""
    from ray.data.aggregate import Sum, Max

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(
            t.column("props").combine_chunks(), r'"k"\s*:\s*(?P<k>-?\d+)'
        )
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        prep = pa.table({"event_type": t.column("event_type"), "k": k})
        g = pa.TableGroupBy(prep, "event_type").aggregate(
            [("k", "sum"), ("k", "max"), ([], "count_all")]
        )
        return g.rename_columns(["event_type", "sum_k", "max_k", "cnt"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum(on="sum_k", alias_name="sum_k"),
            Max(on="max_k", alias_name="max_k"),
            Sum(on="cnt", alias_name="cnt"),
        )
    )


EVENTS_PROPS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(*) AS cnt
FROM events GROUP BY 1
"""


def lineitem_price_qty_corr(sf_dir: str) -> ray.data.Dataset:
    """Pearson correlation of extended price vs quantity per return
    flag — the moment-sketch aggregate family (corr/covar/stddev): each
    batch contributes the 6 sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) per group, so the shuffle moves one tiny
    row per (group, batch) and the correlation assembles exactly once at
    the end. Sums run in float64 (Σx² at web scale overflows int64);
    the SQL oracle mirrors the same explicit formula rather than its
    built-in corr(), so parity is formula-level, not library-level."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
    )

    def partial(t: pa.Table) -> pa.Table:
        x = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        y = t.column("l_quantity").to_numpy(zero_copy_only=False)
        prep = pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "sx": pa.array(x, pa.float64()),
                "sy": pa.array(y, pa.float64()),
                "sxy": pa.array(x * y, pa.float64()),
                "sxx": pa.array(x * x, pa.float64()),
                "syy": pa.array(y * y, pa.float64()),
            }
        )
        g = pa.TableGroupBy(prep, "l_returnflag").aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxy", "sum"), ("sxx", "sum"),
             ("syy", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "sx", "sy", "sxy", "sxx", "syy", "n"]
        )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t.column("sx").to_numpy(zero_copy_only=False)
        sy = t.column("sy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        num = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        r = np.divide(num, den, out=np.zeros_like(num), where=den > 0)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "corr_price_qty": pa.array(np.round(r, 6), pa.float64()),
            }
        )

    from ray.data.aggregate import Sum as _S

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            _S(on="sx", alias_name="sx"), _S(on="sy", alias_name="sy"),
            _S(on="sxy", alias_name="sxy"), _S(on="sxx", alias_name="sxx"),
            _S(on="syy", alias_name="syy"), _S(on="n", alias_name="n"),
        )
        .map_batches(finalize, batch_format="pyarrow")
    )


LINEITEM_CORR_SQL = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_extendedprice AS DOUBLE)) AS sx,
         SUM(CAST(l_quantity AS DOUBLE)) AS sy,
         SUM(CAST(l_extendedprice AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS sxy,
         SUM(CAST(l_extendedprice AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)) AS sxx,
         SUM(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)) AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS corr_price_qty
FROM s
"""


# ---------------------------------------------------------------------------
# TPC-H Q5-style local-supplier volume (6-table join, dual plans)


def local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    max_broadcast: int = 5_000_000,
    force_join: bool = False,
) -> ray.data.Dataset:
    """Revenue per nation from orders whose customer and line-supplier
    share the nation, restricted to one region and a one-year window —
    TPC-H Q5's shape over the test tables.

    Two plans behind a counted gate (same split as the ER scorer and
    pagerank):

    - broadcast (customer+supplier <= max_broadcast rows): the two
      key->nationkey maps are sorted arrays shipped once via ray.put;
      orders and lineitem each take ONE scan with a vectorized
      searchsorted attach, pre-aggregating revenue per (orderkey,
      supp_nation) inside the batch. Only the single orderkey-keyed
      hash join between the two fact streams shuffles.
    - join (the 100 TB path, ``force_join=True`` or over the gate):
      orders ⋈ customer and lineitem-partials ⋈ supplier as distributed
      hash joins, then the same orderkey join. No driver-side structure
      scales with the dims.

    Output: (n_name, revenue_u) — revenue in exact integer micro-units
    (cents x (100 - discount cents)), descending.
    """
    import datetime as _dt

    lo = np.datetime64(_dt.datetime.fromisoformat(date_lo))
    hi = np.datetime64(_dt.datetime.fromisoformat(date_hi))

    # dim-side loads bypass Ray entirely: the broadcast plan is BY
    # DEFINITION driver-bounded (gate below), so paying a distributed
    # read's per-dataset floor x4 for tables we immediately collect is
    # pure overhead (measured: 36 s -> ~8 s for the whole query at
    # sf0.01/32 CPUs). The gate itself reads only parquet footers.
    import pyarrow.parquet as _pq

    nat = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pylist()
    reg = _pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pylist()
    region_keys = {r["r_regionkey"] for r in reg if r["r_name"] == region}
    nk_in_region = np.sort(
        np.array(
            [n["n_nationkey"] for n in nat if n["n_regionkey"] in region_keys],
            dtype=np.int64,
        )
    )
    nk_name = {int(n["n_nationkey"]): n["n_name"] for n in nat}

    def _key_map(table: str, key: str, val: str):
        """Sorted (keys, vals) arrays of a dim table, driver-bounded."""
        t = _pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key, val])
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(val).to_numpy(zero_copy_only=False)
        o = np.argsort(k)
        return k[o].astype(np.int64), v[o].astype(np.int64)

    n_dims = (
        _pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
        + _pq.read_metadata(f"{sf_dir}/supplier.parquet").num_rows
    )
    use_broadcast = (not force_join) and n_dims <= max_broadcast

    ORD = pa.schema([("o_orderkey", pa.int64()), ("cust_nat", pa.int64())])
    REV = pa.schema(
        [("l_orderkey", pa.int64()), ("supp_nat", pa.int64()), ("rev_u", pa.int64())]
    )

    def _lookup(keys: np.ndarray, vals: np.ndarray, q: np.ndarray):
        """vectorized key->val with -1 for misses."""
        if len(keys) == 0:
            return np.full(len(q), -1, dtype=np.int64)
        idx = np.searchsorted(keys, q)
        idx[idx >= len(keys)] = len(keys) - 1
        out = vals[idx].copy()
        out[keys[idx] != q] = -1
        return out

    def rev_partial(t: pa.Table, supp_nat: np.ndarray) -> pa.Table:
        price_c = _cents(t.column("l_extendedprice"))
        disc_c = _cents(t.column("l_discount"))
        rev = price_c * (100 - disc_c)
        ok = supp_nat >= 0
        g = pa.TableGroupBy(
            pa.table(
                {
                    "l_orderkey": t.column("l_orderkey").filter(pa.array(ok)),
                    "supp_nat": pa.array(supp_nat[ok], pa.int64()),
                    "rev_u": pa.array(rev[ok], pa.int64()),
                }
            ),
            ["l_orderkey", "supp_nat"],
        ).aggregate([("rev_u", "sum")])
        return g.rename_columns(["l_orderkey", "supp_nat", "rev_u"])

    if use_broadcast:
        ck, cn = _key_map("customer", "c_custkey", "c_nationkey")
        sk, sn = _key_map("supplier", "s_suppkey", "s_nationkey")
        cust_ref = ray.put((ck, cn))
        supp_ref = ray.put((sk, sn))

        def orders_scan(t: pa.Table) -> pa.Table:
            k, v = ray.get(cust_ref) if isinstance(cust_ref, ray.ObjectRef) else cust_ref
            d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
            keep = (d >= lo) & (d < hi)
            t = t.filter(pa.array(keep))
            nat_k = _lookup(k, v, t.column("o_custkey").to_numpy(zero_copy_only=False))
            in_reg = np.isin(nat_k, nk_in_region)
            return pa.table(
                {
                    "o_orderkey": t.column("o_orderkey").filter(pa.array(in_reg)),
                    "cust_nat": pa.array(nat_k[in_reg], pa.int64()),
                }
            )

        def li_scan(t: pa.Table) -> pa.Table:
            k, v = ray.get(supp_ref) if isinstance(supp_ref, ray.ObjectRef) else supp_ref
            supp_nat = _lookup(k, v, t.column("l_suppkey").to_numpy(zero_copy_only=False))
            supp_nat[~np.isin(supp_nat, nk_in_region)] = -1
            return rev_partial(t, supp_nat)

        f_orders = conformed(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
                orders_scan, batch_format="pyarrow"
            ),
            ORD,
        )
        rev = conformed(
            _read(
                sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
            ).map_batches(li_scan, batch_format="pyarrow"),
            REV,
        )
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

        def orders_filter(t: pa.Table) -> pa.Table:
            d = t.column("o_orderdate").to_numpy(zero_copy_only=False)
            keep = (d >= lo) & (d < hi)
            return t.filter(pa.array(keep)).select(["o_orderkey", "o_custkey"])

        f_orders = (
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
            .map_batches(orders_filter, batch_format="pyarrow")
            .join(
                cust,
                join_type="inner",
                num_partitions=8,
                on=("o_custkey",),
                right_on=("c_custkey",),
            )
        )

        def ord_shape(t: pa.Table) -> pa.Table:
            nat_k = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
            in_reg = np.isin(nat_k, nk_in_region)
            return pa.table(
                {
                    "o_orderkey": t.column("o_orderkey").filter(pa.array(in_reg)),
                    "cust_nat": pa.array(nat_k[in_reg], pa.int64()),
                }
            )

        f_orders = conformed(
            f_orders.map_batches(ord_shape, batch_format="pyarrow"), ORD
        )

        def li_partial_keyed(t: pa.Table) -> pa.Table:
            price_c = _cents(t.column("l_extendedprice"))
            disc_c = _cents(t.column("l_discount"))
            rev = price_c * (100 - disc_c)
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "l_orderkey": t.column("l_orderkey"),
                        "l_suppkey": t.column("l_suppkey"),
                        "rev_u": pa.array(rev, pa.int64()),
                    }
                ),
                ["l_orderkey", "l_suppkey"],
            ).aggregate([("rev_u", "sum")])
            return g.rename_columns(["l_orderkey", "l_suppkey", "rev_u"])

        li_part = _read(
            sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
        ).map_batches(li_partial_keyed, batch_format="pyarrow")
        joined_s = li_part.join(
            supp,
            join_type="inner",
            num_partitions=8,
            on=("l_suppkey",),
            right_on=("s_suppkey",),
        )

        def li_shape(t: pa.Table) -> pa.Table:
            nat_k = t.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
            in_reg = np.isin(nat_k, nk_in_region)
            return pa.table(
                {
                    "l_orderkey": t.column("l_orderkey").filter(pa.array(in_reg)),
                    "supp_nat": pa.array(nat_k[in_reg], pa.int64()),
                    "rev_u": t.column("rev_u").filter(pa.array(in_reg)),
                }
            )

        rev = conformed(joined_s.map_batches(li_shape, batch_format="pyarrow"), REV)

    wide = rev.join(
        f_orders,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def same_nation_partial(t: pa.Table) -> pa.Table:
        cn_ = t.column("cust_nat").to_numpy(zero_copy_only=False)
        sn_ = t.column("supp_nat").to_numpy(zero_copy_only=False)
        keep = cn_ == sn_
        g = pa.TableGroupBy(
            pa.table(
                {
                    "nat": pa.array(sn_[keep], pa.int64()),
                    "rev_u": t.column("rev_u").filter(pa.array(keep)),
                }
            ),
            "nat",
        ).aggregate([("rev_u", "sum")])
        return g.rename_columns(["nat", "rev_u"])

    per_nat = (
        conformed(
            wide.map_batches(same_nation_partial, batch_format="pyarrow"),
            pa.schema([("nat", pa.int64()), ("rev_u", pa.int64())]),
        )
        .groupby("nat")
        .sum("rev_u")
        .rename_columns({"sum(rev_u)": "rev_u"})
    )

    def name_shape(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "nat" not in t.column_names:
            return pa.schema(
                [("n_name", pa.string()), ("revenue_u", pa.int64())]
            ).empty_table()
        names = [nk_name[int(x)] for x in t.column("nat").to_pylist()]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_u": t.column("rev_u"),
            }
        )

    return (
        conformed(
            per_nat.map_batches(name_shape, batch_format="pyarrow"),
            pa.schema([("n_name", pa.string()), ("revenue_u", pa.int64())]),
        )
        .sort(["revenue_u", "n_name"], descending=[True, False])
    )


LOCAL_SUPPLIER_VOLUME_SQL = """
SELECT n_name,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_u
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_u DESC, n_name
"""


# ---------------------------------------------------------------------------
# LEFT OUTER join via tagged union (orders with/without shipped lines)


def order_fulfillment(sf_dir: str, cutoff: str = "1996-07-01") -> ray.data.Dataset:
    """Per-order shipped-line summary that KEEPS orders with no shipped
    lines — the left-outer-join shape, expressed as a tagged union:

    orders emit (key, total_c, is_order=1, 0 lines, 0 revenue); shipped
    lineitems emit per-batch pre-aggregated (key, 0, 0, n, rev_u); one
    groupby(key) sums the tags — so the 'outer' side needs NO join
    operator at all (and no Acero empty-partition hazard), just the same
    single hash shuffle an inner aggregate would use. Orders-side rows
    are identified by is_order >= 1; line rows for unknown orders (none
    under TPC-H referential integrity) drop out the same way a left join
    would drop them.

    Output: (o_orderkey, total_c, n_shipped_lines, shipped_rev_u) — money
    in exact integer cents / micro-units."""
    import datetime as _dt

    cut = np.datetime64(_dt.datetime.fromisoformat(cutoff))
    ACC = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("total_c", pa.int64()),
            ("is_order", pa.int64()),
            ("n_lines", pa.int64()),
            ("rev_u", pa.int64()),
        ]
    )

    def order_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "total_c": pa.array(_cents(t.column("o_totalprice")), pa.int64()),
                "is_order": pa.array(np.ones(n, np.int64), pa.int64()),
                "n_lines": pa.array(np.zeros(n, np.int64), pa.int64()),
                "rev_u": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    def line_rows(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(d <= cut))
        price_c = _cents(t.column("l_extendedprice"))
        disc_c = _cents(t.column("l_discount"))
        g = pa.TableGroupBy(
            pa.table(
                {
                    "o_orderkey": t.column("l_orderkey"),
                    "n_lines": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                    "rev_u": pa.array(price_c * (100 - disc_c), pa.int64()),
                }
            ),
            "o_orderkey",
        ).aggregate([("n_lines", "sum"), ("rev_u", "sum")])
        g = g.rename_columns(["o_orderkey", "n_lines", "rev_u"])
        n = g.num_rows
        return pa.table(
            {
                "o_orderkey": g.column("o_orderkey"),
                "total_c": pa.array(np.zeros(n, np.int64), pa.int64()),
                "is_order": pa.array(np.zeros(n, np.int64), pa.int64()),
                "n_lines": g.column("n_lines"),
                "rev_u": g.column("rev_u"),
            }
        )

    orders = conformed(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            order_rows, batch_format="pyarrow"
        ),
        ACC,
    )
    lines = conformed(
        _read(
            sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
        ).map_batches(line_rows, batch_format="pyarrow"),
        ACC,
    )
    acc = (
        orders.union(lines)
        .groupby("o_orderkey")
        .aggregate(
            ray.data.aggregate.Sum("total_c"),
            ray.data.aggregate.Sum("is_order"),
            ray.data.aggregate.Sum("n_lines"),
            ray.data.aggregate.Sum("rev_u"),
        )
    )

    OUT = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("total_c", pa.int64()),
            ("n_shipped_lines", pa.int64()),
            ("shipped_rev_u", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(is_order)" not in t.column_names:
            return OUT.empty_table()
        keep = pa.compute.greater_equal(t.column("sum(is_order)"), 1)
        t = t.filter(keep)
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "total_c": t.column("sum(total_c)"),
                "n_shipped_lines": t.column("sum(n_lines)"),
                "shipped_rev_u": t.column("sum(rev_u)"),
            }
        )

    return conformed(acc.map_batches(finish, batch_format="pyarrow"), OUT)


ORDER_FULFILLMENT_SQL = """
SELECT o.o_orderkey,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_c,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_shipped_lines,
       CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(ROUND(l.l_discount*100) AS BIGINT))), 0)
            AS BIGINT) AS shipped_rev_u
FROM orders o
LEFT JOIN (SELECT * FROM lineitem WHERE l_shipdate <= TIMESTAMP '1996-07-01') l
       ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_totalprice
"""


# ---------------------------------------------------------------------------
# CUBE grouping sets (shared-scan multi-level aggregate)


def orders_cube(sf_dir: str) -> ray.data.Dataset:
    """Order count + exact total cents for every grouping set of
    CUBE(o_orderpriority, o_orderstatus), rolled-up levels labeled
    'ALL'. Ray shape: the scan emits all four grouping-set keys per
    batch (pre-combined with pa.TableGroupBy), so ONE pass over orders
    and one small shuffle serve all 2^2 levels — the shared-scan
    grouping-sets plan."""
    ACC = pa.schema(
        [
            ("o_orderpriority", pa.string()),
            ("o_orderstatus", pa.string()),
            ("n_orders", pa.int64()),
            ("total_c", pa.int64()),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        base = pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "o_orderstatus": t.column("o_orderstatus"),
                "total_c": pa.array(_cents(t.column("o_totalprice")), pa.int64()),
            }
        )
        alls = pa.array(["ALL"] * t.num_rows, pa.string())
        sets = []
        for pcol, scol in (
            (base.column("o_orderpriority"), base.column("o_orderstatus")),
            (base.column("o_orderpriority"), alls),
            (alls, base.column("o_orderstatus")),
            (alls, alls),
        ):
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "o_orderpriority": pcol,
                        "o_orderstatus": scol,
                        "n_orders": pa.array(np.ones(t.num_rows, np.int64)),
                        "total_c": base.column("total_c"),
                    }
                ),
                ["o_orderpriority", "o_orderstatus"],
            ).aggregate([("n_orders", "sum"), ("total_c", "sum")])
            sets.append(
                g.rename_columns(
                    ["o_orderpriority", "o_orderstatus", "n_orders", "total_c"]
                )
            )
        return pa.concat_tables(sets).cast(ACC)

    acc = (
        conformed(
            _read(
                sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
            ).map_batches(partial, batch_format="pyarrow"),
            ACC,
        )
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(
            ray.data.aggregate.Sum("n_orders"),
            ray.data.aggregate.Sum("total_c"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(n_orders)" not in t.column_names:
            return ACC.empty_table()
        return t.rename_columns(
            ["o_orderpriority", "o_orderstatus", "n_orders", "total_c"]
        ).cast(ACC)

    return conformed(acc.map_batches(finish, batch_format="pyarrow"), ACC)


ORDERS_CUBE_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


# ---------------------------------------------------------------------------
# z-score outliers (two-pass: tiny aggregate -> broadcast filter)


def event_value_outliers(sf_dir: str, z_threshold: float = 3.0) -> ray.data.Dataset:
    """Events whose value deviates more than ``z_threshold`` population
    standard deviations from their event_type's mean.

    Ray shape: pass 1 reduces the stream to TYPE-bounded moment rows
    (per-batch partial combine, one tiny groupby); the per-type (mean,
    std) table is broadcast via ray.put; pass 2 is a stateless scan
    filter. Both sides compute std as sqrt(max(s2/n - mean^2, 0)) so the
    oracle shares the expression tree."""
    MOM = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("s", pa.float64()),
            ("s2", pa.float64()),
        ]
    )

    def mom_partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "n": pa.array(np.ones(len(v), np.int64)),
                    "s": pa.array(v, pa.float64()),
                    "s2": pa.array(v * v, pa.float64()),
                }
            ),
            "event_type",
        ).aggregate([("n", "sum"), ("s", "sum"), ("s2", "sum")])
        return g.rename_columns(["event_type", "n", "s", "s2"]).cast(MOM)

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    mom = (
        conformed(ev.map_batches(mom_partial, batch_format="pyarrow"), MOM)
        .groupby("event_type")
        .aggregate(
            ray.data.aggregate.Sum("n"),
            ray.data.aggregate.Sum("s"),
            ray.data.aggregate.Sum("s2"),
        )
    )
    stats: dict[str, tuple[float, float]] = {}
    for b in mom.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0 or "sum(n)" not in b.column_names:
            continue
        for r in b.to_pylist():
            n = float(r["sum(n)"])
            mean = r["sum(s)"] / n
            std = float(np.sqrt(max(r["sum(s2)"] / n - mean * mean, 0.0)))
            stats[r["event_type"]] = (mean, std)
    stats_ref = ray.put(stats)

    OUT = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("z", pa.float64()),
        ]
    )

    def flag(t: pa.Table) -> pa.Table:
        st = ray.get(stats_ref) if isinstance(stats_ref, ray.ObjectRef) else stats_ref
        types = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        mean = np.array([st.get(x, (0.0, 0.0))[0] for x in types])
        std = np.array([st.get(x, (0.0, 0.0))[1] for x in types])
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(std > 0, (v - mean) / std, 0.0)
        keep = np.abs(z) > z_threshold
        return pa.table(
            {
                "event_id": t.column("event_id").filter(pa.array(keep)),
                "event_type": t.column("event_type").filter(pa.array(keep)),
                "value": pa.array(v[keep], pa.float64()),
                # round-6 output convention (sum-order drift vs SQL)
                "z": pa.array(np.round(z[keep], 6), pa.float64()),
            }
        )

    return conformed(ev.map_batches(flag, batch_format="pyarrow"), OUT)


EVENT_OUTLIERS_SQL = """
WITH s AS (
  SELECT event_type, count(*) AS n,
         SUM(CAST(value AS DOUBLE)) AS s,
         SUM(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS s2
  FROM events GROUP BY 1
),
st AS (
  SELECT event_type, s / n AS mean,
         sqrt(greatest(s2 / n - (s / n) * (s / n), 0)) AS std
  FROM s
)
SELECT e.event_id, e.event_type, CAST(e.value AS DOUBLE) AS value,
       round((e.value - st.mean) / st.std, 6) AS z
FROM events e JOIN st USING (event_type)
WHERE st.std > 0 AND abs((e.value - st.mean) / st.std) > 3.0
"""


def parts_small_only(sf_dir: str) -> ray.data.Dataset:
    """Distributed set difference (SQL EXCEPT): parts shipped at quantity
    1 but NEVER at quantity 50 ("never bulk-ordered"). Per-batch
    (partkey, in_A, in_B) bit partials, one groupby(key) OR-merge,
    stateless filter — the shuffle moves two bits per distinct key per
    batch, never the fact rows. The same plan implements INTERSECT
    (keep A&B) and symmetric difference."""
    lines = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        q = t.column("l_quantity").to_numpy(zero_copy_only=False)
        in_a = q == 1.0
        in_b = q == 50.0
        keep = in_a | in_b
        keys = t.column("l_partkey").to_numpy(zero_copy_only=False)[keep]
        isa = in_a[keep].astype(np.int64)
        uniq, inv = np.unique(keys, return_inverse=True)
        a = np.zeros(len(uniq), dtype=np.int64)
        b = np.zeros(len(uniq), dtype=np.int64)
        np.maximum.at(a, inv, isa)
        np.maximum.at(b, inv, 1 - isa)
        return pa.table(
            {
                "l_partkey": pa.array(uniq, pa.int64()),
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    merged = (
        lines.map_batches(partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Max(on="a", alias_name="a"), Max(on="b", alias_name="b"))
    )

    def final(t: pa.Table) -> pa.Table:
        if "l_partkey" not in t.column_names:  # empty hash-shuffle block
            return pa.table({"l_partkey": pa.array([], pa.int64())})
        keep = pc.and_(pc.equal(t.column("a"), 1), pc.equal(t.column("b"), 0))
        return pa.table({"l_partkey": t.column("l_partkey").filter(keep)})

    return merged.map_batches(final, batch_format="pyarrow")


def event_value_median(sf_dir: str) -> ray.data.Dataset:
    """Exact interpolated median (percentile_cont 0.5) of `value` per
    event type — the EXACT continuous-domain companion to
    quantiles.group_quantiles (integer histograms) and approx_quantiles
    (coresets): each type's values sort inside ONE group, so this is for
    categorical-grained keys; for heavy groups use the coreset op."""
    events = _read(sf_dir, "events", ["event_type", "value"])

    def median(g: pa.Table) -> pa.Table:
        v = np.sort(g.column("value").to_numpy(zero_copy_only=False))
        n = len(v)
        med = float(v[n // 2]) if n % 2 else float((v[n // 2 - 1] + v[n // 2]) / 2.0)
        return pa.table(
            {
                "event_type": pa.array(
                    [g.column("event_type")[0].as_py()], pa.string()
                ),
                "median_value": pa.array([med], pa.float64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    return events.groupby("event_type").map_groups(median, batch_format="pyarrow")


def event_value_mad(sf_dir: str, z: float = 3.0) -> ray.data.Dataset:
    """Robust per-group dispersion: exact median, MAD (median absolute
    deviation) and robust-z outlier count (|v - med| > z * 1.4826 * MAD
    — the MAD-to-sigma consistency constant for normal data). Same
    one-group-per-key sort pattern as event_value_median; the z-score
    variant lives in event_value_outliers (mean/std is outlier-skewed,
    MAD is not — the standard robust alternative).

    Output: (event_type, median_value, mad, n_outliers, n); floats
    rounded to 6 (repo convention), the outlier comparison runs on
    UNROUNDED values and is bit-identical to DuckDB's interpolated
    median (verified: same (a+b)/2 arithmetic)."""
    events = _read(sf_dir, "events", ["event_type", "value"])

    def mad_group(g: pa.Table) -> pa.Table:
        v = np.sort(g.column("value").to_numpy(zero_copy_only=False))
        n = len(v)

        def med_of(a: np.ndarray) -> float:
            m = len(a)
            return float(a[m // 2]) if m % 2 else float(
                (a[m // 2 - 1] + a[m // 2]) / 2.0
            )

        med = med_of(v)
        dev = np.abs(v - med)
        madv = med_of(np.sort(dev))
        n_out = int((dev > z * 1.4826 * madv).sum())
        return pa.table(
            {
                "event_type": pa.array(
                    [g.column("event_type")[0].as_py()], pa.string()
                ),
                "median_value": pa.array([round(med, 6)], pa.float64()),
                "mad": pa.array([round(madv, 6)], pa.float64()),
                "n_outliers": pa.array([n_out], pa.int64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    return events.groupby("event_type").map_groups(mad_group, batch_format="pyarrow")


EVENT_VALUE_MAD_SQL = """
WITH m AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY 1
), d AS (
  SELECT e.event_type, m.med, ABS(e.value - m.med) AS ad
  FROM events e JOIN m USING (event_type)
), md AS (
  SELECT event_type, median(ad) AS mad FROM d GROUP BY 1
)
SELECT d.event_type,
       ROUND(ANY_VALUE(d.med), 6) AS median_value,
       ROUND(ANY_VALUE(md.mad), 6) AS mad,
       CAST(SUM(CASE WHEN d.ad > 3.0 * 1.4826 * md.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       COUNT(*) AS n
FROM d JOIN md USING (event_type)
GROUP BY d.event_type
"""


def orders_price_moments(sf_dir: str) -> ray.data.Dataset:
    """Per-priority sample skewness + excess kurtosis of o_totalprice —
    the order-3/4 members of the moment-sketch family next to
    lineitem_price_qty_corr (order 2). Two passes for numerical safety:
    raw power sums of ~1e5-magnitude prices cancel catastrophically at
    order 4, so pass 1 computes exact per-group means (a tiny count/sum
    aggregate, driver-bounded by |priorities|), pass 2 sums CENTERED
    powers per (group, batch) against the broadcast means — associative,
    stable, one small shuffle. Bias-corrected formulas (DuckDB/Excel G1,
    G2); outputs rounded to 6."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def count_sum(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "p": t.column("o_orderpriority"),
                    "v": pc.cast(t.column("o_totalprice"), pa.float64()),
                }
            ),
            "p",
        ).aggregate([("v", "count"), ("v", "sum")])
        return g.rename_columns(["p", "cnt", "s"])

    from ray.data.aggregate import Sum

    base = (
        orders.map_batches(count_sum, batch_format="pyarrow")
        .groupby("p")
        .aggregate(Sum(on="cnt", alias_name="cnt"), Sum(on="s", alias_name="s"))
        .to_pandas()  # driver-bounded: one row per priority
    )
    means = {r["p"]: r["s"] / r["cnt"] for _, r in base.iterrows()}
    counts = {r["p"]: int(r["cnt"]) for _, r in base.iterrows()}
    import ray as _ray

    means_ref = _ray.put(means)

    def centered(t: pa.Table) -> pa.Table:
        m = _ray.get(means_ref) if isinstance(means_ref, _ray.ObjectRef) else means_ref
        ps = t.column("o_orderpriority").to_pylist()
        v = pc.cast(t.column("o_totalprice"), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        mu = np.array([m[p] for p in ps])
        d = v - mu
        g = pa.TableGroupBy(
            pa.table(
                {
                    "p": pa.array(ps, pa.string()),
                    "d2": pa.array(d * d, pa.float64()),
                    "d3": pa.array(d**3, pa.float64()),
                    "d4": pa.array(d**4, pa.float64()),
                }
            ),
            "p",
        ).aggregate([("d2", "sum"), ("d3", "sum"), ("d4", "sum")])
        return g.rename_columns(["p", "d2", "d3", "d4"])

    sums = (
        orders.map_batches(centered, batch_format="pyarrow")
        .groupby("p")
        .aggregate(
            Sum(on="d2", alias_name="d2"),
            Sum(on="d3", alias_name="d3"),
            Sum(on="d4", alias_name="d4"),
        )
    )

    OUT = pa.schema(
        [
            ("o_orderpriority", pa.string()),
            ("skew", pa.float64()),
            ("kurt", pa.float64()),
            ("n", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "d2" not in t.column_names:
            return OUT.empty_table()
        ps = t.column("p").to_pylist()
        n = np.array([counts[p] for p in ps], dtype=np.float64)
        d2 = t.column("d2").to_numpy(zero_copy_only=False)
        d3 = t.column("d3").to_numpy(zero_copy_only=False)
        d4 = t.column("d4").to_numpy(zero_copy_only=False)
        m2, m3, m4 = d2 / n, d3 / n, d4 / n
        g1 = m3 / m2**1.5
        G1 = g1 * np.sqrt(n * (n - 1)) / (n - 2)
        g2 = m4 / m2**2 - 3.0
        G2 = ((n + 1) * g2 + 6.0) * (n - 1) / ((n - 2) * (n - 3))
        return pa.table(
            {
                "o_orderpriority": pa.array(ps, pa.string()),
                "skew": pa.array(np.round(G1, 6), pa.float64()),
                "kurt": pa.array(np.round(G2, 6), pa.float64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow", batch_size=None)


ORDERS_PRICE_MOMENTS_SQL = """
SELECT o_orderpriority,
       ROUND(skewness(o_totalprice), 6) AS skew,
       ROUND(kurtosis(o_totalprice), 6) AS kurt,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


def orders_fd_check(sf_dir: str) -> "pd.DataFrame":
    """Functional-dependency profiling: does X determine Y? For each
    candidate FD, count determinant groups with >1 distinct dependent
    value (violations). Checked FDs over orders: o_custkey ->
    o_orderpriority (expected to fail — customers change priority) and
    o_orderkey -> o_orderstatus (expected to hold — key determines all).
    Per-batch (X, Y) distinct partials, one group shuffle bounded by
    |distinct (X, Y)|, driver-bounded per-FD summary."""
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderpriority",
                           "o_orderstatus"]
    )
    fds = [
        ("o_custkey", "o_orderpriority"),
        ("o_orderkey", "o_orderstatus"),
    ]

    from ray.data.aggregate import Sum

    rows = []
    for det, dep in fds:
        def partial(t: pa.Table, det=det, dep=dep) -> pa.Table:
            g = pa.TableGroupBy(
                pa.table(
                    {
                        "x": pc.cast(t.column(det), pa.string()),
                        "y": pc.cast(t.column(dep), pa.string()),
                    }
                ),
                ["x", "y"],
            ).aggregate([([], "count_all")])
            return g.rename_columns(["x", "y", "cnt"])

        pairs = (
            orders.map_batches(partial, batch_format="pyarrow")
            .groupby(["x", "y"])
            .aggregate(Sum(on="cnt", alias_name="cnt"))
        )

        def count_viol(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "x" not in t.column_names:
                return pa.table(
                    {
                        "n_groups": pa.array([], pa.int64()),
                        "n_violating": pa.array([], pa.int64()),
                    }
                )
            xs = np.asarray(t.column("x").to_pylist(), dtype=object)
            ux, counts = np.unique(xs, return_counts=True)
            return pa.table(
                {
                    "n_groups": pa.array([len(ux)], pa.int64()),
                    "n_violating": pa.array([int((counts > 1).sum())], pa.int64()),
                }
            )

        # distinct (x, y) relation is group-bounded: one block, one pass
        agg = (
            pairs.repartition(1)
            .map_batches(count_viol, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        rows.append(
            {
                "determinant": det,
                "dependent": dep,
                "n_groups": int(agg["n_groups"][0]),
                "n_violating": int(agg["n_violating"][0]),
                "holds": bool(agg["n_violating"][0] == 0),
            }
        )
    import pandas as pd

    return pd.DataFrame(rows)


ORDERS_FD_SQL = """
WITH fd1 AS (
  SELECT COUNT(*) AS n_groups,
         CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS d
        FROM orders GROUP BY 1)
), fd2 AS (
  SELECT COUNT(*) AS n_groups,
         CAST(SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
  FROM (SELECT o_orderkey, COUNT(DISTINCT o_orderstatus) AS d
        FROM orders GROUP BY 1)
)
SELECT 'o_custkey' AS determinant, 'o_orderpriority' AS dependent,
       n_groups, n_violating, n_violating = 0 AS holds FROM fd1
UNION ALL
SELECT 'o_orderkey', 'o_orderstatus', n_groups, n_violating,
       n_violating = 0 FROM fd2
"""


def lineitem_fk_check(sf_dir: str) -> "pd.DataFrame":
    """Inclusion-dependency (foreign-key) audit: every
    lineitem.l_orderkey must exist in orders.o_orderkey. Fully
    distributed — no driver key set: per-batch distinct (key, f, d)
    tag partials from both sides, ONE hash shuffle on key, then a
    3-counter reduction (a key is an orphan iff it has fact tags and no
    dim tag). No join operator, no empty-partition hazard. Output: one
    summary row (n_fact_keys, n_dim_keys, n_orphan_keys)."""
    from ray.data.aggregate import Sum

    def tag(col: str, f: int, d: int):
        def fn(t: pa.Table) -> pa.Table:
            keys = np.unique(t.column(col).to_numpy(zero_copy_only=False))
            n = len(keys)
            return pa.table(
                {
                    "k": pa.array(keys, pa.int64()),
                    "f": pa.array(np.full(n, f, np.int64), pa.int64()),
                    "d": pa.array(np.full(n, d, np.int64), pa.int64()),
                }
            )

        return fn

    fact = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        tag("l_orderkey", 1, 0), batch_format="pyarrow"
    )
    dim = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        tag("o_orderkey", 0, 1), batch_format="pyarrow"
    )
    per_key = (
        fact.union(dim)
        .groupby("k")
        .aggregate(Sum(on="f", alias_name="f"), Sum(on="d", alias_name="d"))
    )

    def partial_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "f" not in t.column_names:
            return pa.table(
                {
                    "n_fact_keys": pa.array([0], pa.int64()),
                    "n_dim_keys": pa.array([0], pa.int64()),
                    "n_orphan_keys": pa.array([0], pa.int64()),
                }
            )
        f = t.column("f").to_numpy(zero_copy_only=False) > 0
        d = t.column("d").to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "n_fact_keys": pa.array([int(f.sum())], pa.int64()),
                "n_dim_keys": pa.array([int(d.sum())], pa.int64()),
                "n_orphan_keys": pa.array([int((f & ~d).sum())], pa.int64()),
            }
        )

    agg = per_key.map_batches(
        partial_counts, batch_format="pyarrow"
    ).aggregate(
        Sum(on="n_fact_keys", alias_name="n_fact_keys"),
        Sum(on="n_dim_keys", alias_name="n_dim_keys"),
        Sum(on="n_orphan_keys", alias_name="n_orphan_keys"),
    )
    import pandas as pd

    return pd.DataFrame(
        {
            "n_fact_keys": [int(agg["n_fact_keys"])],
            "n_dim_keys": [int(agg["n_dim_keys"])],
            "n_orphan_keys": [int(agg["n_orphan_keys"])],
        }
    )


LINEITEM_FK_SQL = """
SELECT (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_fact_keys,
       (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS n_dim_keys,
       (SELECT COUNT(*) FROM
          (SELECT DISTINCT l_orderkey FROM lineitem) f
          LEFT JOIN orders o ON f.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL) AS n_orphan_keys
"""


def orders_kanonymity(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """k-anonymity audit over a quasi-identifier tuple (priority, order
    month): how identifiable is a row from its quasi-identifiers alone?
    Output: one summary row (n_groups, n_violating groups with < k
    members, n_rows_at_risk, min_group_size) — the data-governance gate
    a release pipeline runs before publishing. Partial per-batch counts,
    one |groups|-row shuffle, driver-bounded summary."""
    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        months = pc.strftime(
            pc.cast(t.column("o_orderdate"), pa.timestamp("us")), format="%Y-%m"
        )
        g = pa.TableGroupBy(
            pa.table({"qp": t.column("o_orderpriority"), "qm": months}),
            ["qp", "qm"],
        ).aggregate([([], "count_all")])
        return g.rename_columns(["qp", "qm", "cnt"])

    from ray.data.aggregate import Sum

    groups = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby(["qp", "qm"])
        .aggregate(Sum(on="cnt", alias_name="cnt"))
    )

    OUT = pa.schema(
        [
            ("n_groups", pa.int64()),
            ("n_violating", pa.int64()),
            ("n_rows_at_risk", pa.int64()),
            ("min_group_size", pa.int64()),
        ]
    )

    def summarize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cnt" not in t.column_names:
            return OUT.empty_table()
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        viol = c < k
        return pa.table(
            {
                "n_groups": pa.array([len(c)], pa.int64()),
                "n_violating": pa.array([int(viol.sum())], pa.int64()),
                "n_rows_at_risk": pa.array([int(c[viol].sum())], pa.int64()),
                "min_group_size": pa.array([int(c.min())], pa.int64()),
            }
        )

    # group-bounded relation (|priorities| x |months|) — one block
    return groups.repartition(1).map_batches(
        summarize, batch_format="pyarrow", batch_size=None
    )


ORDERS_KANON_SQL = """
WITH g AS (
  SELECT o_orderpriority, strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS m,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
)
SELECT COUNT(*) AS n_groups,
       CAST(SUM(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
       CAST(COALESCE(SUM(CASE WHEN cnt < 5 THEN cnt END), 0) AS BIGINT)
         AS n_rows_at_risk,
       MIN(cnt) AS min_group_size
FROM g
"""


def lineitem_price_regression(sf_dir: str) -> ray.data.Dataset:
    """Per-group ordinary least squares: slope/intercept/R² of extended
    price regressed on quantity, per l_linestatus — the REGR_* aggregate
    family next to lineitem_price_qty_corr's Pearson r. Same two-pass
    centered-sums scheme as orders_price_moments (raw power sums of
    1e5-magnitude prices lose ~all significant digits in the n*sxx -
    sx^2 subtraction; centered sums against broadcast means are exact to
    the last few ulps, matching DuckDB's streaming covariance to
    round-6)."""
    items = _read(sf_dir, "lineitem", ["l_linestatus", "l_quantity",
                                       "l_extendedprice"])

    def count_sum(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {
                    "g": t.column("l_linestatus"),
                    "x": pc.cast(t.column("l_quantity"), pa.float64()),
                    "y": pc.cast(t.column("l_extendedprice"), pa.float64()),
                }
            ),
            "g",
        ).aggregate([("x", "count"), ("x", "sum"), ("y", "sum")])
        return g.rename_columns(["g", "cnt", "sx", "sy"])

    from ray.data.aggregate import Sum

    base = (
        items.map_batches(count_sum, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum(on="cnt", alias_name="cnt"),
            Sum(on="sx", alias_name="sx"),
            Sum(on="sy", alias_name="sy"),
        )
        .to_pandas()  # driver-bounded: one row per status
    )
    stats = {
        r["g"]: (int(r["cnt"]), r["sx"] / r["cnt"], r["sy"] / r["cnt"])
        for _, r in base.iterrows()
    }
    import ray as _ray

    ref = _ray.put(stats)

    def centered(t: pa.Table) -> pa.Table:
        m = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
        gs = t.column("l_linestatus").to_pylist()
        x = pc.cast(t.column("l_quantity"), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        y = pc.cast(t.column("l_extendedprice"), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        mx = np.array([m[g][1] for g in gs])
        my = np.array([m[g][2] for g in gs])
        dx, dy = x - mx, y - my
        g = pa.TableGroupBy(
            pa.table(
                {
                    "g": pa.array(gs, pa.string()),
                    "sxx": pa.array(dx * dx, pa.float64()),
                    "syy": pa.array(dy * dy, pa.float64()),
                    "sxy": pa.array(dx * dy, pa.float64()),
                }
            ),
            "g",
        ).aggregate([("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return g.rename_columns(["g", "sxx", "syy", "sxy"])

    sums = (
        items.map_batches(centered, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum(on="sxx", alias_name="sxx"),
            Sum(on="syy", alias_name="syy"),
            Sum(on="sxy", alias_name="sxy"),
        )
    )

    OUT = pa.schema(
        [
            ("l_linestatus", pa.string()),
            ("slope", pa.float64()),
            ("intercept", pa.float64()),
            ("r2", pa.float64()),
            ("n", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sxx" not in t.column_names:
            return OUT.empty_table()
        gs = t.column("g").to_pylist()
        sxx = t.column("sxx").to_numpy(zero_copy_only=False)
        syy = t.column("syy").to_numpy(zero_copy_only=False)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False)
        mx = np.array([stats[g][1] for g in gs])
        my = np.array([stats[g][2] for g in gs])
        n = np.array([stats[g][0] for g in gs], dtype=np.int64)
        slope = sxy / sxx
        intercept = my - slope * mx
        r2 = (sxy * sxy) / (sxx * syy)
        return pa.table(
            {
                "l_linestatus": pa.array(gs, pa.string()),
                "slope": pa.array(np.round(slope, 6), pa.float64()),
                "intercept": pa.array(np.round(intercept, 6), pa.float64()),
                "r2": pa.array(np.round(r2, 6), pa.float64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow", batch_size=None)


LINEITEM_REGRESSION_SQL = """
SELECT l_linestatus,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_linestatus
"""


def events_decayed_counts(sf_dir: str, tau_hours: float = 72.0) -> ray.data.Dataset:
    """Exponentially time-decayed event counts per type: each event
    contributes exp(-(t_max - ts) / tau) — the standard recency-weighted
    activity score (a half-life of tau*ln2). Two passes: a tiny global
    max(ts) aggregate, then stateless per-batch partial sums (decayed
    weight is a pure function of ts once t_max is known) and one
    |types|-row shuffle. Round-6 output (sum reduction order)."""
    events = _read(sf_dir, "events", ["event_type", "ts"])
    t_max = events.max("ts")  # driver scalar (datetime)
    t_max_us = np.datetime64(t_max, "us").astype(np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        age_h = (t_max_us - ts) / 3.6e9
        w = np.exp(-age_h / tau_hours)
        g = pa.TableGroupBy(
            pa.table(
                {
                    "event_type": t.column("event_type"),
                    "w": pa.array(w, pa.float64()),
                    "one": pa.array(np.ones(len(w), np.int64), pa.int64()),
                }
            ),
            "event_type",
        ).aggregate([("w", "sum"), ("one", "sum")])
        return g.rename_columns(["event_type", "w", "n"])

    from ray.data.aggregate import Sum

    out = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum(on="w", alias_name="w"), Sum(on="n", alias_name="n"))
    )

    OUT = pa.schema(
        [
            ("event_type", pa.string()),
            ("decayed_count", pa.float64()),
            ("n", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "w" not in t.column_names:
            return OUT.empty_table()
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "decayed_count": pa.array(
                    np.round(t.column("w").to_numpy(zero_copy_only=False), 6),
                    pa.float64(),
                ),
                "n": pc.cast(t.column("n"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


EVENTS_DECAYED_SQL = """
SELECT event_type,
       ROUND(SUM(EXP(-(EXTRACT(EPOCH FROM (SELECT MAX(ts) FROM events) - ts))
                     / 3600.0 / 72.0)), 6) AS decayed_count,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


def orders_checksum(sf_dir: str) -> "pd.DataFrame":
    """Order-independent table checksum: wrap-around uint64 sum of
    md5-lower64 over a canonical per-row string — the anti-entropy
    primitive for comparing two 100 TB replicas/snapshots WITHOUT moving
    rows (equal checksum + equal count => equal content, modulo md5
    collisions). Associative and commutative, so per-batch partials sum
    in any order; the uint64 sum is carried as split hi/lo 32-bit int64
    sums (Ray's Sum would overflow int64 on raw uint64 values) and
    recombined mod 2^64 on the driver-bounded 1-row aggregate.

    Output: one row (n_rows, checksum VARCHAR-decimal) — matches DuckDB's
    HUGEINT SUM of md5_number_lower mod 2^64."""
    from record_matching_ray.functions.hashing import hash_strings, md5_lower64

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column("o_orderkey").to_pylist()
        sts = t.column("o_orderstatus").to_pylist()
        h = hash_strings(
            [f"{k}|{s}" for k, s in zip(keys, sts)], hash_fn=md5_lower64
        )
        return pa.table(
            {
                "hi": pa.array([int((h >> np.uint64(32)).sum(dtype=np.uint64))],
                               pa.int64()),
                "lo": pa.array(
                    [int((h & np.uint64(0xFFFFFFFF)).sum(dtype=np.uint64))],
                    pa.int64(),
                ),
                "n": pa.array([len(h)], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = orders.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum(on="hi", alias_name="hi"),
        Sum(on="lo", alias_name="lo"),
        Sum(on="n", alias_name="n"),
    )
    total = (int(agg["hi"]) * (1 << 32) + int(agg["lo"])) % (1 << 64)
    import pandas as pd

    return pd.DataFrame({"n_rows": [int(agg["n"])], "checksum": [str(total)]})


ORDERS_CHECKSUM_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(md5_number_lower(
                CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus)
            AS HUGEINT)) % 18446744073709551616 AS VARCHAR) AS checksum
FROM orders
"""


def source_mixture_weights(sf_dir: str, alpha: float = 0.7) -> ray.data.Dataset:
    """Training-mixture weights per (lang, source): temperature-scaled
    sampling shares w_g = n_g^alpha / sum(n^alpha) (the multilingual
    mixing rule of Conneau & Lample 2019 / mT5), plus the implied
    duplication factor w_g * N / n_g ("epochs" each group would see at
    one pass of the mixed stream). One partial-count pass; the power
    normalization runs on the group-bounded aggregate only."""
    docs = _read(sf_dir, "documents", ["lang", "source"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            t.select(["lang", "source"]), ["lang", "source"]
        ).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "cnt"])

    from ray.data.aggregate import Sum

    counts = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum(on="cnt", alias_name="cnt"))
    )

    def weigh(t: pa.Table) -> pa.Table:
        # group-bounded relation: one row per (lang, source)
        if "cnt" not in t.column_names:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                    "epochs": pa.array([], pa.float64()),
                }
            )
        n = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        p = np.power(n, alpha)
        w = p / p.sum()
        total = n.sum()
        return pa.table(
            {
                "lang": t.column("lang"),
                "source": t.column("source"),
                "cnt": pc.cast(t.column("cnt"), pa.int64()),
                # round-6 output convention: the pow/sum reduction order
                # differs from the SQL window expression in the last ulp
                "weight": pa.array(np.round(w, 6), pa.float64()),
                "epochs": pa.array(np.round(w * total / n, 6), pa.float64()),
            }
        )

    # repartition(1): the normalization needs ALL group rows in one block
    # (the aggregate is <= |langs|x|sources| rows — driver-trivial)
    return counts.repartition(1).map_batches(
        weigh, batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# FULL OUTER join via tagged union (keeps unmatched rows from BOTH sides)


def daily_activity_full_outer(sf_dir: str) -> ray.data.Dataset:
    """Per-day order count vs event count, keeping every day that appears
    on EITHER side — the FULL OUTER JOIN shape. Extends order_fulfillment's
    tagged union from left-outer to full-outer: each side pre-aggregates
    (day, n, is_side) per batch, one groupby(day) sums the tags, and a
    side's count is NULL exactly when its presence tag summed to zero
    (SQL's unmatched-side NULL). No join operator, no empty-partition
    hazard, one hash shuffle over <= |days| x batches rows.

    Output: (day timestamp[us], n_orders nullable, n_events nullable)."""
    ACC = pa.schema(
        [
            ("day", pa.date32()),
            ("n_orders", pa.int64()),
            ("is_o", pa.int64()),
            ("n_events", pa.int64()),
            ("is_e", pa.int64()),
        ]
    )

    def _day_counts(col: pa.ChunkedArray) -> pa.Table:
        days = pa.compute.cast(col, pa.date32())
        g = pa.TableGroupBy(pa.table({"day": days}), "day").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["day", "n"])

    def order_rows(t: pa.Table) -> pa.Table:
        g = _day_counts(t.column("o_orderdate"))
        n = g.num_rows
        one = pa.array(np.ones(n, np.int64), pa.int64())
        zero = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {
                "day": g.column("day"),
                "n_orders": g.column("n"),
                "is_o": one,
                "n_events": zero,
                "is_e": zero,
            }
        )

    def event_rows(t: pa.Table) -> pa.Table:
        g = _day_counts(t.column("ts"))
        n = g.num_rows
        one = pa.array(np.ones(n, np.int64), pa.int64())
        zero = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {
                "day": g.column("day"),
                "n_orders": zero,
                "is_o": zero,
                "n_events": g.column("n"),
                "is_e": one,
            }
        )

    orders = conformed(
        _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
            order_rows, batch_format="pyarrow"
        ),
        ACC,
    )
    events = conformed(
        _read(sf_dir, "events", ["ts"]).map_batches(
            event_rows, batch_format="pyarrow"
        ),
        ACC,
    )
    acc = (
        orders.union(events)
        .groupby("day")
        .aggregate(
            ray.data.aggregate.Sum("n_orders"),
            ray.data.aggregate.Sum("is_o"),
            ray.data.aggregate.Sum("n_events"),
            ray.data.aggregate.Sum("is_e"),
        )
    )

    # day goes out as timestamp[us] (midnight), the repo's window-column
    # convention (stages/temporal.py) — date32 reaches pandas as python
    # `datetime.date` objects while the DuckDB oracle's DATE arrives as
    # datetime64[us], and the value-hash compares them as unequal strings.
    OUT = pa.schema(
        [
            ("day", pa.timestamp("us")),
            ("n_orders", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(is_o)" not in t.column_names:
            return OUT.empty_table()
        no = t.column("sum(n_orders)").to_numpy(zero_copy_only=False)
        ne = t.column("sum(n_events)").to_numpy(zero_copy_only=False)
        miss_o = t.column("sum(is_o)").to_numpy(zero_copy_only=False) == 0
        miss_e = t.column("sum(is_e)").to_numpy(zero_copy_only=False) == 0
        return pa.table(
            {
                "day": pc.cast(t.column("day"), pa.timestamp("us")),
                "n_orders": pa.array(no, pa.int64(), mask=miss_o),
                "n_events": pa.array(ne, pa.int64(), mask=miss_e),
            }
        )

    return conformed(acc.map_batches(finish, batch_format="pyarrow"), OUT)


DAILY_ACTIVITY_FULL_OUTER_SQL = """
SELECT CAST(COALESCE(o.day, e.day) AS TIMESTAMP) AS day,
       o.n_orders, e.n_events
FROM (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1) o
FULL OUTER JOIN
     (SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1) e
  ON o.day = e.day
"""


# ---------------------------------------------------------------------------
# Shannon entropy of each user's event-type distribution


def user_type_entropy(sf_dir: str) -> ray.data.Dataset:
    """Per-user event count + Shannon entropy (nats) of its event-type
    distribution — the classic behavioral-diversity profile. Two-level
    partial aggregation: (user, type) counts combine per batch, one
    shuffle on the pair, then a per-user vectorized entropy fold (the
    per-user relation is type-vocabulary-bounded)."""
    events = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["user_id", "event_type"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["user_id", "event_type", "c"])

    counts = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"])
        .sum("c")
        .rename_columns({"sum(c)": "c"})
    )
    counts = conformed(
        counts,
        pa.schema(
            [("user_id", pa.int64()), ("event_type", pa.string()), ("c", pa.int64())]
        ),
    )

    def fold(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(u, kind="stable")
        u, c = u[order], c[order]
        new = np.concatenate(([True], u[1:] != u[:-1]))
        seg = np.cumsum(new) - 1
        tot = np.bincount(seg, weights=c)
        p = c / tot[seg]
        from record_matching_ray.stages.util import round6_sql
        ent = round6_sql(np.bincount(seg, weights=-p * np.log(p)))
        return pa.table(
            {
                "user_id": pa.array(u[new], pa.int64()),
                "n_events": pa.array(tot.astype(np.int64), pa.int64()),
                "entropy": pa.array(ent, pa.float64()),
            }
        )

    # hash-partition by user (segment-aware vectorized fold per
    # partition — no per-user Python dispatch), same contract as
    # temporal.lag_delta
    from record_matching_ray.functions.hashing import _U64, mix64
    from record_matching_ray.stages.util import shuffle_partitions

    P = shuffle_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "pk",
            pa.array((mix64(u.astype(_U64)) % _U64(P)).astype(np.int64), pa.int64()),
        )

    out = (
        counts.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(lambda g: fold(g.drop_columns(["pk"])), batch_format="pyarrow")
    )
    return conformed(
        out,
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_events", pa.int64()),
                ("entropy", pa.float64()),
            ]
        ),
    )


USER_TYPE_ENTROPY_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS c FROM events GROUP BY 1, 2
),
t AS (SELECT user_id, sum(c) AS n FROM c GROUP BY 1)
SELECT c.user_id,
       CAST(t.n AS BIGINT) AS n_events,
       round(sum(-(c.c / CAST(t.n AS DOUBLE))
                 * ln(c.c / CAST(t.n AS DOUBLE))), 6) AS entropy
FROM c JOIN t USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt: lineitem measures to long layout


def lineitem_unpivot(sf_dir: str) -> ray.data.Dataset:
    """Melt the four lineitem measure columns into long
    (l_orderkey, l_linenumber, measure, value) rows — the UNPIVOT
    primitive (inverse of the category-pivot operator). Stateless and
    shuffle-free: each batch emits 4× its rows with a dictionary-cheap
    measure column; values are read straight from parquet (exact)."""
    MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", *MEASURES])

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for m in MEASURES:
            parts.append(
                pa.table(
                    {
                        "l_orderkey": t.column("l_orderkey"),
                        "l_linenumber": t.column("l_linenumber"),
                        "measure": pa.array([m] * n, pa.string()),
                        "value": t.column(m).cast(pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    out = li.map_batches(melt, batch_format="pyarrow")
    return conformed(
        out,
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("measure", pa.string()),
                ("value", pa.float64()),
            ]
        ),
    )


LINEITEM_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


# ---------------------------------------------------------------------------
# Benford first-digit audit


def orders_benford(sf_dir: str) -> ray.data.Dataset:
    """First-significant-digit distribution of order totals vs Benford's
    law (Newcomb 1881 / Benford 1938) — the classic fraud/synthetic-data
    audit over a money column.

    Ray shape: totals go to exact integer cents, the leading digit is
    peeled off with an exact integer divide-by-10 loop (max 12 vector
    passes — no float log10, which goes inexact at power-of-10
    boundaries), per-batch digit counts collapse each batch to <= 9 rows
    before the one tiny groupby. Expected mass is log10(1 + 1/d), the
    deviation column shares the expression tree with the SQL oracle.
    """
    from record_matching_ray.stages.util import round6_sql

    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.abs(_cents(t.column("o_totalprice")))
        v = v[v > 0]
        while (v >= 10).any():
            big = v >= 10
            v[big] //= 10
        d, n = np.unique(v, return_counts=True)
        return pa.table(
            {"digit": pa.array(d, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    from ray.data.aggregate import Sum

    counts = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum(on="n", alias_name="n"))
    )
    rows = sorted(counts.take_all(), key=lambda r: r["digit"])
    total = float(sum(r["sum(n)"] if "sum(n)" in r else r["n"] for r in rows))
    digit = np.array([r["digit"] for r in rows], dtype=np.int64)
    n = np.array([r.get("sum(n)", r.get("n")) for r in rows], dtype=np.int64)
    observed = round6_sql(n / total)
    benford = round6_sql(np.log10(1.0 + 1.0 / digit))
    dev = round6_sql(np.abs(n / total - np.log10(1.0 + 1.0 / digit)))
    return ray.data.from_arrow(
        pa.table(
            {
                "digit": pa.array(digit, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "observed_p": pa.array(observed, pa.float64()),
                "benford_p": pa.array(benford, pa.float64()),
                "abs_dev": pa.array(dev, pa.float64()),
            }
        )
    )


ORDERS_BENFORD_SQL = """
WITH c AS (
  SELECT CAST(left(CAST(CAST(abs(round(o_totalprice*100)) AS BIGINT) AS VARCHAR), 1)
              AS BIGINT) AS digit
  FROM orders WHERE round(o_totalprice*100) <> 0
),
g AS (SELECT digit, count(*) AS n FROM c GROUP BY 1),
t AS (SELECT SUM(n) AS total FROM g)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(n / CAST(total AS DOUBLE), 6) AS observed_p,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
       round(abs(n / CAST(total AS DOUBLE) - log10(1.0 + 1.0 / digit)), 6) AS abs_dev
FROM g, t
"""


# ---------------------------------------------------------------------------
# EWMA over the daily order-count series


def orders_daily_ewma(sf_dir: str, alpha: float = 0.3) -> ray.data.Dataset:
    """Exponentially-weighted moving average of daily order counts
    (recursive e_t = a*x_t + (1-a)*e_{t-1}, e_0 = x_0 — pandas
    ``ewm(adjust=False)`` semantics).

    Ray shape: the distributed part is the per-day count (per-batch
    partial -> one date-keyed groupby, rows = distinct days, bounded by
    the calendar, never by corpus size); the EWMA recursion runs over
    that tiny aggregated series on the driver. The SQL oracle evaluates
    the closed form sum a(1-a)^(t-i) x_i + (1-a)^t x_0 — an O(days^2)
    self-join that is only feasible BECAUSE the series is
    calendar-bounded; agreement is float-robust since (1-a)^k decays
    geometrically."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import round6_sql

    orders = _read(sf_dir, "orders", ["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["o_orderdate"], unit="day")
        g = pa.TableGroupBy(pa.table({"day": day}), "day").aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["day", "n"])

    counts = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum(on="n", alias_name="n"))
    )
    rows = sorted(counts.take_all(), key=lambda r: r["day"])
    days = [r["day"] for r in rows]
    x = np.array([r.get("sum(n)", r.get("n")) for r in rows], dtype=np.float64)
    e = np.empty_like(x)
    if len(x):
        e[0] = x[0]
        for i in range(1, len(x)):
            e[i] = alpha * x[i] + (1.0 - alpha) * e[i - 1]
    return ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array(days, pa.timestamp("us")),
                "n": pa.array(x.astype(np.int64), pa.int64()),
                "ewma": pa.array(round6_sql(e), pa.float64()),
            }
        )
    )


ORDERS_DAILY_EWMA_SQL = """
WITH d AS (
  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n
  FROM orders GROUP BY 1
),
r AS (SELECT day, n, row_number() OVER (ORDER BY day) AS t FROM d),
f AS (SELECT min(t) AS t0 FROM r)
SELECT a.day, CAST(a.n AS BIGINT) AS n,
       round(
         (SELECT SUM(CASE WHEN b.t = t0 THEN pow(0.7, a.t - b.t) * b.n
                          ELSE 0.3 * pow(0.7, a.t - b.t) * b.n END)
          FROM r b, f WHERE b.t <= a.t), 6) AS ewma
FROM r a
"""


# ---------------------------------------------------------------------------
# Relational division: suppliers covering EVERY part type


def supplier_full_coverage(
    sf_dir: str, broadcast_max_rows: int = 2_000_000
) -> ray.data.Dataset:
    """Suppliers that have shipped at least one part of EVERY part type
    — relational division (Codd's ÷), the one classic algebra operator
    the inventory lacked.

    Ray shape (VERDICT r3 item 1: the part dimension load is now
    count-gated, never an unconditional driver materialization): the
    type VOCABULARY (distinct p_type, <= 62 by contract) is always tiny
    and broadcast. The p_partkey -> type-bit map is

    - broadcast via ray.put as sorted arrays when part is counted small
      (searchsorted inside the lineitem partial, zero shuffle), or
    - a distributed hash join lineitem x (p_partkey, mask) beyond the
      gate — the 100-TB plan (part is ~20M rows/TB): the build side
      never materializes on one node.

    Either way lineitem streams once through a per-batch (suppkey, OR
    mask) partial bounded by |suppliers| x batches before the one
    groupby that ORs per-batch type bitmasks; a supplier passes when
    its mask has all type bits set.
    """
    from record_matching_ray.stages.util import shuffle_partitions

    part_ds = _read(sf_dir, "part", ["p_partkey", "p_type"])
    # distributed distinct of the type vocabulary: per-batch pc.unique
    # partials (<= vocab x blocks rows reach the driver, never the table)
    tvals = part_ds.select_columns(["p_type"]).map_batches(
        lambda t: pa.table({"p_type": pc.unique(t.column("p_type"))}),
        batch_format="pyarrow",
    )
    types = sorted({r["p_type"] for r in tvals.take_all()})
    tix = {t: i for i, t in enumerate(types)}
    if len(types) > 62:
        raise NotImplementedError(
            "bitmask division path covers <= 62 types; carry a binary "
            "bitmap column beyond that"
        )
    full_mask = (1 << len(types)) - 1
    tix_ref = ray.put(tix)
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def _or_fold(supp: np.ndarray, masks: np.ndarray) -> pa.Table:
        # per-batch OR-fold, vectorized: sort by supplier, OR-reduce runs
        order = np.argsort(supp, kind="stable")
        s, m2 = supp[order], masks[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        return pa.table(
            {"l_suppkey": pa.array(s[starts], pa.int64()),
             "mask": pa.array(np.bitwise_or.reduceat(m2, starts), pa.int64())}
        )

    n_part = part_ds.count()
    if n_part <= broadcast_max_rows:
        part = part_ds.to_pandas()
        pkeys = part["p_partkey"].to_numpy().astype(np.int64)
        pmasks = np.array(
            [1 << tix[t] for t in part["p_type"]], dtype=np.int64
        )
        order0 = np.argsort(pkeys)
        p2m_ref = ray.put((pkeys[order0], pmasks[order0]))

        def partial(t: pa.Table) -> pa.Table:
            keys, kmasks = (
                ray.get(p2m_ref) if isinstance(p2m_ref, ray.ObjectRef) else p2m_ref
            )
            supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
            pk = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pos = np.searchsorted(keys, pk)
            pos = np.clip(pos, 0, len(keys) - 1)
            masks = np.where(keys[pos] == pk, kmasks[pos], 0)
            return _or_fold(supp, masks)

        pre = li.map_batches(partial, batch_format="pyarrow")
    else:
        # distributed fallback: attach the type bit by hash join, then
        # the same per-batch OR partial (join output streams, the mask
        # column is 8B/row)
        def part_masks(t: pa.Table) -> pa.Table:
            m = ray.get(tix_ref) if isinstance(tix_ref, ray.ObjectRef) else tix_ref
            bits = np.array(
                [1 << m[x] for x in t.column("p_type").to_pylist()], np.int64
            )
            return pa.table(
                {"p_partkey": t.column("p_partkey").cast(pa.int64()),
                 "mask": pa.array(bits, pa.int64())}
            )

        side = part_ds.map_batches(part_masks, batch_format="pyarrow")
        joined = li.join(
            side, join_type="inner", num_partitions=shuffle_partitions(),
            on=("l_partkey",), right_on=("p_partkey",),
        )

        def partial_joined(t: pa.Table) -> pa.Table:
            supp = t.column("l_suppkey").to_numpy(zero_copy_only=False)
            masks = t.column("mask").to_numpy(zero_copy_only=False)
            return _or_fold(supp, masks)

        pre = joined.map_batches(partial_joined, batch_format="pyarrow")

    folded = pre.groupby("l_suppkey").map_groups(
        lambda g: pa.table(
            {
                "s_suppkey": pa.array(
                    [g.column("l_suppkey")[0].as_py()], pa.int64()
                ),
                "mask": pa.array(
                    [int(np.bitwise_or.reduce(
                        g.column("mask").to_numpy(zero_copy_only=False)))],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def keep_full(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("mask"), full_mask)).select(
            ["s_suppkey"]
        )

    out = folded.map_batches(keep_full, batch_format="pyarrow")
    return conformed(out, pa.schema([("s_suppkey", pa.int64())]))


SUPPLIER_FULL_COVERAGE_SQL = """
SELECT l_suppkey AS s_suppkey
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
HAVING COUNT(DISTINCT p_type) = (SELECT COUNT(DISTINCT p_type) FROM part)
"""


# ---------------------------------------------------------------------------
# Mode (most frequent value) per group


def nation_priority_mode(
    sf_dir: str, broadcast_max_rows: int = 2_000_000
) -> ray.data.Dataset:
    """Per customer nation: the modal order priority, with the SQL-exact
    deterministic tie-break (higher count first, then lexicographically
    smaller priority).

    Ray shape (VERDICT r3 item 2: the customer dimension is count-gated
    — at TPC-H-100TB customer is ~1.5B rows, never a driver pandas):

    - counted small: custkey -> nationkey broadcast once via ray.put as
      two sorted numpy arrays (searchsorted inside the orders partial,
      zero shuffle);
    - beyond the gate: distributed hash join orders x customer on
      custkey — the build side never materializes on one node.

    Either way per-batch (nation, priority) count partials collapse each
    batch to <= nations x priorities rows before the one tiny groupby;
    the argmax sweep runs per nation group over a handful of rows.
    nation itself (25 rows) is always broadcast.
    """
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import shuffle_partitions

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nname = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def _count_partial(nat: np.ndarray, pri: pa.Array) -> pa.Table:
        prep = pa.table(
            {"nationkey": pa.array(nat, pa.int64()), "priority": pri}
        )
        g = pa.TableGroupBy(prep, ["nationkey", "priority"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["nationkey", "priority", "cnt"])

    n_cust = cust_ds.count()
    if n_cust <= broadcast_max_rows:
        cust = cust_ds.to_pandas()
        ckeys = cust["c_custkey"].to_numpy().astype(np.int64)
        cnats = cust["c_nationkey"].to_numpy().astype(np.int64)
        order0 = np.argsort(ckeys)
        lookup_ref = ray.put((ckeys[order0], cnats[order0]))

        def partial(t: pa.Table) -> pa.Table:
            keys, nats = (
                ray.get(lookup_ref)
                if isinstance(lookup_ref, ray.ObjectRef)
                else lookup_ref
            )
            ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
            nat = np.where(keys[pos] == ck, nats[pos], -1)
            return _count_partial(nat, t.column("o_orderpriority"))

        pre = orders.map_batches(partial, batch_format="pyarrow")
    else:
        joined = orders.join(
            cust_ds, join_type="inner", num_partitions=shuffle_partitions(),
            on=("o_custkey",), right_on=("c_custkey",),
        )

        def partial_joined(t: pa.Table) -> pa.Table:
            nat = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            return _count_partial(nat, t.column("o_orderpriority"))

        pre = joined.map_batches(partial_joined, batch_format="pyarrow")

    # composite-key groupby is safe ONLY because the per-batch partial
    # bounds rows to nations x priorities x batches (tiny); the measured
    # ~100x composite-key slowness hits at millions of rows
    counts = pre.groupby(["nationkey", "priority"]).aggregate(
        Sum(on="cnt", alias_name="cnt")
    )

    OUT = pa.schema(
        [
            ("n_name", pa.string()),
            ("mode_priority", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def argmax(g: pa.Table) -> pa.Table:
        cnt = g.column("cnt" if "cnt" in g.column_names else "sum(cnt)").to_numpy(
            zero_copy_only=False
        )
        pri = np.asarray(g.column("priority").to_pylist(), dtype=object)
        # highest count; ties -> lexicographically smallest priority
        order = np.lexsort((pri, -cnt))
        best = order[0]
        nk = int(g.column("nationkey")[0].as_py())
        return pa.table(
            {
                "n_name": pa.array([nname.get(nk, "?")], pa.string()),
                "mode_priority": pa.array([str(pri[best])], pa.string()),
                "n": pa.array([int(cnt[best])], pa.int64()),
            }
        )

    out = counts.groupby("nationkey").map_groups(argmax, batch_format="pyarrow")
    return conformed(out, OUT)


NATION_PRIORITY_MODE_SQL = """
WITH c AS (
  SELECT n_name, o_orderpriority AS mode_priority, count(*) AS n,
         row_number() OVER (
           PARTITION BY n_name ORDER BY count(*) DESC, o_orderpriority
         ) AS rk
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT n_name, mode_priority, CAST(n AS BIGINT) AS n FROM c WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Sequential pattern mining: event-type trigrams


def event_trigram_counts(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """Top-k 3-step event-type sequences across users (order by ts, then
    event_id for SQL-identical tie placement) — the classic sequential
    pattern sweep behind "what do users do right before X".

    Ray shape: ONE user-keyed shuffle, then each partition lexsorts
    (user, ts, event_id) and reads trigrams off shifted arrays — no
    window join, no per-event rows leaving the partition (per-batch
    trigram counts collapse to distinct trigrams). Top-k with
    count-desc, trigram-asc tie-break on the driver over the tiny
    distinct-trigram table."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import coarse_groupby_partitions

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_parts = coarse_groupby_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "pk", pa.array((u % n_parts).astype(np.int64), pa.int64())
        )

    def trigrams(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = np.asarray(g.column("event_type").to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ty = u[order], ty[order]
        if len(u) < 3:
            return pa.table(
                {"trigram": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        a, b, c = ty[:-2][same], ty[1:-1][same], ty[2:][same]
        tri = np.array(
            [f"{x}>{y}>{z}" for x, y, z in zip(a, b, c)], dtype=object
        )
        uniq, cnt = np.unique(tri, return_counts=True)
        return pa.table(
            {"trigram": pa.array(uniq, pa.string()),
             "cnt": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    counts = (
        ev.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(trigrams, batch_format="pyarrow")
        .groupby("trigram")
        .aggregate(Sum(on="cnt", alias_name="cnt"))
    )
    rows = counts.take_all()
    tri = [r["trigram"] for r in rows]
    cnt = [int(r.get("sum(cnt)", r.get("cnt"))) for r in rows]
    order = sorted(range(len(tri)), key=lambda i: (-cnt[i], tri[i]))[:k]
    return ray.data.from_arrow(
        pa.table(
            {
                "trigram": pa.array([tri[i] for i in order], pa.string()),
                "cnt": pa.array([cnt[i] for i in order], pa.int64()),
            }
        )
    )


EVENT_TRIGRAM_SQL = """
WITH s AS (
  SELECT user_id, event_type AS a,
         lead(event_type, 1) OVER w AS b,
         lead(event_type, 2) OVER w AS c,
         lead(user_id, 2) OVER w AS u2
  FROM events
  WINDOW w AS (ORDER BY user_id, ts, event_id)
),
t AS (
  SELECT a || '>' || b || '>' || c AS trigram, count(*) AS cnt
  FROM s WHERE u2 = user_id
  GROUP BY 1
)
SELECT trigram, CAST(cnt AS BIGINT) AS cnt
FROM t ORDER BY cnt DESC, trigram LIMIT 20
"""


# ---------------------------------------------------------------------------
# Chi-square independence audit


def events_chi2(sf_dir: str, value_split: float = 50.0) -> ray.data.Dataset:
    """Pearson chi-square test of independence between event_type and a
    high/low value flag: one pass of per-batch contingency partials
    (types x 2 cells), one tiny groupby, closed-form statistic from
    exact integer cells with the oracle's expression tree.

    Output (one row): n, dof, chi2 (round-6)."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import round6_sql

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hi = (
            t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
            >= value_split
        ).astype(np.int64)
        key = np.array([f"{a}|{b}" for a, b in zip(ty, hi)], dtype=object)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq, pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()
    )
    ty = [r["cell"].rsplit("|", 1)[0] for r in cells]
    hi = [int(r["cell"].rsplit("|", 1)[1]) for r in cells]
    n = np.array([r.get("sum(n)", r.get("n")) for r in cells], dtype=np.float64)
    types = sorted(set(ty))
    obs = np.zeros((len(types), 2), np.float64)
    for t_, h_, c_ in zip(ty, hi, n):
        obs[types.index(t_), h_] = c_
    total = obs.sum()
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    exp = row * col / total
    chi2 = float(np.sum((obs - exp) ** 2 / exp))
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([int(total)], pa.int64()),
                "dof": pa.array([(len(types) - 1) * 1], pa.int64()),
                "chi2": pa.array([float(round6_sql(chi2))], pa.float64()),
            }
        )
    )


EVENTS_CHI2_SQL = """
WITH f AS (
  SELECT event_type AS ty,
         CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS hi
  FROM events
),
cells AS (SELECT ty, hi, count(*) AS o FROM f GROUP BY 1, 2),
rows_ AS (SELECT ty, sum(o) AS r FROM cells GROUP BY 1),
cols_ AS (SELECT hi, sum(o) AS c FROM cells GROUP BY 1),
tot AS (SELECT sum(o) AS t FROM cells),
x AS (
  SELECT o, rows_.r * cols_.c / CAST(t AS DOUBLE) AS e
  FROM cells JOIN rows_ USING (ty) JOIN cols_ USING (hi) CROSS JOIN tot
)
SELECT CAST((SELECT t FROM tot) AS BIGINT) AS n,
       CAST((SELECT count(*) - 1 FROM rows_) AS BIGINT) AS dof,
       round(sum((o - e) * (o - e) / e), 6) AS chi2
FROM x
"""


# ---------------------------------------------------------------------------
# Autocorrelation of the daily order-count series


def orders_acf(sf_dir: str, max_lag: int = 14) -> ray.data.Dataset:
    """Pearson autocorrelation of daily order counts at lags 1..max_lag
    (the series-health diagnostic behind seasonality checks).

    Ray shape: the distributed part is the per-day count (calendar-
    bounded histogram, one shuffle); each lag's correlation is computed
    on the driver over the aligned overlap windows with the exact
    moment formula the SQL oracle uses (corr over (x_t, x_{t+lag})
    pairs). Gaps: missing days are absent rows on BOTH sides (the
    lag-join in SQL pairs day d with day d+lag only when both exist —
    the engine aligns by calendar day the same way)."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import round6_sql

    orders = _read(sf_dir, "orders", ["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["o_orderdate"], unit="day")
        di = day.cast(pa.int64()).to_numpy(zero_copy_only=False) // 86_400_000_000
        uniq, cnt = np.unique(di, return_counts=True)
        return pa.table(
            {"d": pa.array(uniq, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    rows = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("d")
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()
    )
    d = np.array([r["d"] for r in rows], np.int64)
    n = np.array([r.get("sum(n)", r.get("n")) for r in rows], np.float64)
    order = np.argsort(d)
    d, n = d[order], n[order]
    pos = {int(x): i for i, x in enumerate(d)}
    lags, acfs, counts = [], [], []
    for lag in range(1, max_lag + 1):
        xi, yi = [], []
        for i, day in enumerate(d):
            j = pos.get(int(day) + lag)
            if j is not None:
                xi.append(n[i])
                yi.append(n[j])
        x = np.asarray(xi)
        y = np.asarray(yi)
        m = len(x)
        if m < 2:
            continue
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        cov = sxy / m - (sx / m) * (sy / m)
        vx = sxx / m - (sx / m) ** 2
        vy = syy / m - (sy / m) ** 2
        lags.append(lag)
        acfs.append(float(round6_sql(cov / np.sqrt(vx * vy))))
        counts.append(m)
    return ray.data.from_arrow(
        pa.table(
            {
                "lag": pa.array(lags, pa.int64()),
                "n_pairs": pa.array(counts, pa.int64()),
                "acf": pa.array(acfs, pa.float64()),
            }
        )
    )


ORDERS_ACF_SQL = """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', o_orderdate)) // 86400 AS BIGINT) AS d,
         count(*) AS n
  FROM orders GROUP BY 1
),
lags AS (SELECT CAST(l AS BIGINT) AS lag FROM range(1, 15) t(l)),
pairs AS (
  SELECT lag, a.n AS x, b.n AS y
  FROM lags JOIN daily a ON TRUE JOIN daily b ON b.d = a.d + lag
)
SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       round(
         (SUM(x*y)*1.0/count(*) - (SUM(x)*1.0/count(*)) * (SUM(y)*1.0/count(*)))
         / sqrt(
             (SUM(x*x)*1.0/count(*) - pow(SUM(x)*1.0/count(*), 2))
             * (SUM(y*y)*1.0/count(*) - pow(SUM(y)*1.0/count(*), 2))
           ), 6) AS acf
FROM pairs GROUP BY 1 HAVING count(*) >= 2
"""


# ---------------------------------------------------------------------------
# Higher-moment group stats: skewness / excess kurtosis from raw moments


def part_price_moments(sf_dir: str) -> ray.data.Dataset:
    """Population skewness and excess kurtosis of retail price (cents)
    per part type, via raw power sums — folded in EXACT INTEGER
    arithmetic. Float power sums of cents (c^4 ~ 1e20) sit far beyond
    float64's 2^53 spacing, so partition-order drift can flip the 6th
    decimal after the central-moment cancellations (observed: kurt
    -0.930431 vs -0.930432 across partitionings). Instead the stream is
    folded to its (type, cents, count) VALUE HISTOGRAM (catalog-bounded,
    the group_quantiles contract); the driver computes s1..s4 as Python
    bigints and converts once to double — bit-identical operands to the
    SQL oracle's HUGEINT sums whatever the partitioning."""
    part = _read(sf_dir, "part", ["p_type", "p_retailprice"])

    def hist_partial(t: pa.Table) -> pa.Table:
        v = _cents(t.column("p_retailprice"))
        ty = np.asarray(t.column("p_type").to_pylist(), dtype=object)
        key = np.array([f"{a}|{b}" for a, b in zip(ty, v)], dtype=object)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"k": pa.array(uniq, pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    from ray.data.aggregate import Sum

    rows = (
        part.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()
    )
    from record_matching_ray.stages.util import round6_sql

    sums: dict[str, list[int]] = {}
    for r in rows:
        ty, c_s = r["k"].rsplit("|", 1)
        c = int(c_s)
        n = int(r.get("sum(n)", r.get("n")))
        acc = sums.setdefault(ty, [0, 0, 0, 0, 0])
        acc[0] += n
        acc[1] += n * c
        acc[2] += n * c * c
        acc[3] += n * c * c * c
        acc[4] += n * c * c * c * c
    types = sorted(sums)
    out_n, out_skew, out_kurt = [], [], []
    for ty in types:
        n, s1, s2, s3, s4 = sums[ty]
        fn, f1, f2, f3, f4 = float(n), float(s1), float(s2), float(s3), float(s4)
        m1 = f1 / fn
        m2 = f2 / fn - m1**2
        m3 = f3 / fn - 3 * m1 * (f2 / fn) + 2 * m1**3
        m4 = (
            f4 / fn - 4 * m1 * (f3 / fn) + 6 * m1**2 * (f2 / fn) - 3 * m1**4
        )
        out_n.append(n)
        out_skew.append(float(round6_sql(m3 / m2**1.5)))
        out_kurt.append(float(round6_sql(m4 / m2**2 - 3.0)))
    return ray.data.from_arrow(
        pa.table(
            {
                "p_type": pa.array(types, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "skew": pa.array(out_skew, pa.float64()),
                "kurt": pa.array(out_kurt, pa.float64()),
            }
        )
    )


PART_PRICE_MOMENTS_SQL = """
WITH m AS (
  -- exact HUGEINT power sums of integer cents (float sums of c^4 ~ 1e20
  -- are partition-order-unstable past 2^53; the engine folds bigints too)
  SELECT p_type, count(*) AS n,
         CAST(SUM(c) AS DOUBLE) AS s1,
         CAST(SUM(c*c) AS DOUBLE) AS s2,
         CAST(SUM(c*c*c) AS DOUBLE) AS s3,
         CAST(SUM(c*c*c*c) AS DOUBLE) AS s4
  FROM (SELECT p_type,
               CAST(CAST(round(p_retailprice*100) AS BIGINT) AS HUGEINT) AS c
        FROM part)
  GROUP BY 1
),
c AS (
  SELECT p_type, n,
         s1/n AS m1, s2/n - pow(s1/n, 2) AS m2,
         s3/n - 3*(s1/n)*(s2/n) + 2*pow(s1/n, 3) AS m3,
         s4/n - 4*(s1/n)*(s3/n) + 6*pow(s1/n, 2)*(s2/n) - 3*pow(s1/n, 4) AS m4
  FROM m
)
SELECT p_type, CAST(n AS BIGINT) AS n,
       round(m3 / pow(m2, 1.5), 6) AS skew,
       round(m4 / pow(m2, 2) - 3.0, 6) AS kurt
FROM c
"""


# ---------------------------------------------------------------------------
# Mutual information between event type and a value bucket


def events_mutual_info(sf_dir: str, value_split: float = 50.0) -> ray.data.Dataset:
    """Mutual information I(event_type; value>=split) in nats from the
    exact contingency table — the info-theoretic sibling of events_chi2,
    same one-pass cell-partial shape. Output: (n, mi round-6)."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import round6_sql

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        hi = (
            t.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
            >= value_split
        ).astype(np.int64)
        key = np.array([f"{a}|{b}" for a, b in zip(ty, hi)], dtype=object)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq, pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    cells = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()
    )
    ty = [r["cell"].rsplit("|", 1)[0] for r in cells]
    hi = [int(r["cell"].rsplit("|", 1)[1]) for r in cells]
    n = np.array([r.get("sum(n)", r.get("n")) for r in cells], np.float64)
    total = n.sum()
    row_tot: dict[str, float] = {}
    col_tot: dict[int, float] = {}
    for a, b, c in zip(ty, hi, n):
        row_tot[a] = row_tot.get(a, 0.0) + c
        col_tot[b] = col_tot.get(b, 0.0) + c
    mi = 0.0
    for a, b, c in zip(ty, hi, n):
        p = c / total
        mi += p * float(np.log(p / ((row_tot[a] / total) * (col_tot[b] / total))))
    return ray.data.from_arrow(
        pa.table(
            {
                "n": pa.array([int(total)], pa.int64()),
                "mi": pa.array([float(round6_sql(mi))], pa.float64()),
            }
        )
    )


EVENTS_MI_SQL = """
WITH f AS (
  SELECT event_type AS ty,
         CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS hi
  FROM events
),
cells AS (SELECT ty, hi, count(*) AS o FROM f GROUP BY 1, 2),
rt AS (SELECT ty, sum(o) AS r FROM cells GROUP BY 1),
ct AS (SELECT hi, sum(o) AS c FROM cells GROUP BY 1),
tot AS (SELECT sum(o) AS t FROM cells)
SELECT CAST((SELECT t FROM tot) AS BIGINT) AS n,
       round(SUM((o * 1.0 / t) * ln((o * 1.0 / t) / ((r * 1.0 / t) * (c * 1.0 / t)))), 6) AS mi
FROM cells JOIN rt USING (ty) JOIN ct USING (hi) CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Gini coefficient of per-user activity


def user_activity_gini(sf_dir: str) -> ray.data.Dataset:
    """Gini inequality coefficient of events-per-user:
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)), x ascending, i=1..n.
    Ties share a value, so rank order inside a tie block cannot change
    sum(i*x_i) — the whole statistic folds from the per-user-count
    HISTOGRAM with exact integer arithmetic (one user shuffle + one
    count-histogram shuffle; the driver sees distinct activity levels).

    Output (one row): n_users, total_events, gini (round-6)."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import round6_sql

    ev = _read(sf_dir, "events", ["user_id"])

    def per_user(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {"u": pa.array(uniq, pa.int64()),
             "c": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    counts = (
        ev.map_batches(per_user, batch_format="pyarrow")
        .groupby("u")
        .aggregate(Sum(on="c", alias_name="c"))
    )

    def hist(t: pa.Table) -> pa.Table:
        name = "c" if "c" in t.column_names else "sum(c)"
        if t.num_rows == 0 or name not in t.column_names:
            return pa.table(
                {"x": pa.array([], pa.int64()), "k": pa.array([], pa.int64())}
            )
        c = t.column(name).to_numpy(zero_copy_only=False)
        vals, k = np.unique(c, return_counts=True)
        return pa.table(
            {"x": pa.array(vals.astype(np.int64), pa.int64()),
             "k": pa.array(k.astype(np.int64), pa.int64())}
        )

    rows = (
        counts.map_batches(hist, batch_format="pyarrow")
        .groupby("x")
        .aggregate(Sum(on="k", alias_name="k"))
        .take_all()
    )
    x = np.array([r["x"] for r in rows], np.int64)
    k = np.array([r.get("sum(k)", r.get("k")) for r in rows], np.int64)
    order = np.argsort(x)
    x, k = x[order], k[order]
    # exact integer rank sums: a block of k equal values occupying ranks
    # (c+1 .. c+k) contributes x * (k*c + k*(k+1)/2) to sum(i * x_i)
    n = int(k.sum())
    total = 0
    six = 0
    c = 0
    for xv, kv in zip(x.tolist(), k.tolist()):
        total += xv * kv
        six += xv * (kv * c + kv * (kv + 1) // 2)
        c += kv
    gini = (2.0 * float(six) - float((n + 1) * total)) / float(n * total)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_users": pa.array([n], pa.int64()),
                "total_events": pa.array([total], pa.int64()),
                "gini": pa.array([float(round6_sql(gini))], pa.float64()),
            }
        )
    )


USER_ACTIVITY_GINI_SQL = """
WITH pu AS (SELECT user_id, count(*) AS x FROM events GROUP BY 1),
r AS (SELECT x, row_number() OVER (ORDER BY x) AS i FROM pu)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(SUM(x) AS BIGINT) AS total_events,
       round((2.0 * SUM(i * x) - (count(*) + 1) * SUM(x))
             / (count(*) * SUM(x)), 6) AS gini
FROM r
"""


# ---------------------------------------------------------------------------
# Winsorized mean per group (lower-method quantile clamps)


def lineitem_winsorized_mean(
    sf_dir: str, q_lo: float = 0.1, q_hi: float = 0.9
) -> ray.data.Dataset:
    """Winsorized mean of l_quantity per return flag: values clamped at
    the per-group lower-method quantiles (value at index floor((n-1)*q)
    of the sorted multiset — the same deterministic rule as
    stages/quantiles.group_quantiles, chosen because SQL row_number
    replicates it exactly), then averaged with exact integer sums.

    One (flag, quantity) histogram shuffle; the clamp bounds and the
    clamped sum both come off the histogram on the driver."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import round6_sql

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        f = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        q = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.array([f"{a}|{b}" for a, b in zip(f, q)], dtype=object)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"k": pa.array(uniq, pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    rows = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()
    )
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        flag, v = r["k"].rsplit("|", 1)
        groups.setdefault(flag, []).append(
            (int(v), int(r.get("sum(n)", r.get("n"))))
        )
    flags, out_n, out_mean = [], [], []
    for flag in sorted(groups):
        hist = sorted(groups[flag])
        vals = np.array([h[0] for h in hist], np.int64)
        cnts = np.array([h[1] for h in hist], np.int64)
        n = int(cnts.sum())
        cum = np.cumsum(cnts)
        lo = int(vals[np.searchsorted(cum, int(np.floor((n - 1) * q_lo)) + 1)])
        hi = int(vals[np.searchsorted(cum, int(np.floor((n - 1) * q_hi)) + 1)])
        clamped = np.clip(vals, lo, hi)
        total = int(np.sum(clamped * cnts))
        flags.append(flag)
        out_n.append(n)
        out_mean.append(float(round6_sql(float(total) / n)))
    return ray.data.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "wmean": pa.array(out_mean, pa.float64()),
            }
        )
    )


LINEITEM_WINSORIZED_SQL = """
WITH v AS (
  SELECT l_returnflag AS f, CAST(l_quantity AS BIGINT) AS q,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS i,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
b AS (
  SELECT f,
         MAX(CASE WHEN i = CAST(floor((n - 1) * 0.1) AS BIGINT) + 1 THEN q END) AS lo,
         MAX(CASE WHEN i = CAST(floor((n - 1) * 0.9) AS BIGINT) + 1 THEN q END) AS hi
  FROM v GROUP BY 1
)
SELECT v.f AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(CAST(SUM(least(greatest(q, lo), hi)) AS DOUBLE) / count(*), 6) AS wmean
FROM v JOIN b USING (f)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Item-item cosine between event types over per-user activity vectors


def event_type_cosine(sf_dir: str) -> ray.data.Dataset:
    """Cosine similarity between event types, each represented by its
    per-user count vector — the item-item collaborative-filtering
    kernel, type-pair bounded: one user-keyed shuffle, then each user's
    tiny type-count vector contributes an outer product accumulated
    into the (types x types) Gram matrix; dot products stay exact
    integers until the final normalization.

    Output: (a, b, cos round-6), a < b lexicographically."""
    from ray.data.aggregate import Sum

    from record_matching_ray.stages.util import round6_sql

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def per_user(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ty = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        key = np.array([f"{a}|{b}" for a, b in zip(u, ty)], dtype=object)
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"k": pa.array(uniq, pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    rows = (
        ev.map_batches(per_user, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()
    )
    # user -> {type: count}; Gram fold in exact ints
    by_user: dict[str, dict[str, int]] = {}
    for r in rows:
        u, ty = r["k"].split("|", 1)
        by_user.setdefault(u, {})[ty] = int(r.get("sum(n)", r.get("n")))
    types = sorted({ty for d in by_user.values() for ty in d})
    tix = {t_: i for i, t_ in enumerate(types)}
    m = len(types)
    gram = [[0] * m for _ in range(m)]
    for d in by_user.values():
        items = sorted(d.items())
        for i, (ta, ca) in enumerate(items):
            for tb, cb in items[i:]:
                gram[tix[ta]][tix[tb]] += ca * cb
    out_a, out_b, out_c = [], [], []
    for i in range(m):
        for j in range(i + 1, m):
            cos = float(gram[i][j]) / (
                np.sqrt(float(gram[i][i])) * np.sqrt(float(gram[j][j]))
            )
            out_a.append(types[i])
            out_b.append(types[j])
            out_c.append(float(round6_sql(cos)))
    return ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(out_a, pa.string()),
                "b": pa.array(out_b, pa.string()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )
    )


EVENT_TYPE_COSINE_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
),
dots AS (
  SELECT x.event_type AS a, y.event_type AS b, SUM(x.n * y.n) AS d
  FROM c x JOIN c y ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY 1, 2
),
norms AS (
  SELECT event_type, SUM(n * n) AS s FROM c GROUP BY 1
)
SELECT a, b,
       round(CAST(d AS DOUBLE) / (sqrt(CAST(na.s AS DOUBLE)) * sqrt(CAST(nb.s AS DOUBLE))), 6) AS cos
FROM dots
JOIN norms na ON na.event_type = a
JOIN norms nb ON nb.event_type = b
"""


# ---------------------------------------------------------------------------
# Initials blocking key (classic ER blocking variant)


def part_initials_block(sf_dir: str) -> ray.data.Dataset:
    """Colliding initials blocking keys over part names: key = the
    concatenated first character of each whitespace token ("goldenrod
    lavender spring" -> "gls"). The classic cheap ER blocking key; this
    audit reports every key binding >= 2 parts with its collision count
    — the block-size distribution a blocking-scheme designer reads
    before committing to the key.

    One vocabulary-bounded shuffle: per-batch (key, count) partials."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "part", ["p_name"])

    def partial(t: pa.Table) -> pa.Table:
        names = t.column("p_name").to_pylist()
        keys = np.array(
            ["".join(tok[0] for tok in n.split() if tok) for n in names],
            dtype=object,
        )
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {"ikey": pa.array(uniq, pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    agg = (
        cust.map_batches(partial, batch_format="pyarrow")
        .groupby("ikey")
        .aggregate(Sum(on="n", alias_name="n"))
    )

    OUT = pa.schema([("ikey", pa.string()), ("n", pa.int64())])

    def finalize(t: pa.Table) -> pa.Table:
        name = "n" if "n" in t.column_names else "sum(n)"
        if t.num_rows == 0 or name not in t.column_names:
            return OUT.empty_table()
        n = t.column(name).to_numpy(zero_copy_only=False)
        keep = n >= 2
        return pa.table(
            {
                "ikey": t.column("ikey").filter(pa.array(keep)),
                "n": pa.array(n[keep].astype(np.int64), pa.int64()),
            }
        )

    return conformed(agg.map_batches(finalize, batch_format="pyarrow"), OUT)


PART_INITIALS_SQL = r"""
WITH k AS (
  SELECT list_aggregate(
           list_transform(
             list_filter(string_split_regex(p_name, '\s+'), x -> x <> ''),
             x -> substr(x, 1, 1)),
           'string_agg', '') AS ikey
  FROM part
)
SELECT ikey, CAST(count(*) AS BIGINT) AS n
FROM k GROUP BY 1 HAVING count(*) >= 2
"""


# ---------------------------------------------------------------------------
# TPC-H classic suite (adapted to the testdata's column set): Q4 / Q6 /
# Q7 / Q12 / Q14 / Q19 analogs. All money math is exact integer cents
# (or cents^2) with the identical expression tree in the SQL oracle; all
# plans are hash-join facts + partial_agg combiners + broadcast dims.


def _one_row(ds: ray.data.Dataset, fields: list) -> ray.data.Dataset:
    """Global-scalar finalizer: the aggregate upstream yields <= 1 row
    (it grouped on a literal key); emit EXACTLY one row — NULLs when no
    input rows matched, mirroring SQL's SUM-over-empty = one NULL row.
    Driver materialization is bounded at one row by construction."""
    rows = ds.take_all()
    vals = rows[0] if rows else {}
    return ray.data.from_arrow(
        pa.table(
            {
                name: pa.array([vals.get(name)], tp)
                for name, tp in fields
            }
        )
    )


def q6_forecast_revenue(sf_dir: str, year: int = 1996) -> ray.data.Dataset:
    """TPC-H Q6: predicate-filtered revenue scan — no join, one exact
    integer sum (price_c * disc_c, cents^2). The pure-scan leg: reader
    column pruning + per-batch partial is the whole plan."""
    li = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(pc.year(t["l_shipdate"]), year),
            pc.less(t["l_quantity"], 24.0),
        )
        t = t.filter(keep)
        disc_c = _cents(t.column("l_discount"))
        price_c = _cents(t.column("l_extendedprice"))
        m = (disc_c >= 5) & (disc_c <= 7)
        return pa.table(
            {
                "k": pa.array(np.ones(int(m.sum()), np.int64), pa.int64()),
                "rev_c2": pa.array(price_c[m] * disc_c[m], pa.int64()),
            }
        )

    out = partial_agg(
        li,
        keys=[("k", pa.int64())],
        values=[("revenue_c2", "rev_c2", "sum", pa.int64())],
        prep=prep,
    )
    return _one_row(out, [("revenue_c2", pa.int64())])


Q6_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT)
         AS revenue_c2
FROM lineitem
WHERE year(l_shipdate) = 1996 AND l_quantity < 24
  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
"""


def q4_order_priority(sf_dir: str, lag_days: int = 30) -> ray.data.Dataset:
    """TPC-H Q4 analog (no commit/receipt dates in this schema): orders
    counted per priority when ANY lineitem shipped more than lag_days
    after the order date. EXISTS(shipdate > X) == max(shipdate) > X, so
    the semi-join is a partial_agg MAX per orderkey + one hash join —
    never a per-order subquery."""
    from record_matching_ray.stages.util import shuffle_partitions

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    max_ship = partial_agg(
        li,
        keys=[("l_orderkey", pa.int64())],
        values=[("max_ship", "l_shipdate", "max", pa.timestamp("us"))],
    )
    joined = orders.join(
        max_ship, join_type="inner", num_partitions=shuffle_partitions(),
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        ms = t.column("max_ship").to_numpy(zero_copy_only=False)
        keep = ms > od + np.timedelta64(lag_days, "D")
        return pa.table(
            {"o_orderpriority": t.column("o_orderpriority").filter(pa.array(keep))}
        )

    return partial_agg(
        joined,
        keys=[("o_orderpriority", pa.string())],
        values=[],
        prep=prep,
        count_as="order_count",
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY 1
"""


def q12_returnflag_priority(sf_dir: str, year: int = 1997) -> ray.data.Dataset:
    """TPC-H Q12 analog (returnflag stands in for shipmode, which this
    schema lacks): per returnflag, counts of high- vs low-priority
    orders among lineitems shipped in `year`. One hash join lineitem x
    orders, then conditional partial counts."""
    from record_matching_ray.stages.util import shuffle_partitions

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders, join_type="inner", num_partitions=shuffle_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.year(t["l_shipdate"]), year))
        hi = pc.is_in(
            t["o_orderpriority"],
            value_set=pa.array(["1-URGENT", "2-HIGH"], pa.string()),
        )
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "high_cnt": pc.cast(hi, pa.int64()),
                "low_cnt": pc.cast(pc.invert(hi), pa.int64()),
            }
        )

    return partial_agg(
        joined,
        keys=[("l_returnflag", pa.string())],
        values=[
            ("high_line_count", "high_cnt", "sum", pa.int64()),
            ("low_line_count", "low_cnt", "sum", pa.int64()),
        ],
        prep=prep,
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE year(l_shipdate) = 1997
GROUP BY 1
"""


def q14_promo_revenue(sf_dir: str, year: int = 1997) -> ray.data.Dataset:
    """TPC-H Q14: promo revenue share. One hash join lineitem x part,
    two exact integer sums (revenue = price_c * (100 - disc_c), scale
    10^4), ratio derived once from the exact totals with the oracle's
    own expression (round(100 * promo / total, 6))."""
    from record_matching_ray.stages.util import shuffle_partitions

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    joined = li.join(
        part, join_type="inner", num_partitions=shuffle_partitions(),
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.year(t["l_shipdate"]), year))
        price_c = _cents(t.column("l_extendedprice"))
        disc_c = _cents(t.column("l_discount"))
        rev = price_c * (100 - disc_c)
        promo = (
            pc.equal(t["p_type"], "PROMO").to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "k": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "promo_c2": pa.array(np.where(promo, rev, 0), pa.int64()),
                "total_c2": pa.array(rev, pa.int64()),
            }
        )

    out = partial_agg(
        joined,
        keys=[("k", pa.int64())],
        values=[
            ("promo_revenue_c2", "promo_c2", "sum", pa.int64()),
            ("total_revenue_c2", "total_c2", "sum", pa.int64()),
        ],
        prep=prep,
    )

    one = _one_row(
        out,
        [("promo_revenue_c2", pa.int64()), ("total_revenue_c2", pa.int64())],
    )

    def derive(t: pa.Table) -> pa.Table:
        p = t.column("promo_revenue_c2").to_numpy(zero_copy_only=False)
        tot = t.column("total_revenue_c2").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = np.round(100.0 * p.astype(np.float64) / tot, 6)
        return pa.table(
            {
                "promo_revenue_c2": t.column("promo_revenue_c2"),
                "total_revenue_c2": t.column("total_revenue_c2"),
                "promo_pct": pa.array(pct, pa.float64()),
            }
        )

    return one.map_batches(derive, batch_format="pyarrow")


Q14_SQL = """
WITH s AS (
  SELECT
    SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
             ELSE 0 END) AS promo_revenue_c2,
    SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS total_revenue_c2
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1997
)
SELECT CAST(promo_revenue_c2 AS BIGINT) AS promo_revenue_c2,
       CAST(total_revenue_c2 AS BIGINT) AS total_revenue_c2,
       round(100.0 * promo_revenue_c2 / total_revenue_c2, 6) AS promo_pct
FROM s
"""


def q19_discounted_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q19: disjunctive brand/size/quantity predicates over the
    lineitem x part join, one exact integer revenue sum. The OR-of-ANDs
    evaluates vectorized per batch after the join."""
    from record_matching_ray.stages.util import shuffle_partitions

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    joined = li.join(
        part, join_type="inner", num_partitions=shuffle_partitions(),
        on=("l_partkey",), right_on=("p_partkey",),
    )

    def prep(t: pa.Table) -> pa.Table:
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        size = t.column("p_size").to_numpy(zero_copy_only=False).astype(np.int64)
        brand = np.asarray(t.column("p_brand").to_pylist(), dtype=object)
        keep = (
            ((brand == "Brand#12") & (size <= 5) & (qty >= 1) & (qty <= 11))
            | ((brand == "Brand#23") & (size <= 10) & (qty >= 10) & (qty <= 20))
            | ((brand == "Brand#34") & (size <= 15) & (qty >= 20) & (qty <= 30))
        )
        t = t.filter(pa.array(keep))
        price_c = _cents(t.column("l_extendedprice"))
        disc_c = _cents(t.column("l_discount"))
        return pa.table(
            {
                "k": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                "rev_c2": pa.array(price_c * (100 - disc_c), pa.int64()),
            }
        )

    out = partial_agg(
        joined,
        keys=[("k", pa.int64())],
        values=[("revenue_c2", "rev_c2", "sum", pa.int64())],
        prep=prep,
    )
    return _one_row(out, [("revenue_c2", pa.int64())])


Q19_SQL = """
SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_c2
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size <= 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size <= 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size <= 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q7_nation_volume(
    sf_dir: str, broadcast_max_rows: int = 2_000_000
) -> ray.data.Dataset:
    """TPC-H Q7: shipping volume between nations by year. Plan: the two
    FACT tables (lineitem, orders) meet in ONE hash join on orderkey;
    the supplier and customer DIMENSIONS attach via count-gated sorted-
    array broadcasts, with a distributed hash-join fallback past the
    gate (the nation_priority_mode dual plan — at true TPC-H-100TB
    scale customer is ~15B rows and takes the join path); nation
    (25 rows) is always broadcast. Unmatched fact rows DROP, matching
    the SQL oracle's inner-join semantics on inputs without referential
    integrity. Revenue exact: price_c * (100 - disc_c)."""
    from record_matching_ray.stages.util import shuffle_partitions

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nname = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    joined = li.join(
        orders, join_type="inner", num_partitions=shuffle_partitions(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    n_supp = supp.count()
    n_cust = cust_ds.count()
    if max(n_supp, n_cust) <= broadcast_max_rows:
        sp = supp.to_pandas()
        cp = cust_ds.to_pandas()
        sk = sp["s_suppkey"].to_numpy().astype(np.int64)
        sn = sp["s_nationkey"].to_numpy().astype(np.int64)
        so = np.argsort(sk)
        ck = cp["c_custkey"].to_numpy().astype(np.int64)
        cn = cp["c_nationkey"].to_numpy().astype(np.int64)
        co = np.argsort(ck)
        ref = ray.put((sk[so], sn[so], ck[co], cn[co]))

        def attach(t: pa.Table) -> pa.Table:
            skk, snn, ckk, cnn = (
                ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            )
            s = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            c = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            ps = np.clip(np.searchsorted(skk, s), 0, len(skk) - 1)
            pc_i = np.clip(np.searchsorted(ckk, c), 0, len(ckk) - 1)
            # inner-join semantics: rows referencing a missing dimension
            # key DROP (matching the SQL oracle) rather than raise
            keep = (skk[ps] == s) & (ckk[pc_i] == c)
            t2 = t.filter(pa.array(keep))
            return pa.table(
                {
                    "s_nationkey": pa.array(snn[ps[keep]], pa.int64()),
                    "c_nationkey": pa.array(cnn[pc_i[keep]], pa.int64()),
                    "l_shipdate": t2.column("l_shipdate"),
                    "l_extendedprice": t2.column("l_extendedprice"),
                    "l_discount": t2.column("l_discount"),
                }
            )

        enriched = joined.map_batches(attach, batch_format="pyarrow")
    else:
        # 100-TB path: attach each nationkey by distributed hash join —
        # neither dimension ever materializes on one node
        enriched = joined.join(
            supp, join_type="inner", num_partitions=shuffle_partitions(),
            on=("l_suppkey",), right_on=("s_suppkey",),
        ).join(
            cust_ds, join_type="inner", num_partitions=shuffle_partitions(),
            on=("o_custkey",), right_on=("c_custkey",),
        )

    def prep(t: pa.Table) -> pa.Table:
        s_nat = t.column("s_nationkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        c_nat = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        keep = s_nat != c_nat
        price_c = _cents(t.column("l_extendedprice"))
        disc_c = _cents(t.column("l_discount"))
        yr = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "supp_nation": pa.array(
                    [nname[int(x)] for x in s_nat[keep]], pa.string()
                ),
                "cust_nation": pa.array(
                    [nname[int(x)] for x in c_nat[keep]], pa.string()
                ),
                "l_year": pa.array(yr[keep].astype(np.int64), pa.int64()),
                "rev_c2": pa.array(
                    (price_c * (100 - disc_c))[keep], pa.int64()
                ),
            }
        )

    return partial_agg(
        enriched,
        keys=[
            ("supp_nation", pa.string()),
            ("cust_nation", pa.string()),
            ("l_year", pa.int64()),
        ],
        values=[("revenue_c2", "rev_c2", "sum", pa.int64())],
        prep=prep,
    )


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_c2
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_nationkey <> cn.n_nationkey
GROUP BY 1, 2, 3
"""


def nation_price_slope(
    sf_dir: str, broadcast_max_rows: int = 2_000_000
) -> ray.data.Dataset:
    """Per customer nation: OLS slope of order price (cents) over order
    date (days since epoch) — grouped linear regression, the classic
    "trend per segment" sweep.

    Exactness: the five sufficient statistics (n, sum_x, sum_y, sum_xy,
    sum_x2) are EXACT int64 sums (x <= ~12k days, y <= ~10^9 cents;
    xy per row < 2^54, partial sums < 2^63 up to ~10^9 rows/group);
    slope = (n*sxy - sx*sy) / (n*sx2 - sx^2) is derived ONCE from the
    exact sums with the identical float64 expression in the SQL oracle
    (numerator/denominator cast to DOUBLE first — n*sxy overflows int64
    at TPC-H row counts, so both sides promote the same way). The
    customer dimension attaches via the count-gated broadcast (the
    nation_priority_mode pattern)."""
    from record_matching_ray.stages.util import shuffle_partitions

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nname = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    n_cust = cust_ds.count()
    if n_cust <= broadcast_max_rows:
        cust = cust_ds.to_pandas()
        ckeys = cust["c_custkey"].to_numpy().astype(np.int64)
        cnats = cust["c_nationkey"].to_numpy().astype(np.int64)
        o0 = np.argsort(ckeys)
        ref = ray.put((ckeys[o0], cnats[o0]))

        def attach(t: pa.Table) -> pa.Table:
            keys, nats = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
            # inner-join semantics: orders referencing a missing customer
            # DROP, matching the SQL oracle
            keep = keys[pos] == ck
            t2 = t.filter(pa.array(keep))
            return pa.table(
                {
                    "c_nationkey": pa.array(nats[pos[keep]], pa.int64()),
                    "o_orderdate": t2.column("o_orderdate"),
                    "o_totalprice": t2.column("o_totalprice"),
                }
            )

        enriched = orders.map_batches(attach, batch_format="pyarrow")
    else:
        # 100-TB path: distributed hash join — customer (~1.5B rows at
        # TPC-H 100TB) never materializes on one node
        enriched = orders.join(
            cust_ds, join_type="inner", num_partitions=shuffle_partitions(),
            on=("o_custkey",), right_on=("c_custkey",),
        )

    def prep(t: pa.Table) -> pa.Table:
        nat = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        x = (
            t.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        y = _cents(t.column("o_totalprice"))
        return pa.table(
            {
                "n_name": pa.array([nname[int(v)] for v in nat], pa.string()),
                "sx": pa.array(x, pa.int64()),
                "sy": pa.array(y, pa.int64()),
                "sxy": pa.array(x * y, pa.int64()),
                "sx2": pa.array(x * x, pa.int64()),
            }
        )

    sums = partial_agg(
        enriched,
        keys=[("n_name", pa.string())],
        values=[
            ("sx", "sx", "sum", pa.int64()),
            ("sy", "sy", "sum", pa.int64()),
            ("sxy", "sxy", "sum", pa.int64()),
            ("sx2", "sx2", "sum", pa.int64()),
        ],
        prep=prep,
        count_as="n",
    )

    def derive(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t.column("sx").to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t.column("sy").to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t.column("sxy").to_numpy(zero_copy_only=False).astype(np.float64)
        sx2 = t.column("sx2").to_numpy(zero_copy_only=False).astype(np.float64)
        slope = np.round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6)
        return pa.table(
            {
                "n_name": t.column("n_name"),
                "n": t.column("n"),
                "slope_c_per_day": pa.array(slope, pa.float64()),
            }
        )

    return sums.map_batches(derive, batch_format="pyarrow")


NATION_PRICE_SLOPE_SQL = """
WITH s AS (
  SELECT n_name,
         count(*) AS n,
         SUM(datediff('day', DATE '1970-01-01', o_orderdate)) AS sx,
         SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS sy,
         SUM(datediff('day', DATE '1970-01-01', o_orderdate)
             * CAST(ROUND(o_totalprice*100) AS BIGINT)) AS sxy,
         SUM(CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
             * datediff('day', DATE '1970-01-01', o_orderdate)) AS sx2
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1
)
SELECT n_name, CAST(n AS BIGINT) AS n,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         AS slope_c_per_day
FROM s
"""


def user_interarrival_cv(sf_dir: str) -> ray.data.Dataset:
    """Per-user burstiness: coefficient of variation of inter-event gaps
    (seconds) — cv >> 1 marks bursty bot-like accounts, cv ~ 0 marks
    metronomic ones. Users with >= 2 gaps and positive total gap.

    Ray shape: ONE user-pk shuffle; each partition lexsorts (user, ts,
    event_id) and reads gaps off shifted epoch-second arrays; per-user
    exact int64 sums (n, sum g, sum g^2 — gaps are epoch-second diffs,
    g^2 sums stay < 2^63 at any realistic horizon) fold per partition,
    and cv derives ONCE from the exact sums with the oracle's float64
    expression."""
    from record_matching_ray.stages.util import coarse_groupby_partitions

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    P = coarse_groupby_partitions()

    def add_pk(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        from record_matching_ray.functions.hashing import mix64

        return t.append_column(
            "pk", pa.array((mix64(u) % np.uint64(P)).astype(np.int64), pa.int64())
        )

    AGG = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_gaps", pa.int64()),
            ("s1", pa.int64()),
            ("s2", pa.int64()),
        ]
    )

    def sweep(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        us = ts.astype(np.int64)
        order = np.lexsort((eid, us, u))
        u, us = u[order], us[order]
        sec = us // 1_000_000  # exact epoch seconds (same floor as oracle)
        same_user = np.r_[False, u[1:] == u[:-1]]
        gaps = np.where(same_user, sec - np.r_[np.int64(0), sec[:-1]], 0)
        # per-user segment sums over gap rows (same_user positions)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        seg = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        gm = gaps[same_user]
        sm = seg[same_user]
        n = np.bincount(sm, minlength=len(starts))
        # exact int64 accumulation (float-weighted bincount would round
        # g^2 terms past 2^53)
        s1 = np.zeros(len(starts), np.int64)
        s2 = np.zeros(len(starts), np.int64)
        np.add.at(s1, sm, gm)
        np.add.at(s2, sm, gm * gm)
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n_gaps": pa.array(n.astype(np.int64), pa.int64()),
                "s1": pa.array(s1, pa.int64()),
                "s2": pa.array(s2, pa.int64()),
            }
        )

    folded = conformed(
        ev.map_batches(add_pk, batch_format="pyarrow")
        .groupby("pk")
        .map_groups(
            lambda g: sweep(g.drop_columns(["pk"])), batch_format="pyarrow"
        ),
        AGG,
    )

    OUT = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_gaps", pa.int64()),
            ("mean_gap_s", pa.float64()),
            ("cv", pa.float64()),
        ]
    )

    def derive(t: pa.Table) -> pa.Table:
        n = t.column("n_gaps").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = t.column("s1").to_numpy(zero_copy_only=False).astype(np.float64)
        s2 = t.column("s2").to_numpy(zero_copy_only=False).astype(np.float64)
        keep = (n >= 2) & (s1 > 0)
        n, s1, s2 = n[keep], s1[keep], s2[keep]
        uid = t.column("user_id").to_numpy(zero_copy_only=False)[keep]
        mean = s1 / n
        var = np.maximum(s2 / n - mean * mean, 0.0)
        cv = np.sqrt(var) / mean
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "n_gaps": pa.array(n.astype(np.int64), pa.int64()),
                "mean_gap_s": pa.array(np.round(mean, 6), pa.float64()),
                "cv": pa.array(np.round(cv, 6), pa.float64()),
            }
        )

    return conformed(folded.map_batches(derive, batch_format="pyarrow"), OUT)


USER_INTERARRIVAL_CV_SQL = """
WITH o AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS s, ts, event_id FROM events
),
g AS (
  SELECT user_id,
         s - lag(s) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS gap
  FROM o
),
a AS (
  SELECT user_id, count(gap) AS n, SUM(gap) AS s1, SUM(gap * gap) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY 1
)
SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
       round(CAST(s1 AS DOUBLE) / n, 6) AS mean_gap_s,
       round(sqrt(greatest(CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                             * (CAST(s1 AS DOUBLE) / n), 0))
             / (CAST(s1 AS DOUBLE) / n), 6) AS cv
FROM a WHERE n >= 2 AND s1 > 0
"""
