"""Relational/warehouse operators (pipelines/relational.py): integer
arithmetic invariants; the sf0.01 oracle-identity checks run in
test_driver_contract."""

import numpy as np

from candidategeneration_ray.pipelines import relational as rl

SF_DIR = "/root/testdata/sf0.001"


def test_cents_matches_duckdb_round():
    import duckdb

    v = np.array([0.005, -0.005, 1.005, 2.675, -2.675, 0.125, 3.335])
    con = duckdb.connect()
    want = [con.execute(
        "SELECT CAST(round(? * 100) AS BIGINT)", [float(x)]).fetchone()[0]
        for x in v]
    assert rl._cents(v).tolist() == want


def test_pricing_summary_bounds(ray_session):
    df = rl.q_pricing_summary(SF_DIR).to_pandas()
    assert len(df) > 0
    # discount is 0-10%, tax 0-8%: the derived sums bracket the base
    assert (df["sum_disc_milli"] <= 100 * df["sum_base_cents"]).all()
    assert (df["sum_disc_milli"] >= 90 * df["sum_base_cents"]).all()
    assert (df["sum_charge_micro"] >= 100 * df["sum_disc_milli"]).all()
    assert (df["sum_charge_micro"] <= 108 * df["sum_disc_milli"]).all()


def test_join_aggregates_consistent(ray_session):
    """The bucketed hash join must conserve the order count and total
    cents of the orders whose custkey exists in customer."""
    import os

    import pyarrow.parquet as pq

    agg = rl.q_nation_order_stats(SF_DIR).to_pandas()
    orders = pq.read_table(os.path.join(SF_DIR, "orders.parquet"),
                           columns=["o_custkey", "o_totalprice"]).to_pandas()
    cust = set(pq.read_table(os.path.join(SF_DIR, "customer.parquet"),
                             columns=["c_custkey"])
               .column("c_custkey").to_pylist())
    matched = orders[orders["o_custkey"].isin(cust)]
    assert agg["n_orders"].sum() == len(matched)
    assert agg["total_cents"].sum() == \
        rl._cents(matched["o_totalprice"].to_numpy()).sum()


def test_top_customers_ordering(ray_session):
    t = rl.q_top_customers(SF_DIR).to_pandas()
    assert 0 < len(t) <= rl.TOP_CUSTOMERS
    rows = list(zip(-t["total_cents"].to_numpy(), t["o_custkey"].to_numpy()))
    assert rows == sorted(rows)
