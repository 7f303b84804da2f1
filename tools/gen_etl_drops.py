#!/usr/bin/env python3
"""Derive reference-shaped ETL drop files from a TPC-H-ish fixture dir.

The EtlMain scale rehearsal (round-10 verdict ask #6) needs
products.csv / orders / order_items drops at sf0.1 and sf1 scale; the
reference's own data/ is fixed at 1000/7500/40803 rows. This maps the
fixture tables onto the reference's bronze schemas deterministically:

  part     -> products.csv   (product_id, department_id, department, product_name)
  orders   -> orders/o.csv   (order_num, order_id, user_id, order_timestamp,
                              total_amount, date)
  lineitem -> order_items/i.csv (id, order_id, user_id, days_since_prior_order,
                              product_id, add_to_cart_order, reordered,
                              order_timestamp, date)

RI is preserved (l_partkey < part count, l_orderkey joins orders), and a
deterministic slice of order_items (order_id % 9973 == 0) gets
product_id = -9999 — guaranteed RI violations whose COUNT the rehearsal
asserts against the pipeline's quarantine numbers (the
"quarantine counts oracle-spot-checked" part of the ask). The expected
counts are printed and written to <outdir>/expected.json.

Usage: python3 tools/gen_etl_drops.py <fixtureDir> <outDir>
"""
import json
import os
import sys

import duckdb


def main(fixture_dir: str, out_dir: str) -> None:
    os.makedirs(f"{out_dir}/orders", exist_ok=True)
    os.makedirs(f"{out_dir}/order_items", exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{fixture_dir}/part.parquet'")
    con.execute(f"CREATE VIEW ord AS SELECT * FROM '{fixture_dir}/orders.parquet'")
    con.execute(f"CREATE VIEW li AS SELECT * FROM '{fixture_dir}/lineitem.parquet'")

    con.execute(f"""
      COPY (
        SELECT CAST(p_partkey AS INT) AS product_id,
               CAST(dense_rank() OVER (ORDER BY p_brand) AS INT) AS department_id,
               p_brand AS department,
               p_name AS product_name
        FROM part ORDER BY product_id
      ) TO '{out_dir}/products.csv' (HEADER, DELIMITER ',')""")

    con.execute(f"""
      COPY (
        SELECT CAST(o_orderkey % 100000 AS INT) AS order_num,
               CAST(o_orderkey AS INT) AS order_id,
               CAST(o_custkey AS INT) AS user_id,
               strftime(o_orderdate + INTERVAL (o_orderkey % 86400) SECOND,
                        '%Y-%m-%dT%H:%M:%S') AS order_timestamp,
               round(o_totalprice, 2) AS total_amount,
               strftime(o_orderdate, '%Y-%m-%d') AS date
        FROM ord ORDER BY order_id
      ) TO '{out_dir}/orders/o.csv' (HEADER, DELIMITER ',')""")

    con.execute(f"""
      COPY (
        -- row_number, not orderkey*8+linenumber: fixture linenumbers
        -- repeat within an order, and a colliding id is silently
        -- PK-deduped by silver (143k rows vanished in the first run)
        SELECT CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                 l_partkey, l_suppkey, l_extendedprice, l_quantity) AS INT) AS id,
               CAST(l_orderkey AS INT) AS order_id,
               CAST(o.o_custkey AS INT) AS user_id,
               CAST(l_orderkey % 31 AS INT) AS days_since_prior_order,
               CASE WHEN l_orderkey % 9973 = 0 THEN -9999
                    ELSE CAST(l_partkey AS INT) END AS product_id,
               l_linenumber AS add_to_cart_order,
               CAST(l_linenumber % 2 AS INT) AS reordered,
               strftime(o.o_orderdate + INTERVAL (l_orderkey % 86400) SECOND,
                        '%Y-%m-%dT%H:%M:%S') AS order_timestamp,
               strftime(o.o_orderdate, '%Y-%m-%d') AS date
        FROM li JOIN ord o ON o.o_orderkey = l_orderkey
        ORDER BY id
      ) TO '{out_dir}/order_items/i.csv' (HEADER, DELIMITER ',')""")

    expected = {
        "products": con.execute("SELECT count(*) FROM part").fetchone()[0],
        "orders": con.execute("SELECT count(*) FROM ord").fetchone()[0],
        "order_items_ok": con.execute(
            "SELECT count(*) FROM li WHERE l_orderkey % 9973 <> 0").fetchone()[0],
        "order_items_ri_violations": con.execute(
            "SELECT count(*) FROM li WHERE l_orderkey % 9973 = 0").fetchone()[0],
    }
    with open(f"{out_dir}/expected.json", "w") as f:
        json.dump(expected, f, indent=2)
    print(json.dumps(expected))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
