#!/usr/bin/env python3
"""Deterministic Zipf-skew fixture generator (skew rehearsal; driver
testdata is read-only).

Derives a SKEWED variant of /root/testdata/sf0.1: same schemas, same
row counts, same referential integrity — but with one hot key holding
~40% of the rows in every skew-sensitive column, which the uniform-ish
driver fixtures never exercise:

  - orders:   ~40% of orders collapse onto customer 0 (hot customer);
  - lineitem: ~40% of line items collapse onto part 0 AND supplier 0
              (hot dimension keys — the skewed-join / skewed-agg case);
  - events:   ~40% of events collapse onto user 0 (hot user — the
              sessionize / funnel / per-user-window case);
  - documents: a hot token is prepended to ~40% of docs (hot df token —
              the near-dup candidate-generation case: prefix filters /
              banded LSH must not explode on a stop-word-like token);
              n_chars is recomputed;
  - region/nation/customer/supplier/part/embeddings: copied unchanged.

Selectors are key-modulus based (k % 10 < 4), so the fixture is
bit-reproducible with no RNG. Row counts are asserted unchanged.
SkewScaleSpec times the heavy skew-sensitive queries on this fixture
against the uniform sf0.1 and pins the ratio (~2x band): AQE skew
handling, salting, prefix ordering and bounded-domain bucketing must
hold on data that actually skews, not just match the plain plan on
uniform data.

Usage: python3 tools/gen_skew.py [outdir]   (default /root/repo/fixtures/skew0.1)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures/skew0.1"
HOT = 4  # k % 10 < HOT  ->  ~40% of rows on the hot key

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("PRAGMA threads=16")


def gen(sql, name):
    con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n_src = con.sql(f"SELECT count(*) FROM '{SRC}/{name}.parquet'").fetchone()[0]
    n_out = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    assert n_src == n_out, f"{name}: {n_src} src rows != {n_out} out rows"
    print(f"{name:12s} {n_out} rows")


# unchanged dimensions (hot keys 0 exist in every dim: dense 0..N-1)
for t in ["region", "nation", "customer", "supplier", "part", "embeddings"]:
    gen(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

gen(f"""SELECT o_orderkey,
          CASE WHEN o_orderkey % 10 < {HOT} THEN 0 ELSE o_custkey END
            AS o_custkey,
          o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""", "orders")

# per-ROW selector (orderkey*7 + linenumber), not per-order: whole-hot
# orders would also degenerate market baskets to single-part sets and
# understate the join skew
gen(f"""SELECT l_orderkey,
          CASE WHEN (l_orderkey * 7 + l_linenumber) % 10 < {HOT}
               THEN 0 ELSE l_partkey END AS l_partkey,
          CASE WHEN (l_orderkey * 7 + l_linenumber) % 10 < {HOT}
               THEN 0 ELSE l_suppkey END AS l_suppkey,
          l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""", "lineitem")

gen(f"""SELECT event_id, ts,
          CASE WHEN event_id % 10 < {HOT} THEN 0 ELSE user_id END
            AS user_id,
          event_type, value, props
        FROM '{SRC}/events.parquet'""", "events")

gen(f"""SELECT doc_id,
          CASE WHEN doc_id % 10 < {HOT}
               THEN 'zipfhot ' || text ELSE text END AS text,
          lang, source,
          CASE WHEN doc_id % 10 < {HOT}
               THEN n_chars + 8 ELSE n_chars END AS n_chars
        FROM '{SRC}/documents.parquet'""", "documents")

# skew sanity: the hot key really holds ~HOT*10% of each table
for t, k, hot in [("orders", "o_custkey", 0), ("lineitem", "l_partkey", 0),
                  ("events", "user_id", 0)]:
    frac = con.sql(f"""SELECT count(*) FILTER (WHERE {k} = {hot})
                         * 1.0 / count(*)
                       FROM '{OUT}/{t}.parquet'""").fetchone()[0]
    assert 0.3 <= frac <= 0.5, f"{t}.{k}: hot fraction {frac:.3f} out of band"
    print(f"{t}.{k}: hot fraction {frac:.3f}")
frac = con.sql(f"""SELECT count(*) FILTER (WHERE text LIKE 'zipfhot %')
                     * 1.0 / count(*) FROM '{OUT}/documents.parquet'
                """).fetchone()[0]
assert 0.3 <= frac <= 0.5, f"documents hot-token fraction {frac:.3f}"
print(f"documents hot token: fraction {frac:.3f}")
print("done:", OUT)
