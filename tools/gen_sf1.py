#!/usr/bin/env python3
"""Deterministic sf1 fixture generator (scale rehearsal; driver testdata is read-only).

Scales /root/testdata/sf0.1 by 10x via key-offset replication, preserving the
driver generator's invariants observed across sf0.01/sf0.1:
  - dense integer keys 0..N-1 per table (replica i maps k -> k + i*N);
  - referential integrity (fact FKs remapped into the same replica's dims);
  - fixed date/time ranges (event/order time DENSITY scales, not the span);
  - region/nation fixed at 5/25 rows at every sf;
  - Customer#%09d / Supplier#%09d name patterns re-derived from the new key.

Documents: replica i>0 word-permutes each text AND substitutes ~35% of
words with a replica-tagged variant (selection keyed on md5(word, i), so
the same word transforms identically everywhere within a replica). Both
transforms are deterministic per (text, i), so EXACT duplicate groups
replicate (same text -> same output within a replica) and within-replica
NEAR-duplicate pairs keep their Jaccard (shared words transform
identically). Crucially the substitution changes the token SET across
replicas -- permutation alone preserves word sets exactly, which made
every doc a 10-clique at any set-similarity threshold (cross-replica
Jaccard 1.0): candidate generation in prefix/LSH joins then scales
quadratically instead of linearly, and the corpus models "10x deeper
duplication" rather than "10x more data". With 35% substitution,
cross-replica Jaccard is ~0.48 against replica 0 and ~0.27 between
tagged replicas -- far under the 0.9 dedup thresholds -- so near-dup
structure replicates 10x linearly, the realistic scale story.
n_chars is recomputed from the transformed text.

Embeddings: replica i rotates the 64-dim vector by (i*7)%64 positions --
norm- and distribution-preserving, but rotated copies are near-orthogonal to
the original so ANN top-k structure scales instead of degenerating into
10-way ties.

Usage: python3 tools/gen_sf1.py [outdir]   (default /root/repo/fixtures/sf1)
"""
import duckdb, hashlib, random, sys, os

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/fixtures/sf1"
R = 10  # replicas
N = dict(customer=15000, supplier=1000, part=20000, orders=150000,
         lineitem=150000,  # lineitem offsets by the ORDER key span
         events=100000, ev_user=1500, documents=5000, embeddings=2000)

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("PRAGMA threads=16")

# The replication offsets below hardcode the sf0.1 row counts (N): if a
# regenerated fixture drifts (say 15500 customers vs N=15000), replica
# 1's key range would OVERLAP replica 0's tail -- duplicate primary
# keys, broken referential integrity, and a silently corrupted scaling
# corpus. Fail loudly instead.
_CHECKS = dict(customer="c_custkey", supplier="s_suppkey", part="p_partkey",
               orders="o_orderkey", events="event_id",
               documents="doc_id", embeddings="vec_id")
for _t, _k in _CHECKS.items():
    _n = con.sql(f"SELECT count(*) FROM '{SRC}/{_t}.parquet'").fetchone()[0]
    assert _n == N[_t], (
        f"{_t}: sf0.1 fixture has {_n} rows but N['{_t}']={N[_t]} -- "
        "update N or key replicas will collide")
    _mx = con.sql(f"SELECT max({_k}) FROM '{SRC}/{_t}.parquet'").fetchone()[0]
    assert _mx < N[_t], (
        f"{_t}: max {_k}={_mx} >= offset stride {N[_t]} -- replica key "
        "ranges would overlap")
_n = con.sql(f"SELECT count(*) FROM '{SRC}/lineitem.parquet'").fetchone()[0]
assert _n == N["lineitem"] * 4, (
    f"lineitem: expected ~4 rows per order ({N['lineitem']*4}), got {_n}")

def gen(sql, name):
    con.execute(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n}")

# fixed dims: copy verbatim
for t in ("region", "nation"):
    gen(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

REP = f"(SELECT CAST(range AS INT) AS i FROM range({R})) rep"

gen(f"""SELECT CAST(c_custkey + i*{N['customer']} AS BIGINT) AS c_custkey,
        printf('Customer#%09d', CAST(c_custkey + i*{N['customer']} AS INT)) AS c_name,
        c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet', {REP}""", "customer")

gen(f"""SELECT CAST(s_suppkey + i*{N['supplier']} AS BIGINT) AS s_suppkey,
        printf('Supplier#%09d', CAST(s_suppkey + i*{N['supplier']} AS INT)) AS s_name,
        s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet', {REP}""", "supplier")

gen(f"""SELECT CAST(p_partkey + i*{N['part']} AS BIGINT) AS p_partkey,
        p_name, p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet', {REP}""", "part")

gen(f"""SELECT CAST(o_orderkey + i*{N['orders']} AS BIGINT) AS o_orderkey,
        CAST(o_custkey + i*{N['customer']} AS BIGINT) AS o_custkey,
        o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', {REP}""", "orders")

gen(f"""SELECT CAST(l_orderkey + i*{N['lineitem']} AS BIGINT) AS l_orderkey,
        CAST(l_partkey + i*{N['part']} AS BIGINT) AS l_partkey,
        CAST(l_suppkey + i*{N['supplier']} AS BIGINT) AS l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', {REP}""", "lineitem")

gen(f"""SELECT CAST(event_id + i*{N['events']} AS BIGINT) AS event_id, ts,
        CAST(user_id + i*{N['ev_user']} AS BIGINT) AS user_id,
        event_type, value, props
        FROM '{SRC}/events.parquet', {REP}""", "events")

# embeddings: rotate by (i*7)%64 (1-based duckdb list slicing; r=0 -> identity)
gen(f"""SELECT CAST(vec_id + i*{N['embeddings']} AS BIGINT) AS vec_id,
        CAST(list_concat(embedding[((i*7)%64)+1:], embedding[1:((i*7)%64)]) AS FLOAT[]) AS embedding,
        label
        FROM '{SRC}/embeddings.parquet', {REP}""", "embeddings")

# documents: python-side word permutation (seeded by md5(text) x replica)
rows = con.sql(f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' ORDER BY doc_id").fetchall()
out = []
for i in range(R):
    for doc_id, text, lang, source in rows:
        if i == 0:
            t = text
        else:
            words = text.split(" ")
            seed = int.from_bytes(hashlib.md5((text + "|" + str(i)).encode()).digest()[:8], "big")
            random.Random(seed).shuffle(words)
            words = [
                w + "x" + str(i)
                if int.from_bytes(hashlib.md5((w + "#" + str(i)).encode()).digest()[:4], "big") % 100 < 35
                else w
                for w in words]
            t = " ".join(words)
        out.append((doc_id + i * N["documents"], t, lang, source, len(t)))
con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", out)
gen("SELECT * FROM docs ORDER BY doc_id", "documents")

# schema parity check against the source
for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
    a = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
    b = con.sql(f"DESCRIBE SELECT * FROM '{OUT}/{t}.parquet'").fetchall()
    assert [(c, ty) for c, ty, *_ in a] == [(c, ty) for c, ty, *_ in b], (t, a, b)
print("schema parity OK")
