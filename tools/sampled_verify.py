#!/usr/bin/env python3
"""Sampled-corpus hash verification for the quadratic oracle twins
(round-12 verdict ask 5).

Five DuckDB oracle twins are deliberately quadratic (all-pairs /
recursive-closure SQL): q_prefix_jaccard, q_ngram_jaccard,
q_cluster_sizes, q_dedup_clusters, q_dedup_survivors. They are
hash-checked at sf0.01/sf0.1 and were protocol-SKIPPED (rows-only) at
sf1, where the all-pairs oracle needs hours at 50k docs. This closes
that gap with corpus sampling:

  1. pick K deterministic doc-id blocks from the sf1 documents table
     (seeded sample — same blocks every run);
  2. materialize a SAMPLED CORPUS DIR: documents filtered to those
     blocks, every other table hard/symlinked unchanged;
  3. run the ENGINE (graft.Verify, the five queries) on that dir, and
     the SAME oracle SQL in DuckDB over the same dir — both sides see
     the identical restricted corpus, so the hash compare is EXACT
     for pair queries and cluster/closure queries alike (restricting
     the corpus first, unlike post-hoc filtering of full-corpus
     output, keeps connected components well-defined);
  4. report per-query sampled-hash status via tools/local_verify.py's
     comparator.

The sampled corpus (default 10 blocks x 1000 ids ~ 10k docs) is
sf0.1-sized for the oracle but carries sf1's REPLICA STRUCTURE
(blocks land across gen_sf1.py's 10 word-substituted replicas), i.e.
the near-dup distribution the sf1 twins were actually skipped over.

Usage: python3 tools/sampled_verify.py [sf1Dir] [workDir]
       (defaults: fixtures/sf1, /tmp/sampled_sf1)
"""
import json
import os
import random
import shutil
import subprocess
import sys

import duckdb

SF1 = sys.argv[1] if len(sys.argv) > 1 else "fixtures/sf1"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sampled_sf1"
QUERIES = ["q_prefix_jaccard", "q_ngram_jaccard", "q_cluster_sizes",
           "q_dedup_clusters", "q_dedup_survivors"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]
K_BLOCKS, BLOCK = 10, 1000
SEED = 20260816  # fixed: same sample every run, diffable across heads

def main():
    sample_dir = f"{WORK}/corpus"
    out_dir = f"{WORK}/out"
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(sample_dir)

    con = duckdb.connect()
    n_docs = con.sql(
        f"SELECT max(doc_id)+1 FROM '{SF1}/documents.parquet'").fetchone()[0]
    n_blocks = n_docs // BLOCK
    blocks = sorted(random.Random(SEED).sample(range(n_blocks), K_BLOCKS))
    pred = " OR ".join(
        f"(doc_id >= {b * BLOCK} AND doc_id < {(b + 1) * BLOCK})"
        for b in blocks)
    con.execute(
        f"COPY (SELECT * FROM '{SF1}/documents.parquet' WHERE {pred} "
        f"ORDER BY doc_id) TO '{sample_dir}/documents.parquet' "
        f"(FORMAT PARQUET, COMPRESSION SNAPPY)")
    n = con.sql(
        f"SELECT count(*) FROM '{sample_dir}/documents.parquet'").fetchone()[0]
    print(f"sampled corpus: {n} docs from blocks {blocks} "
          f"(of {n_blocks} x {BLOCK}-id blocks, seed {SEED})")
    for t in TABLES:
        os.symlink(os.path.abspath(f"{SF1}/{t}.parquet"),
                   f"{sample_dir}/{t}.parquet")

    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get(
        "SPARK_GRAFT_CPUS", "8"))
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {sample_dir} {out_dir} {','.join(QUERIES)}"],
        env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit(f"engine run failed ({r.returncode})")
    for line in r.stdout.splitlines():
        if "[verify]" in line and "failed" in line:
            sys.exit(f"engine query failed: {line}")

    # the oracle side: local_verify's comparator over the sampled dir
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import local_verify
    print("— sampled-hash compare (engine vs quadratic oracle, same "
          "restricted corpus) —")
    local_verify.main(sample_dir, out_dir)

if __name__ == "__main__":
    main()
