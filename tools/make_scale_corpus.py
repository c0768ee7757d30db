#!/usr/bin/env python3
"""Build a measurement-only scale corpus for slope probes beyond sf0.1
(round-18 verdict hygiene: promote the sf0.2/sf0.4 generator from
target/ scratch into tools/ so extra scale points are one command).

Method (the round-18 llm16 probe, SCALE.md §Round-18 measurements):
  dst = src ∪ a letter-permutation-ciphered copy of documents at
        doc_id + offset
The cipher is a fixed alphabet derangement, so the ciphered copy has
an entirely NEW shingle/gram/token population with the identical
per-document length and df distribution — distinct k-grams double
exactly at each application (measured ratio 2.000 in round 18), which
is exactly what a growth exponent needs. Every other table passes
through unchanged so the dir drops into SPARK_GRAFT_SF_DIR directly.

Usage (never writes to /root/testdata — only to the dst you name):
  python3 tools/make_scale_corpus.py /root/testdata/sf0.1 target/sf0.2 100000
  python3 tools/make_scale_corpus.py target/sf0.2      target/sf0.4 200000
Then probe any slope row at the extra points:
  SPARK_GRAFT_SF_DIR=$PWD/target/sf0.2 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=llm16 sbt -batch "runMain graft.Bench"
"""
import os
import sys

import duckdb
import pandas as pd

LOWER = "abcdefghijklmnopqrstuvwxyz"


def perm_for(offset: int):
    """Deterministic alphabet DERANGEMENT seeded by the id offset.

    Seeding by offset makes every chained application a DIFFERENT
    cipher — chaining the same cipher would reproduce the previous
    copy's population (c(orig) appears in both src and the new copy)
    and the distinct-gram ratio reads 1.5, not 2.0 (observed). The
    derangement check (no fixed points) guarantees no k-gram survives
    the cipher by identity."""
    import random
    rnd = random.Random(offset)
    letters = list(LOWER)
    while True:
        rnd.shuffle(letters)
        if all(a != b for a, b in zip(LOWER, letters)):
            break
    cipher = "".join(letters)
    return str.maketrans(LOWER + LOWER.upper(), cipher + cipher.upper())

PASSTHROUGH = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events", "embeddings"]


def main(src: str, dst: str, offset: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT * FROM read_parquet('{src}/documents.parquet')").df()
    copy = docs.copy()
    copy["doc_id"] = copy["doc_id"] + offset
    perm = perm_for(offset)
    copy["text"] = copy["text"].map(lambda t: t.translate(perm))
    both = pd.concat([docs, copy], ignore_index=True)
    con.register("scaled", both)
    con.execute(
        f"COPY (SELECT * FROM scaled) TO '{dst}/documents.parquet' (FORMAT PARQUET)")
    for t in PASSTHROUGH:
        p = f"{src}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"COPY (SELECT * FROM read_parquet('{p}')) "
                        f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    # sanity: distinct 9-gram count must double (the property the
    # probe depends on) — cheap enough to assert every build
    r = con.execute(f"""
        WITH g AS (SELECT substr(text, i, 9) AS s
                   FROM (SELECT text, unnest(generate_series(1,
                           greatest(length(text) - 8, 1))) AS i
                         FROM read_parquet('{dst}/documents.parquet'))),
             gs AS (SELECT substr(text, i, 9) AS s
                    FROM (SELECT text, unnest(generate_series(1,
                            greatest(length(text) - 8, 1))) AS i
                          FROM read_parquet('{src}/documents.parquet')))
        SELECT (SELECT count(DISTINCT s) FROM g),
               (SELECT count(DISTINCT s) FROM gs)""").fetchone()
    ratio = r[0] / r[1]
    print(f"wrote {dst}: documents {len(docs)} -> {len(both)}, "
          f"distinct 9-grams x{ratio:.3f} (expect ~2.0)")
    if not 1.9 <= ratio <= 2.1:
        sys.exit(f"gram-doubling sanity failed: ratio {ratio:.3f}")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
