"""One scale step beyond sf0.1 (VERDICT r3 item 8): deterministically
replicate the sf0.1 documents / embeddings / events tables K× (new ids,
perturbed content — no external data) and run the HEAVIEST queries()
entries against their DuckDB oracles at that size, catching any
size-dependent plan changes (AQE re-plans, overflow, bucket-cap paths).

Usage: python scripts/scale_sweep.py [K] (default 5 → ~sf0.5-equivalent
rows for the scaled tables; untouched tables come from sf0.1).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
K = int(sys.argv[1]) if len(sys.argv) > 1 else 5
DST = f"/tmp/sfbig_k{K}"
HEAVY = [
    "doc_minhash_neardup",
    "doc_minhash_keepers",
    "doc_simhash_near",
    "ann_selfjoin_top2",
    "emb_neardup_pairs",
    "events_sessionize",
    "j2_pip_rect",
]


def build_scaled_dir() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # documents: K replicas, distinct doc_ids, replica-tagged text so
    # replicas are near-dups of their source (exercises the dedup
    # family's bucket paths at K× volume)
    if not os.path.exists(f"{DST}/documents.parquet"):
        con.sql(
            f"""
            COPY (
              SELECT doc_id + r * 1000000000 AS doc_id,
                     CASE WHEN r = 0 THEN text
                          ELSE text || ' r' || r::VARCHAR END AS text,
                     lang, source, n_chars
              FROM '{SRC}/documents.parquet', range({K}) t(r)
            ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
            """
        )
    # embeddings: K replicas with a deterministic tiny per-replica
    # rotation-free perturbation of one coordinate (keeps near-dup
    # structure without collapsing to exact duplicates)
    if not os.path.exists(f"{DST}/embeddings.parquet"):
        con.sql(
            f"""
            COPY (
              SELECT vec_id + r * 1000000000 AS vec_id,
                     list_transform(embedding, (x, i) ->
                       CASE WHEN i = 1 THEN CAST(x + r * 1e-4 AS FLOAT) ELSE x END
                     ) AS embedding,
                     label
              FROM '{SRC}/embeddings.parquet', range({K}) t(r)
            ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
            """
        )
    # events: K replicas shifted far apart in time and user space
    if not os.path.exists(f"{DST}/events.parquet"):
        con.sql(
            f"""
            COPY (
              SELECT event_id + r * 1000000000 AS event_id,
                     ts + to_microseconds((r * 86400000000)::BIGINT) AS ts,
                     user_id + r * 1000000 AS user_id,
                     event_type, value, props
              FROM '{SRC}/events.parquet', range({K}) t(r)
            ) TO '{DST}/events.parquet' (FORMAT PARQUET)
            """
        )
    for t in "region nation customer supplier part orders lineitem".split():
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    con.close()


def main() -> None:
    build_scaled_dir()
    # reuse the oracle validator's comparison on the scaled dir,
    # restricted to the heavy queries
    import subprocess

    rc = subprocess.call(
        [sys.executable, "scripts/validate_oracles.py", DST, ",".join(HEAVY)]
    )
    sys.exit(rc)


if __name__ == "__main__":
    main()
