#!/usr/bin/env python3
"""Build the 10x scaling corpora used for the SURVEY §4 measurements.

Dev tooling only (like check.py) — the engine itself never depends on
this. Two fixtures from /root/testdata/sf0.1:

  documents x10 : per-copy PERTURBED text (a copy-specific token is
                  injected near high-frequency words) so the near-dup
                  structure stays realistic instead of exact-duplicate
                  blowup; doc_ids offset per copy.
  orders/customer/events x10 : keys offset per copy (events rewritten
                  via pyarrow to preserve the TIMESTAMP(NANOS)
                  physical type the engine's reader expects).

Usage: python3 scripts/make_scale_corpus.py /tmp/scale10 [factor=10]
       (factor 100 rebuilds the decade-further d03/d10 spot-run corpus)
Then:  SPARK_GRAFT_SF_DIR=/tmp/scale10 SPARK_GRAFT_ONLY=d04_dedup_minhash \
         SPARK_GRAFT_REPS=1 SPARK_GRAFT_CPUS=16 sbt "runMain graft.Bench"
"""
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main(out: str, factor: int = 10) -> None:
    import os
    os.makedirs(out, exist_ok=True)
    for t in ["region", "nation", "supplier", "part"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    con = duckdb.connect()
    # lineitem x10: l_orderkey offsets match the orders offsets below so
    # the order->line relationship survives scaling (the q72/q76/q73/q74
    # rows in SURVEY §4 measure against this lineitem-scaled corpus)
    con.sql(f"""COPY (
      SELECT * REPLACE (l_orderkey + i*2000000 AS l_orderkey)
      FROM '{SRC}/lineitem.parquet', generate_series(0, {factor - 1}) t(i)
    ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    # embeddings x10: per-copy perturbation of one component keeps the
    # near-dup structure realistic (copies are near- but not exact dups)
    con.sql(f"""COPY (
      SELECT vec_id + i*1000000 AS vec_id,
             list_transform(embedding, x -> CAST(x + i * 0.0003 AS FLOAT)) AS embedding,
             label
      FROM '{SRC}/embeddings.parquet', generate_series(0, {factor - 1}) t(i)
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    con.sql(f"""COPY (
      SELECT doc_id + i*1000000 AS doc_id,
             CASE WHEN i = 0 THEN text
                  ELSE replace(text, ' the ', ' the' || i || ' ') END AS text,
             lang, source, length(CASE WHEN i = 0 THEN text
                  ELSE replace(text, ' the ', ' the' || i || ' ') END) AS n_chars
      FROM '{SRC}/documents.parquet', generate_series(0, {factor - 1}) t(i)
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""COPY (
      SELECT o_orderkey + i*2000000 AS o_orderkey, o_custkey + i*2000000 AS o_custkey,
             o_orderstatus, o_totalprice + i*0.01 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM '{SRC}/orders.parquet', generate_series(0, {factor - 1}) t(i)
    ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.sql(f"""COPY (
      SELECT c_custkey + i*2000000 AS c_custkey, c_name || '_' || i AS c_name,
             c_nationkey, c_acctbal, c_mktsegment
      FROM '{SRC}/customer.parquet', generate_series(0, {factor - 1}) t(i)
    ) TO '{out}/customer.parquet' (FORMAT PARQUET)""")

    # events: pyarrow so ts stays timestamp[ns] (duckdb's writer would
    # downcast to microseconds and break the engine's nanos reader)
    t = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for i in range(factor):
        parts.append(
            t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pc.add(t["event_id"], i * 10000000))
             .set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(t["user_id"], i * 100000)))
    pq.write_table(pa.concat_tables(parts), f"{out}/events.parquet",
                   version="2.6", coerce_timestamps=None)
    print(f"wrote {factor}x corpus to {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10",
         int(sys.argv[2]) if len(sys.argv) > 2 else 10)
