"""Round-4e scaling spot-check: replicate documents/embeddings 20x and
orders/events 10x (per-copy key remapping that keeps BLOCK width
constant while block count grows — the production blocking discipline),
then time the new wave's operators steady-state, best-of-2.

Usage: python tools/scale_check_r4e.py [gen|run|both]
Writes replicas to /tmp/scale_r4e/ (off-repo, as in prior rounds).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_r4e"

DOC_COPIES = 20
FACT_COPIES = 10

OPS = (
    "sk_cms_heavy",
    "sk_hll_distinct",
    "sk_kmv_distinct",
    "sk_hist_quantile",
    "op_incremental_join",
    "op_compaction_plan",
    "op_target_encode",
    "op_snapshot_diff",
    "ev_rate_limit",
    "gr_bfs_reach",
    "pipe_incremental",
    "sk_join_cardinality",
    "sk_hll_grouped",
    "op_zone_map_prune",
    "op_k_anonymity",
    "ev_psi_drift",
    "dd_fuzzy_names",
    "gs_grid_cells",
    "gs_radius_join",
    "op_market_basket",
)


def gen() -> None:
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    copies_doc = ", ".join(str(c) for c in range(DOC_COPIES))
    copies_fact = ", ".join(str(c) for c in range(FACT_COPIES))
    # documents: 20x, per-copy source suffix (block width constant) +
    # per-copy token so distinct-gram counts grow realistically
    con.sql(
        f"""
        COPY (
          SELECT doc_id + c * 100000000 AS doc_id,
                 text || ' copyc' || c AS text,
                 lang, source || '_c' || c AS source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'),
               unnest([{copies_doc}]) AS t(c)
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # embeddings: 20x, label remapped per copy (cells constant width)
    con.sql(
        f"""
        COPY (
          SELECT vec_id + c * 1000000 AS vec_id, embedding,
                 label + c * 1000 AS label
          FROM read_parquet('{SRC}/embeddings.parquet'),
               unnest([{copies_doc}]) AS t(c)
        ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    # orders: 10x with orderkey remap (join cardinality scales honestly)
    con.sql(
        f"""
        COPY (
          SELECT o_orderkey + c * 100000000 AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet'),
               unnest([{copies_fact}]) AS t(c)
        ) TO '{DST}/orders.parquet' (FORMAT PARQUET)
        """
    )
    # events: 10x with user remap (user count grows, per-user volume flat)
    con.sql(
        f"""
        COPY (
          SELECT event_id + c * 100000000 AS event_id, ts,
                 user_id + c * 10000 AS user_id, event_type, value, props
          FROM read_parquet('{SRC}/events.parquet'),
               unnest([{copies_fact}]) AS t(c)
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
        """
    )
    for t in ("region", "nation", "customer", "supplier", "part", "lineitem"):
        dst = f"{DST}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    print("replicas written to", DST, file=sys.stderr)


def run() -> None:
    import __spark_entry__ as e
    from pypers_spark.session import get_session

    spark = get_session("scale-check-r4e")
    qs = e.queries()
    for sf_dir, tag in ((SRC, "1x"), (DST, "big")):
        for name in OPS:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{tag} {name}: {best:.2f}s", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("gen", "both"):
        gen()
    if mode in ("run", "both"):
        run()
