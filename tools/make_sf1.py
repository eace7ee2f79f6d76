"""Synthesize an sf1-scale benchmark directory from sf0.1 (no network,
so no real TPC-H generator): fact tables replicate 10x with key shifts
that preserve join structure, dimension tables copy through.

* orders / lineitem: orderkey += r * (max orderkey + 1) per replica —
  order↔lineitem joins stay consistent; dims (cust/supp/part) are NOT
  scaled, so each dimension row simply sees 10x fact traffic.
* documents: doc_id shifts; every token gets a per-replica suffix so
  replicas are NOT near-duplicates of each other and the dedup
  workload keeps sf0.1's duplicate structure at 10x volume.
* everything else copies as-is.

Output: /root/repo/.bench/sf1/*.parquet (gitignored; ~10x sf0.1).
Usage: python tools/make_sf1.py [--replicas N] [--dst DIR] [--tables a,b]
  e.g. --replicas 100 --dst .bench/sf10 --tables documents  (the 100x
  token-volume set for the dedup/text family scaling runs)
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DST = os.path.join(_REPO, ".bench", "sf1")
REPLICAS = 10


def main() -> None:
    global DST, REPLICAS
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument("--dst", default=DST)
    ap.add_argument("--tables", default=None, help="comma list; default all")
    args = ap.parse_args()
    REPLICAS = args.replicas
    DST = args.dst if os.path.isabs(args.dst) else os.path.join(_REPO, args.dst)
    only = set(args.tables.split(",")) if args.tables else None
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    def want(t: str) -> bool:
        return only is None or t in only

    def want_scaled(t: str) -> bool:
        # *_scaled variants are opt-in fixture sets (they write under
        # the BASE table name): fire only when named explicitly, and
        # the plain-copy loop below skips the base table in that case —
        # a default all-tables run used to write the scaled dimension
        # and immediately overwrite it with the unscaled copy
        # (order-dependent wasted work, r10 ADVICE)
        return only is not None and t in only

    (max_ok,) = con.execute(f"SELECT max(o_orderkey) + 1 FROM {src('orders')}").fetchone()
    (max_doc,) = con.execute(f"SELECT max(doc_id) + 1 FROM {src('documents')}").fetchone()

    if want("orders"):
      write(
        "orders",
        " UNION ALL ".join(
            f"SELECT o_orderkey + {r * max_ok} AS o_orderkey, o_custkey, o_orderstatus,"
            f" o_totalprice, o_orderdate, o_orderpriority FROM {src('orders')}"
            for r in range(REPLICAS)
        ),
      )
    if want("lineitem"):
      write(
        "lineitem",
        " UNION ALL ".join(
            f"SELECT l_orderkey + {r * max_ok} AS l_orderkey, l_partkey, l_suppkey,"
            f" l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
            f" l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}"
            for r in range(REPLICAS)
        ),
      )
    if want("documents"):
      write(
        "documents",
        " UNION ALL ".join(
            f"SELECT doc_id + {r * max_doc} AS doc_id,"
            + (
                "text"
                if r == 0
                else f"regexp_replace(text, '(\\S+)', '\\1x{r}', 'g') AS text"
            )
            + f", lang, source, n_chars FROM {src('documents')}"
            for r in range(REPLICAS)
        ),
      )
    if want_scaled("events_scaled"):
        # join-preserving event scale-up: ids shift per replica, users/
        # timestamps stay — sessions densify and drift windows carry
        # REPLICAS x the rows (drift/temporal family scaling set)
        (max_ev,) = con.execute(
            f"SELECT max(event_id) + 1 FROM {src('events')}"
        ).fetchone()
        write(
            "events",
            " UNION ALL ".join(
                f"SELECT event_id + {r * max_ev} AS event_id, ts, user_id,"
                f" event_type, value, props FROM {src('events')}"
                for r in range(REPLICAS)
            ),
        )
    if want_scaled("embeddings_scaled"):
        # retrieval-family scale-up: vec_id shifts per replica; a small
        # deterministic per-replica affine tweak keeps replicas from
        # being exact duplicates (timing sets only — no oracle runs here)
        (max_vec,) = con.execute(
            f"SELECT max(vec_id) + 1 FROM {src('embeddings')}"
        ).fetchone()
        write(
            "embeddings",
            " UNION ALL ".join(
                f"SELECT vec_id + {r * max_vec} AS vec_id,"
                f" list_transform(embedding, x -> CAST(x * (1.0 + {r} * 0.0001)"
                f" + {r % 11} * 0.001 AS FLOAT)) AS embedding, label"
                f" FROM {src('embeddings')}"
                for r in range(REPLICAS)
            ),
        )
    # dimension scale-up (r10: the sf10 profile-family fixtures) — key
    # shifts per replica, name/text columns get a replica suffix so
    # distinct counts and patterns scale with volume instead of
    # collapsing to the sf0.1 value sets
    dim_specs = {
        "customer_scaled": (
            "customer",
            "c_custkey",
            lambda r: (
                f"SELECT c_custkey + {{shift}} AS c_custkey,"
                + ("c_name" if r == 0 else f"c_name || '#{r}' AS c_name")
                + ", c_nationkey, c_acctbal, c_mktsegment"
            ),
        ),
        "supplier_scaled": (
            "supplier",
            "s_suppkey",
            lambda r: (
                f"SELECT s_suppkey + {{shift}} AS s_suppkey,"
                + ("s_name" if r == 0 else f"s_name || '#{r}' AS s_name")
                + ", s_nationkey, s_acctbal"
            ),
        ),
        "part_scaled": (
            "part",
            "p_partkey",
            lambda r: (
                f"SELECT p_partkey + {{shift}} AS p_partkey,"
                + ("p_name" if r == 0 else f"p_name || ' r{r}' AS p_name")
                + ", p_brand, p_type, p_size, p_retailprice"
            ),
        ),
    }
    for name, (t, key, sel) in dim_specs.items():
        if want_scaled(name):
            (mx,) = con.execute(f"SELECT max({key}) + 1 FROM {src(t)}").fetchone()
            write(
                t,
                " UNION ALL ".join(
                    sel(r).format(shift=r * mx) + f" FROM {src(t)}"
                    for r in range(REPLICAS)
                ),
            )

    scaled_bases = {
        spec[0] for n, spec in dim_specs.items() if want_scaled(n)
    }
    if want_scaled("events_scaled"):
        scaled_bases.add("events")
    if want_scaled("embeddings_scaled"):
        scaled_bases.add("embeddings")
    for t in ("region", "nation", "customer", "supplier", "part", "events", "embeddings"):
        if want(t) and t not in scaled_bases:
            write(t, f"SELECT * FROM {src(t)}")


if __name__ == "__main__":
    main()
