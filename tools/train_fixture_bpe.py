"""Regenerate the vendored fixture BPE merge list.

Trains ops.bpe.bpe_learn on the sf0.01 documents fixture and writes
the merge sequence to
``datalakerulegeneration_spark/resources/fixture_bpe_merges.json`` —
the artifact ``ops.tokenize.default_tokenizer`` loads (via
``SPARK_GRAFT_BPE_MERGES_JSON``) so the REAL-BPE token-accounting path
runs in CI without tiktoken/HF. Deterministic: same corpus → same
merges, so re-running only changes the file when the fixture does.

Usage: python tools/train_fixture_bpe.py [--sf /root/testdata/sf0.01] [--n-merges 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalakerulegeneration_spark.catalog import load_sf_tables
from datalakerulegeneration_spark.ops import bpe
from datalakerulegeneration_spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datalakerulegeneration_spark",
    "resources",
    "fixture_bpe_merges.json",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n-merges", type=int, default=64)
    args = ap.parse_args()
    spark = get_spark("train-bpe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    docs = load_sf_tables(spark, args.sf, ("documents",))["documents"]
    rows = bpe.bpe_learn(docs, "doc_id", "text", n_merges=args.n_merges).collect()
    merges = [[r["left"], r["right"]] for r in rows]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(merges, fh, indent=0)
        fh.write("\n")
    print(f"wrote {len(merges)} merges to {OUT}")


if __name__ == "__main__":
    main()
