"""Generate resources/fixture_compression.json — the pinned zlib
contract table for the compression_ratio rows-only entry (r9 verdict
item 5). Texts span the repetitiveness range the operator exists to
measure; ``n_compressed`` is CPython zlib at level 6, computed HERE
(driver-side, plain stdlib) so the registered check query proves the
Spark executors' Arrow-batched zlib path returns byte-identical
lengths. Deterministic: fixed seed, no timestamps.
"""

from __future__ import annotations

import json
import os
import random
import zlib

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "datalakerulegeneration_spark",
    "resources",
    "fixture_compression.json",
)

WORDS = (
    "data lake rule generation profile cluster share detect score "
    "quality corpus token filter sample pack batch stream drift"
).split()


def main() -> None:
    rng = random.Random(20260816)
    rows = []
    for i in range(24):
        kind = i % 4
        if kind == 0:  # highly repetitive boilerplate
            text = ("spam ham " * (10 + i)).strip()
        elif kind == 1:  # natural-ish prose
            text = " ".join(rng.choice(WORDS) for _ in range(40 + i * 3))
        elif kind == 2:  # incompressible-ish (random hex)
            text = "".join(rng.choice("0123456789abcdef") for _ in range(200 + i))
        else:  # mixed, with unicode
            text = ("répétition à gogo — " * (3 + i)) + " ".join(
                rng.choice(WORDS) for _ in range(10)
            )
        rows.append(
            {
                "id": i,
                "text": text,
                "n_compressed": len(zlib.compress(text.encode("utf-8"), 6)),
            }
        )
    with open(OUT, "w") as fh:
        json.dump({"level": 6, "rows": rows}, fh, indent=1)
        fh.write("\n")
    print(f"wrote {OUT}: {len(rows)} rows")


if __name__ == "__main__":
    main()
