"""Deterministic embedding stand-in for the model seams.

The engine keeps three model hooks the reference fills with real
networks (SURVEY §7.3.1): ``semantic_domains(model_fn=...)`` (Doduo,
reference profiling/profiler.py:129-131),
``two_stage_clustering(name_embedding_fn=...)`` and
``column_name_categories(embedding_fn=...)`` (sentence-transformers,
reference utils/two_stage_clustering.py:73-81,
column_features/column_name_features.py:16-17). No model runtime ships
in this environment, so the seams were declared but never executed
end-to-end (r9 verdict item 4). This module is the vendored
deterministic substitute: a seeded hashed-trigram random projection —
md5-keyed, so it is stable across processes, Python hash seeds, and
platforms — with the exact contract the real models use:
``fn(texts: list[str]) -> ndarray[len(texts), dim]``.

It is a FIXTURE, not a semantic model: texts sharing character
trigrams land close in cosine, everything else is noise. That is
precisely enough to pin the seam contracts (shapes, NULL handling,
determinism, grouping behavior) in tests.
"""

from __future__ import annotations

import hashlib


def _trigrams(text: str) -> list[str]:
    s = f"  {text.lower()}  "
    # all-space trigrams (only produced by empty/1-char texts) carry no
    # signal and would make '' cosine-similar to real names — drop them
    return [g for g in (s[i : i + 3] for i in range(len(s) - 2)) if g.strip()]


def hashed_trigram_embedding(texts: list[str], dim: int = 16, seed: int = 1234):
    """Embed each text as the L2-normalized sum of its trigrams'
    signed hash buckets. Deterministic: bucket and sign come from
    md5(seed || trigram). Empty/trigram-free texts embed as the zero
    vector (callers treat cosine with 0 as no similarity)."""
    import numpy as np

    out = np.zeros((len(texts), dim), dtype=float)
    for i, t in enumerate(texts):
        for g in _trigrams(str(t)):
            h = hashlib.md5(f"{seed}|{g}".encode()).digest()
            bucket = int.from_bytes(h[:4], "big") % dim
            sign = 1.0 if h[4] % 2 == 0 else -1.0
            out[i, bucket] += sign
        n = float(np.linalg.norm(out[i]))
        if n > 0:
            out[i] /= n
    return out


def fixture_domain_model(
    prototypes: dict[str, list[str]], dim: int = 32, seed: int = 1234
):
    """A Doduo-shaped ``model_fn(column_name, values) -> (domain,
    confidence)`` built on the hashed-trigram space: each domain is the
    normalized centroid of its prototype strings; a column scores as
    the cosine between its value-sample centroid and the nearest
    domain centroid. Deterministic; ties break by domain name ascending."""
    import numpy as np

    names = sorted(prototypes)
    cents = []
    for d in names:
        e = hashed_trigram_embedding(prototypes[d], dim=dim, seed=seed)
        c = e.sum(axis=0)
        n = float(np.linalg.norm(c))
        cents.append(c / n if n > 0 else c)
    cents = np.asarray(cents)

    def model_fn(column_name: str, values: list[str]) -> tuple[str, float]:
        e = hashed_trigram_embedding(list(values), dim=dim, seed=seed)
        c = e.sum(axis=0)
        n = float(np.linalg.norm(c))
        if n == 0:
            return ("unknown", 0.0)
        sims = cents @ (c / n)
        best = int(np.argmax(sims))  # argmax takes the FIRST max: name-asc tie-break
        return (names[best], float(sims[best]))

    return model_fn
