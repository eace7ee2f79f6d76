"""P21 column-name categorization with a pluggable embedding seam.

The reference classifies column names into ~21 categories by BERT
embedding similarity to per-category prototype keyword lists
(column_features/column_name_features.py:57-96,109-137). The category
→ prototype-keyword map is ported as data; the scoring runs either:

* default — deterministic char-trigram Jaccard between the (lowercased,
  separator-normalized) column name and each prototype keyword; a
  category scores as its best keyword; ties break by category name.
  Pure driver arithmetic on a #columns × #keywords grid (both tiny).
* ``embedding_fn(texts: list[str]) -> ndarray`` — the model seam
  (same contract as two_stage_clustering's ``name_embedding_fn``):
  names and keywords are embedded once, category prototypes are the
  mean keyword embedding, assignment is argmax cosine — exactly the
  reference's classify_columns_with_labels.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# ported category → prototype keywords (column_name_features.py:76-96)
COLUMN_CATEGORY_PROTOTYPES: dict[str, list[str]] = {
    "id": ["id", "identifier", "user id", "uuid", "primary key", "pk",
           "account id", "customer id", "order id", "record id", "unique id", "tuple id"],
    "name": ["name", "fullname", "first name", "last name", "surname", "nickname",
             "username", "contact name", "person name", "entity name"],
    "number": ["number", "num", "count", "quantity", "total", "amount", "score",
               "index", "age", "price", "value", "figure"],
    "email": ["email", "email address", "contact email", "user email",
              "primary email", "work email"],
    "phone": ["phone", "phone number", "mobile", "cell number", "telephone", "fax",
              "contact number"],
    "address": ["address", "street", "city", "state", "zipcode", "postal code",
                "country", "location", "mailing address", "physical address"],
    "date": ["date", "datetime", "timestamp", "created at", "updated at", "birthdate",
             "dob", "start date", "end date", "registration date", "transaction date"],
    "status": ["status", "state", "condition", "flag", "active", "enabled", "verified",
               "pending", "completed", "is active", "is enabled"],
    "description": ["description", "comment", "note", "details", "remarks", "info", "text"],
    "category": ["category", "type", "label", "code", "tag", "kind", "class"],
    "title": ["title", "job title", "prefix", "designation"],
    "city": ["city", "town", "municipality"],
    "country": ["country", "nation", "region"],
    "postal code": ["postal code", "zip code"],
    "time": ["time", "duration", "hour", "minute", "second", "scheduled time",
             "actual time", "departure time", "arrival time", "dep time", "arr time"],
    "age": ["age", "years old"],
    "amount": ["amount", "sum", "total cost"],
    "price": ["price", "cost", "unit price", "rate"],
    "quantity": ["quantity", "count", "how many"],
    "source": ["src", "source", "origin", "system", "file", "data source", "platform"],
}


def _norm(name: str) -> str:
    from datalakerulegeneration_spark.functions.text import tokenize_column_name

    return " ".join(tokenize_column_name(name))


def _trigrams(s: str) -> set[str]:
    padded = f"  {s}  "
    return {padded[i : i + 3] for i in range(max(len(padded) - 2, 1))}


def column_name_categories(
    spark: SparkSession,
    column_names: list[str],
    prototypes: dict[str, list[str]] | None = None,
    embedding_fn: Callable[[list[str]], "object"] | None = None,
) -> DataFrame:
    """``(column_name, category, confidence)`` for each name. A
    #columns-sized result — computed at the driver boundary (the same
    scale class as the reference's per-column loop) and returned as a
    DataFrame for joining into profiles."""
    protos = prototypes or COLUMN_CATEGORY_PROTOTYPES

    if embedding_fn is not None:
        import numpy as np

        keywords = [k for kws in protos.values() for k in kws]
        embs = np.asarray(embedding_fn(list(column_names) + keywords), dtype=float)
        name_embs, kw_embs = embs[: len(column_names)], embs[len(column_names):]
        centroids, labels, i = [], [], 0
        for label, kws in protos.items():
            centroids.append(kw_embs[i : i + len(kws)].mean(axis=0))
            labels.append(label)
            i += len(kws)
        cents = np.vstack(centroids)
        norm = lambda m: m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = norm(name_embs) @ norm(cents).T
        rows = [
            (c, labels[int(s.argmax())], round(float(s.max()), 6))
            for c, s in zip(column_names, sims)
        ]
    else:
        rows = []
        for c in column_names:
            tri = _trigrams(_norm(c))
            best_label, best_score = "unknown", 0.0
            for label in sorted(protos):
                score = max(
                    (
                        len(tri & kt) / len(tri | kt)
                        if (kt := _trigrams(_norm(k))) or tri
                        else 0.0
                    )
                    for k in protos[label]
                )
                if score > best_score:
                    best_label, best_score = label, score
            # a name that shares nothing with any prototype stays
            # 'unknown' rather than winning the alphabetically-first label
            rows.append((c, best_label, round(best_score, 6)))

    return spark.createDataFrame(
        rows, "column_name string, category string, confidence double"
    )
