"""Schema matching: similarity, Hungarian, binding, transfer."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datalakerulegeneration_spark.matching import (
    apply_bound_rules,
    bind_rules,
    column_match_scores,
    global_assignment,
    hungarian,
    transfer_confidence,
    update_success_rate,
)
from datalakerulegeneration_spark.profiling import profile_table
from datalakerulegeneration_spark.rules.spec import Rule


def test_hungarian_known_solution():
    cost = np.array([[4, 1, 3], [2, 0, 5], [3, 2, 2]])
    rows, cols = hungarian(cost)
    total = sum(cost[r, c] for r, c in zip(rows, cols))
    assert total == 5  # classic optimum
    assert sorted(rows) == [0, 1, 2] and sorted(cols) == [0, 1, 2]


def test_hungarian_rectangular():
    cost = np.array([[1.0, 9.0, 9.0], [9.0, 1.0, 9.0]])
    rows, cols = hungarian(cost)
    assert list(zip(rows, cols)) == [(0, 0), (1, 1)]


@pytest.fixture(scope="module")
def match_profiles(spark, sf_tables):
    src = profile_table(spark, sf_tables["nation"], "nation", with_tokens=False)
    tgt = profile_table(
        spark,
        sf_tables["nation"].withColumnRenamed("n_name", "nation_name")
        .withColumnRenamed("n_nationkey", "nation_key")
        .withColumnRenamed("n_regionkey", "region_key"),
        "nation2",
        with_tokens=False,
    )
    return src, tgt


def test_column_match_and_assignment(spark, match_profiles):
    src, tgt = match_profiles
    scores = column_match_scores(src, tgt)
    assert scores.count() == 9  # 3 × 3
    assign = global_assignment(scores)
    pairs = {(r["src_id"], r["tgt_id"]) for r in assign.collect()}
    # renamed-but-identical columns must match 1:1
    assert ("nation::n_nationkey", "nation2::nation_key") in pairs
    assert ("nation::n_name", "nation2::nation_name") in pairs
    assert ("nation::n_regionkey", "nation2::region_key") in pairs


def test_bind_and_apply(spark, sf_tables, match_profiles):
    src, tgt = match_profiles
    assign = global_assignment(column_match_scores(src, tgt))
    rules_by_src = {
        "nation::n_nationkey": [Rule("is_unique", validate={"type": "unique"})],
        "nation::n_regionkey": [Rule("in_range", validate={"type": "range", "lo": 0, "hi": 4})],
    }
    bound = bind_rules(assign, rules_by_src)
    assert {(t, c, r.name) for t, c, r, _ in bound} == {
        ("nation2", "nation_key", "is_unique"),
        ("nation2", "region_key", "in_range"),
    }
    tgt_df = (
        sf_tables["nation"]
        .withColumnRenamed("n_name", "nation_name")
        .withColumnRenamed("n_nationkey", "nation_key")
        .withColumnRenamed("n_regionkey", "region_key")
    )
    violations, runs = apply_bound_rules(
        spark, {"nation2": tgt_df}, bound, row_id_cols={"nation2": "nation_key"}
    )
    # clean data: unique key holds, regions within range → no violations
    assert violations.count() == 0
    assert runs.count() == 0


def test_transfer_policy(spark):
    cands = spark.createDataFrame(
        [
            ("r1", "universal", 0.2, 1.0),
            ("r2", "table", 0.65, 1.0),   # below 0.7 gate → dropped
            ("r3", "table", 0.8, 0.5),
            ("r4", "instance", 0.95, None),
        ],
        "rule string, level string, similarity double, success_rate double",
    )
    out = {r["rule"]: r["confidence"] for r in transfer_confidence(cands).collect()}
    assert "r2" not in out
    assert out["r1"] == pytest.approx(0.2 * 1.0 * 1.0)
    assert out["r3"] == pytest.approx(0.8 * 0.8 * 0.5)
    assert out["r4"] == pytest.approx(round(0.95 * 0.7, 6))


def test_success_rate_ema(spark):
    stats = spark.createDataFrame([("r1", 1.0), ("r2", 0.5)], "rule string, success_rate double")
    outcomes = spark.createDataFrame([("r1", 0.0)], "rule string, success double")
    out = {r["rule"]: r["success_rate"] for r in update_success_rate(stats, outcomes).collect()}
    assert out["r1"] == pytest.approx(0.9)
    assert out["r2"] == pytest.approx(0.5)  # no outcome → unchanged


def test_name_categories_default_and_model_seam(spark):
    # P21: deterministic trigram default + the embedding_fn model seam
    # (column_name_features.py:57-96,109-137)
    import numpy as np

    from datalakerulegeneration_spark.matching.name_categories import (
        COLUMN_CATEGORY_PROTOTYPES,
        column_name_categories,
    )

    names = ["customer_id", "emailAddress", "unit-price", "start_date"]
    got = {
        r.column_name: r.category
        for r in column_name_categories(spark, names).collect()
    }
    assert got["customer_id"] == "id"
    assert got["emailAddress"] == "email"
    assert got["unit-price"] == "price"
    assert got["start_date"] == "date"

    # fake model: one-hot on whether the text contains the category word
    labels = list(COLUMN_CATEGORY_PROTOTYPES)

    def fake_embed(texts):
        return np.array(
            [[1.0 if lab.split()[0] in t.lower() else 0.0 for lab in labels] for t in texts]
        ) + 1e-6

    got2 = {
        r.column_name: r.category
        for r in column_name_categories(spark, ["the_email_field"], embedding_fn=fake_embed).collect()
    }
    assert got2["the_email_field"] == "email"


def test_semantic_domains_default_and_model_seam(spark):
    # P19: regex default entirely JVM-side + Doduo-shaped model_fn seam
    from datalakerulegeneration_spark.profiling.semantic import semantic_domains

    df = spark.createDataFrame(
        [
            ("a@x.io", "2024-01-02", "hello world"),
            ("b@y.org", "2024-05-06", "free text"),
            ("c@z.net", "2024-07-08", "more text"),
        ],
        "contact string, day string, blurb string",
    )
    got = {r.column: (r.semantic_domain, r.confidence) for r in semantic_domains(df, "t").collect()}
    assert got["contact"] == ("email", 1.0)
    assert got["day"] == ("date", 1.0)
    assert got["blurb"][0] == "unknown"

    calls = {}

    def fake_model(name, values):
        calls[name] = len(values)
        return ("custom:" + name, 0.9)

    got2 = {
        r.column: r.semantic_domain
        for r in semantic_domains(df, "t", model_fn=fake_model, n_sample=2).collect()
    }
    assert got2 == {"contact": "custom:contact", "day": "custom:day", "blurb": "custom:blurb"}
    assert all(n <= 2 for n in calls.values())  # bounded sample reached the model


def test_name_categories_unknown_for_no_overlap(spark):
    """Review fix: a name sharing nothing with any prototype is labeled
    'unknown' (score 0), not the alphabetically-first category."""
    from datalakerulegeneration_spark.matching.name_categories import (
        column_name_categories,
    )

    rows = {r["column_name"]: r for r in column_name_categories(
        spark, ["123", "####", "customer_name"]
    ).collect()}
    assert rows["123"]["category"] == "unknown" and rows["123"]["confidence"] == 0.0
    assert rows["####"]["category"] == "unknown"
    assert rows["customer_name"]["category"] != "unknown"


def test_semantic_domains_fixture_model_end_to_end(spark):
    """P19's model_fn seam driven END-TO-END by the vendored
    deterministic domain model (functions.fixture_embedding
    fixture_domain_model — hashed-trigram prototype centroids, the
    Doduo stand-in): real sampled values flow through applyInPandas to
    the model, classification actually depends on the VALUES (email-
    shaped values → email domain; city names → city), NULL/empty cells
    never reach the model, and the pipeline is deterministic."""
    from datalakerulegeneration_spark.functions.fixture_embedding import (
        fixture_domain_model,
        hashed_trigram_embedding,
    )
    from datalakerulegeneration_spark.profiling.semantic import semantic_domains

    model = fixture_domain_model(
        {
            "email": ["alice@example.com", "bob@mail.org", "x@y.net"],
            "city": ["springfield", "portland", "riverside", "salem"],
        },
        dim=32,
        seed=11,
    )
    df = spark.createDataFrame(
        [
            ("carol@corp.com", "portlandia", None),
            ("dave@site.org", "new salem", ""),
            ("erin@web.net", "riverton", "zz"),
        ],
        "contact string, town string, junk string",
    )
    out = {
        r.column: (r.semantic_domain, r.confidence)
        for r in semantic_domains(df, "t", model_fn=model, n_sample=10).collect()
    }
    assert out["contact"][0] == "email"
    assert out["town"][0] == "city"
    assert 0.0 < out["contact"][1] <= 1.0
    # NULL/'' cells are filtered before the sample: 'junk' has one real
    # value ('zz') and still classifies without the model ever seeing
    # None (the fixture model would crash on str(None) trigram of 'none'
    # matching nothing — more to the point, the sample filter is the
    # contract); determinism across runs
    out2 = {
        r.column: (r.semantic_domain, r.confidence)
        for r in semantic_domains(df, "t", model_fn=model, n_sample=10).collect()
    }
    assert out == out2
    # the model itself is deterministic and tie-stable
    assert model("c", ["springfield"]) == model("c", ["springfield"])
    # empty/trigram-free input → unknown with zero confidence
    assert model("c", [""]) == ("unknown", 0.0)
    # P21's embedding seam rides the same fixture
    from datalakerulegeneration_spark.matching.name_categories import (
        column_name_categories,
    )

    emb = lambda texts: hashed_trigram_embedding(texts, dim=32, seed=11)
    cats = {
        r.column_name: r.category
        for r in column_name_categories(
            spark,
            ["customer_email_address", "customer_email"],
            prototypes={"email": ["email", "e-mail address"], "name": ["name", "full name"]},
            embedding_fn=emb,
        ).collect()
    }
    assert cats["customer_email_address"] == "email"
    assert cats["customer_email"] == "email"
