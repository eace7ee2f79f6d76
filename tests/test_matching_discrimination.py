"""Matcher discrimination controls (r12): the matcher must RANK the
right column first under renamed/permuted schemas and REJECT
cross-dataset negatives — identity parity alone (Quintet_Match, r11)
cannot show either. Reference scoring components:
method_2/pipleline_2.py:181-206; assignment :428-477."""

import pytest

from datalakerulegeneration_spark.matching.discrimination import (
    BINDING_THRESHOLD,
    negative_assignment,
    permutation_map,
    permuted_assignment,
)

# the full true permutation (beers header reversed, alignment-free
# labels) — what the Hungarian assignment must recover with the name
# component neutralized
TRUE_PERM = {
    "index": "c10", "id": "c09", "beer_name": "c08", "style": "c07",
    "ounces": "c06", "abv": "c05", "ibu": "c04", "brewery_id": "c03",
    "brewery_name": "c02", "city": "c01", "state": "c00",
}

# the only cross-dataset assignments allowed to clear the binding
# threshold: columns that genuinely exist in both schemas
SHARED_NEGATIVES = {
    ("beers_1::city", "hospital_2::city"),
    ("beers_1::index", "hospital_2::index"),
    ("beers_1::state", "hospital_2::state"),
}


def test_permutation_labels_carry_no_alignment():
    ren = permutation_map()
    assert ren == TRUE_PERM
    assert all(v.startswith("c") and v[1:].isdigit() for v in ren.values())


def test_hungarian_recovers_true_permutation(spark):
    got = permuted_assignment(spark)
    assert {(s.split("::", 1)[1], t.split("::", 1)[1]) for s, t, _ in got} == set(
        TRUE_PERM.items()
    )
    # every true assignment clears the binding threshold with margin:
    # profile components alone give 0.60 (struct 1.0, dist 1.0,
    # type-agree 1.0, no keyword maps in with_tokens=False mode)
    assert min(sc for _, _, sc in got) >= 0.60 > BINDING_THRESHOLD


def test_cross_dataset_negatives_fall_below_threshold(spark):
    got = negative_assignment(spark)
    surviving = {(s, t) for s, t, sc in got if sc >= BINDING_THRESHOLD}
    assert surviving == SHARED_NEGATIVES
    # pinned margin: the best SPURIOUS assignment stays clearly under
    # the threshold (measured 0.5435: beers ounces -> hospital county)
    spurious = [sc for s, t, sc in got if (s, t) not in SHARED_NEGATIVES]
    assert max(spurious) < 0.55 < BINDING_THRESHOLD
    # and the legitimately shared columns score like true matches
    shared = [sc for s, t, sc in got if (s, t) in SHARED_NEGATIVES]
    assert min(shared) > 0.70
