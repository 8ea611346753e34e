import numpy as np

from oramacore_tpu.index.filter_fields import FilterFields
from oramacore_tpu.types import WhereFilter

CAP = 16


def build():
    ff = FilterFields()
    # docs 0..7
    for d, price in enumerate([5, 10, 15, 20, 25, 30, 35, 40]):
        ff.number("price").insert(d, [price])
    for d in range(8):
        ff.bool_("inStock").insert(d, d % 2 == 0)
    for d, color in enumerate(["red", "blue", "red", "green", "blue", "red", "green", "blue"]):
        ff.string("color").insert(d, [color])
    for d in range(8):
        ff.date("created").insert(d, 1_700_000_000_000 + d * 86_400_000)
    ff.geo("loc").insert(0, 45.0, 9.0)   # Milan-ish
    ff.geo("loc").insert(1, 41.9, 12.5)  # Rome-ish
    return ff


def docs_of(mask):
    return sorted(np.nonzero(mask)[0].tolist())


def test_number_filters():
    ff = build()
    w = WhereFilter.from_json({"price": {"gt": 20}})
    assert docs_of(ff.eval_where(w, CAP)) == [4, 5, 6, 7]
    w = WhereFilter.from_json({"price": {"between": [10, 20]}})
    assert docs_of(ff.eval_where(w, CAP)) == [1, 2, 3]
    w = WhereFilter.from_json({"price": 25})
    assert docs_of(ff.eval_where(w, CAP)) == [4]


def test_bool_and_string_filters():
    ff = build()
    w = WhereFilter.from_json({"inStock": True, "color": "red"})
    assert docs_of(ff.eval_where(w, CAP)) == [0, 2]
    w = WhereFilter.from_json({"color": ["red", "green"]})
    assert docs_of(ff.eval_where(w, CAP)) == [0, 2, 3, 5, 6]


def test_and_or_not_tree():
    ff = build()
    w = WhereFilter.from_json(
        {
            "or": [
                {"price": {"lt": 10}},
                {"and": [{"color": "blue"}, {"inStock": False}]},
            ]
        }
    )
    # price<10 → {0}; blue ∧ odd → {1, 7}
    assert docs_of(ff.eval_where(w, CAP)) == [0, 1, 7]
    w = WhereFilter.from_json({"not": {"color": "red"}, "price": {"lte": 20}})
    assert docs_of(ff.eval_where(w, CAP)) == [1, 3]


def test_date_filter():
    ff = build()
    w = WhereFilter.from_json({"created": {"gte": "2023-11-17"}})
    mask = ff.eval_where(w, CAP)
    assert mask.sum() > 0


def test_geo_radius():
    ff = build()
    w = WhereFilter.from_json(
        {"loc": {"radius": {"coordinates": {"lat": 45.0, "lon": 9.1},
                            "value": 50, "unit": "km"}}}
    )
    assert docs_of(ff.eval_where(w, CAP)) == [0]


def test_geo_polygon():
    ff = build()
    w = WhereFilter.from_json(
        {"loc": {"polygon": {"coordinates": [
            {"lat": 44.0, "lon": 8.0}, {"lat": 46.0, "lon": 8.0},
            {"lat": 46.0, "lon": 10.0}, {"lat": 44.0, "lon": 10.0},
        ]}}}
    )
    assert docs_of(ff.eval_where(w, CAP)) == [0]


def test_facet_helpers():
    ff = build()
    mask = np.ones(CAP, bool)
    counts = ff.strings["color"].value_counts(mask)
    assert counts == {"red": 3, "blue": 3, "green": 2}
    bc = ff.bools["inStock"].counts(mask)
    assert bc == {"true": 4, "false": 4}
    rc = ff.numbers["price"].range_counts([(0, 20), (21, 100)], mask)
    assert rc == [4, 4]


def test_commit_and_tombstones():
    ff = build()
    ff.commit(deleted={0, 1})
    w = WhereFilter.from_json({"price": {"lte": 10}})
    assert docs_of(ff.eval_where(w, CAP)) == []
    w = WhereFilter.from_json({"color": "red"})
    assert docs_of(ff.eval_where(w, CAP)) == [2, 5]


def test_empty_where_returns_none():
    ff = build()
    assert ff.eval_where(WhereFilter.from_json(None), CAP) is None
    assert ff.eval_where(WhereFilter.from_json({}), CAP) is None
