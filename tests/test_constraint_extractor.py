"""Table-driven constraint-extractor suite matching the reference grammar
(src/ai/constraint_extractor.rs:103-839): numeric ops + currency forms,
context field hints, string-enum + synonym matching, boolean patterns,
multi-field disambiguation, validation, injection, shared budget.
"""

import pytest

from oramacore_tpu.ai.constraint_extractor import (
    BoolConstraint,
    NumericConstraint,
    StringEnumConstraint,
    extract_boolean_constraints,
    extract_constraints,
    extract_numeric_constraints,
    extract_string_enum_constraints,
    find_best_field_match,
    format_constraints_for_prompt,
    has_shared_budget,
    inject_constraints,
    match_numeric_constraints,
    shared_budget_amount,
    validate_search_params,
)

# (query, expected op, value, upper, field_hint)
NUMERIC_CASES = [
    # --- lte family ---
    ("headphones under $100", "lte", 100.0, None, "price"),
    ("laptop below 1500", "lte", 1500.0, None, None),
    ("gifts less than 25 dollars", "lte", 25.0, None, "price"),
    ("max 300 price", "lte", 300.0, None, "price"),
    ("maximum of 50", "lte", 50.0, None, None),
    ("up to €80", "lte", 80.0, None, "price"),
    ("no more than 45", "lte", 45.0, None, None),
    ("within 200 budget", "lte", 200.0, None, "price"),
    ("budget of $500", "lte", 500.0, None, "price"),
    ("something cheaper than 60", "lte", 60.0, None, "price"),
    ("at most 99.99", "lte", 99.99, None, None),
    # --- gte family ---
    ("rated over 4 stars", "gte", 4.0, None, "rating"),
    ("above $250", "gte", 250.0, None, "price"),
    ("more than 100 reviews", "gte", 100.0, None, "rating"),
    ("min 20", "gte", 20.0, None, None),
    ("minimum of 8 gb", "gte", 8.0, None, None),
    ("at least 4.5 rating", "gte", 4.5, None, "rating"),
    ("starting from usd 30", "gte", 30.0, None, "price"),
    ("no less than 12", "gte", 12.0, None, None),
    # --- between family ---
    ("between $50 and $150", "between", 50.0, 150.0, "price"),
    ("between 10 and 20 kg weight", "between", 10.0, 20.0, "weight"),
    ("from 100 to 200", "between", 100.0, 200.0, None),
    ("from £5 to £9", "between", 5.0, 9.0, "price"),
    ("$50-$150 range", "between", 50.0, 150.0, "price"),
    ("usd 30 - 90", "between", 30.0, 90.0, "price"),
    ("€20–40", "between", 20.0, 40.0, "price"),
    # --- eq family ---
    ("exactly $42", "eq", 42.0, None, "price"),
    ("precisely 7", "eq", 7.0, None, None),
    # --- decimals / currency-word forms ---
    ("under gbp 19.99", "lte", 19.99, None, "price"),
    ("over eur 3.5", "gte", 3.5, None, "price"),
]


@pytest.mark.parametrize("query,op,value,upper,hint", NUMERIC_CASES)
def test_numeric_grammar(query, op, value, upper, hint):
    cs = extract_numeric_constraints(query)
    assert cs, query
    c = cs[0]
    assert c.op == op, (query, c)
    assert c.value == pytest.approx(value)
    if upper is None:
        assert c.upper is None
    else:
        assert c.upper == pytest.approx(upper)
    assert c.field_hint == hint, (query, c.field_hint)


def test_no_numbers_no_constraints():
    assert extract_numeric_constraints("plain text query") == []
    # plain numeric ranges WITHOUT currency are not price ranges
    assert not any(
        c.op == "between"
        for c in extract_numeric_constraints("2-3 bedroom apartment")
    )


def test_between_suppresses_bound_words():
    # "between X and Y" phrasing must not ALSO emit lte/gte constraints
    cs = extract_numeric_constraints("between $50 and $150")
    assert [c.op for c in cs] == ["between"]


def test_range_dedup_with_between():
    cs = extract_numeric_constraints("between $50 and $150, i.e. $50-$150")
    assert sum(1 for c in cs if c.op == "between") == 1


def test_dollar_anywhere_hints_price():
    cs = extract_numeric_constraints("gaming laptop under 1000 with $ deals")
    assert cs[0].field_hint == "price"


# --- string enums -----------------------------------------------------------

def test_string_enum_direct_and_synonym():
    props = {"gender": ["male", "female", "unisex"], "color": ["red", "blue"]}
    cs = extract_string_enum_constraints("red running shoes for men", props)
    got = {(c.field_name, c.matched_value) for c in cs}
    assert ("color", "red") in got
    assert ("gender", "male") in got  # "for men" -> male synonym
    cs = extract_string_enum_constraints("women's boots", props)
    assert ("gender", "female") in {(c.field_name, c.matched_value) for c in cs}
    cs = extract_string_enum_constraints("shoes for kids", {"aud": ["kids"]})
    assert cs and cs[0].matched_value == "kids"


# --- booleans ---------------------------------------------------------------

def test_boolean_patterns():
    cs = extract_boolean_constraints("in stock headphones", ["inStock"])
    assert cs and cs[0].value is True and cs[0].field_hint == "inStock"
    cs = extract_boolean_constraints("items on sale", ["onSale", "inStock"])
    assert cs and cs[0].value is True and cs[0].field_hint == "onSale"
    cs = extract_boolean_constraints("out of stock products", ["available"])
    # negative phrase wins; field matched via availability keywords
    assert cs and cs[0].value is False and cs[0].field_hint == "available"
    assert extract_boolean_constraints("in stock", []) == []


def test_single_bool_field_fallback():
    cs = extract_boolean_constraints("featured items", ["weird_flag"])
    assert cs and cs[0].field_hint == "weird_flag"


# --- field matching ---------------------------------------------------------

def test_match_numeric_single_field_takes_all():
    cs = extract_numeric_constraints("under 100 and over 10")
    m = match_numeric_constraints(cs, ["price"])
    assert {f for f, _ in m} == {"price"}
    assert len(m) == len(cs)


def test_match_numeric_multi_field_hints():
    # hints use a +-30/50 char context window (reference :262), so keep
    # the price and rating phrases far enough apart
    cs = extract_numeric_constraints(
        "price under $500 for this camera and it should come with "
        "a review rating of at least 4 stars"
    )
    m = dict((c.op, f) for f, c in match_numeric_constraints(
        cs, ["fullPrice", "avg_rating"]
    ))
    assert m["lte"] == "fullPrice"
    assert m["gte"] == "avg_rating"


def test_find_best_field_match():
    assert find_best_field_match("price", ["fullPrice", "rating"]) == "fullPrice"
    assert find_best_field_match("product_price", ["price"]) == "price"
    assert find_best_field_match("rating", ["price"]) is None


# --- validation + injection -------------------------------------------------

def test_validate_and_inject_numeric():
    cs = extract_constraints("shoes under 80")
    missing = validate_search_params({"term": "shoes"}, cs, ["price"])
    assert missing == cs
    sp = inject_constraints({"term": "shoes"}, missing, ["price"])
    assert sp["where"]["price"] == {"lte": 80}
    # params already carrying the field pass validation untouched
    ok = {"term": "shoes", "where": {"price": {"lt": 70}}}
    assert validate_search_params(ok, cs, ["price"]) == []


def test_validate_sees_nested_and_or():
    cs = extract_constraints("under 80")
    sp = {"where": {"and": [{"price": {"lte": 80}}, {"tag": "x"}]}}
    assert validate_search_params(sp, cs, ["price"]) == []
    sp = {"where": {"not": {"price": {"gt": 80}}}}
    assert validate_search_params(sp, cs, ["price"]) == []


def test_inject_enum_and_bool():
    missing = [
        StringEnumConstraint("gender", "male", "for men"),
        BoolConstraint(True, "in stock", "inStock"),
    ]
    sp = inject_constraints({"term": "shoes"}, missing, [])
    assert sp["where"]["gender"] == "male"
    assert sp["where"]["inStock"] is True


def test_inject_between():
    missing = [NumericConstraint("between", 50.0, 150.0, "$50-$150")]
    sp = inject_constraints({}, missing, ["price"])
    assert sp["where"]["price"] == {"between": [50, 150]}


# --- prompt formatting ------------------------------------------------------

def test_format_constraints_for_prompt():
    cs = extract_constraints(
        "red shoes under $80", {"color": ["red"]}, []
    )
    text = format_constraints_for_prompt(cs, ["price"])
    assert "- price: lte 80.0" in text
    assert '- color: "red"' in text
    assert format_constraints_for_prompt([], ["price"]) == (
        "No constraints detected."
    )


# --- shared budget ----------------------------------------------------------

@pytest.mark.parametrize("query,expected", [
    ("a keyboard and a mouse, total budget of $200", True),
    ("laptop and monitor, $1000 for both, max 1000", True),
    ("spend up to 300 altogether on gifts", True),
    ("a mouse under 50", False),                # no coordination language
    ("total chaos", False),                     # no budget number
])
def test_has_shared_budget(query, expected):
    assert has_shared_budget(query) is expected


def test_shared_budget_amount():
    assert shared_budget_amount(
        "a keyboard and a mouse, total budget of $200"
    ) == pytest.approx(200.0)
    assert shared_budget_amount("a mouse under 50") is None
