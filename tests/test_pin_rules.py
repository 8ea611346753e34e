"""Pin-rule (merchandising) suite modeled on the reference's
tests/pin_rules.rs (1,137 lines): anchoring modes, stem normalization,
multi-condition/multi-rule interaction, promoted-doc edge cases,
pagination interaction, lifecycle (update/delete/persistence).
"""

import pytest

from .utils import TestContext


@pytest.fixture()
def ctx():
    c = TestContext()
    yield c
    c.close()


def ids_of(result):
    return [h.id.split(":", 1)[1] for h in result.hits]


def seeded(ctx, n=8):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [{"id": str(i), "t": f"common term doc{i}", "rank": i}
         for i in range(n)]
    )
    return coll, idx


def rule(rid, pattern, anchoring="is", promote=None, normalization=None):
    cond = {"pattern": pattern, "anchoring": anchoring}
    if normalization:
        cond["normalization"] = normalization
    return {
        "id": rid,
        "conditions": [cond],
        "consequence": {"promote": promote or []},
    }


# ---------------------------------------------------------------------------
# anchoring modes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("anchoring,pattern,matching,non_matching", [
    ("is", "common term", "common term", "common"),
    ("starts_with", "comm", "common term", "term common"),
    ("ends_with", "term", "common term", "term common x"),
    ("contains", "mon te", "common term", "co term"),
])
def test_anchoring_modes(ctx, anchoring, pattern, matching, non_matching):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", pattern, anchoring,
        promote=[{"doc_id": "7", "position": 0}],
    ))
    out = coll.search({"term": matching})
    assert ids_of(out)[0] == "7", (anchoring, pattern)
    out = coll.search({"term": non_matching})
    if out.hits:
        assert ids_of(out)[0] != "7" or out.hits[0].score > 0


def test_stem_normalization_condition(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", "running", "is", normalization="stem",
        promote=[{"doc_id": "3", "position": 0}],
    ))
    # "runs" stems to the same root as "running"
    out = coll.search({"term": "runs"})
    # no text matches "runs", but the promoted doc is injected at 0
    assert ids_of(out)[0] == "3"


# ---------------------------------------------------------------------------
# promotion placement edge cases
# ---------------------------------------------------------------------------

def test_promote_multiple_positions_order(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[
            {"doc_id": "5", "position": 0},
            {"doc_id": "6", "position": 2},
        ],
    ))
    out = coll.search({"term": "common term"})
    got = ids_of(out)
    assert got[0] == "5"
    assert got[2] == "6"


def test_promote_position_past_end_clamps(ctx):
    coll, idx = seeded(ctx, n=3)
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "1", "position": 99}],
    ))
    out = coll.search({"term": "common"})
    got = ids_of(out)
    assert got[-1] == "1"          # clamped to the end
    assert got.count("1") == 1     # not duplicated


def test_promoted_doc_outside_result_set_gets_injected(ctx):
    coll, idx = seeded(ctx)
    idx.insert_documents([{"id": "odd", "t": "completely different text"}])
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "odd", "position": 1}],
    ))
    out = coll.search({"term": "common term"})
    got = ids_of(out)
    assert got[1] == "odd"
    # injected docs carry score 0.0 (sort.rs:330-368 semantics)
    assert out.hits[1].score == 0.0


def test_promote_unknown_doc_is_ignored(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "ghost-doc", "position": 0}],
    ))
    out = coll.search({"term": "common term"})
    assert out.count > 0
    assert "ghost-doc" not in ids_of(out)


def test_non_matching_term_no_promotion(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", "special offer", "is",
        promote=[{"doc_id": "0", "position": 0}],
    ))
    out = coll.search({"term": "common term"})
    # ranking unchanged: promoted doc not forced to front
    assert out.hits[0].score >= out.hits[-1].score


# ---------------------------------------------------------------------------
# multiple rules / conditions
# ---------------------------------------------------------------------------

def test_multiple_rules_compose(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "4", "position": 0}],
    ))
    idx.insert_pin_rule(rule(
        "r2", "term", "contains",
        promote=[{"doc_id": "5", "position": 1}],
    ))
    out = coll.search({"term": "common term"})
    got = ids_of(out)
    assert got[0] == "4" and got[1] == "5"


def test_any_condition_triggers(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule({
        "id": "multi",
        "conditions": [
            {"pattern": "zzz", "anchoring": "is"},
            {"pattern": "common", "anchoring": "starts_with"},
        ],
        "consequence": {"promote": [{"doc_id": "2", "position": 0}]},
    })
    out = coll.search({"term": "common term"})
    assert ids_of(out)[0] == "2"


def test_duplicate_consequences_dedup(ctx):
    coll, idx = seeded(ctx)
    for rid in ("a", "b"):
        idx.insert_pin_rule(rule(
            rid, "common", "starts_with",
            promote=[{"doc_id": "3", "position": 0}],
        ))
    out = coll.search({"term": "common term"})
    assert ids_of(out).count("3") == 1


# ---------------------------------------------------------------------------
# pagination interaction (sort.rs:25-46 doubles top-k under pin rules)
# ---------------------------------------------------------------------------

def test_promotion_with_pagination(ctx):
    coll, idx = seeded(ctx, n=8)
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "7", "position": 0}],
    ))
    page1 = coll.search({"term": "common term", "limit": 3})
    assert ids_of(page1)[0] == "7"
    page2 = coll.search({"term": "common term", "limit": 3, "offset": 3})
    # the promoted doc occupies slot 0; page 2 must not repeat it
    assert "7" not in ids_of(page2)
    assert len(ids_of(page2)) == 3


# ---------------------------------------------------------------------------
# lifecycle: update, delete, persistence, replication
# ---------------------------------------------------------------------------

def test_rule_update_replaces(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "1", "position": 0}],
    ))
    # re-insert with the same id but a different consequence
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "2", "position": 0}],
    ))
    out = coll.search({"term": "common term"})
    got = ids_of(out)
    assert got[0] == "2"
    assert got.count("1") <= 1  # old consequence gone from slot 0


def test_rule_delete(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "6", "position": 0}],
    ))
    assert ids_of(coll.search({"term": "common term"}))[0] == "6"
    ctx.writer.delete_pin_rule(coll.collection_id, coll.write_key, "r1")
    ctx.pump()
    out = coll.search({"term": "common term"})
    assert ids_of(out)[0] != "6" or out.hits[0].score > 0


def test_rules_survive_reload(ctx):
    coll, idx = seeded(ctx)
    idx.insert_pin_rule(rule(
        "r1", "common", "starts_with",
        promote=[{"doc_id": "5", "position": 0}],
    ))
    ctx2 = ctx.reload()
    try:
        out = ctx2.reader.search(
            coll.collection_id, coll.read_key,
            __import__("oramacore_tpu.types", fromlist=["SearchParams"])
            .SearchParams.from_json({"term": "common term"}),
        )
        assert [h.id.split(":", 1)[1] for h in out.hits][0] == "5"
    finally:
        ctx2.orama.stop()
