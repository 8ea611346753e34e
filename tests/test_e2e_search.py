"""End-to-end writer→oplog→reader tests, modeled on the reference's
integration suites (src/tests/fulltext_search.rs, filter.rs, facets.rs,
groupby.rs, sort.rs, vector_search.rs, pin_rules.rs, commit.rs)."""

import pytest

from .utils import TestContext, ids_of


@pytest.fixture()
def ctx():
    c = TestContext()
    yield c
    c.close()


def test_fulltext_search_simple(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "title": "The quick brown fox"},
            {"id": "2", "title": "The lazy dog"},
        ]
    )
    out = coll.search({"term": "quick fox"})
    assert out.count == 1
    assert ids_of(out) == ["1"]
    assert out.hits[0].document["title"] == "The quick brown fox"
    assert out.hits[0].id.startswith("index-1:")


def test_fulltext_search_works_after_commit(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([{"id": str(i), "t": f"word{i} common"} for i in range(10)])
    before = coll.search({"term": "common"})
    assert before.count == 10
    ctx.commit_all()
    after = coll.search({"term": "common"})
    assert after.count == 10
    assert coll.search({"term": "word3"}).count == 1


def test_search_documents_order(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "This is a long text with enough words"},
            {"id": "2", "text": "short text"},
        ]
    )
    out = coll.search({"term": "text"})
    # shorter field gets higher normalized TF → doc 2 first
    assert ids_of(out) == ["2", "1"]


def test_limit_and_offset(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [{"id": str(i), "text": "common " * (i + 1)} for i in range(10)]
    )
    page1 = coll.search({"term": "common", "limit": 3})
    assert len(page1.hits) == 3
    assert page1.count == 10
    page2 = coll.search({"term": "common", "limit": 3, "offset": 3})
    assert len(page2.hits) == 3
    assert set(ids_of(page1)).isdisjoint(ids_of(page2))


def test_multi_index_collection(ctx):
    coll = ctx.create_collection()
    idx1 = coll.create_index()
    idx2 = coll.create_index()
    idx1.insert_documents([{"id": "a", "text": "apple pie"}])
    idx2.insert_documents([{"id": "b", "text": "apple juice"}])
    out = coll.search({"term": "apple"})
    assert out.count == 2
    index_ids = {h.id.split(":")[0] for h in out.hits}
    assert index_ids == {"index-1", "index-2"}
    # restrict to one index
    out = coll.search({"term": "apple", "indexes": ["index-1"]})
    assert out.count == 1


def test_threshold(ctx):
    # reference tests/fulltext_search.rs:478
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "The pen is on the table"},
            {"id": "2", "text": "the pen", "text2": "is on the table"},
            {"id": "3", "text": "the pen"},
        ]
    )
    out = coll.search({"term": "the pen is on the table", "threshold": 0.7})
    assert out.count == 2
    out = coll.search({"term": "the pen is on the table", "threshold": 1.0})
    assert out.count == 2
    out = coll.search({"term": "pen", "threshold": 0.0})
    assert out.count == 3
    out = coll.search({"term": "pen", "threshold": 1.0})
    assert out.count == 3
    ctx.commit_all()
    out = coll.search({"term": "the pen is on the table", "threshold": 0.7})
    assert out.count == 2


def test_exact(ctx):
    # reference tests/fulltext_search.rs:603
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "Christopher Nolan"},
            {"id": "2", "text": "Foxes"},
            {"id": "3", "text": "Fox"},
        ]
    )
    assert coll.search({"term": "christoph", "exact": True}).count == 0
    assert coll.search({"term": "christoph", "exact": False}).count == 1
    out = coll.search({"term": "Fox", "exact": True})
    assert ids_of(out) == ["3"]


def test_empty_term(ctx):
    # reference fulltext_search.rs test_fulltext_empty_term: an empty
    # term is MATCH-ALL, before and after commit
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([
        {"id": "1", "text": "The pen is on the table"},
        {"id": "2", "text": "the pen", "text2": "is on the table"},
        {"id": "3", "text": "the pen"},
    ])
    assert coll.search({"term": ""}).count == 3
    ctx.commit_all()
    assert coll.search({"term": ""}).count == 3


def test_filters_where(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "name": "laptop pro", "price": 1200, "inStock": True, "brand": "apex"},
            {"id": "2", "name": "laptop air", "price": 800, "inStock": False, "brand": "apex"},
            {"id": "3", "name": "laptop mini", "price": 500, "inStock": True, "brand": "zen"},
        ]
    )
    out = coll.search({"term": "laptop", "where": {"price": {"lt": 1000}}})
    assert sorted(ids_of(out)) == ["2", "3"]
    out = coll.search({"term": "laptop", "where": {"inStock": True, "brand": "apex"}})
    assert ids_of(out) == ["1"]
    out = coll.search(
        {"term": "laptop", "where": {"or": [{"price": {"gt": 1000}}, {"brand": "zen"}]}}
    )
    assert sorted(ids_of(out)) == ["1", "3"]


def test_filter_unknown_field_errors(ctx):
    from oramacore_tpu.read import ReadError

    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([{"id": "1", "text": "hello"}])
    with pytest.raises(ReadError):
        coll.search({"term": "hello", "where": {"nope": 5}})


def test_facets(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": str(i), "text": "game", "rating": i, "genre": "rpg" if i % 2 else "fps",
             "active": i < 3}
            for i in range(6)
        ]
    )
    out = coll.search(
        {
            "term": "game",
            "facets": {
                "rating": {"ranges": [{"from": 0, "to": 2}, {"from": 3, "to": 5}]},
                "genre": {},
                "active": {"true": True, "false": True},
            },
        }
    )
    assert out.facets["rating"].values == {"0-2": 3, "3-5": 3}
    assert out.facets["genre"].values == {"rpg": 3, "fps": 3}
    assert out.facets["active"].values == {"true": 3, "false": 3}


def test_facets_with_filters_use_unfiltered_scores(ctx):
    # the reference facet quirk (search.rs:345-396)
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": str(i), "text": "game", "genre": "rpg" if i % 2 else "fps"}
            for i in range(6)
        ]
    )
    out = coll.search(
        {
            "term": "game",
            "where": {"genre": "rpg"},
            "facets": {"genre": {}},
        }
    )
    assert out.count == 3  # hits are filtered
    # but facets reflect the unfiltered result set
    assert out.facets["genre"].values == {"rpg": 3, "fps": 3}


def test_group_by(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "shoe red", "color": "red"},
            {"id": "2", "text": "shoe blue", "color": "blue"},
            {"id": "3", "text": "shoe dark red", "color": "red"},
        ]
    )
    out = coll.search(
        {"term": "shoe", "groupBy": {"properties": ["color"], "maxResults": 5}}
    )
    groups = {tuple(g.values): ids_of_group(g) for g in out.groups}
    assert sorted(groups[("red",)]) == ["1", "3"]
    assert groups[("blue",)] == ["2"]


def ids_of_group(g):
    return [h.id.split(":", 1)[1] for h in g.result]


def test_sort_by_number(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "item", "price": 30},
            {"id": "2", "text": "item", "price": 10},
            {"id": "3", "text": "item", "price": 20},
        ]
    )
    out = coll.search({"term": "item", "sortBy": {"property": "price"}})
    assert ids_of(out) == ["2", "3", "1"]
    out = coll.search({"term": "item", "sortBy": {"property": "price", "order": "desc"}})
    assert ids_of(out) == ["1", "3", "2"]


def test_vector_and_hybrid_search(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "greek mythology gods of olympus"},
            {"id": "2", "text": "modern javascript web frameworks"},
        ]
    )
    out = coll.search({"term": "ancient greek gods", "mode": "vector", "similarity": 0.01})
    assert "1" in ids_of(out)
    if out.count == 2:
        assert ids_of(out)[0] == "1"
    out = coll.search({"term": "greek gods", "mode": "hybrid", "similarity": 0.01})
    assert ids_of(out)[0] == "1"


def test_delete_documents(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([{"id": str(i), "text": "target"} for i in range(4)])
    assert coll.search({"term": "target"}).count == 4
    idx.delete_documents(["1", "2"])
    out = coll.search({"term": "target"})
    assert sorted(ids_of(out)) == ["0", "3"]
    ctx.commit_all()
    assert coll.search({"term": "target"}).count == 2


def test_update_document_upsert(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    stats = idx.insert_documents([{"id": "1", "text": "original content"}])
    assert stats.inserted == 1
    stats = idx.insert_documents([{"id": "1", "text": "replaced content"}])
    assert stats.replaced == 1
    assert coll.search({"term": "original"}).count == 0
    out = coll.search({"term": "replaced"})
    assert ids_of(out) == ["1"]


def test_pin_rules(ctx):
    # reference tests/pin_rules.rs:9
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [{"id": str(i), "c": f"c-{i}", "run": f"run-{i}"} for i in range(20)]
    )
    idx.insert_pin_rule(
        {
            "id": "rule-1",
            "conditions": [
                {"pattern": "c", "anchoring": "is"},
                {"pattern": "running", "anchoring": "is", "normalization": "stem"},
            ],
            "consequence": {
                "promote": [
                    {"doc_id": "5", "position": 1},
                    {"doc_id": "7", "position": 2},
                ]
            },
        }
    )
    out = coll.search({"term": "c"})
    assert out.hits[1].id.endswith(":5")
    assert out.hits[2].id.endswith(":7")
    # non-matching term → no promotion of missing docs
    out = coll.search({"term": "zzz"})
    assert out.count == 0


def test_omc_multiplier(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "match word"},
            {"id": "2", "text": "match word", "_omc": 5.0},
        ]
    )
    out = coll.search({"term": "match"})
    assert ids_of(out)[0] == "2"
    assert out.hits[0].score == pytest.approx(out.hits[1].score * 5.0, rel=1e-4)


def test_omc_applies_before_fused_topk(ctx):
    """A doc OUTSIDE the fused top-k candidate set whose OMC boost puts it
    on the page must still surface (ADVICE r1: multipliers must apply
    on-device before top-k, not to the candidate set)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    # 40 strong matches + one weak match with a massive OMC boost; with
    # limit=1 the fused candidate set is only k=16, so "boosted" is far
    # outside it on raw score
    docs = [
        {"id": f"s{i}", "text": "target target target target"}
        for i in range(40)
    ]
    docs.append({"id": "boosted", "text": "target word", "_omc": 100.0})
    idx.insert_documents(docs)
    out = coll.search({"term": "target", "limit": 1})
    assert ids_of(out)[0] == "boosted"
    assert out.count == 41
    # batched path applies OMC before top-k as well
    from oramacore_tpu.types import SearchParams

    batch = ctx.reader.search_batch(
        coll.collection_id, coll.read_key,
        [SearchParams.from_json({"term": "target", "limit": 1})],
    )
    assert batch[0].hits[0].id.endswith(":boosted")
    assert batch[0].count == 41


def test_reload_roundtrip(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "title": "persistent data", "price": 10, "tag": "a"},
            {"id": "2", "title": "volatile data", "price": 20, "tag": "b"},
        ]
    )
    ctx2 = ctx.reload()
    try:
        out = ctx2.reader.search(
            coll.collection_id, coll.read_key,
            __import__("oramacore_tpu.types", fromlist=["SearchParams"]).SearchParams.from_json(
                {"term": "persistent"}
            ),
        )
        assert out.count == 1
        assert out.hits[0].document["title"] == "persistent data"
        # filters survive reload
        out = ctx2.reader.search(
            coll.collection_id, coll.read_key,
            __import__("oramacore_tpu.types", fromlist=["SearchParams"]).SearchParams.from_json(
                {"term": "data", "where": {"price": {"gt": 15}}}
            ),
        )
        assert ids_of(out) == ["2"]
    finally:
        ctx2.close()


def test_replace_index_promotion(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index("main")
    idx.insert_documents([{"id": "1", "text": "old content"}])
    writer = ctx.writer
    temp = writer.create_temporary_index(
        coll.collection_id, coll.write_key, "main"
    )
    writer.insert_documents(
        coll.collection_id, temp.index_id, coll.write_key,
        [{"id": "1", "text": "new content"}],
    )
    writer.replace_index(
        coll.collection_id, coll.write_key, "main", temp.index_id
    )
    ctx.pump()
    out = coll.search({"term": "new"})
    assert out.count == 1
    assert out.hits[0].id.startswith("main:")
    assert coll.search({"term": "old"}).count == 0


def test_reindex(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index("main")
    idx.insert_documents([{"id": str(i), "text": f"doc number {i}"} for i in range(5)])
    ctx.writer.reindex(coll.collection_id, coll.write_key)
    ctx.pump()
    out = coll.search({"term": "doc"})
    assert out.count == 5
    stats = coll.stats()
    assert [i["id"] for i in stats["indexes"]] == ["main"]


def test_auto_mode_with_llm_stub():
    ctx = TestContext(llm_resolve_mode=lambda term: "vector")
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([{"id": "1", "text": "greek gods mythology"}])
        out = coll.search({"term": "greek gods mythology", "mode": "auto"})
        assert out.count >= 1
    finally:
        ctx.close()


def test_stats_and_filterable_fields(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([{"id": "1", "text": "hello", "n": 5, "flag": True}])
    stats = coll.stats()
    assert stats["document_count"] == 1
    fields = ctx.reader.filterable_fields(coll.collection_id, coll.read_key)
    assert fields["n"] == "number"
    assert fields["flag"] == "bool"


def test_late_embedding_lands_via_alias(ctx):
    """After replace_index, in-flight index_embedding ops addressed to the
    temp id must still land through the alias (reference read/index/
    mod.rs:112-118,864)."""
    from oramacore_tpu.oplog import Operation

    coll = ctx.create_collection()
    idx = coll.create_index("main")
    idx.insert_documents([{"id": "1", "text": "aliased doc"}])
    temp = ctx.writer.create_temporary_index(
        coll.collection_id, coll.write_key, "main"
    )
    ctx.writer.insert_documents(
        coll.collection_id, temp.index_id, coll.write_key,
        [{"id": "1", "text": "fresh content"}],
    )
    temp_id = temp.index_id
    ctx.writer.replace_index(
        coll.collection_id, coll.write_key, "main", temp_id
    )
    ctx.pump()
    # simulate a LATE embedding op still addressed to the (gone) temp id
    internal = ctx.reader.collections[coll.collection_id].indexes["main"]
    doc_id = internal.user_to_internal["1"]
    ctx.writer.op_sender.send(
        Operation(
            kind="index_embedding",
            collection=coll.collection_id,
            body={
                "index": temp_id,  # alias target
                "doc_id": doc_id,
                "model": "builtin-minihash-384",
                "vectors": [[0.1] * 384],
            },
        )
    )
    ctx.pump()
    assert internal.vector is not None
    assert internal.vector.n_rows() >= 1


def test_maintenance_loop_commits(tmp_path):
    import time as _t

    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama

    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.commit_interval = 0.2
    cfg.reader_side.commit_interval = 0.2
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=True)
    orama.start_maintenance()
    try:
        coll = orama.write_side.create_collection("mk", "c")
        orama.write_side.create_index("c", coll.write_api_key, "main")
        orama.write_side.insert_documents(
            "c", "main", coll.write_api_key, [{"id": "1", "t": "tick"}]
        )
        orama.write_side.embedding_queue.flush_and_wait()
        deadline = _t.time() + 10
        while _t.time() < deadline:
            if orama.read_side.committed_offset > 0:
                break
            _t.sleep(0.05)
        assert orama.read_side.committed_offset > 0
    finally:
        orama.stop()


def test_group_by_with_sort_by(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "shoe", "color": "red", "price": 30},
            {"id": "2", "text": "shoe", "color": "red", "price": 10},
            {"id": "3", "text": "shoe", "color": "blue", "price": 20},
        ]
    )
    out = coll.search(
        {
            "term": "shoe",
            "groupBy": {"properties": ["color"]},
            "sortBy": {"property": "price"},
        }
    )
    groups = {tuple(g.values): ids_of_group(g) for g in out.groups}
    assert groups[("red",)] == ["2", "1"]  # ascending price within group


def test_search_batch_shared_path(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "t": "red apple pie"},
            {"id": "2", "t": "green apple juice"},
            {"id": "3", "t": "banana split"},
        ]
    )
    ctx.commit_all()
    from oramacore_tpu.types import SearchParams

    params = [
        SearchParams.from_json({"term": "apple"}),
        SearchParams.from_json({"term": "banana"}),
        SearchParams.from_json({"term": "apple pie"}),
        SearchParams.from_json({"term": "nothing matches this zz"}),
    ]
    results = ctx.reader.search_batch(
        coll.collection_id, coll.read_key, params
    )
    assert results[0].count == 2
    assert ids_of(results[1]) == ["3"]
    assert ids_of(results[2])[0] == "1"
    assert results[3].count == 0
    # each matches the single-query path
    for p, batch_result in zip(params, results):
        single = ctx.reader.search(coll.collection_id, coll.read_key, p)
        assert ids_of(single) == ids_of(batch_result)


def test_phrase_boost(ctx):
    """phraseBoost ranks docs containing the query tokens CONSECUTIVELY
    above docs with the same tokens scattered (adjacency shadow terms;
    reference SearchParams phrase_boost knob)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "scattered", "t": "apple sauce and then some red thing"},
            {"id": "phrase", "t": "a bowl of red apple sauce on the table"},
        ]
    )
    # without phrase boost both match the same tokens; 'scattered' wins on
    # field length. With it, the doc containing "red apple" wins.
    base = coll.search({"term": "red apple"})
    assert base.count == 2
    boosted = coll.search({"term": "red apple", "phraseBoost": 3.0})
    assert ids_of(boosted)[0] == "phrase"
    b = {h.id.split(":")[1]: h.score for h in boosted.hits}
    assert b["phrase"] > b["scattered"]
    # committed state keeps the adjacency terms
    ctx.commit_all()
    boosted = coll.search({"term": "red apple", "phraseBoost": 3.0})
    assert ids_of(boosted)[0] == "phrase"


def test_search_batch_hybrid_shared_path(ctx):
    """A homogeneous batch of hybrid queries runs through the fused
    shared path (one embeddings call + one BM25 pass + one fused
    vector/fusion/top-k tail) and matches the per-query hybrid path."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "t": "red apple pie with cinnamon"},
            {"id": "2", "t": "green apple juice"},
            {"id": "3", "t": "banana split dessert"},
            {"id": "4", "t": "chocolate cake"},
        ]
    )
    ctx.commit_all()
    from oramacore_tpu.types import SearchParams

    queries = ["apple pie", "banana dessert", "chocolate", "zz no match"]
    params = [
        SearchParams.from_json({"mode": "hybrid", "term": q, "similarity": 0.1})
        for q in queries
    ]
    results = ctx.reader.search_batch(coll.collection_id, coll.read_key, params)
    for p, batch_result in zip(params, results):
        single = ctx.reader.search(coll.collection_id, coll.read_key, p)
        assert ids_of(single) == ids_of(batch_result)
        assert single.count == batch_result.count
        for hs, hb in zip(single.hits, batch_result.hits):
            assert hb.score == pytest.approx(hs.score, rel=1e-4)


def test_search_batch_falls_back_for_filters(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [{"id": "1", "t": "thing", "n": 1}, {"id": "2", "t": "thing", "n": 2}]
    )
    from oramacore_tpu.types import SearchParams

    params = [
        SearchParams.from_json({"term": "thing", "where": {"n": {"gt": 1}}}),
        SearchParams.from_json({"term": "thing"}),
    ]
    results = ctx.reader.search_batch(
        coll.collection_id, coll.read_key, params
    )
    assert ids_of(results[0]) == ["2"]
    assert results[1].count == 2


def test_field_boost(ctx):
    # reference tests: boost_integration.rs — boosting a field reorders hits
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "title": "banana", "body": "apple apple apple"},
            {"id": "2", "title": "apple", "body": "banana banana banana"},
        ]
    )
    out = coll.search({"term": "apple", "boost": {"title": 10.0}})
    assert ids_of(out)[0] == "2"
    out = coll.search({"term": "apple", "boost": {"body": 10.0}})
    assert ids_of(out)[0] == "1"


def test_geosearch_e2e(ctx):
    # reference tests: geosearch.rs
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "milan", "name": "office milan", "loc": {"lat": 45.46, "lon": 9.19}},
            {"id": "rome", "name": "office rome", "loc": {"lat": 41.90, "lon": 12.49}},
            {"id": "nyc", "name": "office nyc", "loc": {"lat": 40.71, "lon": -74.0}},
        ]
    )
    out = coll.search(
        {"term": "office",
         "where": {"loc": {"radius": {"coordinates": {"lat": 45.0, "lon": 9.0},
                                       "value": 100, "unit": "km"}}}}
    )
    assert ids_of(out) == ["milan"]
    out = coll.search(
        {"term": "office",
         "where": {"loc": {"polygon": {"coordinates": [
             {"lat": 36.0, "lon": 6.0}, {"lat": 47.5, "lon": 6.0},
             {"lat": 47.5, "lon": 19.0}, {"lat": 36.0, "lon": 19.0}]}}}}
    )
    assert sorted(ids_of(out)) == ["milan", "rome"]


def test_date_filter_e2e(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "old", "t": "event", "when": {"gte": 0}},  # not a date field
        ]
    )
    # declare date semantics by filtering with date strings on a number col
    coll2 = ctx.create_collection()
    idx2 = coll2.create_index()
    import time as _t
    from oramacore_tpu.types import parse_date_to_epoch_ms

    idx2.insert_documents(
        [
            {"id": "a", "t": "meeting", "at": parse_date_to_epoch_ms("2024-01-15")},
            {"id": "b", "t": "meeting", "at": parse_date_to_epoch_ms("2025-06-20")},
        ]
    )
    out = coll2.search(
        {"term": "meeting", "where": {"at": {"gte": "2025-01-01"}}}
    )
    assert ids_of(out) == ["b"]


def test_reindex_with_language_change(ctx):
    """Reindex with a new locale retokenizes every stored document
    (reference write/mod.rs:494-639 change_runtime_config)."""
    coll = ctx.create_collection(language="en")
    idx = coll.create_index("main")
    idx.insert_documents([{"id": "1", "text": "running foxes"}])
    # english stemming active: 'run' matches 'running'
    assert coll.search({"term": "run"}).count == 1
    ctx.writer.reindex(coll.collection_id, coll.write_key, language="it")
    ctx.pump()
    # italian tokenizer has no english stemmer: 'run' no longer matches
    assert coll.search({"term": "run"}).count == 0
    assert coll.search({"term": "running"}).count == 1
    stats = coll.stats()
    assert stats["indexes"][0]["locale"] == "italian"


def test_search_batch_with_filters_uses_shared_masked_path(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [{"id": str(i), "t": "widget", "price": i * 10} for i in range(10)]
    )
    ctx.commit_all()
    from oramacore_tpu.types import SearchParams

    params = [
        SearchParams.from_json({"term": "widget", "where": {"price": {"lt": 30}}}),
        SearchParams.from_json({"term": "widget", "where": {"price": {"gte": 70}}}),
        SearchParams.from_json({"term": "widget"}),
    ]
    results = ctx.reader.search_batch(coll.collection_id, coll.read_key, params)
    assert sorted(ids_of(results[0])) == ["0", "1", "2"]
    assert sorted(ids_of(results[1])) == ["7", "8", "9"]
    assert results[2].count == 10
    # scores match the per-query (filtered-IDF) path exactly
    for p, batch_r in zip(params, results):
        single = ctx.reader.search(coll.collection_id, coll.read_key, p)
        assert ids_of(single) == ids_of(batch_r)
        for hs, hb in zip(single.hits, batch_r.hits):
            assert abs(hs.score - hb.score) < 1e-4


def test_multilocale_stemming(tmp_path):
    """Italian light stemming: singular query matches plural doc."""
    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.types import SearchParams

    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    try:
        coll = orama.write_side.create_collection("mk", "c", language="it")
        orama.write_side.create_index("c", coll.write_api_key, "main")
        orama.write_side.insert_documents(
            "c", "main", coll.write_api_key,
            [{"id": "1", "testo": "le case grandi"}],
        )
        orama.write_side.embedding_queue.flush_and_wait()
        orama.read_side.pump()
        out = orama.read_side.search(
            "c", coll.read_api_key, SearchParams.from_json({"term": "casa"})
        )
        assert out.count == 1  # 'casa' stems to 'cas' ~ 'case' -> 'cas'
    finally:
        orama.stop()


def test_secret_passed_to_before_search_hook(tmp_path):
    import json as _json

    from oramacore_tpu.ai.hooks import HooksRuntime
    from oramacore_tpu.config import OramacoreConfig, SecretsConfig
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.types import SearchParams

    secrets_file = tmp_path / "secrets.json"
    secrets_file.write_text(_json.dumps({"c": "super-secret"}))
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path / "data")
    cfg.auth.master_api_key = "mk"
    cfg.secrets = SecretsConfig(provider="local", path=str(secrets_file))
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    try:
        orama.read_side.hooks_runtime = HooksRuntime()
        coll = orama.write_side.create_collection("mk", "c")
        orama.write_side.create_index("c", coll.write_api_key, "main")
        orama.write_side.insert_documents(
            "c", "main", coll.write_api_key, [{"id": "1", "t": "hello"}]
        )
        # hook echoes the secret into the rewritten term
        orama.write_side.set_hook(
            "c", coll.write_api_key, "BeforeSearch",
            "def BeforeSearch(inp):\n"
            "    assert inp['secret'] == 'super-secret'\n"
            "    return {'term': inp['term']}",
        )
        orama.write_side.embedding_queue.flush_and_wait()
        orama.read_side.pump()
        out = orama.read_side.search(
            "c", coll.read_api_key, SearchParams.from_json({"term": "hello"})
        )
        assert out.count == 1  # hook ran without assertion error
    finally:
        orama.stop()


def test_per_field_bm25_params(ctx):
    """Index-level field weight makes a field dominate scoring
    (reference BM25FFieldParams weight/b, bm25.rs:49-63)."""
    coll = ctx.create_collection()
    ctx.writer.create_index(
        coll.collection_id, coll.write_key, "weighted",
        field_params={"title": {"weight": 10.0, "b": 0.75}},
    )
    ctx.pump()
    ctx.writer.insert_documents(
        coll.collection_id, "weighted", coll.write_key,
        [
            {"id": "1", "title": "banana", "body": "apple apple apple"},
            {"id": "2", "title": "apple", "body": "banana banana banana"},
        ],
    )
    ctx.pump()
    out = coll.search({"term": "apple"})
    # no query boost, but the configured title weight wins
    assert ids_of(out)[0] == "2"


def test_geo_polygon_e2e(ctx):
    """Polygon containment through the full search pipeline (reference
    geosearch.rs polygon cases)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([
        {"id": "inside", "t": "spot", "loc": {"lat": 1.0, "lon": 1.0}},
        {"id": "outside", "t": "spot", "loc": {"lat": 5.0, "lon": 5.0}},
        {"id": "edgeish", "t": "spot", "loc": {"lat": 0.5, "lon": 1.5}},
    ])
    square = {
        "polygon": {
            "coordinates": [
                {"lat": 0.0, "lon": 0.0}, {"lat": 0.0, "lon": 2.0},
                {"lat": 2.0, "lon": 2.0}, {"lat": 2.0, "lon": 0.0},
            ]
        }
    }
    out = coll.search({"term": "spot", "where": {"loc": square}})
    got = {h.id.split(":")[1] for h in out.hits}
    assert got == {"inside", "edgeish"}
    # inverted: outside the polygon
    square_out = {"polygon": dict(square["polygon"], inside=False)}
    out = coll.search({"term": "spot", "where": {"loc": square_out}})
    assert {h.id.split(":")[1] for h in out.hits} == {"outside"}


def test_shelves_and_values_replicate_and_persist(ctx):
    """Shelves (curated doc lists) + values (hook-visible KV) replicate
    through the op log and survive reload (reference shelves.rs,
    values.rs)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([{"id": "1", "t": "x"}])
    w = ctx.writer
    w.insert_shelf(coll.collection_id, coll.write_key,
                   {"id": "s1", "name": "Deals", "items": ["1"]})
    w.set_value(coll.collection_id, coll.write_key, "banner", "SALE")
    ctx.pump()
    rcoll = ctx.reader.collections[coll.collection_id]
    assert rcoll.shelves["s1"]["name"] == "Deals"
    assert rcoll.values["banner"] == "SALE"
    # delete one value, keep the shelf; reload round-trips both states
    w.delete_value(coll.collection_id, coll.write_key, "banner")
    ctx.pump()
    ctx2 = ctx.reload()
    try:
        rcoll = ctx2.reader.collections[coll.collection_id]
        assert rcoll.shelves["s1"]["items"] == ["1"]
        assert "banner" not in rcoll.values
    finally:
        ctx2.orama.stop()


def test_search_batch_vector_single_dispatch(ctx):
    """A homogeneous batch of pure-vector queries runs as one embeddings
    call + one device top-k dispatch and matches per-query results."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "t": "greek mythology gods of olympus", "n": 1},
            {"id": "2", "t": "modern javascript web frameworks", "n": 2},
            {"id": "3", "t": "fresh fruit salad with banana", "n": 3},
            {"id": "4", "t": "ancient roman empire history", "n": 4},
        ]
    )
    ctx.commit_all()
    from oramacore_tpu.types import SearchParams

    queries = ["greek gods", "web framework", "banana fruit"]
    params = [
        SearchParams.from_json(
            {"mode": "vector", "term": q, "similarity": 0.05}
        )
        for q in queries
    ]
    results = ctx.reader.search_batch(coll.collection_id, coll.read_key, params)
    for p, batch_result in zip(params, results):
        single = ctx.reader.search(coll.collection_id, coll.read_key, p)
        assert ids_of(single) == ids_of(batch_result)
        assert single.count == batch_result.count
        for hs, hb in zip(single.hits, batch_result.hits):
            assert hb.score == pytest.approx(hs.score, rel=1e-4)
    # a filtered vector query falls back to the per-query path
    params_f = [
        SearchParams.from_json(
            {"mode": "vector", "term": "greek gods", "similarity": 0.05,
             "where": {"n": {"gt": 100}}}
        ),
        params[1],
    ]
    out = ctx.reader.search_batch(coll.collection_id, coll.read_key, params_f)
    assert out[0].count == 0
