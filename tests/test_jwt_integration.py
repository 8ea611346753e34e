"""JWT auth through the engine (reference tests: customer_jwt_search.rs,
api_key_chain.rs, claim_limitations.rs)."""

import time

import pytest

from oramacore_tpu.auth import make_hs256_token
from oramacore_tpu.config import JwtProviderConfig, OramacoreConfig
from oramacore_tpu.read import ReadError
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams
from oramacore_tpu.write import WriteError

SECRET = "jwt-secret"


def engine(tmp_path):
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.auth.jwt_providers = [
        JwtProviderConfig(issuer="iss", audience="aud", hs256_secret=SECRET)
    ]
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    coll = orama.write_side.create_collection("mk", "c")
    orama.write_side.create_index("c", coll.write_api_key, "main")
    orama.write_side.insert_documents(
        "c", "main", coll.write_api_key, [{"id": "1", "t": "hello jwt"}]
    )
    orama.write_side.embedding_queue.flush_and_wait()
    orama.read_side.pump()
    return orama, coll


def token(**extra):
    payload = {"iss": "iss", "aud": "aud", "exp": time.time() + 300}
    payload.update(extra)
    return make_hs256_token(SECRET, payload)


def test_customer_jwt_search(tmp_path):
    orama, coll = engine(tmp_path)
    try:
        out = orama.read_side.search(
            "c", token(collectionID="c"),
            SearchParams.from_json({"term": "hello"}),
        )
        assert out.count == 1
        # wrong collection scope
        with pytest.raises(ReadError):
            orama.read_side.search(
                "c", token(collectionID="other"),
                SearchParams.from_json({"term": "hello"}),
            )
        # bad signature
        bad = make_hs256_token("wrong", {"iss": "iss", "aud": "aud"})
        with pytest.raises(ReadError):
            orama.read_side.search(
                "c", bad, SearchParams.from_json({"term": "hello"})
            )
        # validly-signed token WITHOUT a collection binding must be
        # rejected (ADVICE r1: unbound tokens read every collection)
        with pytest.raises(ReadError):
            orama.read_side.search(
                "c", token(), SearchParams.from_json({"term": "hello"})
            )
        # orak-style claim binding (reference collection.rs
        # check_read_api_key: claims.orak == read_api_key)
        out = orama.read_side.search(
            "c", token(orak=coll.read_api_key),
            SearchParams.from_json({"term": "hello"}),
        )
        assert out.count == 1
        with pytest.raises(ReadError):
            orama.read_side.search(
                "c", token(orak="some-other-key"),
                SearchParams.from_json({"term": "hello"}),
            )
    finally:
        orama.stop()


def test_dashboard_jwt_write_with_claim_limit(tmp_path):
    orama, coll = engine(tmp_path)
    try:
        t = token(collectionID="c", max_docs=2)
        stats = orama.write_side.insert_documents(
            "c", "main", t, [{"id": "2", "t": "second"}]
        )
        assert stats.inserted == 1
        # limit reached (2 docs present, max 2)
        with pytest.raises(WriteError) as e:
            orama.write_side.insert_documents(
                "c", "main", t, [{"id": "3", "t": "third"}]
            )
        assert e.value.status == 403
    finally:
        orama.stop()


# ---------------------------------------------------------------------------
# api key chain (reference api_key_chain.rs) and claim-limit formula
# (reference claim_limitations.rs)
# ---------------------------------------------------------------------------

def test_api_key_chain(tmp_path):
    """Master key can insert; write key can SEARCH; master key can
    search (api_key_chain.rs)."""
    orama, coll = engine(tmp_path)
    try:
        # master key inserts
        stats = orama.write_side.insert_documents(
            "c", "main", "mk", [{"id": "m", "t": "master inserted doc"}]
        )
        assert stats.inserted == 1
        orama.read_side.pump()
        # write key searches
        out = orama.read_side.search(
            "c", coll.write_api_key, SearchParams.from_json({"term": "master"})
        )
        assert out.count == 1
        # master key searches
        out = orama.read_side.search(
            "c", "mk", SearchParams.from_json({"term": "hello"})
        )
        assert out.count == 1
        # an unrelated key still fails
        with pytest.raises(ReadError):
            orama.read_side.search(
                "c", "nope", SearchParams.from_json({"term": "hello"})
            )
    finally:
        orama.stop()


def test_write_key_search_survives_reload(tmp_path):
    orama, coll = engine(tmp_path)
    orama.write_side.commit()
    orama.read_side.commit(force=True)
    orama.stop()
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    orama2 = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    try:
        out = orama2.read_side.search(
            "c", coll.write_api_key, SearchParams.from_json({"term": "hello"})
        )
        assert out.count == 1
    finally:
        orama2.stop()


def test_claim_limit_zero_rejects_any_insert(tmp_path):
    """max_doc_count 0 rejects every insert (claim_limitations.rs
    test_doc_limitation_zero)."""
    orama, coll = engine(tmp_path)
    try:
        t = token(collectionID="c", max_docs=0)
        with pytest.raises(WriteError) as e:
            orama.write_side.insert_documents(
                "c", "main", t, [{"id": "z", "t": "x"}]
            )
        assert e.value.status == 403
    finally:
        orama.stop()


def test_claim_limit_counts_incoming_batch(tmp_path):
    """The limit applies to the POST-insert total: a batch that would
    cross the limit is rejected whole (claim_limitations.rs
    test_doc_limitation_some)."""
    orama, coll = engine(tmp_path)
    try:
        t = token(collectionID="c", max_docs=5)
        # 1 doc exists; inserting 4 → 5 <= 5 passes
        stats = orama.write_side.insert_documents(
            "c", "main", t,
            [{"id": f"b{i}", "t": "bulk"} for i in range(4)],
        )
        assert stats.inserted == 4
        # inserting 1 more → 6 > 5 rejected
        with pytest.raises(WriteError) as e:
            orama.write_side.insert_documents(
                "c", "main", t, [{"id": "overflow", "t": "x"}]
            )
        assert e.value.status == 403
    finally:
        orama.stop()


def test_claim_limit_temp_index_excludes_linked_runtime(tmp_path):
    """Temp-index inserts count as temp + all_runtime - linked_runtime
    (claim_limitations.rs test_temp_index_doc_limitation): the linked
    runtime index's docs are excluded because promotion replaces them."""
    orama, coll = engine(tmp_path)
    try:
        wk = coll.write_api_key
        # grow the runtime index to 10 docs (1 exists)
        orama.write_side.insert_documents(
            "c", "main", wk,
            [{"id": f"r{i}", "t": "runtime doc"} for i in range(9)],
        )
        t = token(collectionID="c", max_docs=15)
        temp = orama.write_side.create_temporary_index("c", wk, "main")
        assert temp.source_index == "main"
        # 10 into the temp: 10 (temp) + 10 (runtime) - 10 (linked) = 10 <= 15
        stats = orama.write_side.insert_documents(
            "c", temp.index_id, t,
            [{"id": f"t{i}", "t": "reindexed doc"} for i in range(10)],
        )
        assert stats.inserted == 10
        # 6 more: 16 > 15 rejected
        with pytest.raises(WriteError) as e:
            orama.write_side.insert_documents(
                "c", temp.index_id, t,
                [{"id": f"t1{i}", "t": "x"} for i in range(6)],
            )
        assert e.value.status == 403
        # but 5 more exactly reaches the limit and passes
        stats = orama.write_side.insert_documents(
            "c", temp.index_id, t,
            [{"id": f"t2{i}", "t": "y"} for i in range(5)],
        )
        assert stats.inserted == 5
    finally:
        orama.stop()
