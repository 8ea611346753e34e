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
