"""HTTP API tests using aiohttp's test client against the full engine."""

import asyncio
import functools
import json
import tempfile

import pytest
from aiohttp.test_utils import TestClient, TestServer

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.server import ApiServer

MASTER = "test-master-key"


def http_test(fn):
    """Run an async test with a live engine + aiohttp test client
    (no pytest-asyncio in the image)."""

    def wrapper():
        async def run():
            with tempfile.TemporaryDirectory() as tmp:
                cfg = OramacoreConfig()
                cfg.data_dir = tmp
                cfg.auth.master_api_key = MASTER
                cfg.writer_side.insert_batch_commit_size = 10_000_000
                cfg.reader_side.insert_batch_commit_size = 10_000_000
                orama = build_orama(cfg, sync_embeddings=True, start_consumer=True)
                server = ApiServer(cfg, orama.write_side, orama.read_side)
                tc = TestClient(TestServer(server.app))
                await tc.start_server()
                try:
                    await fn(tc)
                finally:
                    await tc.close()
                    orama.stop()

        asyncio.run(run())

    wrapper.__name__ = fn.__name__
    return wrapper


def auth(key):
    return {"Authorization": f"Bearer {key}"}


async def create_coll(client, cid="c1"):
    resp = await client.post(
        "/v1/collections/create", json={"id": cid}, headers=auth(MASTER)
    )
    assert resp.status == 201, await resp.text()
    body = await resp.json()
    resp = await client.post(
        f"/v1/collections/{cid}/indexes/create",
        json={"id": "main"},
        headers=auth(body["write_api_key"]),
    )
    assert resp.status == 201
    return body


async def wait_search(client, cid, key, payload, min_count=1, attempts=300):
    import asyncio

    for _ in range(attempts):
        resp = await client.post(
            f"/v1/collections/{cid}/search", json=payload, headers=auth(key)
        )
        if resp.status == 200:
            out = await resp.json()
            if out["count"] >= min_count:
                return out
        await asyncio.sleep(0.02)
    raise TimeoutError("search did not converge")


@http_test
async def test_health_and_metrics(client):
    resp = await client.get("/health")
    assert resp.status == 200
    resp = await client.get("/metrics")
    assert resp.status == 200
    assert "http_requests_total" in await resp.text()


@http_test
async def test_full_crud_and_search_flow(client):
    keys = await create_coll(client)
    wk, rk = keys["write_api_key"], keys["read_api_key"]
    resp = await client.post(
        "/v1/collections/c1/indexes/main/insert",
        json=[
            {"id": "1", "title": "TPU accelerated search", "price": 10},
            {"id": "2", "title": "CPU based engine", "price": 20},
        ],
        headers=auth(wk),
    )
    assert resp.status == 200
    out = await resp.json()
    assert out["inserted"] == 2

    found = await wait_search(client, "c1", rk, {"term": "tpu search"})
    assert found["count"] == 1
    assert found["hits"][0]["document"]["title"] == "TPU accelerated search"
    assert found["hits"][0]["id"] == "main:1"
    assert found["hits"][0]["index_id"] == "main"

    # filters via HTTP
    found = await wait_search(
        client, "c1", rk, {"term": "engine search", "where": {"price": {"gt": 15}}}
    )
    assert [h["id"] for h in found["hits"]] == ["main:2"]

    # stats
    resp = await client.get("/v1/collections/c1/stats", headers=auth(rk))
    stats = await resp.json()
    assert stats["document_count"] == 2

    # filterable fields
    resp = await client.get(
        "/v1/collections/c1/filterable_fields", headers=auth(rk)
    )
    fields = await resp.json()
    assert fields["price"] == "number"

    # batch-get
    resp = await client.post(
        "/v1/collections/c1/documents/batch-get",
        json={"ids": ["1"]},
        headers=auth(rk),
    )
    # flattened map keyed by user doc id (reference types.rs:721)
    docs = await resp.json()
    assert docs["1"]["title"] == "TPU accelerated search"

    # delete documents
    resp = await client.post(
        "/v1/collections/c1/indexes/main/delete",
        json={"document_ids": ["1"]},
        headers=auth(wk),
    )
    assert (await resp.json())["deleted"] == 1


@http_test
async def test_auth_rejection(client):
    keys = await create_coll(client, "c2")
    resp = await client.post(
        "/v1/collections/create", json={"id": "nope"}, headers=auth("bad")
    )
    assert resp.status == 401
    resp = await client.post(
        "/v1/collections/c2/indexes/main/insert",
        json=[{"id": "1"}],
        headers=auth("bad"),
    )
    assert resp.status == 401
    resp = await client.post(
        "/v1/collections/c2/search", json={"term": "x"}, headers=auth("bad")
    )
    assert resp.status == 401
    # api key via query param (reference api/util.rs)
    resp = await client.post(
        f"/v1/collections/c2/search?api-key={keys['read_api_key']}",
        json={"term": "x"},
    )
    assert resp.status == 200


@http_test
async def test_merchandising_and_values(client):
    keys = await create_coll(client, "c3")
    wk = keys["write_api_key"]
    rule = {
        "id": "r1",
        "conditions": [{"pattern": "promo", "anchoring": "is"}],
        "consequence": {"promote": [{"doc_id": "2", "position": 0}]},
    }
    resp = await client.post(
        "/v1/collections/c3/merchandising/pin_rules/insert",
        json=rule, headers=auth(wk),
    )
    assert resp.status == 200
    resp = await client.get(
        "/v1/collections/c3/merchandising/pin_rules/ids", headers=auth(wk)
    )
    assert await resp.json() == ["r1"]

    shelf = {"id": "s1", "name": "Deals", "items": ["1", "2"]}
    await client.post(
        "/v1/collections/c3/merchandising/shelves/insert",
        json=shelf, headers=auth(wk),
    )
    resp = await client.get(
        "/v1/collections/c3/merchandising/shelves/s1/get", headers=auth(wk)
    )
    assert (await resp.json())["name"] == "Deals"

    await client.post(
        "/v1/collections/c3/values/set",
        json={"key": "greeting", "value": "hi"}, headers=auth(wk),
    )
    resp = await client.get(
        "/v1/collections/c3/values/get/greeting", headers=auth(wk)
    )
    assert (await resp.json())["value"] == "hi"

    # pin rule affects search via HTTP
    rk = keys["read_api_key"]
    await client.post(
        "/v1/collections/c3/indexes/main/insert",
        json=[{"id": str(i), "t": "promo item"} for i in range(1, 4)],
        headers=auth(wk),
    )
    found = await wait_search(client, "c3", rk, {"term": "promo"}, min_count=3)
    assert found["hits"][0]["id"] == "main:2"


@http_test
async def test_actions_execute(client):
    keys = await create_coll(client, "c4")
    await client.post(
        "/v1/collections/c4/indexes/main/insert",
        json=[{"id": "1", "t": "findme"}],
        headers=auth(keys["write_api_key"]),
    )
    await wait_search(client, "c4", keys["read_api_key"], {"term": "findme"})
    resp = await client.post(
        "/v1/collections/c4/actions/execute",
        json={"name": "Search", "context": json.dumps({"term": "findme"})},
        headers=auth(keys["read_api_key"]),
    )
    assert resp.status == 200
    assert (await resp.json())["count"] == 1


@http_test
async def test_replace_index_via_http(client):
    keys = await create_coll(client, "c5")
    wk, rk = keys["write_api_key"], keys["read_api_key"]
    await client.post(
        "/v1/collections/c5/indexes/main/insert",
        json=[{"id": "1", "t": "old data"}], headers=auth(wk),
    )
    resp = await client.post(
        "/v1/collections/c5/indexes/main/create-temporary-index",
        json={}, headers=auth(wk),
    )
    temp_id = (await resp.json())["id"]
    await client.post(
        f"/v1/collections/c5/indexes/{temp_id}/insert",
        json=[{"id": "1", "t": "new data"}], headers=auth(wk),
    )
    resp = await client.post(
        "/v1/collections/c5/replace-index",
        json={"target_index_id": "main", "temporary_index_id": temp_id},
        headers=auth(wk),
    )
    assert resp.status == 200
    found = await wait_search(client, "c5", rk, {"term": "new"})
    assert found["count"] == 1


@http_test
async def test_analytics_export(client):
    keys = await create_coll(client, "c6")
    await client.post(
        "/v1/collections/c6/indexes/main/insert",
        json=[{"id": "1", "t": "hello"}], headers=auth(keys["write_api_key"]),
    )
    await wait_search(client, "c6", keys["read_api_key"], {"term": "hello"})
    resp = await client.get("/v1/analytics", headers=auth(MASTER))
    events = (await resp.json())["events"]
    assert any(e["t"] == "sv1" for e in events)
    # claim-gated
    resp = await client.get("/v1/analytics", headers=auth("bad"))
    assert resp.status == 401


@http_test
async def test_search_batch_endpoint(client):
    keys = await create_coll(client, "cb")
    wk, rk = keys["write_api_key"], keys["read_api_key"]
    await client.post(
        "/v1/collections/cb/indexes/main/insert",
        json=[{"id": "1", "t": "alpha beta"}, {"id": "2", "t": "gamma"}],
        headers=auth(wk),
    )
    await wait_search(client, "cb", rk, {"term": "alpha"})
    resp = await client.post(
        "/v1/collections/cb/search/batch",
        json={"searches": [{"term": "alpha"}, {"term": "gamma"},
                           {"term": "zzz"}]},
        headers=auth(rk),
    )
    assert resp.status == 200
    results = (await resp.json())["results"]
    assert [r["count"] for r in results] == [1, 1, 0]


@http_test
async def test_regenerate_read_key_rotation(client):
    keys = await create_coll(client, "rot")
    wk, rk = keys["write_api_key"], keys["read_api_key"]
    await client.post(
        "/v1/collections/rot/indexes/main/insert",
        json=[{"id": "1", "t": "secret data"}], headers=auth(wk),
    )
    await wait_search(client, "rot", rk, {"term": "secret"})
    resp = await client.post(
        "/v1/collections/rot/regenerate-read-api-key",
        json={}, headers=auth(MASTER),
    )
    new_rk = (await resp.json())["read_api_key"]
    assert new_rk != rk
    # old key rejected after the rotation op propagates
    import asyncio as _a

    for _ in range(200):
        r1 = await client.post(
            "/v1/collections/rot/search", json={"term": "secret"},
            headers=auth(rk),
        )
        if r1.status == 401:
            break
        await _a.sleep(0.02)
    assert r1.status == 401
    r2 = await client.post(
        "/v1/collections/rot/search", json={"term": "secret"},
        headers=auth(new_rk),
    )
    assert r2.status == 200 and (await r2.json())["count"] == 1


@http_test
async def test_vector_and_hybrid_over_http(client):
    keys = await create_coll(client, "vec")
    wk, rk = keys["write_api_key"], keys["read_api_key"]
    await client.post(
        "/v1/collections/vec/indexes/main/insert",
        json=[
            {"id": "1", "t": "greek mythology gods of olympus"},
            {"id": "2", "t": "modern web frameworks"},
        ],
        headers=auth(wk),
    )
    await wait_search(client, "vec", rk, {"term": "greek"})
    resp = await client.post(
        "/v1/collections/vec/search",
        json={"term": "greek mythology gods of olympus", "mode": "vector",
              "similarity": 0.5},
        headers=auth(rk),
    )
    out = await resp.json()
    assert out["count"] >= 1 and out["hits"][0]["id"] == "main:1"
    resp = await client.post(
        "/v1/collections/vec/search",
        json={"term": "greek gods", "mode": "hybrid", "similarity": 0.0},
        headers=auth(rk),
    )
    out = await resp.json()
    assert out["hits"][0]["id"] == "main:1"


def test_writer_only_node_serves_503_on_read_paths():
    """role=writer node: search endpoints return 503, admin works
    (reference writer-only binary, lib.rs:234-307)."""
    import asyncio as _a
    import tempfile

    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.server import ApiServer

    async def run():
        with tempfile.TemporaryDirectory() as tmp:
            cfg = OramacoreConfig()
            cfg.data_dir = tmp
            cfg.role = "writer"
            cfg.auth.master_api_key = MASTER
            cfg.writer_side.output = {
                "type": "file-stream", "path": f"{tmp}/ops.stream"
            }
            orama = build_orama(cfg, sync_embeddings=True)
            server = ApiServer(cfg, orama.write_side, orama.read_side)
            tc = TestClient(TestServer(server.app))
            await tc.start_server()
            try:
                resp = await tc.post(
                    "/v1/collections/create", json={"id": "w"},
                    headers=auth(MASTER),
                )
                assert resp.status == 201
                resp = await tc.post(
                    "/v1/collections/w/search", json={"term": "x"},
                    headers=auth(MASTER),
                )
                assert resp.status == 503
                body = await resp.json()
                assert "read side" in body["error"]
            finally:
                await tc.close()
                orama.stop()

    _a.run(run())


@http_test
async def test_list_documents_endpoint(client):
    """POST /v1/collections/list (reference admin.rs:105): write-key
    auth, body {id, index_ids?} -> every document of the collection."""
    keys = await create_coll(client, "ld")
    wk = keys["write_api_key"]
    docs = [{"id": str(i), "t": f"doc number {i}"} for i in range(5)]
    resp = await client.post(
        "/v1/collections/ld/indexes/main/insert", json=docs,
        headers=auth(wk),
    )
    assert resp.status == 200
    resp = await client.post(
        "/v1/collections/list", json={"id": "ld"}, headers=auth(wk),
    )
    assert resp.status == 200
    out = await resp.json()
    assert sorted(d["id"] for d in out) == [str(i) for i in range(5)]
    # index_ids restriction: unknown index -> empty
    resp = await client.post(
        "/v1/collections/list",
        json={"id": "ld", "index_ids": ["nope"]}, headers=auth(wk),
    )
    assert await resp.json() == []
    # wrong key -> auth error
    resp = await client.post(
        "/v1/collections/list", json={"id": "ld"}, headers=auth("bad"),
    )
    assert resp.status in (401, 403)


@http_test
async def test_delete_collection_body_shape(client):
    """POST /v1/collections/delete with {id} in the body (admin.rs:93)."""
    await create_coll(client, "dc")
    resp = await client.post(
        "/v1/collections/delete", json={"id": "dc"}, headers=auth(MASTER),
    )
    assert resp.status == 200
    assert (await resp.json())["deleted"] is True
    resp = await client.get("/v1/collections/dc", headers=auth(MASTER))
    assert resp.status == 404


@http_test
async def test_actions_execute_reference_path(client):
    """POST /v1/{c}/actions/execute (actions.rs:20 path shape, no
    /collections prefix) behaves like the prefixed route."""
    keys = await create_coll(client, "ax")
    wk, rk = keys["write_api_key"], keys["read_api_key"]
    docs = [{"id": "1", "t": "wireless headphones"}]
    resp = await client.post(
        "/v1/collections/ax/indexes/main/insert", json=docs,
        headers=auth(wk),
    )
    assert resp.status == 200
    await wait_search(client, "ax", rk, {"term": "wireless"})
    resp = await client.post(
        "/v1/ax/actions/execute",
        json={"name": "Search",
              "context": json.dumps({"term": "wireless"})},
        headers=auth(rk),
    )
    assert resp.status == 200
    out = await resp.json()
    assert out["count"] >= 1


@http_test
async def test_api_key_extraction_rules(client):
    """Reference api/util.rs:180-220 + tests/api_key_extraction.rs:
    query param takes precedence over the header; plain keys longer
    than 64 chars are rejected (401); empty keys don't authenticate;
    long JWT-shaped tokens are NOT length-capped."""
    keys = await create_coll(client, "ak")
    rk = keys["read_api_key"]
    docs = [{"id": "1", "t": "hello world"}]
    resp = await client.post(
        "/v1/collections/ak/indexes/main/insert", json=docs,
        headers=auth(keys["write_api_key"]),
    )
    assert resp.status == 200
    await wait_search(client, "ak", rk, {"term": "hello"})

    # header valid
    resp = await client.post(
        "/v1/collections/ak/search", json={"term": "hello"}, headers=auth(rk)
    )
    assert resp.status == 200

    # query valid
    resp = await client.post(
        f"/v1/collections/ak/search?api-key={rk}", json={"term": "hello"}
    )
    assert resp.status == 200

    # query takes precedence: bad query + good header -> 401
    resp = await client.post(
        "/v1/collections/ak/search?api-key=wrong", json={"term": "hello"},
        headers=auth(rk),
    )
    assert resp.status == 401

    # too-long plain query key -> 401 with the length message
    resp = await client.post(
        f"/v1/collections/ak/search?api-key={'x' * 65}", json={"term": "hello"}
    )
    assert resp.status == 401
    assert "64" in (await resp.text())

    # empty string does not authenticate
    resp = await client.post(
        "/v1/collections/ak/search?api-key=", json={"term": "hello"}
    )
    assert resp.status == 401

    # a long JWT-shaped token passes the length gate (then fails auth,
    # not the length check)
    fake_jwt = "eyJhbGciOiJIUzI1NiJ9." + "a" * 80 + ".sig"
    resp = await client.post(
        "/v1/collections/ak/search", json={"term": "hello"},
        headers=auth(fake_jwt),
    )
    assert resp.status == 401
    assert "64" not in (await resp.text())

    # missing key entirely
    resp = await client.post("/v1/collections/ak/search", json={"term": "hello"})
    assert resp.status == 401
