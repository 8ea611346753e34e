import sys; sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), ".."))
import jax; jax.config.update("jax_platforms", "cpu")
import asyncio, json, tempfile, threading, time

from oramacore_tpu.ai.service import AIService
from oramacore_tpu.client import OramaCoreTPU
from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.server import ApiServer
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__file__), "..", "tests"))
from ai_mock import MockLLMServer

SCRIPT = [
    ("route a user message", '{"strategy": "simple"}'),
    ("rewrite a conversational message", "noise cancelling headphones"),
    ("grounded question-answering assistant", "The wireless headphones cost $299 and have noise cancelling."),
]

def client_flow(base, orama):
    import urllib.request
    client = OramaCoreTPU(base, master_api_key="mk")
    assert client.health()
    coll = client.create_collection("store")
    coll.create_index("main")
    coll.set_hook("TransformDocumentBeforeSave",
                  "def TransformDocumentBeforeSave(doc):\n"
                  "    doc['hooked'] = True\n    return doc")
    coll.insert_documents("main", [
        {"id": "1", "name": "wireless noise cancelling headphones", "price": 299},
        {"id": "2", "name": "wired earbuds", "price": 19},
    ])
    for _ in range(200):
        try:
            if coll.search({"term": "wireless"})["count"]: break
        except Exception: pass
        time.sleep(0.02)
    out = coll.search({"term": "wireless headphones", "where": {"price": {"gt": 100}}})
    assert out["count"] == 1 and out["hits"][0]["document"]["hooked"] is True
    print("1. search + before-save hook:", out["hits"][0]["document"]["name"], "| hooked:", out["hits"][0]["document"]["hooked"])

    # batched search endpoint (incl. round-3 coverage: homogeneous
    # tolerance batches ride the shared device path)
    req = urllib.request.Request(
        base + "/v1/collections/store/search/batch?api-key=" + coll.read_api_key,
        data=json.dumps({"searches": [{"term": "wireless"}, {"term": "earbuds"}, {"term": "zzz"}]}).encode(),
        headers={"Content-Type": "application/json"})
    batch = json.loads(urllib.request.urlopen(req).read())
    print("2. batch search counts:", [r["count"] for r in batch["results"]])
    req = urllib.request.Request(
        base + "/v1/collections/store/search/batch?api-key=" + coll.read_api_key,
        data=json.dumps({"searches": [
            {"term": "wireles", "tolerance": 1},
            {"term": "earbuds", "tolerance": 1},
        ]}).encode(),
        headers={"Content-Type": "application/json"})
    tol = json.loads(urllib.request.urlopen(req).read())
    assert tol["results"][0]["count"] >= 1, tol
    print("2b. tolerance batch counts:",
          [r["count"] for r in tol["results"]])

    # pruned scoring tier end-to-end (forced on; estimated counts are
    # flagged in the payload)
    orama.read_side.config.reader_side.pruning = "on"
    try:
        pr = coll.search({"term": "wireless headphones"})
        assert pr["count"] >= 1 and pr.get("count_estimated") is True, pr
        print("2c. pruned search:", pr["count"], "(estimated)")
        prx = coll.search({"term": "wireless headphones",
                           "exactCount": True})
        assert prx["count"] >= 1 and not prx.get("count_estimated"), prx
        print("2d. pruned exactCount:", prx["count"], "(exact)")
    finally:
        orama.read_side.config.reader_side.pruning = "auto"

    # answer SSE end-to-end
    answer = coll.answer({"interactionID": "i1", "query": "how much are the headphones?", "searchMode": "fulltext"})
    print("3. answer SSE:", answer.strip()[:70])

    # suggestions (mock default response path)
    # hook log SSE endpoint responds
    req = urllib.request.Request(
        base + "/v1/collections/store/mcp?api-key=" + coll.read_api_key,
        data=json.dumps({"jsonrpc": "2.0", "id": 1, "method": "tools/list"}).encode(),
        headers={"Content-Type": "application/json"})
    mcp = json.loads(urllib.request.urlopen(req).read())
    print("4. MCP tools:", [t["name"] for t in mcp["result"]["tools"]])

    # analytics export (claim-gated)
    events = client.analytics()["events"]
    print("5. analytics events:", sorted({e["t"] for e in events}))

    # probe: JWT-less bad key on AI route
    try:
        urllib.request.urlopen(urllib.request.Request(
            base + "/v1/collections/store/answer?api-key=bad",
            data=b'{"query": "x"}', headers={"Content-Type": "application/json"}))
        print("6. PROBE bad key on answer: FAILED")
    except urllib.error.HTTPError as e:
        print("6. PROBE bad key on answer:", e.code)

    print("FULL DRIVE PASS")


async def main():
    mock = MockLLMServer(SCRIPT)
    await mock.start()
    tmp = tempfile.mkdtemp()
    cfg = OramacoreConfig()
    cfg.data_dir = tmp
    cfg.auth.master_api_key = "mk"
    cfg.ai.remote_llms = [{"name": "mock", "url": mock.url, "model": "m"}]
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=True)
    orama.start_maintenance()
    ai = AIService(cfg, orama.write_side, orama.read_side)
    server = ApiServer(cfg, orama.write_side, orama.read_side, ai)
    from aiohttp import web
    runner = web.AppRunner(server.app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    base = f"http://127.0.0.1:{port}"
    loop = asyncio.get_running_loop()
    await loop.run_in_executor(None, client_flow, base, orama)
    await runner.cleanup()
    await ai.llm.close()
    orama.stop()
    await mock.stop()

asyncio.run(main())
