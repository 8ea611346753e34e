"""Hurl-style HTTP smoke scripts, run in CI against the real server.

The reference ships .hurl API scripts but keeps them disabled in CI
(src/tests/hurl/, tests/mod.rs:27). Here the scripts in tests/hurl/
execute for real: utils/hurl.py implements the hurl subset they use, and
this suite boots the full ApiServer on a TCP port to run them.
"""

import asyncio
import os
import tempfile
import threading

import pytest

from oramacore_tpu.utils.hurl import (
    HurlError,
    jsonpath_get,
    parse_hurl,
    run_hurl,
    run_hurl_file,
)

MASTER = "hurl-master-key"
HURL_DIR = os.path.join(os.path.dirname(__file__), "hurl")


# ---------------------------------------------------------------------------
# parser / jsonpath units
# ---------------------------------------------------------------------------

def test_jsonpath_subset():
    doc = {"a": {"b": [{"c": 5}, {"c": 7}]}, "n": None, "arr": [1, 2, 3]}
    assert jsonpath_get(doc, "$.a.b[0].c") == 5
    assert jsonpath_get(doc, "$.a.b[1].c") == 7
    assert jsonpath_get(doc, "$.arr[-1]") == 3
    assert jsonpath_get(doc, "$.n") is None
    assert repr(jsonpath_get(doc, "$.missing.deep")) == "<missing>"
    assert jsonpath_get([10, 20], "$[1]") == 20


def test_parse_hurl_entries():
    text = """
# comment
POST http://x/v1/make
Authorization: Bearer {{key}}
[Options]
retry: 3
retry-interval: 250ms
{
    "id": "a",
    "nested": { "arr": [1, 2] }
}
HTTP 201
[Captures]
wk: jsonpath "$.write_api_key"
[Asserts]
jsonpath "$.id" == "a"
jsonpath "$.items" count == 2
jsonpath "$.opt" exists

GET http://x/health
HTTP 200
"""
    entries = parse_hurl(text)
    assert len(entries) == 2
    e = entries[0]
    assert e.method == "POST" and e.expect_status == 201
    assert e.retry == 3 and e.retry_interval_s == 0.25
    assert e.headers == [("Authorization", "Bearer {{key}}")]
    assert '"nested"' in e.body
    assert e.captures == [("wk", "$.write_api_key")]
    assert e.asserts == [
        ("$.id", "==", '"a"'),
        ("$.items", "count==", "2"),
        ("$.opt", "exists", ""),
    ]
    assert entries[1].method == "GET" and entries[1].expect_status == 200


def test_run_hurl_asserts_and_captures():
    import http.server
    import json as _json

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = _json.dumps({"token": "t-123", "items": ["a", "b"]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            echo = _json.loads(self.rfile.read(n))
            ok = self.headers.get("Authorization") == "Bearer t-123"
            body = _json.dumps({"echo": echo, "authed": ok}).encode()
            self.send_response(200 if ok else 401)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        out = run_hurl(
            f"""
GET {base}/token
HTTP 200
[Captures]
tok: jsonpath "$.token"
[Asserts]
jsonpath "$.items" count == 2

POST {base}/use
Authorization: Bearer {{{{tok}}}}
{{ "q": "hello" }}
HTTP 200
[Asserts]
jsonpath "$.authed" == true
jsonpath "$.echo.q" == "hello"
""",
        )
        assert out["tok"] == "t-123"
        with pytest.raises(HurlError):
            run_hurl(
                f"""
GET {base}/token
HTTP 200
[Asserts]
jsonpath "$.token" == "wrong"
"""
            )
    finally:
        srv.shutdown()


# ---------------------------------------------------------------------------
# the real scripts against the real server
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def live_server():
    """Full ApiServer on a real TCP port, in a background event loop."""
    from aiohttp import web

    from oramacore_tpu.ai.service import AIService
    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.server import ApiServer

    tmp = tempfile.TemporaryDirectory(prefix="hurl-http-")
    cfg = OramacoreConfig()
    cfg.data_dir = tmp.name
    cfg.auth.master_api_key = MASTER
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=True)
    ai = AIService(cfg, orama.write_side, orama.read_side)
    server = ApiServer(cfg, orama.write_side, orama.read_side, ai)

    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_holder = {}

    async def _start():
        runner = web.AppRunner(server.app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port_holder["port"] = runner.addresses[0][1]
        port_holder["runner"] = runner
        started.set()

    def _run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(_start())
        loop.run_forever()

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    assert started.wait(10), "server did not start"
    yield f"http://127.0.0.1:{port_holder['port']}"
    fut = asyncio.run_coroutine_threadsafe(
        port_holder["runner"].cleanup(), loop
    )
    fut.result(timeout=10)
    loop.call_soon_threadsafe(loop.stop)
    t.join(timeout=10)
    orama.stop()
    tmp.cleanup()


def test_hurl_api_script(live_server):
    run_hurl_file(
        os.path.join(HURL_DIR, "api-test.hurl"),
        {"base_url": live_server, "master_key": MASTER},
    )


def test_hurl_kv_actions_script(live_server):
    run_hurl_file(
        os.path.join(HURL_DIR, "kv-actions-test.hurl"),
        {"base_url": live_server, "master_key": MASTER},
    )


def test_hurl_search_paths_script(live_server):
    """Round-3 search surfaces over the wire: fused sort (asc/desc,
    fieldless tail), match-all browse, fused facets, exactCount,
    sorted batch, tombstones."""
    run_hurl_file(
        os.path.join(HURL_DIR, "search-paths.hurl"),
        {"base_url": live_server, "master_key": MASTER},
    )
