"""Envoy front-proxy artifact (reference: /root/reference/envoy/
envoy.yaml + docker-compose.yml proxy tier).

The envoy binary is not in this image, so these tests validate the
artifact the honest way: parse envoy/envoy.yaml's actual route table,
check it structurally against docker-compose, then REPLAY the table —
first-match-wins, same semantics envoy applies — through a minimal
aiohttp reverse proxy fronting a real writer-role node and a real
reader-role node joined by the file-stream op log, and run a hurl
flow through that proxy (create -> index -> insert -> search). If any
route family lands on the wrong side, the node answers 503
"not enabled on this node" and the flow fails.
"""

import asyncio
import os
import re
import tempfile
import threading

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENVOY_YAML = os.path.join(REPO, "envoy", "envoy.yaml")
COMPOSE_YAML = os.path.join(REPO, "docker-compose.yml")
MASTER = "envoy-master-key"


# ---------------------------------------------------------------------------
# route-table parsing (the subset of route matchers envoy.yaml uses)
# ---------------------------------------------------------------------------

def load_envoy():
    with open(ENVOY_YAML) as f:
        return yaml.safe_load(f)


def listener_routes(cfg, listener_name):
    """[(kind, pattern, cluster)] in declaration order (envoy semantics:
    first matching route wins)."""
    for lst in cfg["static_resources"]["listeners"]:
        if lst["name"] != listener_name:
            continue
        hcm = lst["filter_chains"][0]["filters"][0]["typed_config"]
        vh = hcm["route_config"]["virtual_hosts"][0]
        out = []
        for r in vh["routes"]:
            m = r["match"]
            if "path" in m:
                out.append(("path", m["path"], r["route"]["cluster"]))
            elif "prefix" in m:
                out.append(("prefix", m["prefix"], r["route"]["cluster"]))
            elif "safe_regex" in m:
                out.append(
                    ("regex", m["safe_regex"]["regex"], r["route"]["cluster"])
                )
            else:  # pragma: no cover - unknown matcher means a bad edit
                raise AssertionError(f"unsupported matcher: {m}")
        return out
    raise AssertionError(f"listener {listener_name!r} not found")


def match_cluster(routes, path):
    for kind, pat, cluster in routes:
        if kind == "path" and path == pat:
            return cluster
        if kind == "prefix" and path.startswith(pat):
            return cluster
        if kind == "regex" and re.fullmatch(pat, path):
            return cluster
    raise AssertionError(f"no route matched {path!r}")


# ---------------------------------------------------------------------------
# structural checks vs docker-compose
# ---------------------------------------------------------------------------

def test_envoy_structure():
    cfg = load_envoy()
    routes = listener_routes(cfg, "public")
    clusters = {c["name"]: c for c in cfg["static_resources"]["clusters"]}
    assert set(r[2] for r in routes) <= set(clusters)
    # default (last) route catches everything and goes to the readers
    assert routes[-1] == ("prefix", "/", "reader")
    # the internal admin listener exposes the whole writer API
    admin = listener_routes(cfg, "writer_admin_internal")
    assert admin == [("prefix", "/", "writer")]
    # cluster endpoints point at compose services on the server port
    with open(COMPOSE_YAML) as f:
        compose = yaml.safe_load(f)
    for name in ("writer", "reader"):
        ep = (clusters[name]["load_assignment"]["endpoints"][0]
              ["lb_endpoints"][0]["endpoint"]["address"]["socket_address"])
        assert ep["address"] in compose["services"], name
        assert ep["port_value"] == 8080
    assert "envoy" in compose["services"]
    vols = compose["services"]["envoy"]["volumes"]
    assert any("envoy/envoy.yaml" in v for v in vols)


def test_envoy_route_families():
    """Every route family maps to the side its ApiServer handler
    requires (the WRITER/READER classification in server/__init__.py:
    handlers calling self._writer() vs self._reader())."""
    routes = listener_routes(load_envoy(), "public")
    expect_writer = [
        "/v1/collections",
        "/v1/collections/create",
        "/v1/collections/list",
        "/v1/collections/delete",
        "/v1/collections/c1",
        "/v1/collections/c1/delete",
        "/v1/collections/c1/reindex",
        "/v1/collections/c1/replace-index",
        "/v1/collections/c1/regenerate-read-api-key",
        "/v1/collections/c1/indexes/create",
        "/v1/collections/c1/indexes/main/insert",
        "/v1/collections/c1/indexes/main/documents/upsert",
        "/v1/collections/c1/indexes/main/create-temporary-index",
        "/v1/collections/c1/hooks/set",
        "/v1/collections/c1/hooks/list",
        "/v1/collections/c1/merchandising/pin_rules/insert",
        "/v1/collections/c1/merchandising/shelves/s1/delete",
        "/v1/collections/c1/values/set",
        "/v1/collections/c1/values/get/k",
        "/v1/collections/c1/mcp/update",
        "/v1/collections/c1/tools/insert",
        "/v1/collections/c1/system_prompts/update",
        "/v1/collections/c1/training_sets/ts/generate",
    ]
    expect_reader = [
        "/",
        "/health",
        "/metrics",
        "/v1/analytics",
        "/v1/collections/c1/search",
        "/v1/collections/c1/search/batch",
        "/v1/collections/c1/stats",
        "/v1/collections/c1/filterable_fields",
        "/v1/collections/c1/documents/batch-get",
        "/v1/collections/c1/logs",
        "/v1/collections/c1/answer",
        "/v1/collections/c1/planned_answer",
        "/v1/collections/c1/suggestions",
        "/v1/collections/c1/generate/nlp_query",
        "/v1/collections/c1/actions/execute",
        "/v1/c1/actions/execute",
        "/v1/c1/openai/chat/completions",
        "/v1/collections/c1/mcp",
        "/v1/collections/c1/tools/run",
        "/v1/collections/c1/tools/all",
        "/v1/collections/c1/system_prompts/validate",
        "/v1/collections/c1/training_sets/ts/get",
    ]
    for p in expect_writer:
        assert match_cluster(routes, p) == "writer", p
    for p in expect_reader:
        assert match_cluster(routes, p) == "reader", p


# ---------------------------------------------------------------------------
# live replay: real split-role nodes behind a table-driven mini proxy
# ---------------------------------------------------------------------------

def test_envoy_route_split_live():
    from aiohttp import ClientSession, web

    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.server import ApiServer
    from oramacore_tpu.utils.hurl import run_hurl

    routes = listener_routes(load_envoy(), "public")
    tmp = tempfile.TemporaryDirectory(prefix="envoy-proxy-")
    stream_path = os.path.join(tmp.name, "ops.stream")

    wcfg = OramacoreConfig()
    wcfg.data_dir = os.path.join(tmp.name, "writer-node")
    wcfg.role = "writer"
    wcfg.auth.master_api_key = MASTER
    wcfg.writer_side.output = {"type": "file-stream", "path": stream_path}
    writer_node = build_orama(wcfg, sync_embeddings=True)

    rcfg = OramacoreConfig()
    rcfg.data_dir = os.path.join(tmp.name, "reader-node")
    rcfg.role = "reader"
    rcfg.reader_side.input = {"type": "file-stream", "path": stream_path}
    reader_node = build_orama(rcfg, start_consumer=True)

    loop = asyncio.new_event_loop()
    started = threading.Event()
    ports = {}
    runners = []

    async def _serve(app, name):
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        ports[name] = runner.addresses[0][1]
        runners.append(runner)

    async def _start():
        w_api = ApiServer(wcfg, writer_node.write_side, None)
        r_api = ApiServer(rcfg, None, reader_node.read_side)
        await _serve(w_api.app, "writer")
        await _serve(r_api.app, "reader")

        session = ClientSession()

        async def forward(request: web.Request):
            cluster = match_cluster(routes, request.path)
            url = (f"http://127.0.0.1:{ports[cluster]}"
                   f"{request.path_qs}")
            body = await request.read()
            headers = {
                k: v for k, v in request.headers.items()
                if k.lower() not in ("host", "content-length")
            }
            headers["x-routed-cluster"] = cluster
            async with session.request(
                request.method, url, data=body, headers=headers
            ) as resp:
                payload = await resp.read()
                out = web.Response(status=resp.status, body=payload)
                ct = resp.headers.get("Content-Type")
                if ct:
                    out.content_type = ct.split(";")[0]
                out.headers["x-routed-cluster"] = cluster
                return out

        proxy = web.Application(client_max_size=64 * 1024 * 1024)
        proxy.router.add_route("*", "/{tail:.*}", forward)
        await _serve(proxy, "proxy")
        ports["session"] = session
        started.set()

    def _run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(_start())
        loop.run_forever()

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    assert started.wait(30)
    base = f"http://127.0.0.1:{ports['proxy']}"
    try:
        out = run_hurl(
            f"""
POST {base}/v1/collections/create
Authorization: Bearer {MASTER}
{{ "id": "ep" }}
HTTP 201
[Captures]
write_key: jsonpath "$.write_api_key"
read_key: jsonpath "$.read_api_key"

POST {base}/v1/collections/ep/indexes/create
Authorization: Bearer {{{{write_key}}}}
{{ "id": "main" }}
HTTP 201

POST {base}/v1/collections/ep/indexes/main/insert
Authorization: Bearer {{{{write_key}}}}
[ {{ "id": "1", "t": "proxied through the cqrs front door" }} ]
HTTP 200

POST {base}/v1/collections/ep/search
Authorization: Bearer {{{{read_key}}}}
[Options]
retry: 200
retry-interval: 50ms
{{ "term": "proxied" }}
HTTP 200
[Asserts]
jsonpath "$.count" == 1
jsonpath "$.hits[0].id" == "main:1"
"""
        )
        assert out["write_key"] and out["read_key"]

        # the split is real: the opposite node refuses each family
        import urllib.error
        import urllib.request

        def status_of(port, path, method="POST", body=b"{}"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=body, method=method,
                headers={"Authorization": f"Bearer {MASTER}",
                         "Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=10) as resp:
                    return resp.status
            except urllib.error.HTTPError as e:
                return e.code

        assert status_of(
            ports["reader"], "/v1/collections/create", body=b'{"id": "x"}'
        ) == 503
        assert status_of(
            ports["writer"], "/v1/collections/ep/search",
            body=b'{"term": "x"}',
        ) == 503
    finally:
        async def _stop():
            await ports["session"].close()
            for r in runners:
                await r.cleanup()

        asyncio.run_coroutine_threadsafe(_stop(), loop).result(20)
        loop.call_soon_threadsafe(loop.stop)
        t.join(10)
        writer_node.stop()
        reader_node.stop()
        tmp.cleanup()
