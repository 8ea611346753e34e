"""Auxiliary component tests: oplog transports, storage, JWT, code parser,
locks, secrets, accelerator manager, notifier."""

import json
import os
import threading
import time

import pytest

from oramacore_tpu.auth import JwtManager, JwtProvider, make_hs256_token
from oramacore_tpu.oplog import (
    FileStreamTransport,
    InMemoryTransport,
    Operation,
)
from oramacore_tpu.storage.docstore import DocumentStore
from oramacore_tpu.storage.kv import KV
from oramacore_tpu.utils.code_parser import (
    CodeParser,
    extract_tool_params,
    split_identifier,
)
from oramacore_tpu.utils.locks import InstrumentedLock, InstrumentedRWLock
from oramacore_tpu.utils.secrets import LocalSecretsProvider, SecretsService


# ---------------------------------------------------------------------------
# oplog
# ---------------------------------------------------------------------------

def test_in_memory_transport_multi_receiver():
    t = InMemoryTransport()
    s = t.sender()
    r1 = t.receiver(0)
    s.send(Operation(kind="a"))
    s.send(Operation(kind="b"))
    assert r1.recv(timeout=0)[1].kind == "a"
    r2 = t.receiver(0)  # independent cursor
    assert r2.recv(timeout=0)[1].kind == "a"
    assert r1.recv(timeout=0)[1].kind == "b"


def test_file_stream_transport_durable_and_resume(tmp_path):
    path = str(tmp_path / "ops.stream")
    t = FileStreamTransport(path)
    s = t.sender()
    for i in range(5):
        s.send(Operation(kind="op", body={"i": i}))
    # reader from offset 0
    r = t.receiver(0)
    got = [r.recv(timeout=0) for _ in range(5)]
    assert [g[1].body["i"] for g in got] == [0, 1, 2, 3, 4]
    assert r.recv(timeout=0) is None
    # resume from offset 3 (replay dedup semantics)
    r2 = t.receiver(3)
    assert r2.recv(timeout=0)[1].body["i"] == 3
    # a NEW sender process resumes the offset counter
    s.close()
    s2 = FileStreamTransport(path).sender()
    off = s2.send(Operation(kind="op", body={"i": 5}))
    assert off == 6
    assert r2.recv(timeout=0)[1].body["i"] == 4
    assert r2.recv(timeout=0)[1].body["i"] == 5


def test_file_stream_tolerates_truncated_tail(tmp_path):
    path = str(tmp_path / "ops.stream")
    t = FileStreamTransport(path)
    s = t.sender()
    s.send(Operation(kind="good"))
    s.close()
    with open(path, "ab") as fh:
        fh.write(b"\x07\x00\x00")  # garbage partial frame
    r = FileStreamTransport(path).receiver(0)
    assert r.recv(timeout=0)[1].kind == "good"
    assert r.recv(timeout=0) is None


# ---------------------------------------------------------------------------
# storage
# ---------------------------------------------------------------------------

def test_docstore_roundtrip_and_compact(tmp_path):
    ds = DocumentStore(str(tmp_path / "docs"))
    for i in range(100):
        ds.insert(i, json.dumps({"i": i}).encode())
    ds.commit()
    assert len(ds) == 100
    blobs = ds.get_documents_by_ids([5, 50, 99])
    assert json.loads(blobs[50]) == {"i": 50}
    ds.remove(range(50))
    ds.compact()
    assert len(ds) == 50
    assert ds.get(10) is None
    assert json.loads(ds.get(75)) == {"i": 75}
    # reload from disk
    ds2 = DocumentStore(str(tmp_path / "docs"))
    assert len(ds2) == 50
    assert json.loads(ds2.get(75)) == {"i": 75}


def test_kv_persistence_and_forwarding(tmp_path):
    forwarded = []
    kv = KV(str(tmp_path / "kv.msgpack"),
            on_write=lambda k, v: forwarded.append((k, v)))
    kv.insert("a", {"x": 1})
    kv.insert("prefix:1", "one")
    kv.insert("prefix:2", "two")
    kv.remove("a")
    assert forwarded == [("a", {"x": 1}), ("prefix:1", "one"),
                         ("prefix:2", "two"), ("a", None)]
    assert dict(kv.scan_prefix("prefix:")) == {"prefix:1": "one", "prefix:2": "two"}
    kv.commit()
    kv2 = KV(str(tmp_path / "kv.msgpack"))
    assert kv2.get("prefix:1") == "one"
    assert kv2.get("a") is None


# ---------------------------------------------------------------------------
# JWT
# ---------------------------------------------------------------------------

def test_jwt_hs256_roundtrip():
    provider = JwtProvider(issuer="iss", audience="aud", hs256_secret="s3cret")
    mgr = JwtManager([provider])
    token = make_hs256_token(
        "s3cret",
        {"iss": "iss", "aud": "aud", "collectionID": "c1",
         "exp": time.time() + 60, "scope": "read"},
    )
    assert JwtManager.looks_like_jwt(token)
    claims = mgr.customer_claims(token)
    assert claims.collection_id == "c1"
    assert claims.extra["scope"] == "read"


def test_jwt_rejections():
    from oramacore_tpu.auth import JwtError

    provider = JwtProvider(issuer="iss", audience="aud", hs256_secret="s3cret")
    mgr = JwtManager([provider])
    with pytest.raises(JwtError):
        mgr.verify(make_hs256_token("wrong", {"iss": "iss", "aud": "aud"}))
    with pytest.raises(JwtError):
        mgr.verify(make_hs256_token("s3cret", {"iss": "other", "aud": "aud"}))
    with pytest.raises(JwtError):
        mgr.verify(
            make_hs256_token(
                "s3cret", {"iss": "iss", "aud": "aud", "exp": time.time() - 10}
            )
        )


# ---------------------------------------------------------------------------
# code parser
# ---------------------------------------------------------------------------

TSX = """
import React, { useState } from 'react';
import { searchClient } from './lib/search';
// renders the results list
export default function SearchResults({ query }) {
  const [items, setItems] = useState([]);
  /* fetch on mount */
  const fetchItems = async () => searchClient.find(query);
  return <ResultList items={items} />;
}
class HelperThing {}
"""


def test_code_parser_token_classes():
    tokens = CodeParser().parse(TSX)
    kinds = {(t.kind, t.value) for t in tokens}
    assert ("import", "useState") in kinds
    assert ("import", "./lib/search") in kinds
    assert ("function", "SearchResults") in kinds
    assert ("function", "fetchItems") in kinds
    assert ("class", "HelperThing") in kinds
    assert ("jsx", "ResultList") in kinds
    assert any(t.kind == "comment" and "results list" in t.value for t in tokens)


def test_identifier_splitting():
    assert split_identifier("fooBarBaz") == ["foo", "bar", "baz"]
    assert split_identifier("HTTPServer2") == ["http", "server", "2"]
    assert split_identifier("snake_case_name") == ["snake", "case", "name"]


def test_tool_param_extraction():
    schema = extract_tool_params(
        "export default function run({ city, units = 'metric' }) { return 1; }"
    )
    assert set(schema["properties"]) == {"city", "units"}
    schema = extract_tool_params("export default async (a, b) => a + b")
    assert set(schema["properties"]) == {"a", "b"}
    assert extract_tool_params("function notExported() {}") is None


# ---------------------------------------------------------------------------
# locks / secrets / accelerator / notifier
# ---------------------------------------------------------------------------

def test_instrumented_locks():
    lock = InstrumentedLock("test")
    with lock.acquire("unit test"):
        pass
    rw = InstrumentedRWLock("rw")
    seen = []

    def reader():
        with rw.read("r"):
            seen.append("r")

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    with rw.write("w"):
        seen.append("w")
    assert seen.count("r") == 4 and seen[-1] == "w"


def test_secrets_service(tmp_path):
    path = tmp_path / "secrets.json"
    path.write_text(json.dumps({"coll-a": "sekrit"}))
    svc = SecretsService(LocalSecretsProvider(str(path)),
                         key_pattern="{collection}")
    assert svc.get_for_collection("coll-a") == "sekrit"
    assert svc.get_for_collection("missing") is None
    # env fallback
    os.environ["SECRET_COLL_B"] = "env-secret"
    try:
        svc2 = SecretsService(LocalSecretsProvider(None))
        assert svc2.get_for_collection("coll-b") == "env-secret"
    finally:
        del os.environ["SECRET_COLL_B"]


def test_accelerator_manager():
    from oramacore_tpu.ai.accelerator import AcceleratorManager

    mgr = AcceleratorManager(load_threshold_per_cpu=10_000.0,
                             latency_threshold_ms=100.0)
    assert not mgr.is_overloaded()
    for _ in range(200):
        mgr.record_search_latency(500.0)
    assert mgr.is_overloaded()


def test_notifier_posts_with_retries():
    import asyncio

    from aiohttp import web

    received = []

    async def run():
        async def handler(request):
            received.append(await request.json())
            return web.json_response({"ok": True})

        app = web.Application()
        app.router.add_post("/", handler)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = site._server.sockets[0].getsockname()[1]

        from oramacore_tpu.read.notify import Notifier

        n = Notifier(f"http://127.0.0.1:{port}/")
        n.notify("index_replaced", {"collection": "c1"})
        for _ in range(100):
            if received:
                break
            await asyncio.sleep(0.05)
        await runner.cleanup()
        assert received and received[0]["event"] == "index_replaced"

    asyncio.run(run())


def test_logging_subscriber_stack(tmp_path):
    """Console + JSON file layer + error reporting + per-module filters
    (reference bin/oramacore.rs:101-155 subscriber stack)."""
    import json
    import logging

    from oramacore_tpu.utils.logs import LogConfig, setup_logging

    root = logging.getLogger()
    old_handlers = list(root.handlers)
    try:
        for h in old_handlers:
            root.removeHandler(h)
        log_file = str(tmp_path / "orama.log.jsonl")
        err_file = str(tmp_path / "errors.jsonl")
        setup_logging(LogConfig(
            console_level="error",
            levels={"oramacore_tpu.testmod": "debug",
                    "oramacore_tpu.quiet": "error"},
            file_path=log_file,
            file_level="debug",
            error_file=err_file,
        ))
        logging.getLogger("oramacore_tpu.testmod").debug("dbg-visible")
        logging.getLogger("oramacore_tpu.quiet").info("filtered-out")
        try:
            raise ValueError("boom")
        except ValueError:
            logging.getLogger("oramacore_tpu.testmod").error(
                "it failed", exc_info=True
            )
        lines = [json.loads(l) for l in open(log_file)]
        msgs = [l["message"] for l in lines]
        assert "dbg-visible" in msgs
        assert "filtered-out" not in msgs
        err = [json.loads(l) for l in open(err_file)]
        assert err and err[0]["message"] == "it failed"
        assert "ValueError: boom" in err[0]["exception"]
    finally:
        for h in list(root.handlers):
            root.removeHandler(h)
        for h in old_handlers:
            root.addHandler(h)


def test_analytics_taxonomy_and_rotation(tmp_path):
    """Search/interaction V1 event fields (compact wire keys, reference
    analytics.rs:88/:198), size rotation, export across generations."""
    from oramacore_tpu.read.analytics import AnalyticsLog

    path = str(tmp_path / "a.jsonl")
    log = AnalyticsLog(path, max_bytes=5000, keep_rotated=10, flush_every=1)
    log.add_search_event(
        "c", mode="hybrid", term="red shoes", duration_ms=12.5,
        results_count=3, has_filter=True, has_groups=True,
        has_sorting=False, has_facets=True, has_pin_rules=True,
        has_pinned_results=True, visitor_id="v1", origin="rag",
    )
    h = log.interaction("c", "i-1", conversation_id="conv-1",
                        user_message="what shoes?")
    h.set_llm_info("mock", "m1")
    h.add_rag_step("optimize_query")
    h.add_rag_step("execute_search")
    h.set_time_to_first_token()
    h.set_assistant_response("red running shoes cost $80")
    h.set_generated_related_queries('["blue shoes"]')
    h.finish()
    # force rotation with bulk events
    for i in range(100):
        log.add_search_event("c", mode="fulltext", term=f"q{i}",
                             duration_ms=1.0, results_count=0)
    import os
    assert os.path.exists(path + ".1"), "rotation happened"
    events = log.get_and_erase()
    assert len(events) == 102, "export drains rotated generations too"
    sv = events[0]
    assert sv["t"] == "sv1" and sv["st"] == "h" and sv["o"] == "rag"
    assert sv["hflt"] == 1 and sv["hg"] == 1 and sv["hs"] == 0
    assert sv["hpr"] == 1 and sv["hpres"] == 1 and sv["rc"] == 3
    assert sv["v_id"] == "v1" and sv["rst"] == "red shoes"
    iv = events[1]
    assert iv["t"] == "iv1" and iv["conv"] == "conv-1"
    assert iv["mp"] == "mock" and iv["mn"] == "m1"
    assert "optimize_query" in iv["rs"]
    assert iv["uot"] > 0 and iv["d"] > 0 and iv["gq"] == '["blue shoes"]'
    # erased
    assert log.get_and_erase() == []
    log.close()


def test_analytics_metadata_from_headers(tmp_path):
    from oramacore_tpu.read.analytics import AnalyticsLog

    log = AnalyticsLog(
        str(tmp_path / "a.jsonl"), flush_every=1,
        metadata_from_headers={"X-Country": "country", "X-Device": "device"},
    )
    md = log.metadata_from_request({"X-Country": "IT", "Other": "x"})
    assert md == {"country": "IT"}
    log.add_search_event("c", mode="fulltext", term="q", duration_ms=1.0,
                         results_count=1, metadata=md)
    ev = log.get_and_erase()[0]
    assert ev["md"] == {"country": "IT"}
    log.close()


def test_code_parser_lexer_robustness():
    """A real lexer must not extract 'code' from inside strings, comments
    or regex literals, and must survive template-literal nesting."""
    src = '''
const API = "function fakeFn(x) { import bad from 'nope' }";
// function commentedOut() {}
const re = /function alsoNot\\(\\)/g;
const tpl = `prefix ${ computeValue(realArg) } function neitherMe() {}`;
const ratio = total / count / 2;  // divisions, not regexes
import real, { useThing as useAliased } from "@scope/pkg";
export const realFn = async ({ nested = { a: 1 }, flag = true }, rest) => 1;
'''
    tokens = CodeParser().parse(src)
    names = {(t.kind, t.value) for t in tokens}
    assert ("function", "fakeFn") not in names        # inside a string
    assert ("function", "commentedOut") not in names   # inside a comment
    assert ("function", "alsoNot") not in names        # inside a regex
    assert ("function", "neitherMe") not in names      # inside a template
    assert ("import", "bad") not in names
    assert ("import", "real") in names
    assert ("import", "useAliased") in names           # local alias binding
    assert ("import", "@scope/pkg") in names
    assert ("function", "realFn") in names
    fn = next(t for t in tokens if t.kind == "function" and t.value == "realFn")
    assert fn.extra["params"] == ["nested", "flag", "rest"]


def test_code_parser_jsx_attributes_and_class_extends():
    src = '''
class SearchBox extends BaseWidget {}
const App = () => <ResultGrid items={items} pageSize={20} onSelect={go} />;
'''
    tokens = CodeParser().parse(src)
    cls = next(t for t in tokens if t.kind == "class")
    assert cls.value == "SearchBox" and cls.extra["extends"] == "BaseWidget"
    jsx = next(t for t in tokens if t.kind == "jsx")
    assert jsx.value == "ResultGrid"
    assert jsx.extra["attributes"] == ["items", "pageSize", "onSelect"]


def test_tool_params_hard_cases():
    # nested destructuring defaults with commas inside
    schema = extract_tool_params(
        "export default function run({ city, opts = { a: 1, b: 2 }, "
        "units = 'metric' }, extra) { return 1; }"
    )
    assert set(schema["properties"]) == {"city", "opts", "units", "extra"}
    # TS annotations
    schema = extract_tool_params(
        "export default async (query: string, limit: number = 10) => 1"
    )
    assert set(schema["properties"]) == {"query", "limit"}
    # single-identifier arrow
    schema = extract_tool_params("export default x => x * 2")
    assert set(schema["properties"]) == {"x"}


def test_http_secrets_provider():
    """Remote secrets over HTTP with bearer auth and TTL caching
    (reference oramacore_lib::secrets AWS provider semantics, REST
    shape for no-boto3 environments)."""
    import http.server
    import threading as _threading

    from oramacore_tpu.utils.secrets import HttpSecretsProvider, SecretsService

    calls = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            calls.append((self.path, self.headers.get("Authorization")))
            if self.path.endswith("missing"):
                self.send_response(404)
                self.end_headers()
                return
            body = json.dumps({"SecretString": "s3same"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        p = HttpSecretsProvider(f"http://127.0.0.1:{srv.server_port}",
                                token="tok")
        svc = SecretsService(p, ttl_s=300.0, key_pattern="orama-{collection}")
        assert svc.get_for_collection("c1") == "s3same"
        assert calls[0] == ("/orama-c1", "Bearer tok")
        # cached: a second read doesn't hit the server
        assert svc.get_for_collection("c1") == "s3same"
        assert len(calls) == 1
        assert p.get("missing") is None
    finally:
        srv.shutdown()


def test_span_tracing(caplog):
    """Span trees nest per thread; the root emits one structured trace
    at DEBUG and slow roots escalate to WARNING (tracing #[instrument]
    analog)."""
    import logging

    from oramacore_tpu.utils import trace as tr

    with caplog.at_level(logging.DEBUG, logger="oramacore_tpu.trace"):
        with tr.span("request", route="/search"):
            with tr.span("filter"):
                pass
            with tr.span("score", index="main"):
                with tr.span("topk"):
                    pass
    msgs = [r.message for r in caplog.records if "trace:" in r.message]
    assert msgs, "root span emitted a trace"
    tree = msgs[-1]
    assert "request" in tree and "filter" in tree and "topk" in tree
    # child indented under parent
    lines = tree.splitlines()
    i_score = next(i for i, l in enumerate(lines) if "score" in l)
    i_topk = next(i for i, l in enumerate(lines) if "topk" in l)
    assert i_topk == i_score + 1
    assert lines[i_topk].startswith(lines[i_score][: lines[i_score].index("score")] + "  ")
    assert "route=/search" in tree

    # slow roots escalate to WARNING even with DEBUG disabled
    caplog.clear()
    monkey = tr.SLOW_ROOT_S
    tr.SLOW_ROOT_S = 0.0
    try:
        with caplog.at_level(logging.WARNING, logger="oramacore_tpu.trace"):
            with tr.span("slow-request"):
                pass
        assert any("slow request trace" in r.message for r in caplog.records)
    finally:
        tr.SLOW_ROOT_S = monkey


def test_search_emits_trace_spans(caplog):
    import logging

    from .utils import TestContext

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([{"id": "1", "t": "traced query"}])
        with caplog.at_level(logging.DEBUG, logger="oramacore_tpu.trace"):
            coll.search({"term": "traced"})
        tree = next(
            r.message for r in caplog.records if "trace:" in r.message
        )
        assert "search" in tree and "token_scores" in tree
        assert "hydrate" in tree
    finally:
        ctx.close()


def test_sigv4_spec_vectors():
    """SigV4 signing against the published AWS spec test vectors
    (docs 'Signature Version 4 signing example': AKIDEXAMPLE creds,
    20150830T123600Z, us-east-1/iam)."""
    from oramacore_tpu.utils.secrets import SigV4Signer

    signer = SigV4Signer(
        "AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        "us-east-1",
        "iam",
    )
    # signing-key derivation vector
    assert signer.signing_key("20150830").hex() == (
        "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9"
    )
    # full-request vector: GET /?Action=ListUsers&Version=2010-05-08
    headers = signer.signed_headers(
        "GET",
        "iam.amazonaws.com",
        "/",
        "Action=ListUsers&Version=2010-05-08",
        {"content-type": "application/x-www-form-urlencoded; charset=utf-8"},
        b"",
        amz_date="20150830T123600Z",
    )
    auth = headers["Authorization"]
    assert auth.startswith(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/"
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, "
    )
    assert auth.endswith(
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b"
        "5924a6f2b5d7"
    )


def test_aws_secrets_provider_wire_protocol():
    """AwsSecretsProvider speaks Secrets Manager JSON 1.1 over HTTP with
    a SigV4 Authorization header (no SDK in the image)."""
    import http.server
    import threading as _threading

    from oramacore_tpu.utils.secrets import AwsSecretsProvider

    captured = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            captured["body"] = json.loads(self.rfile.read(n))
            captured["target"] = self.headers.get("X-Amz-Target")
            captured["auth"] = self.headers.get("Authorization")
            captured["token"] = self.headers.get("X-Amz-Security-Token")
            body = json.dumps(
                {"Name": "orama-c1", "SecretString": "wire-secret"}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        p = AwsSecretsProvider(
            "eu-west-1",
            access_key="AKIDEXAMPLE",
            secret_key="sEcReT",
            session_token="sts-tok",
            endpoint=f"http://127.0.0.1:{srv.server_port}",
        )
        assert p.get("orama-c1") == "wire-secret"
        assert captured["body"] == {"SecretId": "orama-c1"}
        assert captured["target"] == "secretsmanager.GetSecretValue"
        assert captured["token"] == "sts-tok"
        assert "Credential=AKIDEXAMPLE/" in captured["auth"]
        assert "/eu-west-1/secretsmanager/aws4_request" in captured["auth"]
        assert "x-amz-security-token" in captured["auth"]  # signed header
    finally:
        srv.shutdown()


def test_aws_provider_requires_credentials(monkeypatch):
    import pytest

    from oramacore_tpu.utils.secrets import AwsSecretsProvider

    monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    with pytest.raises(RuntimeError):
        AwsSecretsProvider("us-east-1")
