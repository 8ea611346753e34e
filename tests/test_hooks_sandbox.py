"""Hook sandbox hardening (ADVICE r1): tenant hook code must not reach
the network or filesystem directly, must not see host env secrets, and
HTTP egress works only through the brokered fetch() under the configured
domain allow/deny policy (orama-js-pool lib.rs:75-139 semantics).
"""

import json
import os
import threading

import pytest

from oramacore_tpu.ai.hooks import HooksRuntime


def run(rt, code, hook_input=None, name="hook"):
    return rt.exec_hook("c", name, code, hook_input if hook_input is not None else {})


def test_direct_sockets_blocked():
    rt = HooksRuntime()
    out = run(rt, """
def hook(x):
    import socket
    try:
        socket.socket()
        return {"socket": "created"}
    except PermissionError as e:
        return {"socket": "blocked"}
""")
    assert out == {"socket": "blocked"}


def test_filesystem_blocked():
    rt = HooksRuntime()
    out = run(rt, """
def hook(x):
    results = {}
    try:
        open("/etc/passwd").read()
        results["read"] = "allowed"
    except (PermissionError, OSError):
        results["read"] = "blocked"
    try:
        open("evil.txt", "w").write("x")
        results["write"] = "allowed"
    except (PermissionError, OSError):
        results["write"] = "blocked"
    return results
""")
    assert out == {"read": "blocked", "write": "blocked"}


def test_subprocess_blocked():
    rt = HooksRuntime()
    out = run(rt, """
def hook(x):
    import subprocess
    try:
        subprocess.run(["/bin/echo", "hi"])
        return "allowed"
    except (PermissionError, OSError):
        return "blocked"
""")
    assert out == "blocked"


def test_environment_scrubbed():
    os.environ["SUPER_SECRET_TOKEN"] = "leakme"
    try:
        rt = HooksRuntime()
        out = run(rt, """
def hook(x):
    import os
    return {"secret": os.environ.get("SUPER_SECRET_TOKEN"),
            "n_env": len(os.environ)}
""")
        assert out["secret"] is None
        assert out["n_env"] <= 6
    finally:
        os.environ.pop("SUPER_SECRET_TOKEN", None)


def test_fetch_respects_domain_policy():
    # local HTTP server plays the "external" service
    import http.server

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps({"hello": "world"}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        code = f"""
def hook(x):
    try:
        r = fetch("http://127.0.0.1:{port}/data")
        return {{"status": r["status"], "body": r["body"]}}
    except RuntimeError as e:
        return {{"denied": str(e)}}
"""
        # allow-listed host: fetch works through the broker
        rt = HooksRuntime(allowed_domains=["127.0.0.1"])
        out = run(rt, code)
        assert out["status"] == 200 and "world" in out["body"]
        # not on the allow list -> denied
        rt = HooksRuntime(allowed_domains=["example.com"])
        out = run(rt, code)
        assert "denied" in out and "not allowed" in out["denied"]
        # deny list beats the default-allow
        rt = HooksRuntime(deny_domains=["127.0.0.1"])
        out = run(rt, code)
        assert "denied" in out
    finally:
        srv.shutdown()


def test_normal_hooks_still_work():
    rt = HooksRuntime()
    out = run(rt, """
def TransformDocumentBeforeSave(doc):
    doc["extra"] = doc.get("n", 0) * 2
    return doc
""", {"n": 21}, name="TransformDocumentBeforeSave")
    assert out == {"n": 21, "extra": 42}
    # preimported stdlib available inside the sandbox
    out = run(rt, """
import re, math
def hook(x):
    return {"m": math.floor(2.9), "r": bool(re.match(r"a+", "aaa"))}
""")
    assert out == {"m": 2, "r": True}


def test_js_hooks_gated_by_default():
    """JS hooks are default-deny (node executor lacks the seccomp +
    brokered-fetch sandbox); hooks.allow_js opts in explicitly."""
    from oramacore_tpu.ai.hooks import HooksRuntime

    rt = HooksRuntime()
    assert rt.allow_js is False
    rt._node = "/usr/bin/node"  # pretend node exists: gate must still win
    logs = []
    rt._emit_log = lambda cid, entry: logs.append(entry)
    out = rt.exec_hook("c", "BeforeSearch", "export default (x) => x", {"a": 1})
    assert out is None
    assert any("allow_js" in e["message"] for e in logs)

    # python hooks are unaffected by the gate
    rt2 = HooksRuntime()
    out = rt2.exec_hook(
        "c", "BeforeSearch", "def hook(x):\n    return x", {"a": 1}
    )
    assert out == {"a": 1}


def test_js_gate_config_plumbs_through():
    from oramacore_tpu.config import OramacoreConfig

    cfg = OramacoreConfig()
    assert cfg.hooks.allow_js is False
    cfg.hooks.allow_js = True
    from oramacore_tpu.ai.hooks import HooksRuntime

    rt = HooksRuntime(allow_js=cfg.hooks.allow_js)
    assert rt.allow_js is True


def test_hooks_isolated_between_collections():
    """A TransformDocumentBeforeSave hook on collection A must not fire
    for collection B (reference hooks.rs
    test_hooks_isolated_between_collections)."""
    from .utils import TestContext

    ctx = TestContext()
    try:
        a = ctx.create_collection()
        b = ctx.create_collection()
        ia = a.create_index()
        ib = b.create_index()
        ctx.writer.set_hook(
            a.collection_id, a.write_key, "TransformDocumentBeforeSave",
            "def TransformDocumentBeforeSave(doc):\n"
            "    doc['tagged'] = True\n"
            "    return doc\n",
        )
        ctx.pump()
        ia.insert_documents([{"id": "1", "t": "alpha"}])
        ib.insert_documents([{"id": "1", "t": "alpha"}])
        da = ctx.reader.batch_get_documents(a.collection_id, a.read_key, ["1"])
        db = ctx.reader.batch_get_documents(b.collection_id, b.read_key, ["1"])
        assert da["1"].get("tagged") is True
        assert "tagged" not in db["1"]
    finally:
        ctx.close()
