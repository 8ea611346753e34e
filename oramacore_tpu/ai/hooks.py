"""Sandboxed hook runtime — the orama-js-pool equivalent.

Reference: `orama-js-pool` (Deno/V8 pool with evaluation/execution
timeouts and HTTP domain allow/deny, lib.rs:75-139), hook types in
`oramacore_lib::hook_storage` (BeforeRetrieval, BeforeAnswer,
BeforeSearch, TransformDocumentBeforeSave, TransformDocumentAfterSearch —
run_hooks.rs:4, search.rs:158-172, write/mod.rs:817-842).

This environment ships no JS engine, so hooks execute in SANDBOXED
SUBPROCESSES with a JSON stdin/stdout protocol, CPU/memory rlimits and a
wall-clock timeout. The default hook language is Python (a function
named after the hook type, or `hook(input)`); a `node` executor is used
automatically for `.js`-style hooks when a JS runtime is installed.
Hook stdout/stderr stream to per-collection log subscribers (the
`GET {c}/logs` SSE endpoint — reference sides/logs.rs:18-80).
"""

from __future__ import annotations

import asyncio
import json
import shutil
import subprocess
import sys
import threading
import time
from typing import Any, Dict, List, Optional

HOOK_TYPES = (
    "BeforeRetrieval",
    "BeforeAnswer",
    "BeforeSearch",
    "TransformDocumentBeforeSave",
    "TransformDocumentAfterSearch",
)

_PY_HARNESS = r"""
import json, resource, sys

resource.setrlimit(resource.RLIMIT_CPU, (5, 5))
try:
    resource.setrlimit(resource.RLIMIT_AS, (512 << 20, 512 << 20))
except (ValueError, OSError):
    pass

payload = json.loads(sys.stdin.read())
code = payload["code"]
hook_name = payload["hook"]
hook_input = payload["input"]

scope = {}
exec(compile(code, "<hook>", "exec"), scope)  # user hook code
fn = scope.get(hook_name) or scope.get("hook") or scope.get(
    hook_name[0].lower() + hook_name[1:]
)
if fn is None:
    print(json.dumps({"error": f"hook function {hook_name!r} not defined"}))
    sys.exit(0)
try:
    out = fn(*hook_input) if isinstance(hook_input, list) else fn(hook_input)
    print(json.dumps({"ok": out}))
except Exception as e:  # noqa: BLE001
    print(json.dumps({"error": f"{type(e).__name__}: {e}"}))
"""

_JS_HARNESS = r"""
const chunks = [];
process.stdin.on('data', (c) => chunks.push(c));
process.stdin.on('end', () => {
  const payload = JSON.parse(Buffer.concat(chunks).toString());
  let fn;
  try {
    const module = { exports: {} };
    const wrapper = new Function('module', 'exports', payload.code + '\n;return typeof ' + payload.hook + ' !== "undefined" ? ' + payload.hook + ' : (module.exports.default || module.exports);');
    fn = wrapper(module, module.exports);
  } catch (e) { console.log(JSON.stringify({error: String(e)})); return; }
  try {
    const input = payload.input;
    const out = Array.isArray(input) ? fn(...input) : fn(input);
    Promise.resolve(out).then((v) => console.log(JSON.stringify({ok: v === undefined ? null : v})));
  } catch (e) { console.log(JSON.stringify({error: String(e)})); }
});
"""


def _looks_like_js(code: str) -> bool:
    markers = ("function ", "=>", "const ", "let ", "export default", "var ")
    py_markers = ("def ", "import ", "lambda ")
    has_js = any(m in code for m in markers)
    has_py = any(m in code for m in py_markers)
    return has_js and not has_py


class HookExecutionError(Exception):
    pass


class HooksRuntime:
    """Executes hook code in sandboxed subprocesses; streams logs."""

    def __init__(self, execution_timeout_s: float = 5.0):
        self.execution_timeout_s = execution_timeout_s
        self._node = shutil.which("node")
        self._log_subs: Dict[str, List[asyncio.Queue]] = {}
        self._log_lock = threading.Lock()

    # -- log streaming ----------------------------------------------------

    def subscribe_logs(self, collection_id: str) -> asyncio.Queue:
        q: asyncio.Queue = asyncio.Queue(maxsize=1000)
        with self._log_lock:
            self._log_subs.setdefault(collection_id, []).append(q)
        return q

    def unsubscribe_logs(self, collection_id: str, q: asyncio.Queue) -> None:
        with self._log_lock:
            subs = self._log_subs.get(collection_id, [])
            if q in subs:
                subs.remove(q)

    def _emit_log(self, collection_id: str, entry: Dict[str, Any]) -> None:
        with self._log_lock:
            subs = list(self._log_subs.get(collection_id, []))
        for q in subs:
            try:
                q.put_nowait(entry)
            except asyncio.QueueFull:
                pass

    # -- execution ----------------------------------------------------------

    def exec_hook(
        self,
        collection_id: str,
        hook_name: str,
        code: str,
        hook_input: Any,
    ) -> Optional[Any]:
        """Run hook code; returns the hook's output or None on error/skip
        (reference: typed exec returning Option)."""
        is_js = _looks_like_js(code)
        if is_js and not self._node:
            self._emit_log(
                collection_id,
                {"level": "error", "hook": hook_name,
                 "message": "JS hook requires a node runtime (not installed); skipped"},
            )
            return None
        if is_js:
            argv = [self._node, "-e", _JS_HARNESS]
        else:
            argv = [sys.executable, "-I", "-c", _PY_HARNESS]
        payload = json.dumps(
            {"code": code, "hook": hook_name, "input": hook_input}
        )
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                argv,
                input=payload.encode(),
                capture_output=True,
                timeout=self.execution_timeout_s,
            )
        except subprocess.TimeoutExpired:
            self._emit_log(
                collection_id,
                {"level": "error", "hook": hook_name, "message": "hook timed out"},
            )
            return None
        took = (time.perf_counter() - t0) * 1000
        stderr = proc.stderr.decode(errors="replace").strip()
        if stderr:
            self._emit_log(
                collection_id,
                {"level": "stderr", "hook": hook_name, "message": stderr},
            )
        out_lines = proc.stdout.decode(errors="replace").strip().splitlines()
        # hook prints before the result line stream as stdout logs
        for line in out_lines[:-1]:
            self._emit_log(
                collection_id,
                {"level": "stdout", "hook": hook_name, "message": line},
            )
        if not out_lines:
            self._emit_log(
                collection_id,
                {"level": "error", "hook": hook_name,
                 "message": f"hook produced no output (exit {proc.returncode})"},
            )
            return None
        try:
            result = json.loads(out_lines[-1])
        except json.JSONDecodeError:
            self._emit_log(
                collection_id,
                {"level": "error", "hook": hook_name,
                 "message": f"hook output not JSON: {out_lines[-1][:200]}"},
            )
            return None
        self._emit_log(
            collection_id,
            {"level": "info", "hook": hook_name,
             "message": f"executed in {took:.1f}ms"},
        )
        if "error" in result:
            self._emit_log(
                collection_id,
                {"level": "error", "hook": hook_name, "message": result["error"]},
            )
            return None
        return result.get("ok")
