"""AI endpoints over HTTP: answer SSE, OpenAI-compatible chat, MCP."""

import asyncio
import json
import tempfile

from aiohttp.test_utils import TestClient, TestServer

from oramacore_tpu.ai.service import AIService
from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.server import ApiServer

from .ai_mock import MockLLMServer

MASTER = "mk"

SCRIPT = [
    ("route a user message", '{"strategy": "simple"}'),
    ("rewrite a conversational message", "mechanical keyboard"),
    ("what is the weather",
     'TOOL_CALL [{"id": "call_1", "type": "function", "function": '
     '{"name": "get_weather", "arguments": "{\\"city\\": \\"Rome\\"}"}}]'),
    ("grounded question-answering assistant", "It costs $80."),
    ("classify a search query", '{"mode": "fulltext"}'),
    ("suggested queries", '["cheap keyboards", "mice"]'),
    ("title for a conversation", "Keyboard shopping"),
    ("used as training data", '["keyboard", "cheap keyboard", "kyeboard"]'),
]


def ai_http_test(fn):
    def wrapper():
        async def run():
            mock = MockLLMServer(SCRIPT)
            await mock.start()
            with tempfile.TemporaryDirectory() as tmp:
                cfg = OramacoreConfig()
                cfg.data_dir = tmp
                cfg.auth.master_api_key = MASTER
                cfg.ai.remote_llms = [
                    {"name": "mock", "url": mock.url, "model": "m"}
                ]
                orama = build_orama(cfg, sync_embeddings=True, start_consumer=True)
                ai = AIService(cfg, orama.write_side, orama.read_side)
                server = ApiServer(cfg, orama.write_side, orama.read_side, ai)
                tc = TestClient(TestServer(server.app))
                tc.mock = mock  # tests inspect captured LLM requests
                await tc.start_server()
                # seed data
                coll = orama.write_side.create_collection(MASTER, "c")
                orama.write_side.create_index("c", coll.write_api_key, "main")
                orama.write_side.insert_documents(
                    "c", "main", coll.write_api_key,
                    [{"id": "1", "name": "mechanical keyboard", "price": 80}],
                )
                orama.write_side.embedding_queue.flush_and_wait()
                for _ in range(200):
                    if orama.read_side.collections.get("c") and \
                       orama.read_side.collections["c"].document_count() == 1:
                        break
                    await asyncio.sleep(0.01)
                try:
                    await fn(tc, coll.read_api_key, coll.write_api_key)
                finally:
                    await tc.close()
                    await ai.llm.close()
                    orama.stop()
            await mock.stop()

        asyncio.run(run())

    wrapper.__name__ = fn.__name__
    return wrapper


def auth(key):
    return {"Authorization": f"Bearer {key}"}


def parse_sse(text):
    events = []
    for line in text.splitlines():
        if line.startswith("data: ") and line != "data: [DONE]":
            events.append(json.loads(line[6:]))
    return events


@ai_http_test
async def test_answer_sse_endpoint(client, rk, wk):
    resp = await client.post(
        "/v1/collections/c/answer",
        json={"interactionID": "i1", "query": "price of mechanical keyboard?",
              "searchMode": "fulltext"},
        headers=auth(rk),
    )
    assert resp.status == 200
    assert resp.headers["Content-Type"].startswith("text/event-stream")
    events = parse_sse(await resp.text())
    types = [e["type"] for e in events]
    assert "acknowledged" in types
    assert "answer_token" in types
    answer = "".join(e["token"] for e in events if e["type"] == "answer_token")
    assert "80" in answer


@ai_http_test
async def test_openai_compatible_endpoint(client, rk, wk):
    # non-streaming
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m",
              "messages": [{"role": "user", "content": "keyboard price?"}]},
        headers=auth(rk),
    )
    assert resp.status == 200
    body = await resp.json()
    assert body["object"] == "chat.completion"
    assert "80" in body["choices"][0]["message"]["content"]
    # streaming
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m", "stream": True,
              "messages": [{"role": "user", "content": "keyboard price?"}]},
        headers=auth(rk),
    )
    assert resp.status == 200
    text = await resp.text()
    assert "chat.completion.chunk" in text
    assert "data: [DONE]" in text


@ai_http_test
async def test_openai_usage_accounting(client, rk, wk):
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m",
              "messages": [{"role": "user", "content": "keyboard price?"}]},
        headers=auth(rk),
    )
    body = await resp.json()
    usage = body["usage"]
    assert usage["prompt_tokens"] > 0
    assert usage["completion_tokens"] > 0
    assert usage["total_tokens"] == (
        usage["prompt_tokens"] + usage["completion_tokens"]
    )
    # streaming usage chunk (stream_options.include_usage)
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m", "stream": True,
              "stream_options": {"include_usage": True},
              "messages": [{"role": "user", "content": "keyboard price?"}]},
        headers=auth(rk),
    )
    text = await resp.text()
    assert '"completion_tokens"' in text


@ai_http_test
async def test_openai_tool_calls(client, rk, wk):
    tools = [{
        "type": "function",
        "function": {
            "name": "get_weather",
            "parameters": {"type": "object",
                           "properties": {"city": {"type": "string"}}},
        },
    }]
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m", "tools": tools,
              "messages": [{"role": "user",
                            "content": "what is the weather in rome"}]},
        headers=auth(rk),
    )
    assert resp.status == 200
    body = await resp.json()
    choice = body["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    call = choice["message"]["tool_calls"][0]
    assert call["function"]["name"] == "get_weather"
    assert "Rome" in call["function"]["arguments"]
    # streaming variant emits tool_call deltas + tool_calls finish
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m", "tools": tools, "stream": True,
              "messages": [{"role": "user",
                            "content": "what is the weather in rome"}]},
        headers=auth(rk),
    )
    text = await resp.text()
    assert '"tool_calls"' in text and "data: [DONE]" in text
    # tool-result round trip: tool messages fold into the conversation
    # and the flow answers normally
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m",
              "messages": [
                  {"role": "user", "content": "what about the keyboard"},
                  {"role": "tool", "tool_call_id": "call_1",
                   "content": "sunny"},
                  {"role": "user", "content": "keyboard price?"},
              ]},
        headers=auth(rk),
    )
    assert resp.status == 200
    body = await resp.json()
    assert "80" in body["choices"][0]["message"]["content"]


@ai_http_test
async def test_mcp_over_http(client, rk, wk):
    resp = await client.post(
        "/v1/collections/c/mcp",
        json={"jsonrpc": "2.0", "id": 1, "method": "tools/list"},
        headers=auth(rk),
    )
    assert resp.status == 200
    tools = (await resp.json())["result"]["tools"]
    assert any(t["name"] == "search" for t in tools)
    resp = await client.post(
        "/v1/collections/c/mcp",
        json={"jsonrpc": "2.0", "id": 2, "method": "tools/call",
              "params": {"name": "search", "arguments": {"term": "keyboard"}}},
        headers=auth(rk),
    )
    payload = json.loads((await resp.json())["result"]["content"][0]["text"])
    assert payload["count"] == 1


@ai_http_test
async def test_mcp_protocol_conformance(client, rk, wk):
    """JSON-RPC 2.0 handshake + error codes (reference mcp_server.rs
    suite, 654 LoC): initialize capabilities, initialized notification,
    invalid envelope -32600, unknown method -32601, unknown tool -32601,
    tool errors as -32000, id echo."""
    async def rpc(body):
        resp = await client.post(
            "/v1/collections/c/mcp", json=body, headers=auth(rk)
        )
        assert resp.status == 200
        return await resp.json()

    # initialize handshake
    out = await rpc({"jsonrpc": "2.0", "id": "init-1",
                     "method": "initialize",
                     "params": {"protocolVersion": "2024-11-05"}})
    assert out["id"] == "init-1"
    assert out["result"]["protocolVersion"]
    assert "tools" in out["result"]["capabilities"]
    assert out["result"]["serverInfo"]["name"]
    # initialized notification acks
    out = await rpc({"jsonrpc": "2.0", "id": 2,
                     "method": "notifications/initialized"})
    assert "error" not in out
    # invalid envelope
    out = await rpc({"jsonrpc": "1.0", "id": 3, "method": "tools/list"})
    assert out["error"]["code"] == -32600
    # unknown method
    out = await rpc({"jsonrpc": "2.0", "id": 4, "method": "resources/list"})
    assert out["error"]["code"] == -32601
    # unknown tool
    out = await rpc({"jsonrpc": "2.0", "id": 5, "method": "tools/call",
                     "params": {"name": "nope", "arguments": {}}})
    assert out["error"]["code"] == -32601
    # tool execution error surfaces as -32000 (bad search params)
    out = await rpc({"jsonrpc": "2.0", "id": 6, "method": "tools/call",
                     "params": {"name": "search",
                                "arguments": {"term": "x",
                                              "properties": 42}}})
    assert out["error"]["code"] == -32000
    # tools/list schema shape
    out = await rpc({"jsonrpc": "2.0", "id": 7, "method": "tools/list"})
    search_tool = next(t for t in out["result"]["tools"]
                       if t["name"] == "search")
    assert search_tool["inputSchema"]["required"] == ["term"]
    # filtered tool call end-to-end
    out = await rpc({"jsonrpc": "2.0", "id": 8, "method": "tools/call",
                     "params": {"name": "search",
                                "arguments": {"term": "keyboard",
                                              "where": {"price": {"lte": 100}}}}})
    payload = json.loads(out["result"]["content"][0]["text"])
    assert payload["count"] == 1
    # auth is enforced on the MCP route too
    resp = await client.post(
        "/v1/collections/c/mcp",
        json={"jsonrpc": "2.0", "id": 9, "method": "tools/list"},
        headers=auth("wrong-key"),
    )
    assert resp.status == 401


@ai_http_test
async def test_suggestions_and_title(client, rk, wk):
    resp = await client.post(
        "/v1/collections/c/suggestions",
        json={"messages": [{"role": "user", "content": "keyboards"}]},
        headers=auth(rk),
    )
    assert (await resp.json())["suggestions"] == ["cheap keyboards", "mice"]
    resp = await client.post(
        "/v1/collections/c/title",
        json={"messages": [{"role": "user", "content": "keyboards"}]},
        headers=auth(rk),
    )
    assert (await resp.json())["title"] == "Keyboard shopping"


@ai_http_test
async def test_system_prompts_http(client, rk, wk):
    resp = await client.post(
        "/v1/collections/c/system_prompts/insert",
        json={"id": "sp1", "prompt": "be terse"},
        headers=auth(wk),
    )
    assert resp.status == 200
    resp = await client.post(
        "/v1/collections/c/system_prompts/all", json={}, headers=auth(rk)
    )
    prompts = (await resp.json())["system_prompts"]
    assert prompts[0]["id"] == "sp1"


@ai_http_test
async def test_tools_http(client, rk, wk):
    resp = await client.post(
        "/v1/collections/c/tools/insert",
        json={"id": "t1", "description": "demo",
              "parameters": {"type": "object", "properties": {}}},
        headers=auth(wk),
    )
    assert resp.status == 200
    resp = await client.post(
        "/v1/collections/c/tools/all", json={}, headers=auth(rk)
    )
    assert (await resp.json())["tools"][0]["id"] == "t1"
    # auth: read key cannot insert
    resp = await client.post(
        "/v1/collections/c/tools/insert",
        json={"id": "t2"}, headers=auth(rk),
    )
    assert resp.status == 401


@ai_http_test
async def test_training_sets_generate_samples_documents(client, rk, wk):
    """`generate` must pass REAL collection documents to the prompt
    (reference training_sets.rs:75; VERDICT r2: `documents` was always
    empty, so generated queries could not reflect corpus content)."""
    resp = await client.post(
        "/v1/collections/c/training_sets/queries_generator/generate",
        json={"count": 3},
        headers=auth(wk),
    )
    assert resp.status == 200, await resp.text()
    body = await resp.json()
    assert isinstance(body.get("data"), list) and body["data"], body
    # the LLM request must contain the seeded document's content
    import json as _json

    gen_reqs = [
        r for r in client.mock.requests
        if "training data" in _json.dumps(r.get("messages", []))
    ]
    assert gen_reqs, "generator prompt never reached the LLM"
    assert "mechanical keyboard" in _json.dumps(gen_reqs[-1]["messages"])


@ai_http_test
async def test_openai_chat_error_no_user_message(client, rk, wk):
    """conversions.rs:144 parity: a request with no user-role message is
    an invalid_request_error, not an empty-query answer."""
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m",
              "messages": [{"role": "system",
                            "content": "You are a helpful assistant."}]},
        headers=auth(rk),
    )
    assert resp.status == 400
    body = await resp.json()
    assert "No user message found" in body["error"]["message"]


@ai_http_test
async def test_openai_model_requires_provider_prefix(client, rk, wk):
    """conversions.rs:260-273 parity: a bare model string ('gpt-4') or
    an unknown provider prefix means NO llm override — the default
    provider still answers; a known 'provider/model' routes to it."""
    for model in ("gpt-4", "unknownprov/gpt-4", "mock/m"):
        resp = await client.post(
            "/v1/c/openai/chat/completions",
            json={"model": model,
                  "messages": [{"role": "user",
                                "content": "keyboard price?"}]},
            headers=auth(rk),
        )
        assert resp.status == 200, model
        body = await resp.json()
        assert "80" in body["choices"][0]["message"]["content"], model


@ai_http_test
async def test_openai_multiple_message_types(client, rk, wk):
    """openai_chat.rs test_openai_chat_with_multiple_message_types:
    system + prior assistant + tool messages all fold into the
    conversation; the LAST user message is the query."""
    resp = await client.post(
        "/v1/c/openai/chat/completions",
        json={"model": "m", "messages": [
            {"role": "system", "content": "Be terse."},
            {"role": "user", "content": "hello"},
            {"role": "assistant", "content": "hi"},
            {"role": "tool", "content": "{\"result\": 42}"},
            {"role": "user", "content": "keyboard price?"},
        ]},
        headers=auth(rk),
    )
    assert resp.status == 200
    body = await resp.json()
    assert "80" in body["choices"][0]["message"]["content"]
