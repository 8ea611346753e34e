"""AI layer tests: LLM client, prompts, constraint extractor, ragat,
hooks runtime, answer/autoquery state machines against a scripted mock
LLM (the reference's test strategy, utils.rs:164-236)."""

import asyncio
import functools
import json
import tempfile

import pytest

from oramacore_tpu.ai.constraint_extractor import (
    extract_constraints,
    has_shared_budget,
    inject_constraints,
)
from oramacore_tpu.ai.hooks import HooksRuntime
from oramacore_tpu.ai.llms import (
    LLMProviderConfig,
    LLMService,
    parse_json_response,
)
from oramacore_tpu.ai.prompts import PROMPTS, format_prompt
from oramacore_tpu.ai import ragat
from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import Interaction, InteractionMessage

from .ai_mock import MockLLMServer


def async_test(fn):
    def wrapper():
        asyncio.run(fn())

    wrapper.__name__ = fn.__name__
    return wrapper


# ---------------------------------------------------------------------------
# prompts / parsing
# ---------------------------------------------------------------------------

def test_prompts_registry_complete():
    expected = {
        "answer", "autoquery", "determine_query_strategy", "optimize_query",
        "advanced_autoquery_query_analyzer",
        "advanced_autoquery_properties_selector",
        "advanced_autoquery_query_composer",
        "advanced_autoquery_budget_planner",
        "automatic_embeddings_selector", "validate_system_prompt",
        "followup", "suggestions", "generate_related_queries",
        "title_generator", "training_sets_queries_generator",
        "training_sets_queries_optimizer",
        "v1_1_determine_query_strategy",
        "v1_1_advanced_autoquery_query_analyzer",
        "v1_1_advanced_autoquery_properties_selector",
        "v1_1_advanced_autoquery_query_composer",
        "v1_1_advanced_autoquery_budget_planner",
        # party-planner action pairs (reference
        # src/prompts/v1/party_planner/actions/, registered even though
        # the flow is dormant — registry covers every reference name)
        "party_planner_ask_followup", "party_planner_create_code",
        "party_planner_describe_input_code",
        "party_planner_generate_queries", "party_planner_give_reply",
        "party_planner_improve_input", "party_planner_optimize_query",
    }
    assert expected <= set(PROMPTS.keys())


def test_party_planner_action_contracts():
    """Slots and output contracts match the reference action prompts."""
    from oramacore_tpu.ai.prompts import format_prompt

    for name, slots, marker in (
        ("party_planner_optimize_query", ("input", "description"),
         '"query"'),
        ("party_planner_generate_queries", ("input", "description"),
         '"queries"'),
        ("party_planner_describe_input_code", ("input", "description"),
         '"description"'),
        ("party_planner_create_code", ("input", "description"), '"code"'),
        ("party_planner_improve_input", ("input", "description"),
         "plain text"),
        ("party_planner_give_reply", ("question", "context"), "markdown"),
    ):
        p = PROMPTS[name]
        for s in slots:
            assert "{" + s + "}" in p.user, (name, s)
        assert marker in p.system, (name, marker)
        sys_t, user_t = format_prompt(
            name, [(s, f"<{s}>") for s in slots]
        )
        for s in slots:
            assert f"<{s}>" in user_t


def test_format_prompt_slots():
    system, user = format_prompt("autoquery", [("query", "red shoes")])
    assert "red shoes" in user
    assert "{query}" not in user


def test_parse_json_response_tolerant():
    assert parse_json_response('{"a": 1}') == {"a": 1}
    assert parse_json_response('```json\n{"a": 1}\n```') == {"a": 1}
    assert parse_json_response('Sure! Here: {"mode": "vector"} hope it helps') == {
        "mode": "vector"
    }
    assert parse_json_response('[1, 2]') == [1, 2]


# ---------------------------------------------------------------------------
# constraint extractor
# ---------------------------------------------------------------------------

def test_constraint_extraction():
    cs = extract_constraints("wireless headphones under $100")
    assert cs[0].op == "lte" and cs[0].value == 100.0
    cs = extract_constraints("laptops between 500 and 1500 euros")
    assert cs[0].op == "between" and (cs[0].value, cs[0].upper) == (500.0, 1500.0)
    cs = extract_constraints("items over 50 bucks")
    assert cs[0].op == "gte" and cs[0].value == 50.0
    assert extract_constraints("plain query without numbers") == []


def test_shared_budget_detection():
    from oramacore_tpu.ai.constraint_extractor import shared_budget_amount

    assert has_shared_budget("a keyboard and a mouse, total budget of $200")
    assert shared_budget_amount(
        "a keyboard and a mouse, total budget of $200"
    ) == 200.0
    assert shared_budget_amount("a mouse under 50") is None


def test_inject_constraints():
    cs = extract_constraints("shoes under 80")
    sp = inject_constraints({"term": "shoes"}, cs, ["price", "stock"])
    assert sp["where"]["price"] == {"lte": 80.0}
    # already has numeric condition → untouched
    sp2 = inject_constraints(
        {"term": "shoes", "where": {"price": {"lt": 70}}}, cs, ["price"]
    )
    assert sp2["where"]["price"] == {"lt": 70}


# ---------------------------------------------------------------------------
# ragat
# ---------------------------------------------------------------------------

def test_ragat_parse():
    comps = ragat.parse("docs,faq@0.5:10;!internal@0.1:5;blog@0.7:3+")
    assert comps[0].source_ids == ["docs", "faq"]
    assert comps[0].threshold == 0.5 and comps[0].max_documents == 10
    assert comps[1].is_exclusion
    assert comps[2].fill_remaining
    with pytest.raises(ragat.RagAtParseError):
        ragat.parse("docs0.5:10")  # missing @
    with pytest.raises(ragat.RagAtParseError):
        ragat.parse("docs@0.5")  # missing :
    assert ragat.parse("") == []


# ---------------------------------------------------------------------------
# hooks runtime
# ---------------------------------------------------------------------------

def test_python_hook_execution():
    rt = HooksRuntime()
    code = """
def TransformDocumentBeforeSave(doc):
    doc["extra"] = doc["n"] * 2
    return doc
"""
    out = rt.exec_hook("c", "TransformDocumentBeforeSave", code, {"n": 21})
    assert out == {"n": 21, "extra": 42}


def test_hook_error_returns_none():
    rt = HooksRuntime()
    out = rt.exec_hook("c", "BeforeSearch", "def BeforeSearch(x): raise ValueError('boom')", {})
    assert out is None
    out = rt.exec_hook("c", "BeforeSearch", "not even python ][", {})
    assert out is None


def test_hook_timeout():
    rt = HooksRuntime(execution_timeout_s=0.5)
    out = rt.exec_hook(
        "c", "BeforeSearch",
        "import time\ndef BeforeSearch(x):\n    time.sleep(5)\n    return x",
        {},
    )
    assert out is None


# ---------------------------------------------------------------------------
# LLM service against the mock
# ---------------------------------------------------------------------------

@async_test
async def test_llm_chat_and_stream():
    mock = MockLLMServer(
        [("classify a search query", '{"mode": "hybrid"}')],
        default="hello world",
    )
    await mock.start()
    try:
        svc = LLMService(
            LLMProviderConfig("local", mock.url, "test-model")
        )
        out = await svc.run_known_prompt("autoquery", variables=[("query", "x")])
        assert parse_json_response(out) == {"mode": "hybrid"}
        parts = []
        async for tok in svc.chat_stream(
            [{"role": "user", "content": "anything"}]
        ):
            parts.append(tok)
        assert "hello" in "".join(parts)
        await svc.close()
    finally:
        await mock.stop()


@async_test
async def test_llm_provider_fallback_on_overload():
    mock = MockLLMServer([], default="remote says hi")
    await mock.start()
    try:
        svc = LLMService(
            LLMProviderConfig("local", "http://127.0.0.1:1/v1", "local-model"),
            [LLMProviderConfig("remote", mock.url, "remote-model", is_local=False)],
            overload_probe=lambda: True,  # local overloaded → remote
        )
        assert svc.select_provider().name == "remote"
        out = await svc.chat([{"role": "user", "content": "x"}])
        assert out["content"] == "remote says hi"
        await svc.close()
    finally:
        await mock.stop()


# ---------------------------------------------------------------------------
# answer + autoquery state machines end-to-end over a real engine
# ---------------------------------------------------------------------------

def make_engine(tmp):
    cfg = OramacoreConfig()
    cfg.data_dir = tmp
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    coll = orama.write_side.create_collection("mk", "c")
    orama.write_side.create_index("c", coll.write_api_key, "main")
    orama.write_side.insert_documents(
        "c", "main", coll.write_api_key,
        [
            {"id": "1", "name": "mechanical keyboard", "price": 80},
            {"id": "2", "name": "wireless mouse", "price": 30},
            {"id": "3", "name": "ultrawide monitor", "price": 400},
        ],
    )
    orama.write_side.embedding_queue.flush_and_wait()
    orama.read_side.pump()
    return cfg, orama, coll


@async_test
async def test_answer_state_machine_stream():
    mock = MockLLMServer(
        [
            ("route a user message", '{"strategy": "simple"}'),
            ("rewrite a conversational message", "mechanical keyboard"),
            ("grounded question-answering assistant", "The mechanical keyboard costs $80."),
        ]
    )
    await mock.start()
    with tempfile.TemporaryDirectory() as tmp:
        cfg, orama, coll = make_engine(tmp)
        try:
            from oramacore_tpu.ai.answer import AnswerStateMachine

            llm = LLMService(LLMProviderConfig("local", mock.url, "m"))
            sm = AnswerStateMachine(
                llm, orama.read_side, "c", coll.read_api_key
            )
            interaction = Interaction(
                interaction_id="i1",
                query="how much is the mechanical keyboard?",
                search_mode="fulltext",
            )
            events = []
            async for ev in sm.run_stream(interaction):
                events.append(ev)
            types = [e["type"] for e in events]
            assert "acknowledged" in types
            assert "selected_llm" in types
            assert "optimizing_query" in types
            assert "search_results" in types
            assert "answer_token" in types
            results = next(e for e in events if e["type"] == "search_results")
            assert any(
                h["document"]["name"] == "mechanical keyboard"
                for h in results["results"]
            )
            answer = "".join(
                e["token"] for e in events if e["type"] == "answer_token"
            )
            assert "mechanical keyboard" in answer
            await llm.close()
        finally:
            orama.stop()
    await mock.stop()


@async_test
async def test_advanced_autoquery_flow_with_constraints():
    mock = MockLLMServer(
        [
            ("independent search intents",
             '{"queries": ["keyboard under 100", "monitor"]}'),
            ("choose which collection properties",
             '{"selections": [{"query": "keyboard under 100", "properties": ["name", "price"]}, {"query": "monitor", "properties": ["name"]}]}'),
            ("compose executable search parameters",
             '{"searches": [{"term": "keyboard"}, {"term": "monitor"}]}'),
        ]
    )
    await mock.start()
    with tempfile.TemporaryDirectory() as tmp:
        cfg, orama, coll = make_engine(tmp)
        try:
            from oramacore_tpu.ai.autoquery import AdvancedAutoqueryStateMachine

            llm = LLMService(LLMProviderConfig("local", mock.url, "m"))
            sm = AdvancedAutoqueryStateMachine(
                llm, orama.read_side, "c", coll.read_api_key
            )
            events = []
            async for ev in sm.run_stream("keyboard under 100 and a monitor"):
                events.append(ev)
            tracked = next(
                e for e in events
                if e["type"] == "state_changed"
                and e["state"] == "tracked_queries_generated"
            )
            # the LLM dropped 'under 100'; the extractor must inject it
            first = tracked["data"]["searches"][0]
            assert first["where"]["price"] == {"lte": 100.0}
            results = next(e for e in events if e["type"] == "search_results")
            names = {h["document"]["name"] for h in results["results"]}
            assert "mechanical keyboard" in names
            assert "ultrawide monitor" in names
            await llm.close()
        finally:
            orama.stop()
    await mock.stop()


@async_test
async def test_hooks_integration_with_engine():
    with tempfile.TemporaryDirectory() as tmp:
        cfg, orama, coll = make_engine(tmp)
        try:
            rt = HooksRuntime()
            orama.write_side.hooks_runtime = rt
            orama.read_side.hooks_runtime = rt
            # TransformDocumentBeforeSave uppercases names
            orama.write_side.set_hook(
                "c", coll.write_api_key, "TransformDocumentBeforeSave",
                "def TransformDocumentBeforeSave(doc):\n"
                "    doc['name'] = doc['name'].upper()\n"
                "    return doc",
            )
            orama.write_side.insert_documents(
                "c", "main", coll.write_api_key,
                [{"id": "4", "name": "gaming headset", "price": 60}],
            )
            orama.write_side.embedding_queue.flush_and_wait()
            orama.read_side.pump()
            from oramacore_tpu.types import SearchParams

            out = orama.read_side.search(
                "c", coll.read_api_key,
                SearchParams.from_json({"term": "gaming"}),
            )
            assert out.hits[0].document["name"] == "GAMING HEADSET"

            # TransformDocumentAfterSearch adds a flag
            orama.write_side.set_hook(
                "c", coll.write_api_key, "TransformDocumentAfterSearch",
                "def TransformDocumentAfterSearch(doc):\n"
                "    doc['seen'] = True\n"
                "    return doc",
            )
            orama.read_side.pump()
            out = orama.read_side.search(
                "c", coll.read_api_key,
                SearchParams.from_json({"term": "gaming"}),
            )
            assert out.hits[0].document["seen"] is True
        finally:
            orama.stop()


@async_test
async def test_mcp_server():
    with tempfile.TemporaryDirectory() as tmp:
        cfg, orama, coll = make_engine(tmp)
        try:
            from oramacore_tpu.ai.mcp import MCPServer

            mcp = MCPServer(orama.read_side)
            out = await mcp.handle(
                "c", coll.read_api_key,
                {"jsonrpc": "2.0", "id": 1, "method": "initialize"},
            )
            assert out["result"]["serverInfo"]["name"] == "oramacore_tpu-mcp"
            out = await mcp.handle(
                "c", coll.read_api_key,
                {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
            )
            assert out["result"]["tools"][0]["name"] == "search"
            out = await mcp.handle(
                "c", coll.read_api_key,
                {
                    "jsonrpc": "2.0", "id": 3, "method": "tools/call",
                    "params": {"name": "search",
                               "arguments": {"term": "monitor"}},
                },
            )
            payload = json.loads(out["result"]["content"][0]["text"])
            assert payload["count"] == 1
            # bad method
            out = await mcp.handle(
                "c", coll.read_api_key,
                {"jsonrpc": "2.0", "id": 4, "method": "nope"},
            )
            assert out["error"]["code"] == -32601
        finally:
            orama.stop()


@async_test
async def test_system_prompts_and_tools_crud():
    with tempfile.TemporaryDirectory() as tmp:
        cfg, orama, coll = make_engine(tmp)
        try:
            from oramacore_tpu.ai.system_prompts import SystemPromptsInterface
            from oramacore_tpu.ai.tools import ToolsRuntime

            sp = SystemPromptsInterface(orama.read_side.kv)
            sp.insert("c", {"id": "p1", "prompt": "be nice", "usage_mode": "automatic"})
            assert sp.get("c", "p1")["prompt"] == "be nice"
            assert sp.select_for_interaction("c", None)["id"] == "p1"
            assert sp.select_for_interaction("c", "p1")["id"] == "p1"
            sp.delete("c", "p1")
            assert sp.get("c", "p1") is None

            rt = HooksRuntime()
            tools = ToolsRuntime(orama.read_side.kv, None, rt)
            tools.insert("c", {
                "id": "adder",
                "description": "adds numbers",
                "parameters": {"type": "object", "properties": {
                    "a": {"type": "number"}, "b": {"type": "number"}}},
                "code": "def adder(args):\n    return args['a'] + args['b']",
            })
            assert tools.get("c", "adder")["description"] == "adds numbers"
            assert len(tools.list("c")) == 1
        finally:
            orama.stop()


@async_test
async def test_automatic_embeddings_selector_on_discovery():
    """With automatic embeddings and no explicit fields, the FIRST insert
    asks the LLM which properties carry semantic text; the choice becomes
    the index's embedding_fields (reference AutomaticEmbeddingsSelector,
    write/index/mod.rs:589)."""
    mock = MockLLMServer([
        ("semantic embeddings", '{"properties": ["title"]}'),
    ])
    await mock.start()
    with tempfile.TemporaryDirectory() as tmp:
        from oramacore_tpu.ai.service import AIService
        from oramacore_tpu.config import OramacoreConfig
        from oramacore_tpu.runtime import build_orama

        cfg = OramacoreConfig()
        cfg.data_dir = tmp
        cfg.auth.master_api_key = "mk"
        cfg.ai.remote_llms = [{"name": "mock", "url": mock.url, "model": "m"}]
        cfg.writer_side.insert_batch_commit_size = 10_000_000
        cfg.reader_side.insert_batch_commit_size = 10_000_000
        orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
        ai = AIService(cfg, orama.write_side, orama.read_side)
        try:
            assert orama.write_side.embeddings_selector is not None
            coll = orama.write_side.create_collection("mk", "c")
            orama.write_side.create_index("c", coll.write_api_key, "main")
            import asyncio
            loop = asyncio.get_running_loop()
            await loop.run_in_executor(None, lambda: (
                orama.write_side.insert_documents(
                    "c", "main", coll.write_api_key,
                    [{"id": "1", "title": "trail running shoes",
                      "sku": "XK-991", "price": 120}],
                )
            ))
            idx = orama.write_side.collections["c"].indexes["main"]
            assert idx.embedding_fields == ["title"]
            assert idx.auto_select_done is True
            # the selection persists across writer reload
            orama.write_side.commit()
        finally:
            await ai.llm.close()
            orama.stop()
    await mock.stop()


@async_test
async def test_llm_retries_transient_failures_with_backoff():
    """Per-state retries with exponential backoff (reference AnswerConfig
    answer.rs:214-236): the first two provider calls fail with HTTP 500,
    the third succeeds — the caller sees a normal answer."""
    mock = MockLLMServer([], default="recovered fine")
    mock.fail_first = 2
    await mock.start()
    try:
        svc = LLMService(LLMProviderConfig("local", mock.url, "m"))
        out = await svc.run_known_prompt("answer", variables=[
            ("context", "ctx"), ("question", "q"),
        ])
        assert out == "recovered fine"
        assert len(mock.requests) == 3  # 2 failures + 1 success
        await svc.close()
    finally:
        await mock.stop()


@async_test
async def test_llm_exhausted_retries_surface_error():
    mock = MockLLMServer([], default="never")
    mock.fail_first = 99
    await mock.start()
    try:
        from oramacore_tpu.ai.llms import LLMError

        svc = LLMService(
            LLMProviderConfig("local", mock.url, "m"), max_retries=2,
        )
        import pytest as _pytest
        with _pytest.raises(LLMError):
            await svc.run_known_prompt("answer", variables=[
                ("context", "c"), ("question", "q"),
            ])
        assert len(mock.requests) == 2
        await svc.close()
    finally:
        await mock.stop()


@async_test
async def test_multi_turn_conversation_aware_answer_flow():
    """Multi-turn behavioral test (VERDICT r2 next #7): an anaphoric
    follow-up question ('how much does it cost?') must reach the
    optimize_query prompt WITH the conversation history, the
    conversation-aware rewrite must drive the search, and the
    generate-answer turn must carry the full message history."""
    mock = MockLLMServer(
        [
            ("route a user message", '{"strategy": "simple"}'),
            # conversation-aware rewrite: the mock stands in for an LLM
            # that resolves 'it' from the history
            ("rewrite a conversational message", "mechanical keyboard"),
            ("grounded question-answering assistant", "It costs $80."),
            ("suggested queries", '["are there cheaper keyboards"]'),
        ]
    )
    await mock.start()
    with tempfile.TemporaryDirectory() as tmp:
        cfg, orama, coll = make_engine(tmp)
        try:
            from oramacore_tpu.ai.answer import AnswerStateMachine

            llm = LLMService(LLMProviderConfig("local", mock.url, "m"))
            sm = AnswerStateMachine(
                llm, orama.read_side, "c", coll.read_api_key
            )
            history = [
                InteractionMessage("user", "show me mechanical keyboards"),
                InteractionMessage(
                    "assistant",
                    "We have the mechanical keyboard at several prices.",
                ),
            ]
            interaction = Interaction(
                interaction_id="multi1",
                query="how much does it cost?",
                messages=history,
                search_mode="fulltext",
                related={"howMany": 1},
            )
            events = [ev async for ev in sm.run_stream(interaction)]
            by_type = {}
            for ev in events:
                by_type.setdefault(ev["type"], []).append(ev)

            # the conversation-aware rewrite drove the flow
            opt = by_type["optimizing_query"][0]
            assert opt["original_query"] == "how much does it cost?"
            assert opt["optimized_query"] == "mechanical keyboard"
            # ... and the SEARCH used the rewrite, not the raw anaphora
            results = by_type["search_results"][0]["results"]
            assert any(
                h["document"]["name"] == "mechanical keyboard"
                for h in results
            ), results
            # the answer turn carried the history + grounded answer
            answer = "".join(
                e["token"] for e in by_type.get("answer_token", [])
            )
            assert "$80" in answer
            # inspect the captured optimize request: the conversation
            # history must be inside it (conversation-aware rewriting is
            # only possible if the LLM actually SEES the history)
            opt_reqs = [
                r for r in mock.requests
                if "rewrite a conversational message"
                in json.dumps(r.get("messages", []))
            ]
            assert opt_reqs, "optimize_query never reached the LLM"
            assert "show me mechanical keyboards" in json.dumps(
                opt_reqs[-1]["messages"]
            )
            # the generate-answer turn received the multi-turn history
            ans_reqs = [
                r for r in mock.requests
                if "grounded question-answering assistant"
                in json.dumps(r.get("messages", []))
            ]
            roles = [m["role"] for m in ans_reqs[-1]["messages"]]
            assert roles.count("user") >= 2 and "assistant" in roles
            # related queries generated on request
            assert by_type.get("related_queries")
            await llm.close()
        finally:
            orama.stop()
    await mock.stop()


@async_test
async def test_answer_before_retrieval_and_before_answer_hooks():
    """Answer-flow hooks (reference tests/answer.rs
    test_answer_before_retrieval / test_answer_before_answer): a
    BeforeRetrieval hook rewrites the query BEFORE optimize_query and
    the rewritten query drives the search; a BeforeAnswer hook can
    replace the retrieved results before answer generation."""
    mock = MockLLMServer(
        [
            ("route a user message", '{"strategy": "simple"}'),
            # echo-style: the optimize prompt carries the hook-rewritten
            # query; respond with the matching search term
            ("rewrite a conversational message", "wireless mouse"),
            ("grounded question-answering assistant", "It costs $30."),
            ("suggested queries", '["any other mice"]'),
        ]
    )
    await mock.start()
    with tempfile.TemporaryDirectory() as tmp:
        cfg, orama, coll = make_engine(tmp)
        try:
            from oramacore_tpu.ai.answer import AnswerStateMachine
            from oramacore_tpu.ai.hooks import HooksRuntime

            # BeforeRetrieval rewrites any keyboard question to the mouse
            orama.write_side.set_hook(
                "c", coll.write_api_key, "BeforeRetrieval",
                "def BeforeRetrieval(payload):\n"
                "    if 'keyboard' in payload.get('query', ''):\n"
                "        return {'query': 'wireless mouse'}\n",
            )
            orama.read_side.pump()

            llm = LLMService(LLMProviderConfig("local", mock.url, "m"))
            sm = AnswerStateMachine(
                llm, orama.read_side, "c", coll.read_api_key,
                hooks_runtime=HooksRuntime(),
            )
            interaction = Interaction(
                interaction_id="h1",
                query="how much is the mechanical keyboard?",
                search_mode="fulltext",
            )
            events = [ev async for ev in sm.run_stream(interaction)]
            results = next(e for e in events if e["type"] == "search_results")
            names = [h["document"]["name"] for h in results["results"]]
            assert "wireless mouse" in names
            # the optimize_query request saw the REWRITTEN query
            optimize_reqs = [
                r for r in mock.requests
                if "rewrite a conversational message"
                in json.dumps(r.get("messages", []))
            ]
            assert optimize_reqs
            assert "wireless mouse" in json.dumps(optimize_reqs[-1]["messages"])

            # BeforeAnswer replaces the results fed to the answer prompt
            orama.write_side.set_hook(
                "c", coll.write_api_key, "BeforeAnswer",
                "def BeforeAnswer(payload):\n"
                "    return {'results': ["
                "{'document': {'name': 'injected context doc'}}]}\n",
            )
            orama.read_side.pump()
            events = [ev async for ev in sm.run_stream(interaction)]
            answer_reqs = [
                r for r in mock.requests
                if "grounded question-answering assistant"
                in json.dumps(r.get("messages", []))
            ]
            assert answer_reqs
            assert "injected context doc" in json.dumps(
                answer_reqs[-1]["messages"]
            )
            await llm.close()
        finally:
            orama.stop()
    await mock.stop()
