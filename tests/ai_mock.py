"""Scripted OpenAI-compatible LLM mock (reference utils.rs:164-236
create_ai_server_mock): a local aiohttp server implementing
/v1/chat/completions with scripted responses (matched by substring of
the system or user prompt) and request capture."""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, List, Optional, Tuple

from aiohttp import web


class MockLLMServer:
    def __init__(self, script: List[Tuple[str, str]], default: str = "ok"):
        """script: list of (substring, response). The first entry whose
        substring appears in the rendered prompt wins."""
        self.script = script
        self.default = default
        self.requests: List[Dict[str, Any]] = []
        # transient-failure injection: the first N requests get HTTP 500
        self.fail_first = 0
        self.app = web.Application()
        self.app.router.add_post("/v1/chat/completions", self._handle)
        self.runner: Optional[web.AppRunner] = None
        self.port: Optional[int] = None

    def _response_for(self, body: Dict[str, Any]) -> str:
        text = json.dumps(body.get("messages", []))
        for needle, response in self.script:
            if needle in text:
                return response
        return self.default

    async def _handle(self, request: web.Request):
        body = await request.json()
        self.requests.append(body)
        if len(self.requests) <= self.fail_first:
            return web.json_response({"error": "overloaded"}, status=500)
        content = self._response_for(body)
        if body.get("stream"):
            resp = web.StreamResponse(
                headers={"Content-Type": "text/event-stream"}
            )
            await resp.prepare(request)
            # stream word by word like a real provider
            for word in content.split(" "):
                chunk = {
                    "choices": [{"delta": {"content": word + " "}, "index": 0}]
                }
                await resp.write(f"data: {json.dumps(chunk)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            return resp
        # scripted function calling: a response of "TOOL_CALL <json>"
        # returns tool_calls instead of content (requires body["tools"])
        if body.get("tools") and content.startswith("TOOL_CALL "):
            calls = json.loads(content[len("TOOL_CALL "):])
            return web.json_response(
                {
                    "choices": [
                        {
                            "index": 0,
                            "message": {
                                "role": "assistant",
                                "content": None,
                                "tool_calls": calls,
                            },
                            "finish_reason": "tool_calls",
                        }
                    ]
                }
            )
        return web.json_response(
            {
                "choices": [
                    {
                        "index": 0,
                        "message": {"role": "assistant", "content": content},
                        "finish_reason": "stop",
                    }
                ]
            }
        )

    async def start(self) -> int:
        self.runner = web.AppRunner(self.app)
        await self.runner.setup()
        site = web.TCPSite(self.runner, "127.0.0.1", 0)
        await site.start()
        self.port = site._server.sockets[0].getsockname()[1]
        return self.port

    async def stop(self):
        if self.runner:
            await self.runner.cleanup()

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}/v1"
