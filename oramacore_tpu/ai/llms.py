"""LLMService: unified chat-completions client over local or remote
OpenAI-compatible providers.

Reference: src/ai/llms.rs — provider registry (ai/mod.rs:32-40: local
vLLM + OramaCore/OpenAI/Fireworks/Together/GoogleVertex/Groq/Anthropic
remotes), `format_prompt` (:220), `run_known_prompt` (:526) + streaming
(:560), accelerator-overload-aware provider selection (:673-782 — NVML
in the reference; here a pluggable overload probe, since the TPU is the
search data plane and LLM serving stays an external process).
"""

from __future__ import annotations

import asyncio
import json
import random
from dataclasses import dataclass, field
from typing import Any, AsyncIterator, Callable, Dict, List, Optional, Tuple

import aiohttp

from .prompts import format_prompt


@dataclass
class LLMProviderConfig:
    name: str              # local | openai | fireworks | together | groq | anthropic | ...
    url: str               # base url, e.g. http://host:port/v1
    model: str
    api_key: str = ""
    is_local: bool = True


@dataclass
class LLMConfig:
    """Per-request overrides (Interaction.llm_config)."""

    provider: Optional[str] = None
    model: Optional[str] = None
    temperature: Optional[float] = None


class LLMError(Exception):
    pass


class LLMService:
    def __init__(
        self,
        local: Optional[LLMProviderConfig],
        remotes: Optional[List[LLMProviderConfig]] = None,
        overload_probe: Optional[Callable[[], bool]] = None,
        max_retries: int = 3,
        backoff_base_s: float = 0.1,
        backoff_max_s: float = 30.0,
    ):
        self.local = local
        self.remotes = remotes or []
        self.overload_probe = overload_probe
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s
        self.backoff_max_s = backoff_max_s
        self._session: Optional[aiohttp.ClientSession] = None

    async def _get_session(self) -> aiohttp.ClientSession:
        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession(
                timeout=aiohttp.ClientTimeout(total=120)
            )
        return self._session

    async def close(self):
        if self._session and not self._session.closed:
            await self._session.close()

    # ------------------------------------------------------------------

    def select_provider(self, llm_config: Optional[LLMConfig] = None) -> LLMProviderConfig:
        """Local unless overloaded/absent → random remote fallback
        (reference read/mod.rs:934, answer.rs HandleGPUOverload)."""
        if llm_config and llm_config.provider:
            for p in [self.local, *self.remotes]:
                if p and p.name == llm_config.provider:
                    return p
            raise LLMError(f"unknown provider {llm_config.provider!r}")
        overloaded = bool(self.overload_probe and self.overload_probe())
        if self.local and not overloaded:
            return self.local
        if self.remotes:
            return random.choice(self.remotes)
        if self.local:
            return self.local
        raise LLMError("no LLM providers configured")

    # ------------------------------------------------------------------

    async def chat(
        self,
        messages: List[Dict[str, str]],
        llm_config: Optional[LLMConfig] = None,
        temperature: float = 0.0,
        tools: Optional[List[Dict[str, Any]]] = None,
    ) -> Dict[str, Any]:
        """One chat-completions call with retries; returns the raw message
        dict ({"content": ..., "tool_calls": [...]})."""
        provider = self.select_provider(llm_config)
        body: Dict[str, Any] = {
            "model": (llm_config.model if llm_config and llm_config.model
                      else provider.model),
            "messages": messages,
            "temperature": (llm_config.temperature
                            if llm_config and llm_config.temperature is not None
                            else temperature),
        }
        if tools:
            body["tools"] = tools
        headers = {"Content-Type": "application/json"}
        if provider.api_key:
            headers["Authorization"] = f"Bearer {provider.api_key}"

        last: Optional[Exception] = None
        for attempt in range(self.max_retries):
            try:
                session = await self._get_session()
                async with session.post(
                    f"{provider.url.rstrip('/')}/chat/completions",
                    json=body,
                    headers=headers,
                ) as resp:
                    if resp.status != 200:
                        raise LLMError(
                            f"provider {provider.name} HTTP {resp.status}: "
                            f"{(await resp.text())[:300]}"
                        )
                    data = await resp.json()
                    return data["choices"][0]["message"]
            except (aiohttp.ClientError, LLMError, KeyError, json.JSONDecodeError) as e:
                last = e
                await asyncio.sleep(
                    min(self.backoff_base_s * (2 ** attempt), self.backoff_max_s)
                )
        raise LLMError(f"chat failed after {self.max_retries} retries: {last}")

    async def chat_stream(
        self,
        messages: List[Dict[str, str]],
        llm_config: Optional[LLMConfig] = None,
        temperature: float = 0.0,
    ) -> AsyncIterator[str]:
        """Streaming chat: yields content deltas (SSE parse)."""
        provider = self.select_provider(llm_config)
        body = {
            "model": (llm_config.model if llm_config and llm_config.model
                      else provider.model),
            "messages": messages,
            "temperature": (llm_config.temperature
                            if llm_config and llm_config.temperature is not None
                            else temperature),
            "stream": True,
        }
        headers = {"Content-Type": "application/json"}
        if provider.api_key:
            headers["Authorization"] = f"Bearer {provider.api_key}"
        session = await self._get_session()
        async with session.post(
            f"{provider.url.rstrip('/')}/chat/completions",
            json=body,
            headers=headers,
        ) as resp:
            if resp.status != 200:
                raise LLMError(
                    f"provider {provider.name} HTTP {resp.status}: "
                    f"{(await resp.text())[:300]}"
                )
            async for raw_line in resp.content:
                line = raw_line.decode(errors="replace").strip()
                if not line.startswith("data:"):
                    continue
                payload = line[len("data:"):].strip()
                if payload == "[DONE]":
                    return
                try:
                    chunk = json.loads(payload)
                    delta = chunk["choices"][0].get("delta", {})
                    content = delta.get("content")
                    if content:
                        yield content
                except (json.JSONDecodeError, KeyError, IndexError):
                    continue

    # ------------------------------------------------------------------

    async def run_known_prompt(
        self,
        prompt_name: str,
        conversation: Optional[List[Dict[str, str]]] = None,
        variables: Optional[List[Tuple[str, str]]] = None,
        llm_config: Optional[LLMConfig] = None,
    ) -> str:
        system, user = format_prompt(prompt_name, variables or [])
        messages = [{"role": "system", "content": system}]
        messages.extend(conversation or [])
        messages.append({"role": "user", "content": user})
        msg = await self.chat(messages, llm_config)
        return msg.get("content") or ""

    async def run_known_prompt_stream(
        self,
        prompt_name: str,
        conversation: Optional[List[Dict[str, str]]] = None,
        variables: Optional[List[Tuple[str, str]]] = None,
        llm_config: Optional[LLMConfig] = None,
    ) -> AsyncIterator[str]:
        system, user = format_prompt(prompt_name, variables or [])
        messages = [{"role": "system", "content": system}]
        messages.extend(conversation or [])
        messages.append({"role": "user", "content": user})
        async for delta in self.chat_stream(messages, llm_config):
            yield delta

    # ------------------------------------------------------------------

    async def execute_tools(
        self,
        messages: List[Dict[str, str]],
        tools: List[Dict[str, Any]],
        llm_config: Optional[LLMConfig] = None,
    ) -> List[Dict[str, Any]]:
        """Function-calling round (llms.rs:483): returns tool_calls."""
        msg = await self.chat(messages, llm_config, tools=tools)
        return msg.get("tool_calls") or []


def parse_json_response(text: str) -> Any:
    """Tolerant JSON extraction from an LLM reply (strips fences/prose)."""
    text = text.strip()
    if text.startswith("```"):
        text = text.split("```", 2)[1]
        if text.startswith("json"):
            text = text[4:]
        text = text.strip()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    # find the first balanced {...} or [...]
    for opener, closer in (("{", "}"), ("[", "]")):
        start = text.find(opener)
        if start < 0:
            continue
        depth = 0
        for i in range(start, len(text)):
            if text[i] == opener:
                depth += 1
            elif text[i] == closer:
                depth -= 1
                if depth == 0:
                    try:
                        return json.loads(text[start : i + 1])
                    except json.JSONDecodeError:
                        break
    raise ValueError(f"no JSON found in LLM reply: {text[:200]}")
