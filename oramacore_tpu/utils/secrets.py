"""Secrets service: provider abstraction with TTL cache.

Reference: `oramacore_lib::secrets::SecretsService` — AWS Secrets Manager
or local provider, TTL cache, per-collection key pattern, values passed
to hooks (write/mod.rs:79,287-296; config.yaml secrets_manager block).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class SecretsProvider:
    def get(self, key: str) -> Optional[str]:
        raise NotImplementedError


class LocalSecretsProvider(SecretsProvider):
    """Secrets from a JSON file or environment (SECRET_<NAME>)."""

    def __init__(self, path: Optional[str] = None):
        self._data: Dict[str, str] = {}
        if path and os.path.exists(path):
            with open(path) as fh:
                self._data = json.load(fh)

    def get(self, key: str) -> Optional[str]:
        if key in self._data:
            return self._data[key]
        return os.environ.get(f"SECRET_{key.upper().replace('-', '_')}")


class AwsSecretsProvider(SecretsProvider):
    """AWS Secrets Manager provider (requires boto3; gated)."""

    def __init__(self, region: str):
        try:
            import boto3  # type: ignore

            self._client = boto3.client("secretsmanager", region_name=region)
        except ImportError as e:
            raise RuntimeError("boto3 not available in this image") from e

    def get(self, key: str) -> Optional[str]:
        try:
            resp = self._client.get_secret_value(SecretId=key)
            return resp.get("SecretString")
        except Exception:  # noqa: BLE001
            return None


class HttpSecretsProvider(SecretsProvider):
    """Remote secrets over HTTPS (the Secrets-Manager-shaped REST
    contract for environments without boto3): GET <url>/<key> with a
    bearer token; accepts either a raw string body or a JSON object
    with a SecretString field."""

    def __init__(self, url: str, token: Optional[str] = None,
                 timeout_s: float = 5.0):
        self.url = url.rstrip("/")
        self.token = token
        self.timeout_s = timeout_s

    def get(self, key: str) -> Optional[str]:
        import urllib.error
        import urllib.parse
        import urllib.request

        headers = {}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        req = urllib.request.Request(
            f"{self.url}/{urllib.parse.quote(key, safe='')}",
            headers=headers,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                body = r.read().decode(errors="replace")
        except (urllib.error.URLError, OSError):
            return None
        try:
            data = json.loads(body)
            if isinstance(data, dict):
                return data.get("SecretString") or data.get("value")
            if isinstance(data, str):
                return data
        except json.JSONDecodeError:
            pass
        return body or None


def make_provider(kind: str, **kwargs) -> SecretsProvider:
    """Provider factory for the config layer: local | http | aws."""
    if kind == "local":
        return LocalSecretsProvider(kwargs.get("path"))
    if kind == "http":
        return HttpSecretsProvider(
            kwargs["url"], kwargs.get("token"),
            float(kwargs.get("timeout_s", 5.0)),
        )
    if kind == "aws":
        return AwsSecretsProvider(kwargs.get("region", "us-east-1"))
    raise ValueError(f"unknown secrets provider: {kind}")


class SecretsService:
    def __init__(self, provider: SecretsProvider, ttl_s: float = 300.0,
                 key_pattern: str = "{collection}"):
        self.provider = provider
        self.ttl_s = ttl_s
        self.key_pattern = key_pattern
        self._cache: Dict[str, tuple] = {}

    def get_for_collection(self, collection_id: str) -> Optional[str]:
        key = self.key_pattern.format(collection=collection_id)
        now = time.time()
        hit = self._cache.get(key)
        if hit and now - hit[1] < self.ttl_s:
            return hit[0]
        value = self.provider.get(key)
        self._cache[key] = (value, now)
        return value
