"""JWT auth: HS256/RS256 verification, multi-provider, claims.

Reference: src/auth/jwt_manager.rs:43-123 (JWKS multi-provider),
types.rs:576 DashboardClaims (writes, with doc-count claim_limitations),
types.rs:603 CustomerClaims (reads, extra claims passed to hooks).

No external JWT lib in the image — implemented on stdlib hmac + the
`cryptography` package for RSA. JWKS keys can be fetched lazily over
HTTP (jwks_url) or configured statically.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


class JwtError(Exception):
    pass


def _b64url_decode(data: str) -> bytes:
    pad = "=" * (-len(data) % 4)
    return base64.urlsafe_b64decode(data + pad)


def _b64url_encode(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


@dataclass
class JwtProvider:
    issuer: str
    audience: str
    hs256_secret: Optional[str] = None
    jwks_url: Optional[str] = None
    static_jwks: Optional[Dict[str, Any]] = None  # {"keys": [...]}
    _jwks_cache: Optional[Dict[str, Any]] = None
    _jwks_fetched_at: float = 0.0

    def _get_jwks(self) -> Dict[str, Any]:
        if self.static_jwks is not None:
            return self.static_jwks
        if self._jwks_cache is not None and time.time() - self._jwks_fetched_at < 3600:
            return self._jwks_cache
        if not self.jwks_url:
            raise JwtError("no JWKS configured")
        import urllib.request

        with urllib.request.urlopen(self.jwks_url, timeout=5) as resp:
            self._jwks_cache = json.loads(resp.read())
            self._jwks_fetched_at = time.time()
        return self._jwks_cache

    def _verify_rs256(self, signing_input: bytes, sig: bytes, kid: Optional[str]) -> bool:
        from cryptography.exceptions import InvalidSignature
        from cryptography.hazmat.primitives import hashes
        from cryptography.hazmat.primitives.asymmetric import padding, rsa

        jwks = self._get_jwks()
        for key in jwks.get("keys", []):
            if kid and key.get("kid") != kid:
                continue
            if key.get("kty") != "RSA":
                continue
            n = int.from_bytes(_b64url_decode(key["n"]), "big")
            e = int.from_bytes(_b64url_decode(key["e"]), "big")
            pub = rsa.RSAPublicNumbers(e, n).public_key()
            try:
                pub.verify(sig, signing_input, padding.PKCS1v15(), hashes.SHA256())
                return True
            except InvalidSignature:
                continue
        return False

    def verify(self, token: str) -> Dict[str, Any]:
        try:
            header_b64, payload_b64, sig_b64 = token.split(".")
        except ValueError as e:
            raise JwtError("malformed token") from e
        header = json.loads(_b64url_decode(header_b64))
        payload = json.loads(_b64url_decode(payload_b64))
        sig = _b64url_decode(sig_b64)
        signing_input = f"{header_b64}.{payload_b64}".encode()

        alg = header.get("alg")
        if alg == "HS256":
            if not self.hs256_secret:
                raise JwtError("HS256 not configured for provider")
            expected = hmac.new(
                self.hs256_secret.encode(), signing_input, hashlib.sha256
            ).digest()
            if not hmac.compare_digest(expected, sig):
                raise JwtError("invalid signature")
        elif alg == "RS256":
            if not self._verify_rs256(signing_input, sig, header.get("kid")):
                raise JwtError("invalid signature")
        else:
            raise JwtError(f"unsupported alg {alg}")

        now = time.time()
        if "exp" in payload and now > float(payload["exp"]):
            raise JwtError("token expired")
        if "nbf" in payload and now < float(payload["nbf"]):
            raise JwtError("token not yet valid")
        if self.issuer and payload.get("iss") != self.issuer:
            raise JwtError("issuer mismatch")
        if self.audience:
            aud = payload.get("aud")
            auds = aud if isinstance(aud, list) else [aud]
            if self.audience not in auds:
                raise JwtError("audience mismatch")
        return payload


@dataclass
class DashboardClaims:
    """Write-side claims (types.rs:576): scoped collection + doc limits."""

    collection_id: Optional[str] = None
    claim_limitations: Optional[int] = None  # max doc count
    raw: Dict[str, Any] = field(default_factory=dict)


@dataclass
class CustomerClaims:
    """Read-side claims (types.rs:603): extras forwarded to hooks."""

    collection_id: Optional[str] = None
    extra: Dict[str, Any] = field(default_factory=dict)
    raw: Dict[str, Any] = field(default_factory=dict)


class JwtManager:
    def __init__(self, providers: List[JwtProvider]):
        self.providers = providers

    @staticmethod
    def looks_like_jwt(token: str) -> bool:
        return token.count(".") == 2 and token.split(".")[0].startswith("eyJ")

    def verify(self, token: str) -> Dict[str, Any]:
        last: Optional[Exception] = None
        for p in self.providers:
            try:
                return p.verify(token)
            except JwtError as e:
                last = e
        raise last or JwtError("no jwt providers configured")

    def dashboard_claims(self, token: str) -> DashboardClaims:
        payload = self.verify(token)
        return DashboardClaims(
            collection_id=payload.get("collectionID") or payload.get("collection_id"),
            claim_limitations=payload.get("claimLimitations", {}).get("maxDocs")
            if isinstance(payload.get("claimLimitations"), dict)
            else payload.get("max_docs"),
            raw=payload,
        )

    def customer_claims(self, token: str) -> CustomerClaims:
        payload = self.verify(token)
        known = {"iss", "aud", "exp", "nbf", "iat", "sub"}
        return CustomerClaims(
            collection_id=payload.get("collectionID") or payload.get("collection_id"),
            extra={k: v for k, v in payload.items() if k not in known},
            raw=payload,
        )


def make_hs256_token(secret: str, payload: Dict[str, Any]) -> str:
    """Helper for tests: mint an HS256 JWT."""
    header = _b64url_encode(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
    body = _b64url_encode(json.dumps(payload).encode())
    signing_input = f"{header}.{body}".encode()
    sig = hmac.new(secret.encode(), signing_input, hashlib.sha256).digest()
    return f"{header}.{body}.{_b64url_encode(sig)}"
