"""HS256 JWT auth (reference: crates/ai00-server/src/api/auth.rs + the JWT
hoop on /admin, main.rs:251-258).  Implemented on the stdlib (hmac/base64)
— no external jwt dependency."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _b64url_dec(s: str) -> bytes:
    pad = "=" * (-len(s) % 4)
    return base64.urlsafe_b64decode(s + pad)


def encode_jwt(claims: dict, secret: str) -> str:
    header = {"alg": "HS256", "typ": "JWT"}
    h = _b64url(json.dumps(header, separators=(",", ":")).encode())
    p = _b64url(json.dumps(claims, separators=(",", ":")).encode())
    signing = f"{h}.{p}".encode()
    sig = hmac.new(secret.encode(), signing, hashlib.sha256).digest()
    return f"{h}.{p}.{_b64url(sig)}"


def decode_jwt(token: str, secret: str) -> dict | None:
    """Returns claims when the signature and expiry check out, else None."""
    try:
        h, p, s = token.split(".")
        signing = f"{h}.{p}".encode()
        want = hmac.new(secret.encode(), signing, hashlib.sha256).digest()
        if not hmac.compare_digest(want, _b64url_dec(s)):
            return None
        claims = json.loads(_b64url_dec(p))
        if "exp" in claims and time.time() > float(claims["exp"]):
            return None
        return claims
    except Exception:
        return None


def make_token(app_id: str, secret: str, expire_sec: int = 86400) -> str:
    return encode_jwt(
        {"sid": app_id, "exp": int(time.time()) + int(expire_sec)}, secret)
