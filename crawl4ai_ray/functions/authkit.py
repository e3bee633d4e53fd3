"""Stdlib HS256 JWT — the reference server's auth layer laws
(/root/reference/deploy/docker/auth.py) without the ``jwt`` package:

- ``create_access_token(data, secret)``: HS256 JWT with an ``exp`` claim
  ``ACCESS_TOKEN_EXPIRE_MINUTES`` (60) out, like auth.py:23-29;
- ``verify_token(token, secret)``: signature + expiry check
  (``do_time_check=True`` law) → payload dict, ``AuthError`` on any
  failure (the endpoint maps it to 401 "Invalid or expired token");
- ``verify_email_domain(email)``: the reference resolves MX records
  (utils.py:120-127) — no DNS in this environment, so the default
  resolver is a labeled syntactic stub (user@domain.tld) and a real
  resolver plugs in via the ``resolver`` argument.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import re
import time

ACCESS_TOKEN_EXPIRE_MINUTES = 60


class AuthError(Exception):
    """Invalid or expired token."""


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _unb64url(s: str) -> bytes:
    pad = "=" * (-len(s) % 4)
    return base64.urlsafe_b64decode(s + pad)


def _sign(msg: bytes, secret: str) -> str:
    return _b64url(hmac.new(secret.encode(), msg,
                            hashlib.sha256).digest())


def create_access_token(data: dict, secret: str,
                        expires_minutes: float | None = None) -> str:
    payload = dict(data)
    payload["exp"] = int(time.time()
                         + 60 * (expires_minutes
                                 if expires_minutes is not None
                                 else ACCESS_TOKEN_EXPIRE_MINUTES))
    header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"},
                                separators=(",", ":")).encode())
    body = _b64url(json.dumps(payload, separators=(",", ":"),
                              sort_keys=True).encode())
    msg = f"{header}.{body}"
    return f"{msg}.{_sign(msg.encode(), secret)}"


def verify_token(token: str, secret: str) -> dict:
    """Signature + expiry check → payload. Raises AuthError otherwise.

    Every failure mode on attacker-supplied input maps to AuthError:
    a non-ASCII signature segment would make ``hmac.compare_digest``
    raise TypeError, and a signed-but-garbage ``exp`` claim would make
    ``int()`` raise — both must surface as 401, not a dropped
    connection."""
    try:
        header, body, sig = token.split(".")
        expect = _sign(f"{header}.{body}".encode(), secret)
        if not hmac.compare_digest(sig, expect):
            raise AuthError("bad signature")
        alg = json.loads(_unb64url(header)).get("alg")
        payload = json.loads(_unb64url(body))
        if alg != "HS256":
            raise AuthError("unsupported alg")
        if int(payload.get("exp", 0)) < time.time():
            raise AuthError("expired token")
    except AuthError:
        raise
    except Exception:
        raise AuthError("malformed token") from None
    return payload


_EMAIL_RE = re.compile(r"^[^@\s]+@([A-Za-z0-9-]+\.)+[A-Za-z]{2,}$")


def verify_email_domain(email: str, resolver=None) -> bool:
    """Reference law: MX records must resolve for the domain. No DNS in
    this sandbox — the default path is a syntactic check (labeled stub);
    pass ``resolver(domain) -> bool`` to restore the MX semantics."""
    if not _EMAIL_RE.match(email or ""):
        return False
    if resolver is not None:
        try:
            return bool(resolver(email.split("@", 1)[1]))
        except Exception:
            return False
    return True
