"""RS512 JWT auth — twin of railgun/handlers/BaseHandler.go:61-93 and
AuthenticateHandler.go.

Tokens are standard JWS compact serialization (header.payload.signature,
base64url) with alg RS512 = RSA PKCS#1 v1.5 over SHA-512 — exactly what
jwt-go's SigningMethodRS512 produces (BaseHandler.go:63 NewWithClaims).
Implemented on `cryptography` primitives (no pyjwt in this container);
claims mirror jwt.StandardClaims: `sub` (Subject) + `exp` (ExpiresAt).
"""

from __future__ import annotations

import base64
import json
import time

from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import padding, rsa


class InvalidToken(ValueError):
    pass


def generate_keypair(bits: int = 2048) -> rsa.RSAPrivateKey:
    """Dev-mode keypair (the reference loads PEM keys via --jwt-private-key /
    --jwt-public-key config; serve.go)."""
    return rsa.generate_private_key(public_exponent=65537, key_size=bits)


def _b64(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _unb64(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def sign_token(
    private_key: rsa.RSAPrivateKey,
    subject: str,
    duration_seconds: float = 3600.0,
    now: float | None = None,
) -> str:
    """NewAuthorization parity (BaseHandler.go:61-74): RS512 JWT with
    Subject + ExpiresAt = now + session duration."""
    header = {"alg": "RS512", "typ": "JWT"}
    claims = {"sub": subject, "exp": int((now if now is not None else time.time()) + duration_seconds)}
    signing_input = (
        _b64(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64(json.dumps(claims, separators=(",", ":")).encode())
    )
    sig = private_key.sign(signing_input.encode(), padding.PKCS1v15(), hashes.SHA512())
    return signing_input + "." + _b64(sig)


def parse_token(public_key, token: str) -> dict:
    """ParseAuthorization parity (BaseHandler.go:81-93): verify signature
    with the public key, restrict ValidMethods to RS512, reject expired."""
    from cryptography.exceptions import InvalidSignature

    try:
        h64, p64, s64 = token.split(".")
        header = json.loads(_unb64(h64))
        sig = _unb64(s64)
    except Exception as e:
        raise InvalidToken(f"malformed token: {e}") from e
    if header.get("alg") != "RS512":
        raise InvalidToken(f"alg {header.get('alg')!r} not in ValidMethods ['RS512']")
    try:
        public_key.verify(sig, f"{h64}.{p64}".encode(), padding.PKCS1v15(), hashes.SHA512())
    except InvalidSignature as e:
        raise InvalidToken("signature verification failed") from e
    claims = json.loads(_unb64(p64))
    if "exp" in claims and time.time() > float(claims["exp"]):
        raise InvalidToken("token expired")
    return claims


def bearer_from_header(authorization: str | None) -> str:
    """GetAuthorization parity (BaseHandler.go:47-59): 'bearer <token>',
    scheme case-insensitive."""
    if not authorization:
        raise InvalidToken("missing required parameter Authorization")
    parts = authorization.split(" ")
    if len(parts) != 2 or parts[0].lower() != "bearer":
        raise InvalidToken(f"invalid Authorization header {authorization!r}")
    return parts[1]
