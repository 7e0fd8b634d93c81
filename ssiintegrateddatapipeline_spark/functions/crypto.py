"""SSI crypto kernel: Ed25519 keys, compact JWTs, did:key derivation.

Pure-compute reimplementation of the reference's Veramo service hops
(issue VC: veramo-agent/src/veramo/veramo_authorisation_credential.ts:79-240;
verify: veramo-verifier/src/server.ts:500-539; did:key derivation:
veramo_resolver_manager.ts:22-64 — all reimplemented from the public W3C
VC / did:key / JWS specs, no service calls). Runs inside Arrow-batched
Pandas UDFs on executors; keys are deterministic from a seed string so test
vectors are reproducible.

JWT: JOSE compact serialization, alg=EdDSA (RFC 8037).
did:key: multicodec 0xed01 + raw public key, base58btc, 'z' prefix -> the
standard 'did:key:z6Mk...' form for Ed25519.
"""

from __future__ import annotations

import base64
import hashlib
import json

from cryptography.exceptions import InvalidSignature
from cryptography.hazmat.primitives.asymmetric.ed25519 import (
    Ed25519PrivateKey,
    Ed25519PublicKey,
)

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def b58encode(data: bytes) -> str:
    n = int.from_bytes(data, "big")
    out = []
    while n > 0:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    # preserve leading zero bytes
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def seed_for(name: str, namespace: str = "ssi-identity") -> bytes:
    """Deterministic 32-byte Ed25519 seed for a symbol/alias."""
    return hashlib.sha256(f"{namespace}|{name}".encode()).digest()


def keypair_for(name: str) -> tuple[Ed25519PrivateKey, Ed25519PublicKey]:
    priv = Ed25519PrivateKey.from_private_bytes(seed_for(name))
    return priv, priv.public_key()


def public_bytes(pub: Ed25519PublicKey) -> bytes:
    from cryptography.hazmat.primitives.serialization import Encoding, PublicFormat

    return pub.public_bytes(Encoding.Raw, PublicFormat.Raw)


def did_key_for(pub: Ed25519PublicKey) -> str:
    """did:key for an Ed25519 key: multicodec ed25519-pub (0xed, varint ->
    0xed 0x01) + raw key, base58btc with 'z' multibase prefix."""
    return "did:key:z" + b58encode(b"\xed\x01" + public_bytes(pub))


def jwt_sign(claims: dict, priv: Ed25519PrivateKey) -> str:
    """Compact JWS, alg=EdDSA. Deterministic: sorted keys, no whitespace."""
    header = {"alg": "EdDSA", "typ": "JWT"}

    def enc(obj: dict) -> str:
        return b64url(json.dumps(obj, sort_keys=True, separators=(",", ":")).encode())

    signing_input = f"{enc(header)}.{enc(claims)}"
    sig = priv.sign(signing_input.encode("ascii"))
    return f"{signing_input}.{b64url(sig)}"


def jwt_verify(token: str, pub: Ed25519PublicKey) -> bool:
    try:
        signing_input, sig_b64 = token.rsplit(".", 1)
        pub.verify(b64url_decode(sig_b64), signing_input.encode("ascii"))
        return True
    except (InvalidSignature, ValueError):
        return False


def jwt_claims(token: str) -> dict:
    return json.loads(b64url_decode(token.split(".")[1]))
