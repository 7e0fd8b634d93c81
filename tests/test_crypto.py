"""Property tests for the SSI crypto kernel (SURVEY §5: sign->verify
round-trip, tamper detection, did:key format)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ssiintegrateddatapipeline_spark.functions import crypto


def test_sign_verify_roundtrip():
    priv, pub = crypto.keypair_for("BINANCE:BTCUSDT")
    token = crypto.jwt_sign({"iss": "did:key:x", "claims": {"Price": 1.5}}, priv)
    assert crypto.jwt_verify(token, pub)


def test_tampered_payload_fails():
    priv, pub = crypto.keypair_for("BINANCE:BTCUSDT")
    token = crypto.jwt_sign({"claims": "a"}, priv)
    head, payload, sig = token.split(".")
    other = crypto.b64url(b'{"claims":"b"}')
    assert not crypto.jwt_verify(f"{head}.{other}.{sig}", pub)
    assert not crypto.jwt_verify(token + "x", pub)
    assert not crypto.jwt_verify("garbage", pub)


def test_wrong_key_fails():
    priv, _ = crypto.keypair_for("A")
    _, pub_b = crypto.keypair_for("B")
    assert not crypto.jwt_verify(crypto.jwt_sign({"x": 1}, priv), pub_b)


def test_did_key_format():
    _, pub = crypto.keypair_for("BINANCE:ETHUSDT")
    did = crypto.did_key_for(pub)
    # ed25519 multicodec under base58btc always yields the z6Mk prefix
    assert did.startswith("did:key:z6Mk")


def test_keys_deterministic():
    a1 = crypto.did_key_for(crypto.keypair_for("S")[1])
    a2 = crypto.did_key_for(crypto.keypair_for("S")[1])
    assert a1 == a2


@given(st.dictionaries(st.text(max_size=20), st.integers(), max_size=5))
@settings(max_examples=25, deadline=None)
def test_roundtrip_any_claims(claims):
    priv, pub = crypto.keypair_for("prop")
    token = crypto.jwt_sign(claims, priv)
    assert crypto.jwt_verify(token, pub)
    assert crypto.jwt_claims(token) == {str(k): v for k, v in claims.items()}


def test_b58_known_vector():
    # public test vector: leading zeros preserved, standard alphabet
    assert crypto.b58encode(b"\x00\x00hello") == "11Cn8eVZg"
