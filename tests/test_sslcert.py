"""SSL certificate model: DER parse round-trip on generated fixtures,
the decode law, properties, and PEM/DER/JSON export contracts."""

import base64
import json

from crawl4ai_ray.state.sslcert import (
    SSLCertificate,
    make_self_signed_der,
    parse_der_certificate,
)


def _fixture():
    return make_self_signed_der("example.test", "Example CA",
                                serial=0xABCDEF, san=b"www.example.test")


def test_der_parse_roundtrip():
    der = _fixture()
    cert = SSLCertificate.from_der(der)
    assert cert.subject == {"CN": "example.test", "O": "Test Org"}
    assert cert.issuer == {"CN": "Example CA", "O": "Test CA"}
    assert cert["serial_number"] == hex(0xABCDEF)
    assert cert.valid_from == "20240101000000Z"
    assert cert.valid_until == "20340101000000Z"
    assert cert["signature_algorithm"] == "sha256WithRSAEncryption"
    assert cert["version"] == 2
    import hashlib

    assert cert.fingerprint == hashlib.sha256(der).hexdigest()
    assert cert["extensions"][0]["name"] == "subjectAltName"


def test_decode_law_and_json():
    raw = {"subject": {b"CN": b"x"}, "vals": [b"a", 1, {"k": b"b"}]}
    cert = SSLCertificate(raw)
    assert cert["subject"] == {"CN": "x"}
    assert cert["vals"] == ["a", 1, {"k": "b"}]
    # dict subclass → directly serializable; to_json matches
    assert json.loads(cert.to_json()) == dict(cert)


def test_exports(tmp_path):
    der = _fixture()
    cert = SSLCertificate.from_der(der)
    assert cert.to_der() == der
    pem = cert.to_pem()
    assert pem.startswith("-----BEGIN CERTIFICATE-----")
    body = "".join(l for l in pem.splitlines() if not l.startswith("-"))
    assert base64.b64decode(body) == der
    cert.to_pem(str(tmp_path / "c.pem"))
    cert.to_der(str(tmp_path / "c.der"))
    cert.to_json(str(tmp_path / "c.json"))
    assert (tmp_path / "c.der").read_bytes() == der
    assert json.loads((tmp_path / "c.json").read_text())["subject"][
        "CN"] == "example.test"


def test_from_url_returns_none_without_network():
    assert SSLCertificate.from_url("https://no-such-host.invalid/",
                                   timeout=1) is None
