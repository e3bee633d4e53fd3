"""SSL certificate model + export laws (reference ssl_certificate.py:1-203).

The reference builds its cert dict with pyOpenSSL (absent here) after a
live TLS handshake (no network here). This port keeps the same data
contract on the stdlib:

- ``SSLCertificate(dict)`` — the dict-subclass model with the bytes→str
  decode law (_decode_cert_data, ssl_certificate.py:41-60), the
  subject/issuer/valid_from/valid_until/fingerprint properties and the
  to_json / to_pem / to_der exports (PEM is the base64-64-col wrapping
  of DER — no OpenSSL needed);
- ``parse_der_certificate`` — a from-scratch minimal X.509/DER reader
  (ASN.1 TLV walk): version, serial (hex), issuer/subject RDNs mapped to
  OpenSSL short names (CN/C/O/OU/L/ST/emailAddress), notBefore/notAfter
  as OpenSSL-style ``YYYYMMDDHHMMSSZ`` strings, sha256 fingerprint of
  the DER, signature-algorithm OID name, extension short names;
- ``SSLCertificate.from_url`` — the live path via the stdlib ``ssl``
  handshake (works when a network exists; returns None on any failure,
  matching the reference's error law);
- ``make_self_signed_der`` — deterministic DER fixture encoder for tests
  (structurally valid TBSCertificate; the signature is a placeholder —
  the parser, like the reference's, never verifies signatures).
"""

from __future__ import annotations

import base64
import hashlib
import json
import ssl
import socket
from pathlib import Path
from urllib.parse import urlparse

# OID → OpenSSL short-name maps (X.520 attribute types; RFC 5280 algs)
_RDN_OIDS = {
    (2, 5, 4, 3): "CN", (2, 5, 4, 6): "C", (2, 5, 4, 7): "L",
    (2, 5, 4, 8): "ST", (2, 5, 4, 10): "O", (2, 5, 4, 11): "OU",
    (1, 2, 840, 113549, 1, 9, 1): "emailAddress",
}
_SIG_OIDS = {
    (1, 2, 840, 113549, 1, 1, 5): "sha1WithRSAEncryption",
    (1, 2, 840, 113549, 1, 1, 11): "sha256WithRSAEncryption",
    (1, 2, 840, 113549, 1, 1, 12): "sha384WithRSAEncryption",
    (1, 2, 840, 10045, 4, 3, 2): "ecdsa-with-SHA256",
    (1, 2, 840, 10045, 4, 3, 3): "ecdsa-with-SHA384",
}
_EXT_OIDS = {
    (2, 5, 29, 17): "subjectAltName", (2, 5, 29, 19): "basicConstraints",
    (2, 5, 29, 15): "keyUsage", (2, 5, 29, 37): "extendedKeyUsage",
    (2, 5, 29, 14): "subjectKeyIdentifier",
    (2, 5, 29, 35): "authorityKeyIdentifier",
    (2, 5, 29, 31): "cRLDistributionPoints",
}


# -- minimal DER (TLV) --------------------------------------------------------


def _tlv(buf: bytes, pos: int):
    """One ASN.1 TLV → (tag, header_len, content, next_pos)."""
    tag = buf[pos]
    i = pos + 1
    length = buf[i]
    i += 1
    if length & 0x80:
        n = length & 0x7F
        length = int.from_bytes(buf[i:i + n], "big")
        i += n
    return tag, buf[i:i + length], i + length


def _iter_children(content: bytes):
    pos = 0
    while pos < len(content):
        tag, body, nxt = _tlv(content, pos)
        yield tag, body, content[pos:nxt]
        pos = nxt


def _decode_oid(body: bytes) -> tuple:
    if not body:
        return ()
    first = body[0]
    out = [first // 40, first % 40]
    val = 0
    for b in body[1:]:
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(val)
            val = 0
    return tuple(out)


def _parse_name(body: bytes) -> dict:
    """RDNSequence → {shortname: value} (last occurrence wins, matching
    pyOpenSSL's dict(get_components()))."""
    out = {}
    for _tag, rdn_set, _ in _iter_children(body):       # SET per RDN
        for _t2, attr_seq, _ in _iter_children(rdn_set):  # SEQUENCE
            kids = list(_iter_children(attr_seq))
            if len(kids) != 2:
                continue
            oid = _decode_oid(kids[0][1])
            val = kids[1][1].decode("utf-8", "replace")
            key = _RDN_OIDS.get(oid, ".".join(map(str, oid)))
            out[key] = val
    return out


def _parse_time(tag: int, body: bytes) -> str:
    """UTCTime/GeneralizedTime → OpenSSL get_notBefore format
    (YYYYMMDDHHMMSSZ)."""
    s = body.decode("ascii", "replace")
    if tag == 0x17:  # UTCTime YYMMDD...
        yy = int(s[:2])
        s = ("20" if yy < 50 else "19") + s
    return s


def parse_der_certificate(der: bytes) -> dict:
    """DER X.509 → the reference's cert_info dict
    (ssl_certificate.py:90-111 contract)."""
    _tag, cert_body, _ = _tlv(der, 0)                     # Certificate
    kids = list(_iter_children(cert_body))
    tbs_body = kids[0][1]
    sig_alg_oid = None
    if len(kids) > 1:
        alg_kids = list(_iter_children(kids[1][1]))
        if alg_kids:
            sig_alg_oid = _decode_oid(alg_kids[0][1])

    fields = list(_iter_children(tbs_body))
    idx = 0
    version = 0
    if fields and fields[idx][0] == 0xA0:                 # [0] EXPLICIT
        vk = list(_iter_children(fields[idx][1]))
        if vk:
            version = int.from_bytes(vk[0][1], "big")
        idx += 1
    serial = int.from_bytes(fields[idx][1], "big", signed=True)
    idx += 1
    idx += 1                                              # tbs sig alg
    issuer = _parse_name(fields[idx][1])
    idx += 1
    validity = list(_iter_children(fields[idx][1]))
    not_before = _parse_time(validity[0][0], validity[0][1])
    not_after = _parse_time(validity[1][0], validity[1][1])
    idx += 1
    subject = _parse_name(fields[idx][1])
    idx += 1
    idx += 1                                              # SPKI
    extensions = []
    for tag, body, _ in fields[idx:]:
        if tag == 0xA3:                                   # [3] extensions
            ext_seq = list(_iter_children(body))
            if ext_seq:
                for _t, ext_body, _ in _iter_children(ext_seq[0][1]):
                    ext_kids = list(_iter_children(ext_body))
                    if ext_kids:
                        oid = _decode_oid(ext_kids[0][1])
                        extensions.append({
                            "name": _EXT_OIDS.get(
                                oid, ".".join(map(str, oid))),
                            "value": ext_kids[-1][1].hex(),
                        })
    return {
        "subject": subject,
        "issuer": issuer,
        "version": version,
        "serial_number": hex(serial),
        "not_before": not_before,
        "not_after": not_after,
        "fingerprint": hashlib.sha256(der).hexdigest(),
        "signature_algorithm": _SIG_OIDS.get(
            sig_alg_oid, ".".join(map(str, sig_alg_oid or ()))),
        "raw_cert": base64.b64encode(der),
        "extensions": extensions,
    }


# -- the model ---------------------------------------------------------------


class SSLCertificate(dict):
    """Dict-subclass cert model (directly JSON-serializable)."""

    def __init__(self, cert_info: dict):
        super().__init__(self._decode_cert_data(cert_info))

    @staticmethod
    def _decode_cert_data(data):
        """bytes→str decode law (ssl_certificate.py:41-60)."""
        if isinstance(data, bytes):
            try:
                return data.decode("utf-8")
            except UnicodeDecodeError:
                return data.decode("latin-1")
        if isinstance(data, dict):
            return {
                (k.decode("utf-8") if isinstance(k, bytes) else k):
                SSLCertificate._decode_cert_data(v)
                for k, v in data.items()
            }
        if isinstance(data, list):
            return [SSLCertificate._decode_cert_data(x) for x in data]
        return data

    @staticmethod
    def from_der(der: bytes) -> "SSLCertificate":
        return SSLCertificate(parse_der_certificate(der))

    @staticmethod
    def from_url(url: str, timeout: int = 10):
        """Live TLS fetch (no network in this sandbox → returns None, the
        reference's any-error law)."""
        try:
            hostname = urlparse(url).netloc.split(":")[0]
            context = ssl.create_default_context()
            with socket.create_connection((hostname, 443),
                                          timeout=timeout) as sock:
                with context.wrap_socket(
                        sock, server_hostname=hostname) as ssock:
                    der = ssock.getpeercert(binary_form=True)
                    if not der:
                        return None
                    return SSLCertificate.from_der(der)
        except Exception:
            return None

    # properties (ssl_certificate.py:138-157)
    @property
    def issuer(self) -> dict:
        return self.get("issuer", {})

    @property
    def subject(self) -> dict:
        return self.get("subject", {})

    @property
    def valid_from(self) -> str:
        return self.get("not_before", "")

    @property
    def valid_until(self) -> str:
        return self.get("not_after", "")

    @property
    def fingerprint(self) -> str:
        return self.get("fingerprint", "")

    # exports (ssl_certificate.py:159-198)
    def to_json(self, filepath: str | None = None):
        json_str = json.dumps(self, indent=2, ensure_ascii=False)
        if filepath:
            Path(filepath).write_text(json_str, encoding="utf-8")
            return None
        return json_str

    def to_pem(self, filepath: str | None = None):
        try:
            der = base64.b64decode(self.get("raw_cert", ""))
            b64 = base64.b64encode(der).decode("ascii")
            lines = [b64[i:i + 64] for i in range(0, len(b64), 64)]
            pem = ("-----BEGIN CERTIFICATE-----\n"
                   + "\n".join(lines) + "\n-----END CERTIFICATE-----\n")
            if filepath:
                Path(filepath).write_text(pem, encoding="utf-8")
                return None
            return pem
        except Exception:
            return None

    def to_der(self, filepath: str | None = None):
        try:
            der = base64.b64decode(self.get("raw_cert", ""))
            if filepath:
                Path(filepath).write_bytes(der)
                return None
            return der
        except Exception:
            return None

    def __repr__(self) -> str:
        return (f"<SSLCertificate subject CN={self.subject.get('CN','N/A')}"
                f" issuer CN={self.issuer.get('CN','N/A')}>")


# -- deterministic DER fixture encoder ---------------------------------------


def _enc_tlv(tag: int, body: bytes) -> bytes:
    n = len(body)
    if n < 0x80:
        return bytes([tag, n]) + body
    lb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(lb)]) + lb + body


def _enc_oid(oid: tuple) -> bytes:
    body = bytearray([oid[0] * 40 + oid[1]])
    for part in oid[2:]:
        chunk = bytearray([part & 0x7F])
        part >>= 7
        while part:
            chunk.insert(0, 0x80 | (part & 0x7F))
            part >>= 7
        body += chunk
    return _enc_tlv(0x06, bytes(body))


def _enc_name(attrs: dict) -> bytes:
    rev = {v: k for k, v in _RDN_OIDS.items()}
    rdns = b""
    for short, val in attrs.items():
        atv = _enc_oid(rev[short]) + _enc_tlv(0x0C, val.encode())
        rdns += _enc_tlv(0x31, _enc_tlv(0x30, atv))
    return _enc_tlv(0x30, rdns)


def make_self_signed_der(subject_cn: str, issuer_cn: str | None = None,
                         serial: int = 0x1234,
                         not_before: str = "240101000000Z",
                         not_after: str = "340101000000Z",
                         san: bytes = b"") -> bytes:
    """Structurally-valid X.509 DER for tests (placeholder signature)."""
    sig_alg = _enc_tlv(0x30, _enc_oid((1, 2, 840, 113549, 1, 1, 11))
                       + _enc_tlv(0x05, b""))
    version = _enc_tlv(0xA0, _enc_tlv(0x02, b"\x02"))
    serial_enc = _enc_tlv(
        0x02, serial.to_bytes((serial.bit_length() + 8) // 8, "big"))
    issuer = _enc_name({"CN": issuer_cn or subject_cn, "O": "Test CA"})
    validity = _enc_tlv(0x30, _enc_tlv(0x17, not_before.encode())
                        + _enc_tlv(0x17, not_after.encode()))
    subject = _enc_name({"CN": subject_cn, "O": "Test Org"})
    spki = _enc_tlv(0x30, _enc_tlv(0x30, _enc_oid(
        (1, 2, 840, 113549, 1, 1, 1)) + _enc_tlv(0x05, b""))
        + _enc_tlv(0x03, b"\x00\x30\x00"))
    exts = b""
    if san:
        ext = _enc_tlv(0x30, _enc_oid((2, 5, 29, 17))
                       + _enc_tlv(0x04, _enc_tlv(0x30, _enc_tlv(0x82, san))))
        exts = _enc_tlv(0xA3, _enc_tlv(0x30, ext))
    tbs = _enc_tlv(0x30, version + serial_enc + sig_alg + issuer
                   + validity + subject + spki + exts)
    return _enc_tlv(0x30, tbs + sig_alg + _enc_tlv(0x03, b"\x00\xAA"))
