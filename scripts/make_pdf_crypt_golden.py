#!/usr/bin/env python
"""Mint PDF Standard-security goldens R2-R6 with an INDEPENDENT
derivation (VERDICT r11 item 7 — the last mirror-risk seam in
operators/pdf_crypt.py).

No PDF encryptor ships in this container (no qpdf/mutool/pikepdf), so
this script IS the independent implementation: every algorithm here —
RC4, AES (log/antilog-table construction, self-checked against the
FIPS 197 C.1/C.3 vectors before minting), Algorithm 2 (legacy file
key), Algorithm 3 (/O), Algorithms 4/5 (/U), the R5 SHA-256 hash and
Algorithm 2.B (R6 hardened hash) — is transcribed FRESH from ISO
32000-1 §7.6.3 / 32000-2 §7.6.4, sharing zero code with the module
under test.  A transcription bug in pdf_crypt.py's derivation (e.g.
truncating inside Algorithm 3's 50-round loop, or hashing the wrong
udata span in 2.B) cannot cancel out of both sides: the fixture would
simply fail to decrypt.

The fixtures are a minimal one-page PDF (uncompressed content stream)
and its five encrypted twins (R2/V1-40, R3/V2-128, R4/V4-AESV2,
R5/V5-AESV3, R6/V5-AESV3), empty user password, owner password set —
the DRM-shaped documents a crawl actually hits.  Output is python
source for tests/test_pdf_crypt_golden.py.

Usage: python scripts/make_pdf_crypt_golden.py
"""

from __future__ import annotations

import hashlib

# ----------------------------------------------------------- ciphers
# GF(2^8) log/antilog tables over generator 3 — a different
# construction shape than the module's _gf_mul/_make_sbox pair.

_ALOG = [1] * 256
for _i in range(1, 256):
    _v = _ALOG[_i - 1]
    _v = _v ^ (_v << 1)
    if _v & 0x100:
        _v ^= 0x11B
    _ALOG[_i] = _v
_LOG = [0] * 256
for _i in range(255):
    _LOG[_ALOG[_i]] = _i


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _ALOG[(_LOG[a] + _LOG[b]) % 255]


def _rot8(x: int, n: int) -> int:
    return ((x << n) | (x >> (8 - n))) & 0xFF


_SBOX = [0] * 256
for _i in range(256):
    _inv = 0 if _i == 0 else _ALOG[255 - _LOG[_i]]
    _SBOX[_i] = (
        _inv ^ _rot8(_inv, 1) ^ _rot8(_inv, 2) ^ _rot8(_inv, 3)
        ^ _rot8(_inv, 4) ^ 0x63
    )

_RCON = [0x01]
for _i in range(13):
    _RCON.append(_gmul(_RCON[-1], 2))


def _expand(key: bytes):
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[x] for x in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[x] for x in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return w, nr


def _aes_block(w, nr, block: bytes) -> bytes:
    # state kept column-major as a flat 16-list (s[4*c + r])
    s = [block[i] ^ w[i // 4][i % 4] for i in range(16)]
    for rnd in range(1, nr + 1):
        s = [_SBOX[x] for x in s]
        # ShiftRows on column-major flat layout
        s = [s[(4 * (i // 4 + i % 4) + i % 4) % 16] for i in range(16)]
        if rnd < nr:
            t = []
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                t += [
                    _gmul(col[0], 2) ^ _gmul(col[1], 3) ^ col[2] ^ col[3],
                    col[0] ^ _gmul(col[1], 2) ^ _gmul(col[2], 3) ^ col[3],
                    col[0] ^ col[1] ^ _gmul(col[2], 2) ^ _gmul(col[3], 3),
                    _gmul(col[0], 3) ^ col[1] ^ col[2] ^ _gmul(col[3], 2),
                ]
            s = t
        rk = w[4 * rnd : 4 * rnd + 4]
        s = [s[i] ^ rk[i // 4][i % 4] for i in range(16)]
    return bytes(s)


def aes_cbc_enc(key: bytes, iv: bytes, data: bytes) -> bytes:
    assert len(data) % 16 == 0
    w, nr = _expand(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _aes_block(w, nr, blk)
        out += prev
    return bytes(out)


# self-check against the public FIPS 197 vectors BEFORE minting
assert _aes_block(
    *_expand(bytes(range(16))), bytes.fromhex("00112233445566778899aabbccddeeff")
) == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
assert _aes_block(
    *_expand(bytes(range(32))), bytes.fromhex("00112233445566778899aabbccddeeff")
) == bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out.append(c ^ S[(S[i] + S[j]) & 0xFF])
    return bytes(out)


# ------------------------------------------- ISO 32000 derivations

PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def _md5(b: bytes) -> bytes:
    return hashlib.md5(b).digest()


def alg2_file_key(user_pwd, o_entry, p, id0, r, n, encrypt_metadata=True):
    """ISO 32000-1 Algorithm 2: the legacy file key."""
    buf = (
        (user_pwd + PAD)[:32]
        + o_entry
        + (p & 0xFFFFFFFF).to_bytes(4, "little")
        + id0
    )
    if r >= 4 and not encrypt_metadata:
        buf += b"\xff\xff\xff\xff"
    key = _md5(buf)
    if r >= 3:
        for _ in range(50):
            key = _md5(key[:n])  # Algorithm 2 truncates INSIDE the loop
    return key[:n]


def alg3_o(owner_pwd, user_pwd, r, n):
    """ISO 32000-1 Algorithm 3: the /O entry."""
    key = _md5((owner_pwd + PAD)[:32])
    if r >= 3:
        for _ in range(50):
            key = _md5(key)  # FULL digest (no truncation here)
    key = key[:n]
    o = rc4(key, (user_pwd + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def alg4_u(file_key):
    """Algorithm 4 (R2): /U = RC4 of the padding string."""
    return rc4(file_key, PAD)


def alg5_u(file_key, id0):
    """Algorithm 5 (R>=3): 16 significant bytes + 16 arbitrary."""
    u = rc4(file_key, _md5(PAD + id0))
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16


def hash_2b(pwd, salt, udata):
    """ISO 32000-2 Algorithm 2.B (R6 hardened hash)."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    rnd = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_enc(k[:16], k[16:32], k1)
        digest = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            int.from_bytes(e[:16], "big") % 3
        ]
        k = digest(e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def r56_auth_entries(r, user_pwd, owner_pwd, file_key):
    """/U /UE /O /OE for R5 (plain SHA-256) and R6 (2.B)."""

    def h(pwd, salt, udata):
        if r == 5:
            return hashlib.sha256(pwd + salt + udata).digest()
        return hash_2b(pwd, salt, udata)

    uvs, uks = b"indepVS!", b"indepKS!"
    u = h(user_pwd, uvs, b"") + uvs + uks
    ue = aes_cbc_enc(h(user_pwd, uks, b""), b"\x00" * 16, file_key)
    ovs, oks = b"ownerVS!", b"ownerKS!"
    o = h(owner_pwd, ovs, u[:48]) + ovs + oks
    oe = aes_cbc_enc(h(owner_pwd, oks, u[:48]), b"\x00" * 16, file_key)
    return u, ue, o, oe


def object_key(file_key, cfm, num, gen):
    """ISO 32000-1 Algorithm 1 per-object key."""
    if cfm == "aes256":
        return file_key
    buf = (
        file_key
        + (num & 0xFFFFFF).to_bytes(3, "little")
        + (gen & 0xFFFF).to_bytes(2, "little")
    )
    if cfm == "aes128":
        buf += b"\x73\x41\x6c\x54"  # sAlT
    return _md5(buf)[: min(len(file_key) + 5, 16)]


def encrypt_stream(file_key, cfm, num, gen, data):
    k = object_key(file_key, cfm, num, gen)
    if cfm == "rc4":
        return rc4(k, data)
    pad = 16 - len(data) % 16
    iv = _md5(b"golden-iv" + bytes([num]))[:16]
    return iv + aes_cbc_enc(k, iv, data + bytes([pad]) * pad)


# ------------------------------------------------------ the fixture

ID0 = bytes.fromhex("0123456789abcdeffedcba9876543210")
P = -44
OWNER = b"golden-owner"
CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (Independent derivation pin.) Tj "
    b"0 -14 Td (Spec-minted golden.) Tj ET"
)


def build_pdf(stream_data: bytes, encdict: bytes | None) -> bytes:
    out = bytearray(b"%PDF-1.6\n")
    objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (
            3,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        ),
        (
            4,
            b"<< /Length %d >>\nstream\n" % len(stream_data)
            + stream_data
            + b"\nendstream",
        ),
        (
            5,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        ),
    ]
    if encdict is not None:
        objs.append((6, encdict))
    for num, body in objs:
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    trailer = b"trailer\n<< /Size %d /Root 1 0 R " % (len(objs) + 1)
    if encdict is not None:
        trailer += (
            b"/Encrypt 6 0 R /ID [<%s> <%s>] "
            % (ID0.hex().encode(), ID0.hex().encode())
        )
    out += trailer + b">>\n%%EOF\n"
    return bytes(out)


def mint(r: int) -> bytes:
    if r in (2, 3, 4):
        n = 5 if r == 2 else 16
        o = alg3_o(OWNER, b"", r, n)
        key = alg2_file_key(b"", o, P, ID0, r, n)
        u = alg4_u(key) if r == 2 else alg5_u(key, ID0)
        v = {2: 1, 3: 2, 4: 4}[r]
        cfm = "aes128" if r == 4 else "rc4"
        d = (
            b"<< /Filter /Standard /V %d /R %d /Length %d /P %d "
            % (v, r, n * 8, P)
            + b"/O <" + o.hex().encode() + b"> /U <"
            + u.hex().encode() + b"> "
        )
        if r == 4:
            d += (
                b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> "
                b"/StmF /StdCF /StrF /StdCF "
            )
        d += b">>"
    else:
        file_key = hashlib.sha256(b"golden-file-key-%d" % r).digest()
        u, ue, o, oe = r56_auth_entries(r, b"", OWNER, file_key)
        key, cfm = file_key, "aes256"
        d = (
            b"<< /Filter /Standard /V 5 /R %d /Length 256 /P %d " % (r, P)
            + b"/CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF /StrF /StdCF "
            + b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> "
            + b"/OE <" + oe.hex().encode() + b"> /UE <"
            + ue.hex().encode() + b"> >>"
        )
    return build_pdf(encrypt_stream(key, cfm, 4, 0, CONTENT), d)


def _emit(name: str, b: bytes):
    print(f"{name} = bytes.fromhex(")
    hx = b.hex()
    for i in range(0, len(hx), 96):
        print(f'    "{hx[i:i + 96]}"')
    print(")")


def main():
    _emit("PLAIN_PDF", build_pdf(CONTENT, None))
    for r in (2, 3, 4, 5, 6):
        _emit(f"R{r}_PDF", mint(r))


if __name__ == "__main__":
    main()
