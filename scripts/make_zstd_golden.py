#!/usr/bin/env python
"""Mint GOLDEN zstd frames with the REFERENCE encoder: the system
``zstd`` CLI (v1.5.7, Yann Collet's implementation) compresses fixed
deterministic payloads at levels chosen to force every section type —
RLE blocks, raw blocks (incompressible), FSE-compressed sequence
tables, four-stream Huffman literals, treeless reuse across blocks,
repeat-mode tables, long-offset matches, multi-frame concatenation and
skippable frames.  The bytes are printed as hex for embedding in
tests/test_zstd_golden.py, so the tests need no CLI at runtime and any
misreading of RFC 8878 in sources/zstd.py disagrees with the reference
implementation immediately.

The INPUTS are regenerated inside the test from the same deterministic
generators below (sha256 chain for pseudo-random bytes — no RNG module
drift), so only the compressed bytes are committed.

Usage: python scripts/make_zstd_golden.py  →  python source to paste.
"""

from __future__ import annotations

import hashlib
import json
import subprocess


def rand_bytes(n: int, seed: bytes = b"zstd-golden") -> bytes:
    """Deterministic pseudo-random bytes via a sha256 chain."""
    out = bytearray()
    block = seed
    while len(out) < n:
        block = hashlib.sha256(block).digest()
        out += block
    return bytes(out[:n])


def text_payload() -> bytes:
    return (
        b"In the beginning the Universe was created. This has made a "
        b"lot of people very angry and been widely regarded as a bad "
        b"move. Many were increasingly of the opinion that they had "
        b"all made a big mistake in coming down from the trees. "
    ) * 64


def jsonl_payload() -> bytes:
    lines = []
    for i in range(200):
        lines.append(
            json.dumps(
                {
                    "id": f"doc-{i:04d}",
                    "text": "Document body with repeated boilerplate. "
                    * (1 + i % 7),
                    "lang": ("en", "de", "fr")[i % 3],
                },
                sort_keys=True,
            )
        )
    return ("\n".join(lines) + "\n").encode()


def warc_payload() -> bytes:
    """A two-record WARC (conversion + response) for the .warc.zst
    reader pin — same record framing as tests/test_warc.py."""

    def rec(headers: dict, block: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers.items()
        )
        head += f"Content-Length: {len(block)}\r\n".encode()
        return head + b"\r\n" + block + b"\r\n\r\n"

    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
        b"zstd-compressed crawl body"
    )
    return rec(
        {
            "WARC-Type": "conversion",
            "WARC-Target-URI": "https://example.com/wet",
            "WARC-Date": "2026-08-16T00:00:00Z",
            "Content-Type": "text/plain",
        },
        b"Pre-extracted text inside a zstd WARC.",
    ) + rec(
        {
            "WARC-Type": "response",
            "WARC-Target-URI": "https://example.com/page",
            "WARC-Date": "2026-08-16T00:00:01Z",
        },
        http,
    )


def _zc(data: bytes, *args: str) -> bytes:
    return subprocess.run(
        ["zstd", *args, "-c"], input=data, capture_output=True,
        check=True,
    ).stdout


def dict_samples() -> list:
    """Deterministic training samples shaped like the payloads."""
    out = []
    for i in range(80):
        out.append(
            (
                f"GET /page/{i} HTTP/1.1 Host example.com shared "
                f"boilerplate header text sequence {i} " * 25
            ).encode()
        )
    return out


def dict_payload() -> bytes:
    return (
        b"GET /page/7 HTTP/1.1 Host example.com shared boilerplate "
        b"header text sequence 7 " * 30 + b"novel tail content 987"
    )


def _train_dict(tmpdir: str) -> bytes:
    import os

    paths = []
    for i, s in enumerate(dict_samples()):
        p = os.path.join(tmpdir, f"s{i}")
        with open(p, "wb") as f:
            f.write(s)
        paths.append(p)
    dict_p = os.path.join(tmpdir, "dict")
    subprocess.run(
        ["zstd", "--train", *paths, "-o", dict_p, "--maxdict=4096"],
        capture_output=True, check=True,
    )
    with open(dict_p, "rb") as f:
        return f.read(), dict_p


def _emit(name: str, b: bytes):
    print(f"{name} = bytes.fromhex(")
    h = b.hex()
    for i in range(0, len(h), 96):
        print(f'    "{h[i:i + 96]}"')
    print(")")


def main():
    _emit("TEXT_L3", _zc(text_payload(), "-3"))
    _emit("TEXT_L19", _zc(text_payload(), "-19"))
    _emit("JSONL_L22", _zc(jsonl_payload(), "--ultra", "-22"))
    _emit("JSONL_L1_NOCHK", _zc(jsonl_payload(), "-1", "--no-check"))
    _emit("RLE_L9", _zc(b"A" * 10000, "-9"))
    _emit("RANDOM_L3", _zc(rand_bytes(4096), "-3"))
    _emit("EMPTY_L3", _zc(b"", "-3"))
    skip = (0x184D2A50).to_bytes(4, "little") + (7).to_bytes(
        4, "little"
    ) + b"ignored"
    _emit(
        "MULTIFRAME",
        _zc(b"first frame ", "-3") + skip + _zc(b"second frame", "-19"),
    )
    _emit("WARC_ZST", _zc(warc_payload(), "-9"))
    # trained-dictionary fixtures (RFC 8878 §5 + the IIPC .warc.zst
    # embedded-dictionary convention)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        dict_bytes, dict_p = _train_dict(d)
        _emit("DICT_BYTES", dict_bytes)
        _emit(
            "DICT_FRAME_L19",
            _zc(dict_payload(), "-19", "-D", dict_p),
        )
        # IIPC layout: skippable 0x184D2A5D carrying the dict, then
        # one frame per record compressed WITH the dict
        skip_dict = (
            (0x184D2A5D).to_bytes(4, "little")
            + len(dict_bytes).to_bytes(4, "little")
            + dict_bytes
        )
        recs = warc_payload()
        _emit(
            "WARC_ZST_DICT",
            skip_dict + _zc(recs, "-9", "-D", dict_p),
        )


if __name__ == "__main__":
    main()
