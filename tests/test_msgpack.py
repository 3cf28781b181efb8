"""MessagePack codec (sources/msgpack.py): exhaustive type-palette
roundtrips, width-boundary ints, stream framing, the spec's canonical
example bytes, and foreign-input handling."""

from __future__ import annotations

import math

import pytest

from metricproxy_spark.sources.msgpack import (
    decode_msgpack,
    decode_msgpack_stream,
    encode_msgpack,
)

_CASES = [
    None, True, False,
    0, 1, 127, 128, 255, 256, 65535, 65536, 2**32, 2**63 - 1, 2**64 - 1,
    -1, -31, -32, -33, -128, -129, -32768, -32769, -(2**31), -(2**31) - 1,
    -(2**63),
    1.5, -0.125, math.pi, 0.0,
    "", "a", "x" * 31, "y" * 32, "z" * 300, "é" * 100,
    b"", b"\x00\xff", b"q" * 300,
    [], [1, 2, 3], list(range(20)),
    {}, {"a": 1}, {f"k{i}": i for i in range(20)},
    {"name": "cpu", "value": 1.25, "ts": 1700000000,
     "dims": {"host": "h1", "az": None}, "tags": ["a", "b"]},
]


class TestMsgpack:
    @pytest.mark.parametrize("obj", _CASES, ids=lambda o: repr(o)[:30])
    def test_roundtrip(self, obj):
        rt = decode_msgpack(encode_msgpack(obj))
        assert rt == obj
        assert type(rt) is type(obj)

    def test_stream_framing(self):
        blob = b"".join(encode_msgpack(c) for c in _CASES)
        assert decode_msgpack_stream(blob) == _CASES

    def test_spec_reference_bytes(self):
        # the msgpack.org front-page example
        assert encode_msgpack({"compact": True, "schema": 0}) == bytes.fromhex(
            "82a7636f6d70616374c3a6736368656d6100"
        )

    def test_float32_decodes(self):
        # foreign encoders may emit float32 (0xca); ours never does
        assert decode_msgpack(b"\xca\x3f\xc0\x00\x00") == 1.5

    def test_trailing_garbage_rejected(self):
        with pytest.raises(ValueError, match="trailing"):
            decode_msgpack(encode_msgpack(1) + b"\x01")

    def test_unsupported_ext_type_rejected(self):
        with pytest.raises(ValueError, match="0xd4"):
            decode_msgpack(b"\xd4\x01\x00")  # fixext1

    def test_fuzz_malformed_raises_valueerror_only(self):
        import random

        from metricproxy_spark.sources.msgpack import decode_msgpack_stream

        rng = random.Random(1)
        for _ in range(3000):
            b = bytes(rng.randrange(256) for _ in range(rng.randint(0, 60)))
            try:
                decode_msgpack(b)
                decode_msgpack_stream(b)
            except ValueError:
                pass  # the ONLY permitted failure for foreign bytes

    def test_every_truncated_suffix_raises(self):
        # A truncated PREFIX of a valid encoding must never decode to a
        # wrong value (short int.from_bytes slices succeed silently);
        # r7 ADVICE: decode_msgpack_stream(b'\xa5ab') returned ['ab'].
        for obj in _CASES:
            enc = encode_msgpack(obj)
            for cut in range(len(enc)):
                with pytest.raises(ValueError):
                    decode_msgpack(enc[:cut])
        # the reported cases, verbatim
        for bad in (b"\xa5ab", b"\xce", b"\xce\x00\x00", b"\xc4\x05ab",
                    b"\xdb\x00\x00", b"\xd3\x01"):
            with pytest.raises(ValueError):
                decode_msgpack_stream(bad)
