"""Canonical Huffman coder (sphinxbase util/huff_code.c capability)."""

import io

import numpy as np
import pytest

from cmusphinx_tpu.utils.huff import HuffCode


def test_roundtrip_ints():
    rng = np.random.RandomState(0)
    # Zipf-ish symbol stream.
    syms = list(rng.zipf(1.5, 2000) % 50)
    freqs = {}
    for s in syms:
        freqs[int(s)] = freqs.get(int(s), 0) + 1
    hc = HuffCode.build(freqs)
    data, nbits = hc.encode([int(s) for s in syms])
    assert hc.decode(data, nbits) == [int(s) for s in syms]
    # Compression beats fixed-width for a skewed alphabet.
    fixed = len(syms) * int(np.ceil(np.log2(len(freqs))))
    assert nbits < fixed


def test_roundtrip_strings():
    text = "go forward ten meters go go forward".split()
    freqs = {}
    for w in text:
        freqs[w] = freqs.get(w, 0) + 1
    hc = HuffCode.build(freqs)
    data, nbits = hc.encode(text)
    assert hc.decode(data, nbits) == text


def test_canonical_property():
    """Within a length, codes are consecutive; lengths are Kraft-tight."""
    hc = HuffCode.build({"a": 5, "b": 3, "c": 2, "d": 1, "e": 1})
    assert abs(sum(2.0 ** -ln for _, ln in hc.codes.values()) - 1.0) < 1e-12
    by_len = {}
    for sym, (c, ln) in hc.codes.items():
        by_len.setdefault(ln, []).append(c)
    for ln, cs in by_len.items():
        cs = sorted(cs)
        assert cs == list(range(cs[0], cs[0] + len(cs)))


def test_serialize():
    hc = HuffCode.build({"x": 4, "y": 2, "z": 1, 7: 9})
    buf = io.StringIO()
    hc.write(buf)
    buf.seek(0)
    hc2 = HuffCode.read(buf)
    assert hc2.codes == hc.codes


def test_single_symbol():
    hc = HuffCode.build({"only": 3})
    data, nbits = hc.encode(["only"] * 4)
    assert hc.decode(data, nbits) == ["only"] * 4
