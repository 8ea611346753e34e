"""Native C++ tokenizer parity with the pure-Python oracle."""

import json

import pytest

from oramacore_tpu.native import (
    load_tokenizer,
    native_stem,
    native_tokenize_and_stem,
)
from oramacore_tpu.utils.tokenizer import TextParser, porter2_stem
from oramacore_tpu.types import Locale

lib = load_tokenizer()
pytestmark = pytest.mark.skipif(lib is None, reason="no C++ toolchain")


def python_reference(text):
    p = TextParser(Locale.EN, use_native=False)
    return p.tokenize_and_stem(text)


def test_stemmer_parity_on_corpus_vocab():
    docs = json.load(open("/root/reference/benches/games.json"))
    vocab = set()
    p = TextParser(Locale.EN, use_native=False)
    for d in docs[:400]:
        vocab.update(p.tokenize(d["title"]))
        vocab.update(p.tokenize(d["description"]))
    vocab = sorted(v for v in vocab if v.isascii())
    assert len(vocab) > 1000
    mismatches = [
        (w, porter2_stem(w), native_stem(lib, w))
        for w in vocab
        if porter2_stem(w) != native_stem(lib, w)
    ]
    assert mismatches == [], mismatches[:20]


def test_tokenize_parity():
    cases = [
        "The quick brown fox JUMPS over the lazy dog!",
        "Rating: 4.5 stars (genres: RPG, Action-Adventure)",
        "it's the user's choice... really?",
        "",
        "   whitespace\t\tand\nnewlines   ",
        "x" * 500,
    ]
    for text in cases:
        assert native_tokenize_and_stem(lib, text) == python_reference(text), text


def test_native_used_by_default_parser():
    p = TextParser(Locale.EN)
    out = p.tokenize_and_stem("running foxes")
    assert out == [("running", ["run"]), ("foxes", ["fox"])]


def test_native_throughput_exceeds_python():
    import time

    docs = json.load(open("/root/reference/benches/games.json"))
    texts = [d["description"] for d in docs[:300]]
    t0 = time.perf_counter()
    for t in texts:
        native_tokenize_and_stem(lib, t)
    native_time = time.perf_counter() - t0
    p = TextParser(Locale.EN, use_native=False)
    t0 = time.perf_counter()
    for t in texts:
        p.tokenize_and_stem(t)
    python_time = time.perf_counter() - t0
    # native should be decisively faster on the ingest hot loop
    assert native_time < python_time, (native_time, python_time)


def test_wire_format_parity():
    """tokenize_and_stem_wire must equal pack_parsed(tokenize_and_stem)
    — count and payload — on corpus text + edge cases."""
    from oramacore_tpu.native import native_tokenize_wire
    from oramacore_tpu.utils.tokenizer import pack_parsed

    docs = json.load(open("/root/reference/benches/games.json"))
    texts = [
        "The quick brown fox JUMPS over the lazy dog!",
        "it's the user's choice... really?",
        "", "   ", "x" * 500, "a",
        "running foxes are RUNNING",
    ] + [d["description"] for d in docs[:150]]
    for text in texts:
        if not text.isascii():
            continue
        want = pack_parsed(python_reference(text))
        got = native_tokenize_wire(lib, text)
        assert got == want, text[:80]


def test_parser_packed_path_matches_oracle():
    p_native = TextParser(Locale.EN)
    p_python = TextParser(Locale.EN, use_native=False)
    from oramacore_tpu.utils.tokenizer import pack_parsed

    for text in ["Mario Kart 8 Deluxe racing", "", "Don't stop"]:
        assert p_native.tokenize_and_stem_packed(text) == pack_parsed(
            p_python.tokenize_and_stem(text)
        )
