"""Native (C++) runtime components, loaded via ctypes.

The tokenizer/stemmer is the host-side ingest hot loop (every string
field of every document passes through it — reference does this in Rust,
write/index/fields.rs:715). `load_tokenizer()` compiles the shared
library on first use (g++, cached next to the source) and returns a
ctypes binding, or None when no toolchain is available — callers fall
back to the pure-Python implementation, which is the semantic oracle.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

logger = logging.getLogger("oramacore_tpu.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tokenizer.cpp")
_LIB = os.path.join(_DIR, "libtokenizer.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        logger.warning("native tokenizer build failed: %s", e)
        return False


def load_tokenizer():
    """Returns the ctypes lib or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.tokenize_and_stem.argtypes = [ctypes.c_char_p]
            lib.tokenize_and_stem.restype = ctypes.c_void_p
            lib.stem_word.argtypes = [ctypes.c_char_p]
            lib.stem_word.restype = ctypes.c_void_p
            lib.free_result.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError as e:
            logger.warning("native tokenizer load failed: %s", e)
            _lib = None
        return _lib


def native_tokenize_and_stem(lib, text: str) -> List[Tuple[str, List[str]]]:
    """Call the native tokenizer; returns tokenize_and_stem-shaped output."""
    ptr = lib.tokenize_and_stem(text.encode("utf-8"))
    try:
        raw = ctypes.string_at(ptr).decode("utf-8", errors="replace")
    finally:
        lib.free_result(ptr)
    out: List[Tuple[str, List[str]]] = []
    for line in raw.splitlines():
        if not line:
            continue
        token, _, stem = line.partition("\t")
        out.append((token, [stem] if stem else []))
    return out


def native_stem(lib, word: str) -> str:
    ptr = lib.stem_word(word.encode("utf-8"))
    try:
        return ctypes.string_at(ptr).decode("utf-8", errors="replace")
    finally:
        lib.free_result(ptr)
