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
            lib.tokenize_and_stem_wire.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.tokenize_and_stem_wire.restype = ctypes.c_void_p
            _lib = lib
        except (OSError, AttributeError) as e:
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


def native_tokenize_wire(lib, text: str) -> Tuple[int, str]:
    """(n_surface_tokens, packed op-body payload) — the writer's wire
    format produced in one native pass (no per-token Python objects)."""
    n = ctypes.c_int64(0)
    ptr = lib.tokenize_and_stem_wire(text.encode("utf-8"), ctypes.byref(n))
    try:
        raw = ctypes.string_at(ptr).decode("utf-8", errors="replace")
    finally:
        lib.free_result(ptr)
    return int(n.value), raw


def native_stem(lib, word: str) -> str:
    ptr = lib.stem_word(word.encode("utf-8"))
    try:
        return ctypes.string_at(ptr).decode("utf-8", errors="replace")
    finally:
        lib.free_result(ptr)


# ---------------------------------------------------------------------------
# Hash embedding encoder (hash_encode.cpp): the writer-side embedding hot
# loop when no trained model is configured. blake2b-8 + splitmix64 in
# C++, GIL-released for the whole batch; embeddings.hash_encode is the
# oracle (parity-tested to 1e-6 after L2 normalize).
# ---------------------------------------------------------------------------

_HE_SRC = os.path.join(_DIR, "hash_encode.cpp")
_HE_LIB = os.path.join(_DIR, "libhash_encode.so")
_he_lock = threading.Lock()
_he_lib = None
_he_tried = False


def load_hash_encoder():
    """ctypes lib for the native hash encoder, or None."""
    global _he_lib, _he_tried
    with _he_lock:
        if _he_lib is not None or _he_tried:
            return _he_lib
        _he_tried = True
        if not os.path.exists(_HE_LIB) or (
            os.path.exists(_HE_SRC)
            and os.path.getmtime(_HE_SRC) > os.path.getmtime(_HE_LIB)
        ):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _HE_LIB,
                     _HE_SRC],
                    check=True, capture_output=True, timeout=120,
                )
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired) as e:
                logger.warning("native hash encoder build failed: %s", e)
                return None
        try:
            lib = ctypes.CDLL(_HE_LIB)
            lib.he_encode.argtypes = [
                ctypes.c_char_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.he_encode.restype = ctypes.c_int32
            lib.he_encode_batch.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.he_encode_batch.restype = ctypes.c_int32
            _he_lib = lib
        except (OSError, AttributeError) as e:
            logger.warning("native hash encoder load failed: %s", e)
            _he_lib = None
        return _he_lib


def native_hash_encode_batch(lib, texts, dim: int):
    """float32[n, dim] L2-normalized hash embeddings for ASCII texts
    (callers gate non-ASCII to the Python oracle)."""
    import numpy as np

    blobs = [t.encode() for t in texts]
    offs = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offs[1:])
    concat = b"".join(blobs)
    out = np.empty((len(blobs), dim), np.float32)
    lib.he_encode_batch(
        concat, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(blobs), dim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


# ---------------------------------------------------------------------------
# Live-layer accumulator (live_accum.cpp): the read-side apply hot loop
# ---------------------------------------------------------------------------

_LA_SRC = os.path.join(_DIR, "live_accum.cpp")
_LA_LIB = os.path.join(_DIR, "liblive_accum.so")
_la_lock = threading.Lock()
_la_lib = None
_la_tried = False

_TOKEN_SEP = b"\x02"
_VARIANT_SEP = b"\x01"


def load_live_accum():
    """ctypes lib for the native live accumulator, or None."""
    global _la_lib, _la_tried
    with _la_lock:
        if _la_lib is not None or _la_tried:
            return _la_lib
        _la_tried = True
        if not os.path.exists(_LA_LIB) or (
            os.path.exists(_LA_SRC)
            and os.path.getmtime(_LA_SRC) > os.path.getmtime(_LA_LIB)
        ):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _LA_LIB,
                     _LA_SRC],
                    check=True, capture_output=True, timeout=120,
                )
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired) as e:
                logger.warning("native live accumulator build failed: %s", e)
                return None
        try:
            lib = ctypes.CDLL(_LA_LIB)
            lib.la_new.restype = ctypes.c_void_p
            lib.la_free.argtypes = [ctypes.c_void_p]
            lib.la_index_field.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ]
            lib.la_index_field.restype = ctypes.c_int64
            lib.la_delete_doc.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.la_delete_doc.restype = ctypes.c_int64
            lib.la_n_rows.argtypes = [ctypes.c_void_p, ctypes.c_int32]
            lib.la_n_rows.restype = ctypes.c_int64
            lib.la_n_terms.argtypes = [ctypes.c_void_p, ctypes.c_int32]
            lib.la_n_terms.restype = ctypes.c_int64
            lib.la_n_paths.argtypes = [ctypes.c_void_p]
            lib.la_n_paths.restype = ctypes.c_int32
            lib.la_export_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.la_term_names.argtypes = [
                ctypes.c_void_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.la_term_names.restype = ctypes.c_void_p
            lib.la_free_buf.argtypes = [ctypes.c_void_p]
            lib.la_clear.argtypes = [ctypes.c_void_p]
            _la_lib = lib
        except OSError as e:
            logger.warning("native live accumulator load failed: %s", e)
            _la_lib = None
        return _la_lib


class NativeLiveAccum:
    """Per-StringIndex handle over the C++ live accumulator."""

    __slots__ = ("_lib", "_h", "_path_ids", "_paths")

    def __init__(self, lib):
        self._lib = lib
        self._h = ctypes.c_void_p(lib.la_new())
        self._path_ids = {}
        self._paths = []

    def __del__(self):
        try:
            if self._h:
                self._lib.la_free(self._h)
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    def path_id(self, path: str) -> int:
        pid = self._path_ids.get(path)
        if pid is None:
            pid = len(self._paths)
            self._path_ids[path] = pid
            self._paths.append(path)
        return pid

    def index_parsed(self, path: str, doc_id: int, parsed,
                     index_bigrams: bool) -> int:
        # One str join + ONE utf-8 encode of the whole payload: per-token
        # bytes joins/encodes measured ~40% of read-side apply time.
        parts = []
        for tok, variants in parsed:
            if variants:
                parts.append(tok + "\x01" + "\x01".join(variants))
            else:
                parts.append(tok)
        return self.index_packed(path, doc_id, "\x02".join(parts),
                                 index_bigrams)

    def index_packed(self, path: str, doc_id: int, payload: str,
                     index_bigrams: bool) -> int:
        """Payload is already in the wire format (token := surface
        [\\x01 variant]*, joined by \\x02) — built once by the writer at
        tokenize time and passed straight through the op body."""
        data = payload.encode()
        return self._lib.la_index_field(
            self._h, self.path_id(path), doc_id, data, len(data),
            1 if index_bigrams else 0,
        )

    def delete_doc(self, doc_id: int) -> int:
        return self._lib.la_delete_doc(self._h, doc_id)

    def live_paths(self):
        return [
            p for p in self._paths
            if self._lib.la_n_rows(self._h, self._path_ids[p]) > 0
        ]

    def n_terms(self, path: str) -> int:
        pid = self._path_ids.get(path)
        if pid is None:
            return 0
        return int(self._lib.la_n_terms(self._h, pid))

    def n_rows(self, path: str) -> int:
        pid = self._path_ids.get(path)
        if pid is None:
            return 0
        return int(self._lib.la_n_rows(self._h, pid))

    def rows(self, path: str):
        """(doc int64[n], tid int64[n], tf f64[n], etf f64[n], names) or
        None when the path has no live rows."""
        import numpy as np

        pid = self._path_ids.get(path)
        if pid is None:
            return None
        n = int(self._lib.la_n_rows(self._h, pid))
        if n == 0:
            return None
        doc = np.empty(n, np.int64)
        tid = np.empty(n, np.int32)
        tf = np.empty(n, np.float32)
        etf = np.empty(n, np.float32)
        self._lib.la_export_rows(
            self._h, pid,
            doc.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            tid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            etf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        ln = ctypes.c_int64(0)
        buf = self._lib.la_term_names(self._h, pid, ctypes.byref(ln))
        try:
            raw = ctypes.string_at(buf, ln.value)
        finally:
            self._lib.la_free_buf(buf)
        names = raw.decode("utf-8", errors="replace").split("\n")[:-1]
        return (
            doc, tid.astype(np.int64), tf.astype(np.float64),
            etf.astype(np.float64), names,
        )

    def clear(self):
        self._lib.la_clear(self._h)
        self._path_ids.clear()
        self._paths.clear()
