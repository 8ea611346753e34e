"""Atomic file helpers (reference: oramacore_lib::fs::BufferedFile)."""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Optional

import msgpack


def atomic_write_bytes(path: str, data: bytes) -> None:
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def atomic_write_json(path: str, obj: Any) -> None:
    atomic_write_bytes(path, json.dumps(obj).encode())


def read_json(path: str, default: Any = None) -> Any:
    if not os.path.exists(path):
        return default
    with open(path, "r") as fh:
        return json.load(fh)


def atomic_write_msgpack(path: str, obj: Any) -> None:
    atomic_write_bytes(path, msgpack.packb(obj, use_bin_type=True))


def read_msgpack(path: str, default: Any = None) -> Any:
    if not os.path.exists(path):
        return default
    with open(path, "rb") as fh:
        return msgpack.unpackb(fh.read(), raw=False, strict_map_key=False)


# Snapshot compression is OPT-IN (ORAMACORE_COMPRESS_SNAPSHOTS=1): the
# reference writes raw bincode dumps, and zlib was ~25%% of read-side
# commit time at 10k docs (zlib 2.5s + fsync/write 3s vs 6s of merge).
def savez_snapshot(fh, **arrays):
    import os

    import numpy as np

    if os.environ.get("ORAMACORE_COMPRESS_SNAPSHOTS", "0") == "1":
        np.savez_compressed(fh, **arrays)
    else:
        np.savez(fh, **arrays)
