"""Quickstart: embedded engine, no HTTP server.

Run: python examples/quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams


def main():
    cfg = OramacoreConfig()
    cfg.data_dir = tempfile.mkdtemp(prefix="oramacore-quickstart-")
    cfg.auth.master_api_key = "master"

    orama = build_orama(cfg, sync_embeddings=True)
    writer, reader = orama.write_side, orama.read_side

    coll = writer.create_collection("master", "products")
    writer.create_index("products", coll.write_api_key, "main")
    writer.insert_documents(
        "products", "main", coll.write_api_key,
        [
            {"id": "1", "name": "wireless noise cancelling headphones",
             "price": 299, "tags": ["audio", "wireless"]},
            {"id": "2", "name": "mechanical keyboard with rgb lighting",
             "price": 120, "tags": ["input"]},
            {"id": "3", "name": "wired gaming mouse", "price": 45,
             "tags": ["input", "gaming"]},
        ],
    )
    writer.embedding_queue.flush_and_wait()
    reader.pump()  # (the server runs a consumer thread instead)

    print("— fulltext + filter:")
    out = reader.search("products", coll.read_api_key, SearchParams.from_json(
        {"term": "wireless headphones", "where": {"price": {"gt": 100}}}
    ))
    for h in out.hits:
        print("  ", h.id, round(h.score, 3), h.document["name"])

    print("— facets:")
    out = reader.search("products", coll.read_api_key, SearchParams.from_json(
        {"term": "wireless keyboard mouse", "facets": {"tags": {}}}
    ))
    print("  ", out.facets["tags"].values)

    print("— hybrid (semantic + keyword):")
    out = reader.search("products", coll.read_api_key, SearchParams.from_json(
        {"term": "typing peripherals", "mode": "hybrid", "similarity": 0.0}
    ))
    for h in out.hits[:2]:
        print("  ", h.id, round(h.score, 3), h.document["name"])

    print("— batched search (one device pass):")
    results = reader.search_batch(
        "products", coll.read_api_key,
        [SearchParams.from_json({"term": t})
         for t in ("headphones", "keyboard", "mouse")],
    )
    print("   counts:", [r.count for r in results])

    orama.stop()
    print("done.")


if __name__ == "__main__":
    main()
