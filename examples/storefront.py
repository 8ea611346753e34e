"""Storefront walkthrough: facets, filters, groups, sort, merchandising
(pin rules + shelves), OMC boosts, and the TPU-native batched search API.

Run: python examples/storefront.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

CATALOG = [
    {"id": "tee-red", "name": "classic cotton tee", "color": "red",
     "price": 19.0, "stock": True, "category": "tops"},
    {"id": "tee-blue", "name": "classic cotton tee", "color": "blue",
     "price": 19.0, "stock": True, "category": "tops"},
    {"id": "hoodie", "name": "fleece hoodie with logo", "color": "gray",
     "price": 59.0, "stock": True, "category": "tops"},
    {"id": "jeans", "name": "slim denim jeans", "color": "blue",
     "price": 79.0, "stock": False, "category": "bottoms"},
    {"id": "shorts", "name": "running shorts lightweight", "color": "red",
     "price": 29.0, "stock": True, "category": "bottoms"},
    # _omc: order multiplier custom — score boost set at index time
    {"id": "tee-promo", "name": "limited edition cotton tee", "color": "black",
     "price": 25.0, "stock": True, "category": "tops", "_omc": 1.5},
]


def show(title, result):
    print(f"\n== {title} (count={result.count})")
    for h in result.hits:
        doc = h.document or {}
        print(f"  {h.id:22s} score={h.score:6.3f}  {doc.get('name', '')}")


def main():
    cfg = OramacoreConfig()
    cfg.data_dir = tempfile.mkdtemp(prefix="oramacore-storefront-")
    cfg.auth.master_api_key = "master"
    orama = build_orama(cfg, sync_embeddings=True)
    writer, reader = orama.write_side, orama.read_side

    coll = writer.create_collection("master", "store")
    wk, rk = coll.write_api_key, coll.read_api_key
    writer.create_index("store", wk, "catalog")
    writer.insert_documents("store", "catalog", wk, CATALOG)
    writer.embedding_queue.flush_and_wait()
    reader.pump()

    def search(p):
        return reader.search("store", rk, SearchParams.from_json(p))

    # facets + filters
    out = search({
        "term": "cotton tee",
        "where": {"stock": True},
        "facets": {"color": {}, "category": {}},
    })
    show("in-stock tees with facets", out)
    print("  facets:", {k: v.values for k, v in (out.facets or {}).items()})

    # group by category, best 2 per group
    out = search({
        "term": "", "groupBy": {"properties": ["category"], "maxResults": 2},
    })
    print("\n== grouped by category")
    for g in out.groups or []:
        print(f"  {g.values}: {[h.id for h in g.result]}")

    # sort by price descending
    show("price desc", search({
        "term": "", "sortBy": {"property": "price", "order": "desc"},
    }))

    # merchandising: pin the hoodie to position 0 on 'tee' searches
    writer.insert_pin_rule("store", wk, {
        "id": "hoodie-push",
        "conditions": [{"pattern": "tee", "anchoring": "contains"}],
        "consequence": {"promote": [{"doc_id": "hoodie", "position": 0}]},
    })
    writer.insert_shelf("store", wk, {
        "id": "summer", "name": "Summer picks", "items": ["shorts", "tee-red"],
    })
    reader.pump()
    show("tee search with pin rule", search({"term": "cotton tee"}))
    print("  shelves:", [s["id"] for s in writer.list_shelves("store", wk)])

    # the _omc boost lifts the promo tee above its BM25 ranking
    show("omc boost", search({"term": "cotton tee limited"}))

    # TPU-native batched search: one device pass for the whole batch
    batch = reader.search_batch("store", rk, [
        SearchParams.from_json({"term": q})
        for q in ["cotton", "denim", "running"]
    ])
    print("\n== batched search")
    for q, r in zip(["cotton", "denim", "running"], batch):
        print(f"  {q!r}: {[h.id.split(':', 1)[1] for h in r.hits]}")

    orama.stop()
    print("\nOK")


if __name__ == "__main__":
    main()
