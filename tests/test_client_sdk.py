"""Client SDK test against a live server on a real socket."""

import asyncio
import threading
import time

import pytest

from oramacore_tpu.client import ApiError, OramaCoreTPU
from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.server import ApiServer

MASTER = "client-master"


@pytest.fixture()
def live_server(tmp_path):
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = MASTER
    cfg.http.host = "127.0.0.1"
    cfg.http.port = 0
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=True)
    server = ApiServer(cfg, orama.write_side, orama.read_side)

    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_box = {}

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            from aiohttp import web

            runner = web.AppRunner(server.app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", 0)
            await site.start()
            port_box["port"] = site._server.sockets[0].getsockname()[1]
            started.set()
            while not port_box.get("stop"):
                await asyncio.sleep(0.05)
            await runner.cleanup()

        loop.run_until_complete(main())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    started.wait(10)
    yield f"http://127.0.0.1:{port_box['port']}"
    port_box["stop"] = True
    t.join(timeout=5)
    orama.stop()


def test_client_full_flow(live_server):
    client = OramaCoreTPU(live_server, master_api_key=MASTER)
    assert client.health()

    coll = client.create_collection("sdk-test")
    coll.create_index("main")
    out = coll.insert_documents(
        "main",
        [
            {"id": "1", "title": "solar panel kit", "watts": 400},
            {"id": "2", "title": "wind turbine", "watts": 1000},
        ],
    )
    assert out["inserted"] == 2

    found = None
    for _ in range(300):
        found = coll.search({"term": "solar panel"})
        if found["count"]:
            break
        time.sleep(0.02)
    assert found["count"] == 1
    assert found["hits"][0]["document"]["title"] == "solar panel kit"

    found = coll.search({"term": "solar wind", "where": {"watts": {"gte": 500}}})
    assert [h["id"] for h in found["hits"]] == ["main:2"]

    assert coll.stats()["document_count"] == 2
    assert coll.filterable_fields()["watts"] == "number"

    colls = client.list_collections()
    assert colls[0]["id"] == "sdk-test"

    with pytest.raises(ApiError) as e:
        OramaCoreTPU(live_server, master_api_key="bad").create_collection("x")
    assert e.value.status == 401

    client.delete_collection("sdk-test")
