"""Profile the host ingest hot paths: writer-side insert_documents and
read-side op apply (pump), separately, with cProfile.

The absolute docs/s on this 1-core host swings with load (CLAUDE.md);
this script is for HOTSPOT RANKING — the cumulative-time shares.

    python benches/ingest_profile.py [--docs 5000] [--tokens 64]
"""

import cProfile
import io
import pstats
import random
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo/tests")

from tests.utils import TestContext  # noqa: E402

WORDS = [f"word{i:05d}" for i in range(20000)]


def make_docs(n, tokens):
    rng = random.Random(7)
    docs = []
    for i in range(n):
        body = " ".join(rng.choices(WORDS, k=tokens))
        docs.append(
            {
                "id": f"d{i}",
                "title": " ".join(rng.choices(WORDS, k=6)),
                "body": body,
                "price": rng.uniform(1, 100),
                "in_stock": rng.random() < 0.5,
                "genre": rng.choice(["a", "b", "c", "d"]),
            }
        )
    return docs


def top(profiler, label, n=25):
    s = io.StringIO()
    st = pstats.Stats(profiler, stream=s)
    st.sort_stats("cumulative").print_stats(n)
    print(f"\n==== {label} ====")
    # skip the pstats header noise
    lines = s.getvalue().splitlines()
    for ln in lines:
        print(ln)


def main():
    n = int(sys.argv[sys.argv.index("--docs") + 1]) if "--docs" in sys.argv else 5000
    toks = (
        int(sys.argv[sys.argv.index("--tokens") + 1])
        if "--tokens" in sys.argv
        else 64
    )
    docs = make_docs(n, toks)

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()

        # writer side
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        ctx.writer.insert_documents(
            coll.collection_id, idx.index_id, coll.write_key, docs
        )
        pr.disable()
        t_w = time.time() - t0
        print(f"writer insert: {n / t_w:.0f} docs/s ({t_w:.1f} s)")
        top(pr, "WRITER insert_documents")

        # reader apply
        pr2 = cProfile.Profile()
        t0 = time.time()
        pr2.enable()
        ctx.pump()
        pr2.disable()
        t_r = time.time() - t0
        print(f"reader apply: {n / t_r:.0f} docs/s ({t_r:.1f} s)")
        top(pr2, "READER pump (op apply)")

        # commit
        pr3 = cProfile.Profile()
        t0 = time.time()
        pr3.enable()
        ctx.writer.commit()
        ctx.reader.commit(force=True)
        pr3.disable()
        t_c = time.time() - t0
        print(f"commit: {t_c:.1f} s")
        top(pr3, "COMMIT (writer + reader)")
    finally:
        ctx.close()


if __name__ == "__main__":
    main()
