"""Sharded pruned scoring parity (parallel/engine.search_topk_pruned).

The 10M-tier two-phase path (ops/pruned.py) on the 8-device CPU mesh
must match the single-device DENSE path exactly on small corpora (the
per-shard prefix + candidate budgets cover everything): per-shard
nomination + shard-local exact rescore with a psum'd global df, final
all_gather top-k merge. Counts are estimates unless the exact counting
dispatch runs (psum of shard-disjoint exact counts).
"""

import tempfile

import numpy as np
import pytest

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

MASTER = "mk"

_SYL = ["ba", "de", "fi", "go", "ku", "lo", "mi", "na", "po", "ra"]
VOCAB = ["apple", "banana", "cherry", "fig", "grape", "kiwi", "lemon",
         "mango"] + [a + b for a in _SYL for b in _SYL]

DOCS = []
_rng = np.random.default_rng(41)
for i in range(400):
    w1 = _rng.choice(VOCAB, size=4, replace=False).tolist()
    # cross-field overlap: union df must dedup docs across fields
    w2 = _rng.choice(w1 + VOCAB[:8], size=3, replace=False).tolist()
    DOCS.append({
        "id": str(i),
        "title": " ".join(w1),
        "body": " ".join(w2) + f" u{i}",
        "_omc": 1.5 if i % 9 == 0 else None,
    })
for d in DOCS:
    if d["_omc"] is None:
        d.pop("_omc")

QUERIES = [
    {"term": "apple banana", "limit": 10},
    {"term": "cherry", "limit": 10},
    {"term": "grape kiwi mango", "limit": 10, "boost": {"title": 2.0}},
    {"term": "apple", "limit": 10, "exact": True},
    {"term": "fig lemon", "offset": 3, "limit": 4},
    # tolerance rides the pruned mesh path too (variant-range union df)
    {"term": "aple", "tolerance": 1, "limit": 10},
    {"term": "zz nothing"},
]


def _assert_hits_match(a, b, q=None, tol=1e-4):
    """Ranked parity allowing id swaps among TIED scores: the corpus
    produces many exact BM25 ties, and tied docs have no canonical
    order across kernel shapes (a batch's padding changes the float
    reduction order by an ulp, legally reordering ties)."""
    sa = [h.score for h in a.hits]
    sb = [h.score for h in b.hits]
    assert len(sa) == len(sb), (q, sa, sb)
    assert np.allclose(sa, sb, rtol=tol, atol=tol), (q, sa, sb)
    offset = int((q or {}).get("offset", 0))
    i, K = 0, len(sa)
    while i < K:
        j = i
        while j + 1 < K and abs(sa[j + 1] - sa[i]) <= tol * max(
            abs(sa[i]), 1.0
        ):
            j += 1
        # a tie run truncated by a PAGE BOUNDARY may continue beyond it
        # with more equal-score docs — any subset is a valid page slice
        # there, so only interior runs demand identical id sets. Both
        # boundaries truncate: the page end (run reaches K-1) and, under
        # a nonzero offset, the page start (run starts at 0 — the group
        # may extend into the dropped offset rows).
        if j < K - 1 and not (i == 0 and offset > 0):
            assert {h.id for h in a.hits[i:j + 1]} == {
                h.id for h in b.hits[i:j + 1]
            }, (q, i, j, [h.id for h in a.hits], [h.id for h in b.hits])
        i = j + 1


def _build(tmp, shards, pruning, docs=None):
    cfg = OramacoreConfig()
    cfg.data_dir = tmp
    cfg.auth.master_api_key = MASTER
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.sharded_shards = shards
    cfg.reader_side.pruning = pruning
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    coll = orama.write_side.create_collection(MASTER, "c")
    orama.write_side.create_index("c", coll.write_api_key, "main")
    orama.write_side.insert_documents(
        "c", "main", coll.write_api_key,
        DOCS if docs is None else docs,
    )
    orama.write_side.embedding_queue.flush_and_wait()
    orama.read_side.pump()
    return orama, coll


def test_sharded_pruned_matches_single_device_dense():
    import jax

    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        single, coll_s = _build(t1, 0, "off")
        sharded, coll_m = _build(t2, 8, "on")
        try:
            assert sharded.read_side.sharded_mesh is not None
            single.read_side.commit(force=True)
            sharded.read_side.commit(force=True)
            engaged = 0
            for q in QUERIES:
                a = single.read_side.search(
                    "c", coll_s.read_api_key, SearchParams.from_json(dict(q))
                )
                b = sharded.read_side.search(
                    "c", coll_m.read_api_key, SearchParams.from_json(dict(q))
                )
                _assert_hits_match(a, b, q)
                if b.count_estimated:
                    engaged += 1
                    # the estimate is floored by verified candidates
                    assert b.count >= len(b.hits), q
                else:
                    assert b.count == a.count, q
            # the pruned path actually ran on the mesh (count_estimated
            # is only ever set by the pruned tier)
            assert engaged >= len(QUERIES) - 2
        finally:
            single.stop()
            sharded.stop()


def test_sharded_pruned_exact_counts():
    """exactCount on the mesh: psum of shard-disjoint exact counts ==
    the dense single-device count; thresholds become pruned-eligible."""
    import jax

    assert len(jax.devices()) >= 8
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        single, coll_s = _build(t1, 0, "off")
        sharded, coll_m = _build(t2, 8, "on")
        try:
            single.read_side.commit(force=True)
            sharded.read_side.commit(force=True)
            for q in (
                {"term": "apple banana", "limit": 10},
                {"term": "cherry", "limit": 10},
                {"term": "apple", "limit": 10, "exact": True},
                {"term": "apple banana cherry", "limit": 10,
                 "threshold": 0.6},
            ):
                qa = dict(q)
                qb = {**q, "exactCount": True}
                a = single.read_side.search(
                    "c", coll_s.read_api_key, SearchParams.from_json(qa)
                )
                b = sharded.read_side.search(
                    "c", coll_m.read_api_key, SearchParams.from_json(qb)
                )
                _assert_hits_match(a, b, q)
                assert b.count == a.count, q
                assert not b.count_estimated, q
        finally:
            single.stop()
            sharded.stop()


def test_sharded_pruned_live_layer_mix():
    """Pruned on the mesh across committed + live postings (live ranges
    ride the clipped-prefix fallback; ends align up to boundaries)."""
    import jax

    assert len(jax.devices()) >= 8
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        single, coll_s = _build(t1, 0, "off")
        sharded, coll_m = _build(t2, 8, "on")
        try:
            single.read_side.commit(force=True)
            sharded.read_side.commit(force=True)
            extra = [
                {"id": f"x{i}", "title": "apple banana zulu",
                 "body": "banana cherry"}
                for i in range(20)
            ]
            for o, c in ((single, coll_s), (sharded, coll_m)):
                o.write_side.insert_documents(
                    "c", "main", c.write_api_key, extra
                )
                o.write_side.embedding_queue.flush_and_wait()
                o.read_side.pump()
            for q in (
                {"term": "apple banana", "limit": 15},
                {"term": "zulu", "limit": 10},
            ):
                a = single.read_side.search(
                    "c", coll_s.read_api_key, SearchParams.from_json(dict(q))
                )
                b = sharded.read_side.search(
                    "c", coll_m.read_api_key, SearchParams.from_json(dict(q))
                )
                _assert_hits_match(a, b, q)
        finally:
            single.stop()
            sharded.stop()


def test_sharded_pruned_batch():
    """search_batch on the mesh rides the sharded pruned kernels when
    pruning engages (read._search_batch_index routing)."""
    import jax

    assert len(jax.devices()) >= 8
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        single, coll_s = _build(t1, 0, "off")
        sharded, coll_m = _build(t2, 8, "on")
        try:
            single.read_side.commit(force=True)
            sharded.read_side.commit(force=True)
            batch = [
                {"term": "apple banana", "limit": 10},
                {"term": "cherry", "limit": 10},
                {"term": "grape kiwi", "limit": 8},
            ]
            seq = [
                single.read_side.search(
                    "c", coll_s.read_api_key, SearchParams.from_json(dict(q))
                )
                for q in batch
            ]
            got = sharded.read_side.search_batch(
                "c", coll_m.read_api_key,
                [SearchParams.from_json(dict(q)) for q in batch],
            )
            for s, g, q in zip(seq, got, batch):
                _assert_hits_match(s, g, q)
                assert g.count_estimated, q
            got = sharded.read_side.search_batch(
                "c", coll_m.read_api_key,
                [SearchParams.from_json({**q, "exactCount": True})
                 for q in batch],
            )
            for s, g, q in zip(seq, got, batch):
                assert g.count == s.count, q
                assert not g.count_estimated, q
        finally:
            single.stop()
            sharded.stop()


def test_sharded_pruned_filtered_matches_single_device():
    """Filtered fulltext on the mesh rides the sharded pruned kernel
    with a doc-sharded mask (round-3 session 4): parity vs the
    single-device DENSE filtered path, exact counts via the small-filter
    cand-given mode, and tombstones (deletes, no where-filter) keep the
    mesh on the pruned tier too."""
    import jax

    from oramacore_tpu.parallel import engine as eng

    assert len(jax.devices()) >= 8
    fdocs = []
    for i, d in enumerate(DOCS):
        d = dict(d)
        d["n"] = i % 7
        fdocs.append(d)
    calls = []
    orig = eng.ShardedStringExec.search_topk_pruned

    def spy(self, *a, **kw):
        calls.append(kw.get("mask"))
        return orig(self, *a, **kw)

    eng.ShardedStringExec.search_topk_pruned = spy
    try:
        with tempfile.TemporaryDirectory() as t1, \
                tempfile.TemporaryDirectory() as t2:
            single, coll_s = _build(t1, 0, "off", docs=fdocs)
            sharded, coll_m = _build(t2, 8, "on", docs=fdocs)
            try:
                single.read_side.commit(force=True)
                sharded.read_side.commit(force=True)
                for q in (
                    {"term": "apple banana", "limit": 10,
                     "where": {"n": {"lt": 4}}},
                    {"term": "cherry grape", "limit": 10,
                     "where": {"n": {"eq": 2}}},
                    {"term": "apple banana fig", "limit": 10,
                     "threshold": 0.6, "where": {"n": {"lt": 5}}},
                ):
                    a = single.read_side.search(
                        "c", coll_s.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    b = sharded.read_side.search(
                        "c", coll_m.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    _assert_hits_match(a, b, q)
                    # small filters -> cand-given -> exact counts
                    assert b.count == a.count, q
                    assert not b.count_estimated, q
                assert all(m is not None for m in calls)
                assert len(calls) == 3

                # tombstones: delete docs, no where-filter — the mesh
                # must stay pruned with the alive-mask as the filter
                gone = [str(i) for i in range(0, 400, 4)]
                for orama, coll in ((single, coll_s), (sharded, coll_m)):
                    orama.write_side.delete_documents(
                        "c", "main", coll.write_api_key, gone
                    )
                    orama.read_side.pump()
                q = {"term": "apple banana", "limit": 20}
                a = single.read_side.search(
                    "c", coll_s.read_api_key, SearchParams.from_json(dict(q))
                )
                b = sharded.read_side.search(
                    "c", coll_m.read_api_key, SearchParams.from_json(dict(q))
                )
                _assert_hits_match(a, b, q)
                assert not {h.id for h in b.hits} & set(gone)
                assert len(calls) == 4 and calls[-1] is not None
            finally:
                single.stop()
                sharded.stop()
    finally:
        eng.ShardedStringExec.search_topk_pruned = orig


def test_sharded_pruned_facets_parity():
    """Facet counting at the pruned tier on the MESH: per-shard bucket
    histograms off the sharded worklist, psum'd — counts must equal the
    single-device dense path (tombstones included, device facet spy)."""
    import jax

    from oramacore_tpu.parallel import engine as eng

    assert len(jax.devices()) >= 8
    fdocs = []
    for i, d in enumerate(DOCS):
        d = dict(d)
        d["n"] = i % 5
        d["flag"] = bool(i % 2)
        fdocs.append(d)
    calls = []
    orig = eng.ShardedStringExec.facet_counts_pruned

    def spy(self, *a, **kw):
        calls.append(True)
        return orig(self, *a, **kw)

    eng.ShardedStringExec.facet_counts_pruned = spy
    try:
        with tempfile.TemporaryDirectory() as t1, \
                tempfile.TemporaryDirectory() as t2:
            single, coll_s = _build(t1, 0, "off", docs=fdocs)
            sharded, coll_m = _build(t2, 8, "on", docs=fdocs)
            try:
                single.read_side.commit(force=True)
                sharded.read_side.commit(force=True)
                for orama, coll in ((single, coll_s), (sharded, coll_m)):
                    orama.write_side.delete_documents(
                        "c", "main", coll.write_api_key,
                        [str(i) for i in range(0, 400, 9)],
                    )
                    orama.read_side.pump()
                for q in (
                    {"term": "apple banana", "limit": 10, "facets": {
                        "n": {"ranges": [{"from": 0, "to": 2},
                                         {"from": 2, "to": 4}]},
                        "flag": {"true": True, "false": True},
                    }},
                    {"term": "aple", "tolerance": 1, "limit": 10,
                     "facets": {"flag": {"true": True, "false": True}}},
                    # thresholded facets: reps count distinct matched
                    # tokens per doc; the response count is the exact
                    # rep sum (facet_match_count), not the estimate
                    {"term": "apple banana", "threshold": 1.0,
                     "limit": 10,
                     "facets": {"flag": {"true": True, "false": True}}},
                ):
                    a = single.read_side.search(
                        "c", coll_s.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    b = sharded.read_side.search(
                        "c", coll_m.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    for f in q["facets"]:
                        assert a.facets[f].values == b.facets[f].values, (
                            q, f, a.facets[f].values, b.facets[f].values,
                        )
                    if q.get("threshold") is not None:
                        assert a.count == b.count, (q, a.count, b.count)
                        assert not b.count_estimated
                assert calls  # the mesh device facet path engaged
            finally:
                single.stop()
                sharded.stop()
    finally:
        eng.ShardedStringExec.facet_counts_pruned = orig


def test_pruned_kernel_generation_policy():
    """POLICY (VERDICT r3 #1): single-device and mesh must dispatch the
    SAME pruned kernel generation. With PRUNED_BS=True an eligible
    search (single-span tokens, non-exact, unfiltered) runs the v4
    binary-search rescore on BOTH stacks; with PRUNED_BS=False both run
    the v3 streaming rescore. A default flip that reaches only one
    stack (the round-3 regression) fails here."""
    import jax

    import oramacore_tpu.ops.pruned as prmod
    from oramacore_tpu.index import search_exec as se
    from oramacore_tpu.parallel import engine as eng

    assert len(jax.devices()) >= 8

    bs_calls = []
    orig_bs = prmod.pruned_fulltext_topk_bs
    orig_v3 = prmod.pruned_fulltext_topk

    def spy_bs(*a, **kw):
        bs_calls.append("single_v4")
        return orig_bs(*a, **kw)

    v3_calls = []

    def spy_v3(*a, **kw):
        v3_calls.append("single_v3")
        return orig_v3(*a, **kw)

    mesh_modes = []
    orig_step = eng.ShardedStringExec._get_pruned_step

    def spy_step(self, **kw):
        mesh_modes.append(bool(kw.get("use_bs")))
        return orig_step(self, **kw)

    q = {"term": "apple banana", "limit": 10}
    # the v4 gate needs single-span tokens (nre == 0): one searchable
    # string field — the two-field DOCS corpus keeps both stacks on v3
    sdocs = [
        {"id": d["id"], "t": d["title"],
         **({"_omc": d["_omc"]} if "_omc" in d else {})}
        for d in DOCS
    ]
    prmod.pruned_fulltext_topk_bs = spy_bs
    prmod.pruned_fulltext_topk = spy_v3
    eng.ShardedStringExec._get_pruned_step = spy_step
    old_flag = se.PrunedPlanMixin.PRUNED_BS
    try:
        with tempfile.TemporaryDirectory() as t1, \
                tempfile.TemporaryDirectory() as t2:
            single, coll_s = _build(t1, 0, "on", docs=sdocs)
            sharded, coll_m = _build(t2, 8, "on", docs=sdocs)
            try:
                single.read_side.commit(force=True)
                sharded.read_side.commit(force=True)
                for flag in (True, False):
                    se.PrunedPlanMixin.PRUNED_BS = flag
                    bs_calls.clear()
                    v3_calls.clear()
                    mesh_modes.clear()
                    a = single.read_side.search(
                        "c", coll_s.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    b = sharded.read_side.search(
                        "c", coll_m.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    assert a.hits and b.hits
                    if flag:
                        assert bs_calls and not v3_calls
                        assert mesh_modes == [True], mesh_modes
                    else:
                        assert v3_calls and not bs_calls
                        assert mesh_modes == [False], mesh_modes
                    _assert_hits_match(a, b, q)
            finally:
                single.stop()
                sharded.stop()
    finally:
        prmod.pruned_fulltext_topk_bs = orig_bs
        prmod.pruned_fulltext_topk = orig_v3
        eng.ShardedStringExec._get_pruned_step = orig_step
        se.PrunedPlanMixin.PRUNED_BS = old_flag

def test_sharded_batch_exact_counts_sliced():
    """A >8-query exactCount batch on the mesh dispatches the counts
    kernel in <= PRUNED_COUNTS_SLICE query slices (its per-shard global
    sort is superlinear in flat length): counts stay exact and match
    the single-device dense per-query path."""
    import jax

    from oramacore_tpu.index.search_exec import PrunedPlanMixin as PM
    from oramacore_tpu.parallel import engine as eng

    assert len(jax.devices()) >= 8

    S = PM.PRUNED_COUNTS_SLICE
    slice_b = []
    orig_step = eng.ShardedStringExec._get_pruned_counts_step

    def spy_step(self, **kw):
        step = orig_step(self, **kw)

        def wrapped(p_doc, p_tf, p_etf, wl, thr, fm):
            slice_b.append(int(thr.shape[0]))
            return step(p_doc, p_tf, p_etf, wl, thr, fm)

        return wrapped

    eng.ShardedStringExec._get_pruned_counts_step = spy_step
    try:
        with tempfile.TemporaryDirectory() as t1, \
                tempfile.TemporaryDirectory() as t2:
            single, coll_s = _build(t1, 0, "off")
            sharded, coll_m = _build(t2, 8, "on")
            try:
                single.read_side.commit(force=True)
                sharded.read_side.commit(force=True)
                terms = [VOCAB[i % 16] for i in range(2 * S + 4)]
                batch = [
                    {"term": f"{t} {VOCAB[(i + 3) % 16]}", "limit": 5,
                     "exactCount": True}
                    for i, t in enumerate(terms)
                ]
                seq = [
                    single.read_side.search(
                        "c", coll_s.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    for q in batch
                ]
                got = sharded.read_side.search_batch(
                    "c", coll_m.read_api_key,
                    [SearchParams.from_json(dict(q)) for q in batch],
                )
                for s, g, q in zip(seq, got, batch):
                    _assert_hits_match(s, g, q)
                    assert g.count == s.count, q
                    assert not g.count_estimated, q
                assert slice_b and all(b == S for b in slice_b), slice_b
                assert len(slice_b) >= -(-len(batch) // S)
            finally:
                single.stop()
                sharded.stop()
    finally:
        eng.ShardedStringExec._get_pruned_counts_step = orig_step


def test_sharded_pruned_facets_multivalued_parity():
    """MULTI-VALUED facet fields on the MESH device path: the deduped
    pair table shards by doc % D and per-shard bounded probes psum to
    exact global counts (parallel/engine._get_facet_hist_multi_step) —
    equal to the single-device dense path, distinct-value and
    range-once semantics included."""
    import jax

    from oramacore_tpu.parallel import engine as eng

    assert len(jax.devices()) >= 8
    fdocs = []
    for i, d in enumerate(DOCS):
        d = dict(d)
        d["tags"] = ["x", "y", "x"] if i % 2 else ["x"]
        d["sizes"] = [i % 5, (i % 5) + 3]
        fdocs.append(d)
    calls = []
    orig = eng.ShardedStringExec._get_facet_hist_multi_step

    def spy(self, *a, **kw):
        calls.append(True)
        return orig(self, *a, **kw)

    eng.ShardedStringExec._get_facet_hist_multi_step = spy
    try:
        with tempfile.TemporaryDirectory() as t1, \
                tempfile.TemporaryDirectory() as t2:
            single, coll_s = _build(t1, 0, "off", docs=fdocs)
            sharded, coll_m = _build(t2, 8, "on", docs=fdocs)
            try:
                single.read_side.commit(force=True)
                sharded.read_side.commit(force=True)
                q = {"term": "apple banana", "limit": 10, "facets": {
                    "tags": {},
                    "sizes": {"ranges": [{"from": 0, "to": 3},
                                         {"from": 4, "to": 7}]},
                }}
                a = single.read_side.search(
                    "c", coll_s.read_api_key,
                    SearchParams.from_json(dict(q)),
                )
                b = sharded.read_side.search(
                    "c", coll_m.read_api_key,
                    SearchParams.from_json(dict(q)),
                )
                for f in q["facets"]:
                    assert a.facets[f].values == b.facets[f].values, (
                        f, a.facets[f].values, b.facets[f].values,
                    )
                assert calls  # the mesh multi-valued step engaged
            finally:
                single.stop()
                sharded.stop()
    finally:
        eng.ShardedStringExec._get_facet_hist_multi_step = orig
