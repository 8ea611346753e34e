"""Property/fuzz tests for the engine core (VERDICT r2 weak #7: no
randomized testing). Two suites:

1. randomized op sequences (insert / update / delete / commit / reload
   interleavings) asserting search-result equivalence against a naive
   in-memory model of the collection;
2. randomized where-filter trees asserting the engine's filter
   evaluation equals a direct numpy evaluation of the same tree.

Deterministic seeds — failures reproduce exactly.
"""

import numpy as np

from oramacore_tpu.types import SearchParams

from .utils import TestContext, ids_of

_WORDS = ["orange", "banana", "apple", "grape", "melon", "kiwi", "plum",
          "pear", "fig", "cherry", "lime", "date", "mango", "peach"]


def _mk_doc(rng, doc_id):
    return {
        "id": str(doc_id),
        "t": " ".join(
            rng.choice(_WORDS, size=int(rng.integers(1, 5)),
                       replace=False).tolist()
        ),
        "n": int(rng.integers(0, 10)),
        "f": bool(rng.integers(0, 2)),
        "s": str(rng.choice(["red", "green", "blue"])),
    }


def _naive_matches(model, term):
    toks = term.split()
    out = set()
    for did, doc in model.items():
        words = set(doc["t"].split())
        if any(t in words for t in toks):
            out.add(did)
    return out


def test_random_op_sequences_match_naive_model():
    rng = np.random.default_rng(42)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        model = {}
        next_id = 0
        for step in range(120):
            op = rng.choice(
                ["insert", "update", "delete", "commit", "check"],
                p=[0.4, 0.15, 0.15, 0.1, 0.2],
            )
            if op == "insert":
                docs = [_mk_doc(rng, next_id + i)
                        for i in range(int(rng.integers(1, 6)))]
                next_id += len(docs)
                idx.insert_documents(docs)
                for d in docs:
                    model[d["id"]] = d
            elif op == "update" and model:
                did = str(rng.choice(sorted(model)))
                d = _mk_doc(rng, did)
                d["id"] = did
                idx.insert_documents([d])  # upsert semantics
                model[did] = d
            elif op == "delete" and model:
                dids = [
                    str(x) for x in rng.choice(
                        sorted(model),
                        size=min(len(model), int(rng.integers(1, 3))),
                        replace=False,
                    )
                ]
                idx.delete_documents(dids)
                for did in dids:
                    model.pop(did)
            elif op == "commit":
                ctx.commit_all()
            else:  # check
                term = " ".join(
                    rng.choice(_WORDS, size=int(rng.integers(1, 3)),
                               replace=False).tolist()
                )
                got = coll.search({"term": term, "limit": 500})
                want = _naive_matches(model, term)
                assert set(ids_of(got)) == want, (step, term)
                assert got.count == len(want), (step, term)
        # final: reload round-trip preserves equivalence
        ctx2 = ctx.reload()
        try:
            got = ctx2.reader.search(
                coll.collection_id, coll.read_key,
                SearchParams.from_json({"term": "orange banana",
                                        "limit": 500}),
            )
            want = _naive_matches(model, "orange banana")
            assert {h.id.split(":", 1)[1] for h in got.hits} == want
        finally:
            ctx2.close()
            ctx = None
    finally:
        if ctx is not None:
            ctx.close()


def _eval_where(tree, doc):
    """Numpy-free naive evaluation of a where tree for one doc."""
    if "and" in tree:
        return all(_eval_where(t, doc) for t in tree["and"])
    if "or" in tree:
        return any(_eval_where(t, doc) for t in tree["or"])
    if "not" in tree:
        return not _eval_where(tree["not"], doc)
    ((path, cond),) = tree.items()
    v = doc.get(path)
    if isinstance(cond, dict):
        for op, val in cond.items():
            if op == "eq" and not v == val:
                return False
            if op == "gt" and not v > val:
                return False
            if op == "gte" and not v >= val:
                return False
            if op == "lt" and not v < val:
                return False
            if op == "lte" and not v <= val:
                return False
            if op == "between" and not (val[0] <= v <= val[1]):
                return False
        return True
    return v == cond


def _random_tree(rng, depth=0):
    r = rng.random()
    if depth < 2 and r < 0.3:
        kind = rng.choice(["and", "or", "not"])
        if kind == "not":
            return {"not": _random_tree(rng, depth + 1)}
        return {
            str(kind): [
                _random_tree(rng, depth + 1)
                for _ in range(int(rng.integers(2, 4)))
            ]
        }
    which = rng.choice(["n_range", "n_eq", "bool", "string"])
    if which == "n_range":
        op = str(rng.choice(["gt", "gte", "lt", "lte"]))
        return {"n": {op: int(rng.integers(0, 10))}}
    if which == "n_eq":
        if rng.random() < 0.5:
            lo = int(rng.integers(0, 8))
            return {"n": {"between": [lo, lo + int(rng.integers(0, 4))]}}
        return {"n": {"eq": int(rng.integers(0, 10))}}
    if which == "bool":
        return {"f": bool(rng.integers(0, 2))}
    return {"s": str(rng.choice(["red", "green", "blue"]))}


def test_random_filter_trees_match_naive():
    rng = np.random.default_rng(7)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = [_mk_doc(rng, i) for i in range(150)]
        idx.insert_documents(docs)
        ctx.commit_all()
        model = {d["id"]: d for d in docs}
        for trial in range(30):
            tree = _random_tree(rng)
            got = coll.search({"term": "", "where": tree, "limit": 500})
            want = {did for did, d in model.items() if _eval_where(tree, d)}
            assert set(ids_of(got)) == want, (trial, tree)
            assert got.count == len(want), (trial, tree)
    finally:
        ctx.close()


def test_random_op_sequences_pruned_exact_counts():
    """The randomized op-sequence property holds on the PRUNED tier
    with exact counts: searches forced through the two-phase
    candidate+rescore path (+ the exact counting dispatch) must match
    the naive model exactly — hits AND counts — across random
    insert/update/delete/commit interleavings."""
    rng = np.random.default_rng(7)
    ctx = TestContext()
    try:
        ctx.reader.config.reader_side.pruning = "on"
        ctx.reader.config.reader_side.pruned_exact_counts = True
        coll = ctx.create_collection()
        idx = coll.create_index()
        model = {}
        next_id = 0
        for step in range(80):
            op = rng.choice(
                ["insert", "update", "delete", "commit", "check"],
                p=[0.4, 0.15, 0.15, 0.1, 0.2],
            )
            if op == "insert":
                docs = [_mk_doc(rng, next_id + i)
                        for i in range(int(rng.integers(1, 6)))]
                next_id += len(docs)
                idx.insert_documents(docs)
                for d in docs:
                    model[d["id"]] = d
            elif op == "update" and model:
                did = str(rng.choice(sorted(model)))
                d = _mk_doc(rng, did)
                d["id"] = did
                idx.insert_documents([d])
                model[did] = d
            elif op == "delete" and model:
                dids = [
                    str(x) for x in rng.choice(
                        sorted(model),
                        size=min(len(model), int(rng.integers(1, 3))),
                        replace=False,
                    )
                ]
                idx.delete_documents(dids)
                for did in dids:
                    model.pop(did)
            elif op == "commit":
                ctx.commit_all()
            else:  # check (limit 200 keeps k <= 512: pruned-eligible)
                term = " ".join(
                    rng.choice(_WORDS, size=int(rng.integers(1, 3)),
                               replace=False).tolist()
                )
                got = coll.search(
                    {"term": term, "limit": 200, "exactCount": True}
                )
                want = _naive_matches(model, term)
                assert got.count == len(want), (step, term)
                assert not got.count_estimated, (step, term)
                if len(want) <= 200:
                    assert set(ids_of(got)) == want, (step, term)
                else:
                    assert set(ids_of(got)) <= want, (step, term)
    finally:
        ctx.reader.config.reader_side.pruning = "off"
        ctx.reader.config.reader_side.pruned_exact_counts = False
        ctx.close()


def test_fuzzy_match_prefilters_never_drop_true_matches():
    """The tolerance path prefilters candidates with two vectorized
    edit-distance lower bounds (char-class signature popcount and hashed
    bag distance) before the banded DP. Property: for ANY term in the
    vocab and ANY sequence of <=k random edits applied to it, the edited
    token must still surface the original term (the bounds are proved
    lower bounds; this fuzzes the implementation of that proof).
    Reference analog: the FST fuzzy walker is exhaustive by construction
    (string_field.rs); our cascade must be too."""
    from oramacore_tpu.index.string_index import StringIndex

    rng = np.random.default_rng(1234)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    vocab = sorted({
        "".join(rng.choice(list(alphabet),
                           size=int(rng.integers(3, 14))))
        for _ in range(3000)
    })
    idx = StringIndex(index_bigrams=False)
    parsed = [(w, []) for w in vocab]
    idx.index_text(1, "t", parsed)
    idx.commit()

    def edit(tok: str) -> str:
        kind = int(rng.integers(0, 3))
        pos = int(rng.integers(0, max(len(tok), 1)))
        c = alphabet[int(rng.integers(0, 26))]
        if kind == 0 and len(tok) > 1:      # delete
            return tok[:pos] + tok[pos + 1:]
        if kind == 1:                        # insert
            return tok[:pos] + c + tok[pos:]
        return tok[:pos] + c + tok[pos + 1:] if tok else c  # substitute

    for trial in range(300):
        orig = vocab[int(rng.integers(0, len(vocab)))]
        k = int(rng.integers(1, 3))
        tok = orig
        for _ in range(k):
            tok = edit(tok)
        hits = idx._fuzzy_match("t", tok, k)
        found = {t for _d, t in hits}
        assert orig in found, (
            f"trial {trial}: {orig!r} not found for token {tok!r} "
            f"(k={k}); cascade dropped a true match"
        )
        # and distances reported are real edit distances <= k
        for d, t in hits:
            assert d <= k


def test_fuzzy_match_agrees_with_bruteforce_dp():
    """Full-result equivalence: the cascaded matcher returns EXACTLY the
    terms a brute-force Levenshtein scan returns, same distances."""
    from oramacore_tpu.index.string_index import StringIndex

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(77)
    alphabet = "abcdef"  # tiny alphabet -> dense neighborhoods
    vocab = sorted({
        "".join(rng.choice(list(alphabet),
                           size=int(rng.integers(2, 9))))
        for _ in range(800)
    })
    idx = StringIndex(index_bigrams=False)
    idx.index_text(1, "t", [(w, []) for w in vocab])
    idx.commit()
    for trial in range(60):
        tok = "".join(rng.choice(list(alphabet),
                                 size=int(rng.integers(2, 9))))
        k = int(rng.integers(1, 3))
        got = {(d, t) for d, t in idx._fuzzy_match("t", tok, k)}
        want = {(lev(tok, w), w) for w in vocab if lev(tok, w) <= k}
        assert got == want, f"trial {trial} tok={tok!r} k={k}"
