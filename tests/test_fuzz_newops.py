"""Property tests for the round-4 continuation operators: invariants a
single fixture can't pin — winnowing's shared-run guarantee, chunking's
reconstruction property, fusion's majority invariant, and edge-split
totality.  Spark actions are expensive, so each property batches ALL its
hypothesis examples into ONE DataFrame and a single collect."""

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps",
                         "zeta", "eta", "theta", "iota", "kappa"])
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(st.lists(st.tuples(_DOC, _DOC, st.lists(_WORD, min_size=5,
                                               max_size=8).map(" ".join)),
                min_size=8, max_size=8))
def test_winnow_guarantee_property(spark, cases):
    """Any two docs sharing a run of >= w + k - 1 words share >= 1
    fingerprint (k=3, w=3 -> run of 5); short docs yield none and never
    crash."""
    from rdf_tabular_spark.operators.dedup import winnow_fingerprints
    rows = []
    for i, (pre, post, shared) in enumerate(cases):
        rows.append((2 * i, f"{pre} {shared}".strip()))
        rows.append((2 * i + 1, f"{shared} {post}".strip()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    by_doc: dict[int, set] = {}
    for r in winnow_fingerprints(docs, k=3, w=3).collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, (pre, post, shared) in enumerate(cases):
        if len(shared.split()) >= 5:
            a = by_doc.get(2 * i, set())
            b = by_doc.get(2 * i + 1, set())
            assert a & b, f"case {i}: no shared fp for run {shared!r}"


@settings(max_examples=5, deadline=None, derandomize=True)
@given(st.lists(st.tuples(_DOC, st.integers(3, 8), st.integers(0, 2)),
                min_size=10, max_size=10))
def test_chunk_reconstruction_property(spark, cases):
    """Dropping each chunk's first `overlap` tokens (except chunk 0) and
    concatenating reproduces the original token stream exactly."""
    from rdf_tabular_spark.operators.text import chunk_documents
    # one (size, overlap) config per run keeps it a single Spark job
    size, overlap = 5, 2
    docs = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(cases)],
        "doc_id long, text string")
    chunks: dict[int, list] = {}
    for r in chunk_documents(docs, size=size, overlap=overlap).collect():
        chunks.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_text"]))
    for i, (t, _, _) in enumerate(cases):
        orig = t.strip().split() if t.strip() else [""]
        parts = [c for _, c in sorted(chunks[i])]
        rebuilt = parts[0].split() if parts[0] else [""]
        for p in parts[1:]:
            toks = p.split()
            # a remainder window shorter than overlap repeats only its
            # tail; drop the overlapping prefix it shares with rebuilt
            share = min(overlap, len(toks))
            assert rebuilt[-share:] == toks[:share]
            rebuilt.extend(toks[share:])
        assert rebuilt == orig or (t.strip() == "" and parts == [""])


@settings(max_examples=5, deadline=None, derandomize=True)
@given(st.lists(st.lists(st.sampled_from("abc"), min_size=1, max_size=7),
                min_size=12, max_size=12))
def test_fuse_majority_property(spark, cases):
    """The fused value always carries maximal support; n_values counts the
    distinct competitors; support sums to the assertion count."""
    from collections import Counter

    from rdf_tabular_spark.operators.fusion import fuse_majority
    rows = []
    for i, objs in enumerate(cases):
        rows.extend((f"e{i}", "p", o) for o in objs)
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {r["subj"]: r for r in fuse_majority(df).collect()}
    for i, objs in enumerate(cases):
        c = Counter(objs)
        r = out[f"e{i}"]
        best = max(c.values())
        assert c[r["obj"]] == best
        # lexical-min among maximal-support values
        assert r["obj"] == min(o for o, n in c.items() if n == best)
        assert r["n_support"] == best and r["n_values"] == len(c)


@settings(max_examples=5, deadline=None, derandomize=True)
@given(st.lists(st.tuples(st.integers(0, 999), st.integers(0, 999)),
                min_size=50, max_size=50, unique=True))
def test_edge_split_total_and_stable(spark, pairs):
    """Every distinct edge lands in exactly one split, assignments are
    input-order independent, and all three splits are reachable over a
    large enough sample."""
    from rdf_tabular_spark.operators.graph import edge_split
    edges = spark.createDataFrame(
        [(f"s{a}", f"d{b}") for a, b in pairs], "src string, dst string")
    fwd = {(r["src"], r["dst"]): r["split"]
           for r in edge_split(edges).collect()}
    assert len(fwd) == len(set(pairs))
    rev = {(r["src"], r["dst"]): r["split"]
           for r in edge_split(edges.orderBy("dst")).collect()}
    assert fwd == rev
