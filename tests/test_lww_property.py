"""Property-based LWW tests (hypothesis): the combinable max_by
formulation must agree with the window formulation and with a pure-Python
sequential replay for arbitrary event soups — duplicates, ties broken by
event_id, out-of-order delivery, deletes."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_spark.cdc.lww import lww_dedup, lww_latest_window

KEYS = ["k0", "k1", "k2"]
BASE = dt.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),          # event_id (dups allowed)
        st.sampled_from(KEYS),                            # key
        st.integers(min_value=0, max_value=5),            # ts offset (ties likely)
        st.sampled_from(["I", "U", "D"]),                 # op
        st.text(alphabet="abc", max_size=3),              # content
    ),
    min_size=1,
    max_size=30,
)


def python_lww(rows):
    """Sequential oracle: per key, the row with max (ts, event_id); on a
    full (ts, event_id) tie the payload is whichever duplicate delivery —
    assert only on deterministic fields in that case."""
    best = {}
    for eid, key, off, op, content in rows:
        v = (off, eid)
        if key not in best or v > best[key][0]:
            best[key] = (v, (eid, key, off, op, content))
    return {k: v[1] for k, v in best.items()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(events)
def test_maxby_equals_window_equals_python(spark, rows):
    df = spark.createDataFrame(
        [(eid, key, BASE + dt.timedelta(seconds=off), op, content)
         for eid, key, off, op, content in rows],
        "event_id long, key string, op_ts timestamp, op string, content string",
    )
    a = lww_dedup(df, ["key"], ["op_ts", "event_id"])
    b = lww_latest_window(df, ["key"], ["op_ts", "event_id"])
    want = python_lww(rows)

    got_a = {r["key"]: r for r in a.collect()}
    got_b = {r["key"]: r for r in b.collect()}
    assert set(got_a) == set(got_b) == set(want)
    for k, (eid, key, off, op, content) in want.items():
        # version tuple is deterministic even under duplicate delivery
        assert got_a[k]["event_id"] == eid and got_b[k]["event_id"] == eid
        assert got_a[k]["op_ts"] == BASE + dt.timedelta(seconds=off)
        # exact duplicates carry identical payloads, so these match too
        dup_payloads = {
            (o, c) for e2, k2, f2, o, c in rows if (e2, k2, f2) == (eid, k, off)
        }
        assert (got_a[k]["op"], got_a[k]["content"]) in dup_payloads
        assert (got_b[k]["op"], got_b[k]["content"]) in dup_payloads


# ---------------------------------------------------------------- top-k

topk_cands = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),     # q_id
        st.integers(min_value=0, max_value=40),    # c_id
        st.integers(min_value=-100, max_value=100),  # sim*100 (int => exact)
    ),
    min_size=1,
    max_size=60,
)


def python_topk(rows, k):
    """Naive oracle: per query, sort candidates by (-sim, c_id), slice k.
    Duplicate (q,c) pairs keep their best sim (matches distinct candidate
    generation upstream; the operator itself ranks whatever it is given,
    so feed it deduped pairs like every caller does)."""
    best: dict = {}
    for q, c, s in rows:
        if (q, c) not in best or s > best[(q, c)]:
            best[(q, c)] = s
    per_q: dict = {}
    for (q, c), s in best.items():
        per_q.setdefault(q, []).append((-s, c))
    out = {}
    for q, lst in per_q.items():
        lst.sort()
        out[q] = [(c, -negs, i + 1) for i, (negs, c) in enumerate(lst[:k])]
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(topk_cands, st.integers(min_value=1, max_value=6))
def test_bounded_topk_equals_naive(spark, rows, k):
    from pyspark.sql import functions as F

    from etl_spark.operators.similarity import bounded_topk

    deduped = python_topk(rows, 10**9)  # dedup only
    flat = [(q, c, s / 100.0)
            for q, ranked in deduped.items() for c, s, _ in ranked]
    df = spark.createDataFrame(flat, "q_id int, c_id int, sim double")
    got = {}
    for r in bounded_topk(df, "q_id", "c_id", k, fanout=4).collect():
        got.setdefault(r["q_id"], []).append((r["c_id"], r["sim"], r["rank"]))
    want = {q: [(c, s / 100.0, rank) for c, s, rank in ranked]
            for q, ranked in python_topk(rows, k).items()}
    for q in want:
        got[q].sort(key=lambda t: t[2])
    assert got == want


# ------------------------------------------------- connected components

edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=25),
              st.integers(min_value=0, max_value=25)),
    min_size=1, max_size=40,
).map(lambda es: [(x, y) for x, y in es if x != y]).filter(len)


def python_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in edges:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    # canonical label = min of each component
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return {n: root for root, ns in comp.items() for n in ns}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(edge_lists)
def test_star_contraction_equals_union_find(spark, edges):
    from etl_spark.operators.dedup import connected_components_star

    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"]
           for r in connected_components_star(df).collect()}
    assert got == python_components(edges)


def test_star_contraction_handles_long_chain(spark):
    """A path graph of diameter 40 — the case O(diameter) label
    propagation needs 40 rounds for — converges in O(log n) star rounds."""
    from etl_spark.operators.dedup import connected_components_star

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["component"]
           for r in connected_components_star(df).collect()}
    assert got == {i: 0 for i in range(41)}


def test_star_contraction_keeps_self_loop_singletons(spark):
    """A node whose only pair is reflexive is a singleton component —
    present in the output, like connected_components (not dropped)."""
    from etl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame([(5, 5), (1, 2)], "a long, b long")
    star = {r["node"]: r["component"]
            for r in connected_components_star(df).collect()}
    prop = {r["node"]: r["component"]
            for r in connected_components(df).collect()}
    assert star == {5: 5, 1: 1, 2: 1}
    assert star == prop
