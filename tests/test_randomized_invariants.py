"""Seeded randomized invariants for the r5 analytics operators: one
generated dataset per test (hypothesis-per-example would pay a Spark
job per example), each checked against an independent pure-Python
oracle — the randomized complement of the hand-case units and the
SQL-oracle queue."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest  # noqa: F401


def test_weighted_median_matches_python_reference(spark):
    from biosd_feature_annotator_spark.plans.quality import weighted_median

    rng = random.Random(7)
    rows = [
        (f"k{rng.randrange(20)}", rng.randrange(-1000, 1000),
         rng.randrange(1, 9))
        for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "k string, v long, w long")
    got = {r.k: r.median for r in weighted_median(df, ["k"], "v", "w").collect()}

    by_key = defaultdict(list)
    for k, v, w in rows:
        by_key[k].append((v, w))
    for k, vw in by_key.items():
        vw.sort()
        tot = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if 2 * cum >= tot:
                assert got[k] == v, k
                break


def test_rate_bursts_internal_consistency(spark):
    import datetime as dt

    from biosd_feature_annotator_spark.operators.funnel import rate_bursts

    rng = random.Random(11)
    rows = [
        (f"k{rng.randrange(4)}",
         dt.datetime.fromtimestamp(rng.randrange(0, 50) * 3600 + rng.randrange(3600),
                                   dt.timezone.utc).replace(tzinfo=None))
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = rate_bursts(df, ["k"], "ts", 3600, trailing=3,
                      ratio_num=2, ratio_den=1).collect()
    by_key = defaultdict(dict)
    for r in out:
        by_key[r.k][r.bucket] = r
    for k, buckets in by_key.items():
        for b, r in buckets.items():
            prior = [buckets.get(b - i * 3600) for i in (1, 2, 3)]
            contiguous = all(p is not None for p in prior)
            want_prior = sum(p.cnt for p in prior if p is not None)
            assert r.prior_sum == want_prior
            if contiguous and want_prior > 0:
                assert r.ratio_micro == r.cnt * 3 * 1_000_000 // want_prior
                assert r.is_burst == (r.cnt * 3 > want_prior * 2)
            else:
                assert r.ratio_micro is None and r.is_burst is False


def test_rrf_fuse_is_run_order_invariant_and_exact(spark):
    from biosd_feature_annotator_spark.operators.ranking import rrf_fuse

    rng = random.Random(13)
    runs = []
    for src in range(4):
        docs = rng.sample(range(50), 20)
        runs += [("q", f"d{d}", i + 1) for i, d in enumerate(docs)]
    df = spark.createDataFrame(runs, "query string, doc string, rank long")
    got = {r.doc: r.rrf_micro for r in rrf_fuse(df, k=60).collect()}
    want = defaultdict(int)
    for _, d, rank in runs:
        want[d] += 1_000_000 // (60 + rank)
    assert got == dict(want)
    # permuting input rows changes nothing
    rng.shuffle(runs)
    df2 = spark.createDataFrame(runs, "query string, doc string, rank long")
    got2 = {r.doc: r.rrf_micro for r in rrf_fuse(df2, k=60).collect()}
    assert got2 == got


def test_kmv_exact_below_k_and_closure_matches_bfs(spark):
    from biosd_feature_annotator_spark.operators.graph import transitive_closure
    from biosd_feature_annotator_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_state,
    )

    rng = random.Random(17)
    rows = [
        (f"g{rng.randrange(6)}", f"v{rng.randrange(40)}")
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    truth = defaultdict(set)
    for g, v in rows:
        truth[g].add(v)
    st = kmv_state(df, ["g"], "v", k=64)
    est = {r.g: r for r in kmv_distinct_estimate(st, ["g"], 64).collect()}
    for g, vals in truth.items():
        assert len(vals) < 64
        assert est[g].n_est == len(vals)          # under-full => exact

    # random DAG (edges only i -> j for i < j): closure == python BFS
    edges = sorted({
        (rng.randrange(0, 15), rng.randrange(0, 30))
        for _ in range(40)
    })
    edges = [(a, b) for a, b in edges if a < b]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.src, r.dst): r.depth
        for r in transitive_closure(edf, max_depth=5).collect()
    }
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    expected_pairs = set()
    for s in set(a for a, _ in edges):
        dist = {s: 0}
        frontier = [s]
        for d in range(1, 6):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for node, d in dist.items():
            if node != s:
                assert got[(s, node)] == d, (s, node)
                expected_pairs.add((s, node))
    # completeness both ways: the closure emits exactly the BFS pairs
    assert set(got) == expected_pairs and len(got) > 0


def test_truth_discovery_matches_python_replay(spark):
    from biosd_feature_annotator_spark.operators.canonicalize import (
        truth_discovery,
    )

    rng = random.Random(19)
    rows = list({
        (f"s{rng.randrange(8)}", f"sub{rng.randrange(30)}",
         f"v{rng.randrange(4)}")
        for _ in range(400)
    })
    df = spark.createDataFrame(rows, "src string, subj string, val string")
    got = {
        r.subject: (r.value, r.n_votes, r.weight_micro)
        for r in truth_discovery(df, "src", "subj", "val").collect()
    }

    votes1 = defaultdict(lambda: defaultdict(int))
    for s, sub, v in rows:
        votes1[sub][v] += 1
    cons1 = {
        sub: min(vv.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for sub, vv in votes1.items()
    }
    per = defaultdict(lambda: [0, 0])  # source -> [matched, total]
    for s, sub, v in rows:
        per[s][1] += 1
        if cons1[sub] == v:
            per[s][0] += 1
    rel = {
        s: (m + 1) * 1_000_000 // (t + 2) for s, (m, t) in per.items()
    }
    votes2 = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for s, sub, v in rows:
        votes2[sub][v][0] += 1
        votes2[sub][v][1] += rel[s]
    for sub, vv in votes2.items():
        val, (n, w) = min(
            vv.items(), key=lambda kv: (-kv[1][1], kv[0])
        )
        assert got[sub] == (val, n, w), sub


def test_apply_cdc_log_matches_python_replay(spark):
    from biosd_feature_annotator_spark.operators.scd import apply_cdc_log

    rng = random.Random(23)
    snap = [(f"k{i}", i * 10) for i in range(30)]
    ops = []
    for t in range(120):
        ops.append((
            f"k{rng.randrange(40)}", rng.randrange(1000),
            rng.choice(["I", "U", "D"]), t,
        ))
    sdf = spark.createDataFrame(snap, "k string, v long")
    odf = spark.createDataFrame(ops, "k string, v long, op string, ts long")
    got = dict(
        (r.k, r.v)
        for r in apply_cdc_log(sdf, odf, ["k"], ["v"],
                               seq_cols=["ts"]).collect()
    )
    state = dict(snap)
    last = {}
    for k, v, op, t in ops:
        if k not in last or t > last[k][0]:
            last[k] = (t, v, op)
    for k, (t, v, op) in last.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == state


def test_landmark_distances_match_python_bfs(spark):
    from biosd_feature_annotator_spark.operators.graph import (
        landmark_distances,
    )

    rng = random.Random(29)
    edges = sorted({
        (rng.randrange(0, 25), rng.randrange(0, 25)) for _ in range(60)
    })
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(edges, "src long, dst long")
    lms = [0, 1, 2]
    lmf = spark.createDataFrame([(x,) for x in lms], "node long")
    got = {
        (r.landmark, r.node): r.dist
        for r in landmark_distances(edf, lmf, max_dist=4).collect()
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for lm in lms:
        dist = {lm: 0}
        frontier = [lm]
        for d in range(1, 5):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for node, d in dist.items():
            expected[(lm, node)] = d
    assert got == expected
