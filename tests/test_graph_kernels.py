"""Randomized cross-check of the degree-oriented triangle kernel: the
Spark plan (orientation + wedge join + closing semi-join) must count
EXACTLY the triangles a pure-Python enumeration finds, on seeded
random graphs spanning hubs, near-cliques and sparse chains."""

from __future__ import annotations

import itertools
import random

from miba_2023_capstone_rb_nlp_spark.suite.graph import triangle_counts


def _py_triangle_counts(edges: set) -> dict:
    nodes = sorted({x for e in edges for x in e})
    adj = {u: set() for u in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    counts: dict = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                counts[x] = counts.get(x, 0) + 1
    return counts


def test_triangle_kernel_matches_naive_enumeration(spark):
    rng = random.Random(20260814)
    cases = []
    for trial in range(6):
        n = rng.randint(5, 14)
        p = rng.choice([0.2, 0.4, 0.7])
        edges = {
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < p
        }
        cases.append(edges)
    # adversarial shapes: a clique (every node in C(k-1,2) triangles)
    cases.append(set(itertools.combinations(range(6), 2)))
    # a hub star (no triangles at all despite max degree)
    cases.append({(0, i) for i in range(1, 12)})
    for edges in cases:
        if not edges:
            continue
        e = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], "ea bigint, eb bigint"
        )
        got = {
            r["part"]: r["n_triangles"] for r in triangle_counts(e).collect()
        }
        assert got == _py_triangle_counts(edges), sorted(edges)
