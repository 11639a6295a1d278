"""Markov transition model (operators/markov.py): exact parity with
a pure-Python replay of counts, micro-probabilities and the floored
k-step propagation; per-user stream isolation; dead-end mass loss;
the k guard."""

import random
from collections import defaultdict

import pytest

from metal_history_knowledge_graph_spark.operators.markov import (
    MICRO,
    markov_k_step,
    transition_matrix,
)


def py_transitions(rows):
    """rows: (user, ts, event_id, state) — returns {(s1,s2): (n, p)}"""
    by_user = defaultdict(list)
    for u, ts, eid, s in rows:
        by_user[u].append((ts, eid, s))
    counts = defaultdict(int)
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    tot = defaultdict(int)
    for (a, _), n in counts.items():
        tot[a] += n
    return {
        (a, b): (n, n * MICRO // tot[a]) for (a, b), n in counts.items()
    }


def py_k_step(trans, start, k):
    mass = {start: MICRO}
    for _ in range(k):
        nxt = defaultdict(int)
        for s1, m in mass.items():
            for (a, b), (_, p) in trans.items():
                if a == s1:
                    nxt[b] += m * p // MICRO
        mass = {s: m for s, m in nxt.items() if m > 0}
    return mass


def _rows(seed, n_users=8, n_ev=120):
    rng = random.Random(seed)
    states = ["view", "click", "buy", "exit"]
    return [
        (rng.randrange(n_users), rng.randrange(10**6), i, rng.choice(states))
        for i in range(n_ev)
    ]


def test_transitions_match_python(spark):
    rows = _rows(3)
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    got = {
        (r.s1, r.s2): (r.n, r.p_micro)
        for r in transition_matrix(df).collect()
    }
    assert got == py_transitions(rows)


def test_k_step_matches_python_and_dead_ends(spark):
    rows = [
        (1, 1, 1, "a"), (1, 2, 2, "b"), (1, 3, 3, "a"), (1, 4, 4, "c"),
        (2, 1, 5, "a"), (2, 2, 6, "b"), (2, 3, 7, "b"),
        # "c" is a dead end: mass reaching it vanishes next step
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    trans = transition_matrix(df)
    py_t = py_transitions(rows)
    for k in (0, 1, 2, 3):
        got = {
            r.state: r.mass_micro
            for r in markov_k_step(trans, "a", k).collect()
        }
        assert got == py_k_step(py_t, "a", k), k


def test_streams_isolated_per_user(spark):
    # user 1 ends with 'x'; user 2 starts with 'y': no x->y transition
    rows = [(1, 1, 1, "a"), (1, 2, 2, "x"), (2, 3, 3, "y"), (2, 4, 4, "b")]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    got = {(r.s1, r.s2) for r in transition_matrix(df).collect()}
    assert got == {("a", "x"), ("y", "b")}


def test_k_guard(spark):
    df = spark.createDataFrame([("a", "b", 1, MICRO)],
                               "s1 string, s2 string, n long, p_micro long")
    with pytest.raises(ValueError, match="k must be"):
        markov_k_step(df, "a", -1)
