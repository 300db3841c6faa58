"""Property-based tests for the round-7 operators, each checked
against a plain-Python reference model (same one-Spark-job-per-example
discipline as test_properties.py)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from public_projet_data_engineering_tarification_electrique_spark.operators.graph import (
    label_propagation,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.packing import (
    padding_waste_audit,
)
from public_projet_data_engineering_tarification_electrique_spark.operators.textstats import (
    bpe_train_merges,
)

words = st.text(alphabet="abcd|", min_size=1, max_size=6)


def _bpe_model(word_list: list[str], rounds: int):
    """Pure-Python BPE: freq-weighted pair counts, (count desc, pair
    asc) argmax, greedy left-to-right merge — the operator's contract.
    Tokens containing the '|' delimiter are DROPPED (the operator's
    documented invariant-enforcement convention)."""
    from collections import Counter

    freqs = Counter(w for w in word_list if "|" not in w)
    seqs = {w: list(w) for w in freqs}
    merges = []
    for r in range(1, rounds + 1):
        counts: Counter = Counter()
        for w, f in freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, left, right, left + right, cnt))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


@settings(max_examples=5, deadline=None)
@given(st.lists(words, min_size=2, max_size=25))
def test_bpe_matches_python_model(spark, word_list):
    docs = spark.createDataFrame(
        [(1, " ".join(word_list))], "doc_id long, text string"
    )
    got = [
        (r["round"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train_merges(docs, rounds=2).orderBy("round").collect()
    ]
    assert got == _bpe_model(word_list, 2)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=30))
def test_padding_waste_matches_python_model(spark, lens):
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    row = padding_waste_audit(docs, seq_lens=(256,)).collect()[0]
    n_seq = sum((n + 255) // 256 for n in lens if n > 0)
    total = sum(lens)
    assert row["n_sequences"] == n_seq
    assert row["total_tokens"] == total
    assert row["padded_tokens"] == n_seq * 256
    # +1e-9 nudge mirrors the operator/oracle (dyadic ties like
    # 760/1280 = .40625 are convention-dependent without it)
    expect = None if n_seq == 0 else round(1 - total / (n_seq * 256) + 1e-9, 4)
    assert row["waste_fraction"] == expect


def _lp_model(seeds: dict, edges: list, rounds: int):
    """Pure-Python clamped majority-vote propagation."""
    labels = dict(seeds)
    out = {n: (l, 0) for n, l in seeds.items()}
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    for r in range(1, rounds + 1):
        updates = {}
        for n, nbrs in adj.items():
            if n in labels:
                continue
            votes: dict = {}
            for d in nbrs:
                if d in labels:
                    votes[labels[d]] = votes.get(labels[d], 0) + 1
            if votes:
                lab = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
                updates[n] = lab
        for n, lab in updates.items():
            labels[n] = lab
            out[n] = (lab, r)
    return out


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_label_propagation_matches_python_model(spark, data):
    n_nodes = data.draw(st.integers(min_value=2, max_value=8))
    nodes = list(range(n_nodes))
    seeds = {
        n: data.draw(st.integers(min_value=0, max_value=2))
        for n in nodes
        if data.draw(st.booleans())
    }
    if not seeds:
        seeds = {0: 1}
    pairs = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n_nodes - 1),
                st.integers(min_value=0, max_value=n_nodes - 1),
            ).filter(lambda p: p[0] != p[1]),
            max_size=16,
        )
    )
    edges = sorted(set(pairs) | {(b, a) for a, b in pairs})
    node_rows = [(n, seeds.get(n)) for n in nodes]
    nodes_df = spark.createDataFrame(node_rows, "id long, label int")
    if edges:
        edges_df = spark.createDataFrame(edges, "src long, dst long")
    else:
        edges_df = spark.createDataFrame([], "src long, dst long")
    got = {
        r["id"]: (r["label"], r["round"])
        for r in label_propagation(nodes_df, edges_df, rounds=2).collect()
    }
    assert got == _lp_model(seeds, edges, 2)
