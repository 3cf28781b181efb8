"""Edit-distance join: the prefix-filtered blocking must find EXACTLY
the brute-force pair set (completeness is the whole point — a blocked
join that drops pairs is wrong, not approximate)."""

from __future__ import annotations

import random

from metricproxy_spark.operators.fuzzyjoin import edit_distance_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _vocab_sides():
    rng = random.Random(7)
    vocab = [
        "red", "blue", "cold", "gold", "old", "bolt", "ring", "gear",
        "aaaa", "aaab", "ab", "a", "small anvil", "smallqanvil",
    ]
    left = sorted(
        {" ".join(rng.sample(vocab, rng.randint(1, 3))) for _ in range(60)}
        | {"aaaaaaaa", "aaaaaaab", "xy", "x"}
    )
    right = sorted(
        {" ".join(rng.sample(vocab, rng.randint(1, 3))) for _ in range(60)}
        | {"aaaaaaaa", "baaaaaaa", "xz"}
    )
    return left, right


class TestEditDistanceJoin:
    def test_matches_brute_force_k1_and_k2(self, spark):
        left, right = _vocab_sides()
        ldf = spark.createDataFrame([(s,) for s in left], "lname string")
        rdf = spark.createDataFrame([(s,) for s in right], "rname string")
        for k in (1, 2):
            expect = sorted(
                (a, b, _lev(a, b))
                for a in left
                for b in right
                if _lev(a, b) <= k
            )
            got = sorted(
                tuple(r)
                for r in edit_distance_join(
                    ldf, rdf, "lname", "rname", k=k
                ).collect()
            )
            assert got == expect, f"k={k}"

    def test_repeated_gram_strings_not_dropped(self, spark):
        # multiset trap: set-semantics grams would see 'aaaaaaaa' and
        # 'aaaaaaab' as sharing only {'aaa'} and could underestimate
        # overlap; occurrence annotation must keep the pair
        ldf = spark.createDataFrame([("aaaaaaaa",)], "lname string")
        rdf = spark.createDataFrame([("aaaaaaab",), ("aaaaaaaa",)], "rname string")
        got = sorted(
            tuple(r)
            for r in edit_distance_join(ldf, rdf, "lname", "rname", k=1).collect()
        )
        assert got == [
            ("aaaaaaaa", "aaaaaaaa", 0),
            ("aaaaaaaa", "aaaaaaab", 1),
        ]

    def test_short_strings_use_band_fallback(self, spark):
        # |G| <= k*q strings carry no discriminating signature; they
        # must still match via the length-band path
        ldf = spark.createDataFrame([("ab",), ("x",)], "lname string")
        rdf = spark.createDataFrame([("ac",), ("xy",), ("zzzzzz",)], "rname string")
        got = sorted(
            tuple(r)
            for r in edit_distance_join(ldf, rdf, "lname", "rname", k=1).collect()
        )
        assert got == [
            ("ab", "ac", 1),
            ("x", "xy", 1),
        ]
