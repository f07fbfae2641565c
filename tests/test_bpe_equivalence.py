"""Equivalence harness for the batched distributed BPE merge loop.

The r13 verdict's item 4: the distributed path above the driver-vocab
cap is the actual 100 TB path, and its r14 rewrite (batched merges per
pair-count round + one Arrow re-symbolization pass) must be PROVEN
equal to the strictly sequential greedy algorithm. These tests randomize
over tie-heavy alphabets (2-3 letters), overlapping self-pairs
("aaaa" -> (a,a) twice), and merged-symbol collisions (a word containing
"ab" next to separate "a","b"), comparing the full (step, left, right,
count) merge list of:
  - bpe_train(driver_vocab_max=0)  (forced distributed, batched), vs
  - _bpe_train_driver(vocab)       (the sequential reference).
The driver fast path is itself oracle-gated (bpe_train_merges replays
the identical greedy rounds in DuckDB), so driver == distributed ties
the whole chain together.

Also unit-tests _bpe_safe_batch's conservative cases: truncation
boundary, equal-count interaction, and the preexisting-merged-symbol
growth hazard each stop the batch.
"""

import random

import pytest
from pyspark.sql import Row

from otit_swt_spark.pipelines.textstats import (
    _bpe_safe_batch,
    _bpe_train_driver,
    bpe_train,
)


def _mk_docs(spark, vocab):
    """One doc per word, text = the word repeated wc times, so the
    corpus word-frequency table is exactly ``vocab``."""
    return spark.createDataFrame(
        [Row(doc_id=i, text=" ".join([w] * wc))
         for i, (w, wc) in enumerate(vocab)])


def _driver_merges(vocab, n_merges):
    rows = [{"w": w, "wc": wc} for w, wc in vocab]
    return _bpe_train_driver(rows, n_merges)


def _check(spark, vocab, n_merges):
    got = bpe_train(_mk_docs(spark, vocab), n_merges=n_merges,
                    driver_vocab_max=0)
    want = _driver_merges(vocab, n_merges)
    assert got == want, (vocab, got, want)


def test_bpe_batched_equivalence_randomized(spark):
    for seed in range(8):
        rng = random.Random(seed)
        alphabet = "ab" if seed % 2 else "abc"
        vocab = []
        seen = set()
        for _ in range(rng.randint(10, 40)):
            w = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 8)))
            if w in seen:
                continue
            seen.add(w)
            vocab.append((w, rng.randint(1, 12)))
        _check(spark, vocab, n_merges=rng.randint(4, 12))


def test_bpe_batched_equivalence_self_pairs(spark):
    # runs of one letter: overlapping (a,a) occurrences, then (aa,a)/
    # (aa,aa) chains — the greedy-application edge cases
    vocab = [("aaaa", 5), ("aaa", 4), ("aaaaaa", 2), ("a", 9), ("aa", 3)]
    _check(spark, vocab, n_merges=6)


def test_bpe_batched_equivalence_tie_heavy(spark):
    # every pair count engineered close/equal so the lexicographic
    # tie-break and the strict-inequality batch guard are both exercised
    vocab = [("ab", 4), ("cd", 4), ("ef", 4), ("abcd", 2), ("cdef", 2)]
    _check(spark, vocab, n_merges=8)


def test_bpe_batched_equivalence_merged_symbol_preexists(spark):
    # merging (a,b)->"ab" while "ab"-looking adjacencies keep arriving:
    # hazard (d) of _bpe_safe_batch — the batch must stop rather than
    # assume counts of ab-containing pairs are stable
    vocab = [("abab", 6), ("ab", 5), ("ba", 4), ("aabb", 3), ("abba", 2)]
    _check(spark, vocab, n_merges=8)


def test_bpe_safe_batch_truncation_boundary():
    rows = [{"l": "a", "r": "b", "c": 10},
            {"l": "c", "r": "d", "c": 9}]
    # truncated list: unseen pairs may hold count 9 and interact — only
    # the head is provable when the next disjoint count ties the boundary
    batch = _bpe_safe_batch(rows, truncated=True, max_take=5, created=set())
    assert batch == [("a", "b", 10)]
    # complete list: both are provable
    batch = _bpe_safe_batch(rows, truncated=False, max_take=5, created=set())
    assert batch == [("a", "b", 10), ("c", "d", 9)]


def test_bpe_safe_batch_equal_count_interaction():
    # (c,d) ties an a-sharing pair's count -> a derived pair could tie
    # and win the tie-break; the batch must stop before (c,d)
    rows = [{"l": "a", "r": "b", "c": 10},
            {"l": "b", "r": "c", "c": 9},
            {"l": "d", "r": "e", "c": 9}]
    batch = _bpe_safe_batch(rows, truncated=False, max_take=5, created=set())
    assert batch == [("a", "b", 10)]


def test_bpe_safe_batch_growth_hazard_stops_batch():
    # "ab" already exists as a symbol: accepting (a,b) is itself safe,
    # but pairs containing "ab" may GROW, so nothing after it is provable
    rows = [{"l": "a", "r": "b", "c": 10},
            {"l": "x", "r": "y", "c": 3}]
    batch = _bpe_safe_batch(rows, truncated=False, max_take=5,
                            created={"ab"})
    assert batch == [("a", "b", 10)]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
