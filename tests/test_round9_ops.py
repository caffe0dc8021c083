"""Round-9 operator fixtures — closed-form, hand-computed answers.

Oracle parity cannot catch a formula bug shared by engine and oracle
(the round-6 Wilson lesson), so every new operator here gets a fixture
whose expected output is derived by hand before either engine runs.
"""

import pytest


# ---------------------------------------------------------------------------
# decontamination_semantic_pairs
# ---------------------------------------------------------------------------


def test_semantic_decon_flags_within_cluster_paraphrase_only(spark):
    """Hand-built 2-D geometry, k=2 seeds [1,0] / [0,1] (assignment
    boundary = the line y=x), eval = vec_id % 3 == 0, threshold 0.9:

    - eval 0 [1,0] pairs with train 2 [0.97,0.03] (cos .9995) and
      train 4 [0.95,0.05] (cos .9986) — both cluster 0.
    - eval 3 [1.2,1.1] and train 5 [1.1,1.2] are a paraphrase-shaped
      near-dup (cos .9959) SPLIT by the cluster boundary (3 → cluster
      0, 5 → cluster 1): the documented SemDeDup approximation — the
      pair must NOT be flagged.
    - eval/eval (0,3) and train/train (2,4) closeness never pairs.
    - eval 6 [-1,0] (cluster 1) has no positive-cosine train partner.
    """
    from sparkstreaming_rawdataingestion_spark.operators.dedup import (
        semantic_decon_pairs,
    )

    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.97, 0.03]),
        (3, [1.2, 1.1]),
        (4, [0.95, 0.05]),
        (5, [1.1, 1.2]),
        (6, [-1.0, 0.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        (r.eval_id, r.train_id, r.cluster_id)
        for r in semantic_decon_pairs(
            e, k=2, eval_mod=3, threshold=0.9
        ).collect()
    }
    assert got == {(0, 2, 0), (0, 4, 0)}

    # sanity: the missed pair really is a near-dup by brute force
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.hypot(*a) * math.hypot(*b)
        )

    assert cos([1.2, 1.1], [1.1, 1.2]) > 0.99


# ---------------------------------------------------------------------------
# tokenizer_greedy_subword
# ---------------------------------------------------------------------------


def test_greedy_tokenizer_hand_tokenized_fixture(spark):
    """Hand-applied WordPiece rule over a tiny custom vocab:

    - 'table' → tab+le (2): LONGEST match wins over 't'/'ta' prefixes.
    - 'tables' → tab+le+s (3): leftover char falls back to a single.
    - 'dup' → d+u+p (3): no multi-char piece covers it.
    - 'x9y' → x + UNK('9') + y (3 tokens, 1 unk): the char fallback
      only covers letters, digits are out-of-alphabet.
    - '' (empty word from a double space) → 0 tokens.
    """
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
    )

    pieces = tuple("abcdefghijklmnopqrstuvwxyz") + ("t", "ta", "tab", "le")
    docs = spark.createDataFrame(
        [(1, "table tables"), (2, "dup  x9y")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_unk)
        for r in tokenizer_greedy_subword(docs, pieces=pieces).collect()
    }
    # doc 2: 'dup', '', 'x9y' → 3 words, 3+0+3 tokens, 1 unk
    assert got == {1: (2, 5, 0), 2: (3, 6, 1)}


def test_greedy_tokenizer_longest_match_beats_first_match(spark):
    """With both 'st' and 'stream' in the vocab the encoder must take
    'stream' (1 token), not 'st'+... — the property separating greedy
    LONGEST-match from any shorter-first scan."""
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
    )

    pieces = tuple("abcdefghijklmnopqrstuvwxyz") + ("st", "stream")
    docs = spark.createDataFrame([(1, "stream")], "doc_id long, text string")
    row = tokenizer_greedy_subword(docs, pieces=pieces).collect()[0]
    assert (row.n_words, row.n_tokens, row.n_unk) == (1, 1, 0)


def test_greedy_tokenizer_null_text_is_empty(spark):
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        tokenizer_greedy_subword,
    )

    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = tokenizer_greedy_subword(docs).collect()[0]
    # ''.split(' ') == [''] — one empty word, zero tokens
    assert (row.n_words, row.n_tokens, row.n_unk) == (1, 0, 0)
