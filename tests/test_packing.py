"""Chunking / packing invariants (chunk_documents also has a DuckDB
oracle; packing is sequential per stratum, so its contract lives here)."""

from __future__ import annotations

from collections import defaultdict

from sparkstreaming_rawdataingestion_spark.operators import packing

SF01 = "/root/testdata/sf0.01"


def test_chunks_cover_every_token_with_overlap(spark):
    rows = packing.q_chunk_documents(spark, SF01).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    from sparkstreaming_rawdataingestion_spark import catalog

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in catalog.load_table(spark, SF01, "documents").collect()
    }
    for doc_id, chunks in list(by_doc.items())[:50]:
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r["chunk_idx"])
        covered = 0
        for r in chunks:
            start = r["chunk_idx"] * packing.CHUNK_STRIDE
            assert r["n_chunk_tokens"] <= packing.CHUNK_TOKENS
            assert r["chunk_text"].split(" ")[: r["n_chunk_tokens"]] == toks[
                start : start + r["n_chunk_tokens"]
            ]
            covered = max(covered, start + r["n_chunk_tokens"])
        assert covered == len(toks)  # tail fully covered


def test_packing_respects_budget_and_covers_all_docs(spark):
    rows = packing.q_pack_documents(spark, SF01).collect()
    from sparkstreaming_rawdataingestion_spark import catalog

    n_docs = catalog.load_table(spark, SF01, "documents").count()
    assert len(rows) == n_docs  # every doc packed exactly once
    fills = defaultdict(int)
    for r in rows:
        fills[(r["lang"], r["bin_id"])] += r["n_tokens"]
    for (lang, bid), total in fills.items():
        # a bin exceeds the budget only when one oversized doc owns it
        if total > packing.PACK_BUDGET:
            members = [
                r
                for r in rows
                if r["lang"] == lang and r["bin_id"] == bid
            ]
            assert len(members) == 1

    # bins are contiguous from 0 per stratum
    by_lang = defaultdict(set)
    for r in rows:
        by_lang[r["lang"]].add(r["bin_id"])
    for bins in by_lang.values():
        assert bins == set(range(len(bins)))


def test_packing_is_deterministic(spark):
    a = sorted(map(tuple, packing.q_pack_documents(spark, SF01).collect()))
    b = sorted(map(tuple, packing.q_pack_documents(spark, SF01).collect()))
    assert a == b


def test_contrastive_negatives_no_self_pairs_and_k_per_anchor(spark, sf_dir):
    from sparkstreaming_rawdataingestion_spark.operators import packing

    rows = packing.q_contrastive_negative_pairs(spark, sf_dir).collect()
    by_anchor = {}
    for r in rows:
        assert r.negative_id != r.anchor_id  # structurally impossible
        by_anchor.setdefault(r.anchor_id, []).append(r.negative_id)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(by_anchor) == n_docs
    assert all(len(v) == packing._NEG_K for v in by_anchor.values())


def test_curriculum_interleave_round_robin(spark, sf_dir):
    """Global positions are a permutation, and consecutive positions
    cycle through the difficulty buckets."""
    from sparkstreaming_rawdataingestion_spark.operators import packing

    rows = sorted(
        packing.q_curriculum_interleave(spark, sf_dir).collect(),
        key=lambda r: r.global_pos,
    )
    n = len(rows)
    assert {r.doc_id for r in rows} == set(r.doc_id for r in rows)
    K = packing._CURR_BUCKETS
    # within every full window of K consecutive positions, all buckets
    # appear exactly once (NTILE buckets differ by ≤1 in size, so only
    # the tail windows may be partial)
    full = (n // K) - 1
    for w in range(full):
        window = rows[w * K : (w + 1) * K]
        assert sorted(r.difficulty_bucket for r in window) == list(
            range(1, K + 1)
        )
