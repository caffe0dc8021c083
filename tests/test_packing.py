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
