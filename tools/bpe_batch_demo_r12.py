"""Round-12 BPE batching demonstration: jobs-vs-N on a WIDE FLAT
vocabulary — the regime the parallel-BPE batching condition targets.

The registry corpus (tools/bpe_batch_ab_r12.py) is tie-heavy: its
synthetic text draws from a small word list, so pair counts collide at
every level of the Zipf tail and the exactness trim forces mostly K=1
rounds (measured: 60 rounds / 64 merges). This tool measures the other
end of the spectrum — thousands of DISJOINT two-char words with all-
distinct frequencies (the "wide flat vocabulary" shape of large real
corpora, where top pair counts rarely tie exactly) — where the batch
scheduler can legally take near-full pages, so cluster rounds (and so
driver round trips) collapse from N to ~N/top_m. Output equality vs
the sequential K=1 loop is asserted before any timing is trusted.

Run: nohup python tools/bpe_batch_demo_r12.py > /tmp/bpe_batch_demo_r12.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_WORDS = 1200  # disjoint 2-char words -> 1200 candidate merges


def main() -> None:
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces,
        _bpe_train_from_pieces_batched,
        _bpe_word_pieces,
    )

    spark = session.get_spark()
    # word i = two dedicated CJK-range chars (no pair shares a token),
    # frequency 2*N_WORDS - i (all distinct): every page of the pair
    # table is a legal full batch under the exactness proof
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(
                    [chr(0x4E00 + 2 * i) + chr(0x4E01 + 2 * i)]
                    * (2 * N_WORDS - i)
                ),
            )
            for i in range(N_WORDS)
        ],
        "doc_id long, text string",
    )

    def run(arm: str, n: int):
        session.release_staged()
        pieces = session.stage(_bpe_word_pieces(docs))
        t0 = time.monotonic()
        if arm == "k1":
            df = _bpe_train_from_pieces(spark, pieces, n)
            rounds = n
        else:
            log: list = []
            df = _bpe_train_from_pieces_batched(
                spark, pieces, n, local_max_words=0, _round_log=log
            )
            rounds = len(log)
        rows = sorted(
            (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in df.collect()
        )
        return time.monotonic() - t0, rounds, rows

    for n in (64, 256, 1024):
        expected = None
        print(f"\n=== N={n} merges, wide-flat corpus ===", flush=True)
        for rep in range(2):
            for arm in ("k1", "batched"):
                if arm == "k1" and n > 256:
                    continue  # linear arm extrapolates; cap the wait
                total, rounds, rows = run(arm, n)
                if expected is None:
                    expected = rows
                if arm != "k1" or n <= 256:
                    if rows != expected:
                        raise AssertionError(f"{arm} N={n} diverged!")
                print(
                    f"{arm:8s} rep{rep} total {total:6.1f}s  rounds {rounds}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
