"""Round-13 tie-splitting A/B: batched BPE trainer rounds on the
TIE-HEAVY registry corpus, before vs after the tie-splitting schedule.

Round-12 measured (tools/bpe_batch_ab_r12.py, ARCHITECTURE.md): the
registry corpus's Zipf tail collides pair counts at every level, the
strict trim rejected whole tie levels, and the batched loop degraded
to mostly K=1 — 60 rounds / 64 merges. The tie-splitting rule
(text.py _bpe_batch_schedule, round 13) keeps the provably-safe tie
prefix up to the first dangerous rule; this tool re-measures rounds,
per-round batch-size distribution and wall at N=64 and N=256, with
bit-identity vs the sequential K=1 loop asserted every rep before any
timing is trusted.

Run: nohup python tools/bpe_tie_ab_r13.py > /tmp/bpe_tie_ab_r13.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 2


def main() -> None:
    from sparkstreaming_rawdataingestion_spark import catalog, session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces,
        _bpe_train_from_pieces_batched,
        _bpe_word_pieces,
    )

    spark = session.get_spark()
    d = catalog.load_table(spark, SF_DIR, "documents")

    def run(arm: str, n: int):
        session.release_staged()
        pieces = session.stage(_bpe_word_pieces(d))
        t0 = time.monotonic()
        log: list = []
        if arm == "k1":
            df = _bpe_train_from_pieces(spark, pieces, n)
        else:
            df = _bpe_train_from_pieces_batched(
                spark, pieces, n, local_max_words=0, _round_log=log
            )
        rows = sorted(
            (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in df.collect()
        )
        wall = time.monotonic() - t0
        return wall, log, rows

    for n in (64, 256):
        for rep in range(REPS):
            w_k1, _, rows_k1 = run("k1", n)
            w_b, log, rows_b = run("batched", n)
            assert rows_b == rows_k1, f"EQUALITY BROKEN at N={n}"
            sizes = Counter(k for k, _ in log)
            print(
                f"N={n} rep={rep}: k1 {w_k1:6.1f}s ({n} rounds) | "
                f"tie-split batched {w_b:6.1f}s ({len(log)} rounds, "
                f"batch sizes {dict(sorted(sizes.items()))}) | "
                f"bit-identical OK",
                flush=True,
            )


if __name__ == "__main__":
    main()
