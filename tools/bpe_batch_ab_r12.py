"""Round-12 BPE trainer A/B: sequential K=1 pair-delta loop (round 11)
vs BATCHED non-interacting merge loop (round 12) — total wall and
cluster-round counts at N=64 and N=256 merges, interleaved same-session
reps (the bench.py adjudication protocol).

The claim on trial (VERDICT r11 Next #1): the delta loop made per-step
cost flat, so the remaining wall is N sequential driver round trips;
the batched loop must (a) emit the BIT-IDENTICAL merge table (asserted
every rep before any timing is trusted) and (b) scale wall time
SUBLINEARLY in N by applying provably-sequential-equal merge batches in
single jobs (jobs == rounds < N).

Run: nohup python tools/bpe_batch_ab_r12.py > /tmp/bpe_batch_ab_r12.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 2  # per arm per N, interleaved


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
        rounds = None
        if arm == "k1":
            df = _bpe_train_from_pieces(spark, pieces, n)
        else:
            log: list = []
            df = _bpe_train_from_pieces_batched(
                spark, pieces, n, local_max_words=0, _round_log=log
            )
        rows = sorted(
            (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in df.collect()
        )
        if arm == "batched":
            rounds = (len(log), dict(Counter(k for k, _ in log)))
        return time.monotonic() - t0, rounds, rows

    for n in (64, 256):
        expected = None
        print(f"\n=== N={n} merges, sf_dir={SF_DIR} ===", flush=True)
        for rep in range(REPS):
            for arm in ("k1", "batched"):
                total, rounds, rows = run(arm, n)
                if expected is None:
                    expected = rows
                assert rows == expected, f"{arm} N={n} output diverged!"
                extra = (
                    f"  rounds {rounds[0]}  batch-size hist {rounds[1]}"
                    if rounds
                    else ""
                )
                print(
                    f"{arm:8s} rep{rep} total {total:6.1f}s{extra}",
                    flush=True,
                )
        if expected is not None:
            print(f"outputs identical across arms: {len(expected)} merges")


if __name__ == "__main__":
    main()
