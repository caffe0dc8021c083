"""Round-11 BPE trainer A/B: full-recount loop (round 10) vs
incremental pair-delta loop (round 11) — per-step wall times at
N=12 and N=64 merges, interleaved same-session reps (the bench.py
adjudication protocol: alternate the arms so scheduler/JIT drift
hits both equally).

The claim on trial (VERDICT r10 Next #1): the recount loop's per-step
cost stays O(all pairs over the whole word table) for every step,
while the delta loop's per-step cost collapses with vocab convergence
(later merges touch ever-smaller affected word sets). The output
tables are asserted identical each rep before any timing is trusted.

Run: nohup python tools/bpe_ab_r11.py > /tmp/bpe_ab_r11.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 2  # per arm per N, interleaved


def main() -> None:
    from sparkstreaming_rawdataingestion_spark import catalog, session
    from sparkstreaming_rawdataingestion_spark.operators.text import (
        _bpe_train_from_pieces,
        _bpe_train_from_pieces_recount,
        _bpe_word_pieces,
    )

    spark = session.get_spark()
    # the N=64 recount arm persists a 64-deep lineage chain; plan
    # stringification (cache names, AQE logs) is O(chain^2) without a
    # cap and OOMs the driver before any data cost. Measurement-only
    # knob — the shipped delta path's frames are checkpoint leaves.
    spark.conf.set("spark.sql.maxPlanStringLength", "8192")
    d = catalog.load_table(spark, SF_DIR, "documents")

    def run(arm: str, n: int):
        session.release_staged()
        pieces = session.stage(_bpe_word_pieces(d))
        fn = (
            _bpe_train_from_pieces
            if arm == "delta"
            else _bpe_train_from_pieces_recount
        )
        steps: list[float] = []
        t0 = time.monotonic()
        rows = sorted(
            (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
            for r in fn(spark, pieces, n, _step_seconds=steps).collect()
        )
        return time.monotonic() - t0, steps, rows

    for n in (12, 64):
        expected = None
        print(f"\n=== N={n} merges, sf_dir={SF_DIR} ===", flush=True)
        for rep in range(REPS):
            for arm in ("delta", "recount"):
                total, steps, rows = run(arm, n)
                if expected is None:
                    expected = rows
                assert rows == expected, f"{arm} N={n} output diverged!"
                head = " ".join(f"{s:.2f}" for s in steps[:8])
                tail = " ".join(f"{s:.2f}" for s in steps[-4:])
                print(
                    f"{arm:8s} rep{rep} total {total:6.1f}s  "
                    f"steps[0:8] {head}  steps[-4:] {tail}",
                    flush=True,
                )
        if expected is not None:
            print(f"outputs identical across arms: {len(expected)} merges")


if __name__ == "__main__":
    main()
