"""Round-13 adversarial 10x scale measurement for the round's new pair
generator: multimodal_audio_decimated_containment (sample-hop-1 probe
prints vs 128-sample-hop archive prints). Continues the r9-r12
evidence tier — every pair generator in the repo carries measured 10x
adversarial-corpus numbers.

Corpus recipe: the standing doc_id*10+i builder (imported from
encoder_ab_r11, never copied), which multiplies the CLIP FAMILY count
10x (families are doc_id//2 blocks here). The adversarial axis is the
probe side's decimated geometry: 10x more 2x-decimated excerpts (392
probe samples each) each contribute 133 sample-hop windows of
4-sample analysis frames (starts 0..132) whose band values collide
into the same 16-bit buckets as 10x more archive prints — the
candidate join's bucket products plus the energy-witness verify joins
are what is on trial. Per-family structure is the fixture's, so the
true-containment row count scales ~10x while wall-per-emitted-row
should hold or fall.

Run: nohup python tools/adversarial_scale_r13b.py > /tmp/adv_r13b.log 2>&1 &
(r13 advice: its own log path — /tmp/adv_r13.log belongs to
adversarial_scale_r13.py — and the decimated probe geometry above,
not the sub-frame rung's 265 windows.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from encoder_ab_r11 import ADV_DIR, build_corpus  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.operators import multimodal

    build_corpus()
    spark = session.get_spark()

    for label, sf in (("1x", SF_DIR), ("10x", ADV_DIR)):
        session.release_staged()
        t0 = time.monotonic()
        n = multimodal.q_multimodal_audio_decimated_containment(
            spark, sf
        ).count()
        secs = time.monotonic() - t0
        print(
            f"audio_decimated_containment {label}: {n} pair rows in "
            f"{secs:6.1f}s  ({1000 * secs / max(n, 1):.3f} ms/row)",
            flush=True,
        )


if __name__ == "__main__":
    main()
