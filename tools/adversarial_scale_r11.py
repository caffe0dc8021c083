"""Round-11 adversarial 10x scale measurement for the round's new pair
generator: multimodal_audio_window_matches (windowed variable-length
audio prints). Continues the r9/r10 evidence tier — every pair
generator in the repo carries measured 10x adversarial-corpus numbers.

Corpus recipe (the standing protocol): documents 10x by doc_id*10+i,
which multiplies the CLIP FAMILY count 10x (families are doc_id//4
blocks). The adversarial axis is window-print band-bucket occupancy:
10x more families collide into the same 16-bit band values, and the
candidate join's bucket products are what is on trial — within-family
structure stays the fixture's, and window counts per clip are
unchanged, so pair yield should scale ~10x while wall-per-emitted-pair
holds or falls.

Run: nohup python tools/adversarial_scale_r11.py > /tmp/adv_r11.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# ONE corpus recipe governs the shared /tmp/adv10x_r11 directory: the
# builder is imported from encoder_ab_r11, never copied — a second
# recipe here could silently diverge and measure a different corpus
# than the directory name implies. (Python puts the script's own
# directory on sys.path, so the sibling tool imports directly.)
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
        n = multimodal.q_multimodal_audio_window_matches(spark, sf).count()
        secs = time.monotonic() - t0
        print(
            f"audio_window_matches {label}: {n} clip pairs in "
            f"{secs:6.1f}s  ({1000 * secs / max(n, 1):.3f} ms/pair)",
            flush=True,
        )


if __name__ == "__main__":
    main()
