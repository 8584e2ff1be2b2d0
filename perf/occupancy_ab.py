"""Interleaved fixed-occupancy (k ∝ n) scale measurement for the
quantizer-celled faces (VERDICT r10 item 3).

Why not just perf/scale_curve.py --occupancy: this box stalls
intermittently for MINUTES at ~4-10× slowdown (one session recorded
build_sec 182 s vs 26 s, calib 1.54 → 0.11 within the same run), and
a sequential x1-then-xN protocol attributes whatever stall phase each
section landed in to the RATIO. This harness interleaves: per round,
a fixed CPU calibration probe, then one timed x1 run, then one timed
xN run — so both sides of every ratio sample the same box state, and
the min-over-rounds pair is a stall-free estimate. The cold (train)
legs are timed separately, once, before the rounds.

Usage:
    python perf/occupancy_ab.py [N ...]      # default: 5 25
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from perf.scale_curve import build_scaled, calib_cpu  # noqa: E402
from spark_streaming_with_debezium_spark.session import get_spark  # noqa: E402

ROUNDS = 5


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ns = [int(a) for a in sys.argv[1:]] or [5, 25]
    # n == 1 would collide the 'x1' and f'x{n}' round keys and compare
    # a timing with itself (ADVICE r11); the ratio is only meaningful
    # for a genuinely scaled leg.
    bad = [n for n in ns if n <= 1]
    if bad:
        raise SystemExit(f"scale factors must be > 1, got {bad}")
    spark = get_spark("occupancy_ab")
    spark.sparkContext.setLogLevel("ERROR")

    from spark_streaming_with_debezium_spark.llm.cluster import (
        _KM_K,
        embedding_hard_negatives,
    )

    def run(sf_dir: str, k: int):
        embedding_hard_negatives(spark, sf_dir, k=k).write.format(
            "noop"
        ).mode("overwrite").save()

    out = {}
    for n in ns:
        dst = tempfile.mkdtemp(prefix=f"occ_ab_x{n}_")
        try:
            build_sec = timed(lambda: build_scaled(spark, src, dst, n))
            # cold legs (train + persist materialization), once each
            cold_x1 = timed(lambda: run(src, _KM_K))
            cold_xn = timed(lambda: run(dst, _KM_K * n))
            rounds = []
            for _ in range(ROUNDS):
                rounds.append(
                    {
                        "calib": calib_cpu(spark),
                        "x1": timed(lambda: run(src, _KM_K)),
                        f"x{n}": timed(lambda: run(dst, _KM_K * n)),
                    }
                )
            x1_min = min(r["x1"] for r in rounds)
            xn_min = min(r[f"x{n}"] for r in rounds)
            out[f"x{n}"] = {
                "build_sec": build_sec,
                "cold_x1_sec": cold_x1,
                f"cold_x{n}_sec": cold_xn,
                "rounds": rounds,
                "x1_min_sec": x1_min,
                f"x{n}_min_sec": xn_min,
                "ratio_min": round(xn_min / x1_min, 2) if x1_min else None,
                "ideal_ratio": float(n),
            }
        finally:
            shutil.rmtree(dst, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "occupancy_ab",
                "query": "embedding_hard_negatives",
                "mode": "k_prop_n_interleaved",
                "rounds_per_point": ROUNDS,
                "points": out,
                "base_dir": src,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
