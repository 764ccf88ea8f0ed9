#!/usr/bin/env python
"""Pin the libtorch-CPU reference baseline into BASELINE_CPU.json.

Runs the reference-equivalent CPU pipeline (tests/torch_xfeat_ref.py,
modeled on /root/reference/src/XFextractor.cc:250-357) N times on this
host and records the MEDIAN fps. bench.py reads the pinned file instead
of re-measuring, so the recorded vs_baseline ratio is stable across bench
runs when the repo didn't change (VERDICT r4 item 6).

Usage: python tools/pin_baseline.py [--runs 5]
"""

import argparse
import datetime
import json
import os
import platform
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import bench

    imgs = bench.make_images(4)
    vals = sorted(bench.bench_torch_cpu(imgs, n_frames=2)
                  for _ in range(args.runs))
    med = vals[len(vals) // 2]
    out = {
        "metric": "xfeat_extract_match_fps_libtorch_cpu",
        "value": round(med, 2),
        "unit": "frames/s (640x480, 1000 kpts, single frame at a time)",
        "pipeline": ("tests/torch_xfeat_ref.py reference_extract per frame "
                     "+ torch cdist 1000x1000x64 mutual-NN matching cost "
                     "(reference pipeline: /root/reference/src/"
                     "XFextractor.cc:250-357 + ORBmatcher)"),
        "how_measured": (f"median of {args.runs} runs of "
                         "bench.bench_torch_cpu(make_images(4), n_frames=2) "
                         "on an otherwise-idle host"),
        "environment": (f"{os.cpu_count()}-core {platform.machine()} host, "
                        f"torch CPU, {datetime.date.today().isoformat()}"),
        "note": ("Pinned per VERDICT r4 item 6: bench.py reads this file "
                 "instead of re-measuring the baseline under variable host "
                 "load, so vs_baseline is stable when the repo doesn't "
                 "change. Re-pin by running tools/pin_baseline.py."),
    }
    path = os.path.join(ROOT, "BASELINE_CPU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"pinned {med:.2f} fps (runs: {[round(v, 2) for v in vals]}) "
          f"-> {path}")


if __name__ == "__main__":
    main()
