#!/usr/bin/env python
"""Associate TUM RGB-D rgb.txt / depth.txt by timestamp into association.txt.

Role of the reference's only script, /root/reference/scripts/
tum_rgbd_association.py: TUM RGB-D sequences list color and depth frames in
separate files with slightly offset timestamps; rgbd_tum needs them paired.

This version takes the sequence dir (or explicit file paths) on argv,
enforces a maximum timestamp difference, and pairs one-to-one greedily by
smallest difference (the reference takes an unconstrained per-RGB argmin,
which can reuse one depth frame for several RGB frames around dropouts).

    python tools/tum_associate.py /data/rgbd_dataset_freiburg1_desk
    python tools/tum_associate.py rgb.txt depth.txt -o association.txt
"""

import argparse
import os
import sys


def read_file_list(path):
    """[(timestamp, filename)] from a TUM-format list (comments with #)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def associate(rgb, depth, max_difference=0.02):
    """One-to-one greedy pairing by smallest |t_rgb - t_depth|.

    Returns [(t_rgb, rgb_file, t_depth, depth_file)] sorted by t_rgb.
    """
    cands = [
        (abs(tr - td), i, j)
        for i, (tr, _) in enumerate(rgb)
        for j, (td, _) in enumerate(depth)
        if abs(tr - td) < max_difference
    ]
    cands.sort()
    used_r, used_d, pairs = set(), set(), []
    for _, i, j in cands:
        if i in used_r or j in used_d:
            continue
        used_r.add(i)
        used_d.add(j)
        pairs.append((rgb[i][0], rgb[i][1], depth[j][0], depth[j][1]))
    pairs.sort()
    return pairs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("paths", nargs="+",
                    help="sequence dir containing rgb.txt+depth.txt, or "
                         "the two files: rgb.txt depth.txt")
    ap.add_argument("-o", "--out", default=None,
                    help="output path (default: association.txt next to "
                         "rgb.txt)")
    ap.add_argument("--max-difference", type=float, default=0.02,
                    help="max |t_rgb - t_depth| in seconds (default 0.02)")
    args = ap.parse_args(argv)

    if len(args.paths) == 1:
        seq = args.paths[0]
        rgb_path = os.path.join(seq, "rgb.txt")
        depth_path = os.path.join(seq, "depth.txt")
    elif len(args.paths) == 2:
        rgb_path, depth_path = args.paths
    else:
        ap.error("pass one sequence dir or exactly two list files")

    rgb = read_file_list(rgb_path)
    depth = read_file_list(depth_path)
    pairs = associate(rgb, depth, args.max_difference)
    out = args.out or os.path.join(os.path.dirname(rgb_path) or ".",
                                   "association.txt")
    with open(out, "w") as f:
        for tr, fr, td, fd in pairs:
            f.write(f"{tr:.6f} {fr} {td:.6f} {fd}\n")
    print(f"{len(pairs)} pairs ({len(rgb)} rgb, {len(depth)} depth) -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
