"""Offline dataset tooling: the TUM rgb/depth association tool
(tools/tum_associate.py — role of the reference's only script,
/root/reference/scripts/tum_rgbd_association.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import tum_associate  # noqa: E402


def _write(path, rows):
    with open(path, "w") as f:
        f.write("# timestamp filename\n")
        for t, name in rows:
            f.write(f"{t:.6f} {name}\n")


@pytest.fixture()
def seq(tmp_path):
    # rgb at 30 Hz, depth offset by ~7ms with one dropout (rgb[2] has no
    # depth within 20 ms)
    rgb = [(100.0 + i / 30.0, f"rgb/{i}.png") for i in range(5)]
    depth = [(100.007 + i / 30.0, f"depth/{i}.png") for i in range(5)
             if i != 2]
    _write(tmp_path / "rgb.txt", rgb)
    _write(tmp_path / "depth.txt", depth)
    return tmp_path


def test_associate_pairs_nearest(seq):
    rgb = tum_associate.read_file_list(seq / "rgb.txt")
    depth = tum_associate.read_file_list(seq / "depth.txt")
    pairs = tum_associate.associate(rgb, depth)
    # the dropped frame must be absent, not re-paired to a neighbor's depth
    assert len(pairs) == 4
    assert all(abs(tr - td) < 0.02 for tr, _, td, _ in pairs)
    names = [(fr, fd) for _, fr, _, fd in pairs]
    assert ("rgb/2.png", "depth/1.png") not in names
    assert names[0] == ("rgb/0.png", "depth/0.png")


def test_one_to_one(seq):
    # two rgb frames close to one depth frame: only one may claim it
    rgb = [(100.000, "a.png"), (100.004, "b.png")]
    depth = [(100.003, "d.png")]
    pairs = tum_associate.associate(rgb, depth)
    assert len(pairs) == 1
    assert pairs[0][1] == "b.png"  # smaller time difference wins


def test_cli_writes_association(seq):
    rc = tum_associate.main([str(seq)])
    assert rc == 0
    out = seq / "association.txt"
    assert out.exists()
    lines = out.read_text().strip().split("\n")
    assert len(lines) == 4
    t, fr, td, fd = lines[0].split()
    assert fr.startswith("rgb/") and fd.startswith("depth/")
    # the output format is what examples/rgbd_tum.py's loader consumes
    from xfeatslam_tpu.utils import io as io_utils
    data = io_utils.load_tum_association(str(seq), str(out))
    assert len(data) == 4
    assert data.rgb_paths[0].endswith("rgb/0.png")
