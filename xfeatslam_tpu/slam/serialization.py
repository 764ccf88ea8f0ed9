"""Atlas checkpoint/resume: whole-map save and load.

Role of System::SaveAtlas/LoadAtlas (/root/reference/src/System.cc:1403-1546:
boost binary archive of the Atlas object graph + vocabulary MD5 checksum).
TPU-native format: one compressed npz per map holding the struct-of-arrays
(keyframe measurements, poses, point store, observation index) plus a json
header with a config checksum — standard Python, no boost."""

from __future__ import annotations

import hashlib
import io
import json
import os
import zipfile

import numpy as np

from .atlas import Atlas
from .map import KeyFrame, SlamMap

FORMAT_VERSION = 1


def _config_checksum(desc_dim: int) -> str:
    """Stands in for the vocabulary MD5 gate (System.cc:1508-1546): a load
    into a mismatched descriptor setup must fail loudly."""
    return hashlib.md5(f"xfeatslam_tpu:v{FORMAT_VERSION}:d{desc_dim}".encode()).hexdigest()


def _flatten_pre(pre) -> np.ndarray:
    """Preintegrated -> flat float32 (292,): dt, dR, dV, dP, cov15, 5x J, bg, ba."""
    parts = [np.atleast_1d(np.asarray(pre.dt, np.float32))]
    for a in (pre.dR, pre.dV, pre.dP, pre.cov, pre.JRg, pre.JVg, pre.JVa,
              pre.JPg, pre.JPa, pre.bg, pre.ba):
        parts.append(np.asarray(a, np.float32).reshape(-1))
    return np.concatenate(parts)


def _unflatten_pre(v: np.ndarray):
    from ..ops.imu import Preintegrated

    def take(n, shape):
        nonlocal i
        out = v[i:i + n].reshape(shape)
        i += n
        return out

    i = 0
    dt = v[0]
    i = 1
    return Preintegrated(
        np.float32(dt), take(9, (3, 3)), take(3, (3,)), take(3, (3,)),
        take(225, (15, 15)), take(9, (3, 3)), take(9, (3, 3)),
        take(9, (3, 3)), take(9, (3, 3)), take(9, (3, 3)),
        take(3, (3,)), take(3, (3,)),
    )


def save_map(m: SlamMap, f):
    kids = sorted(m.keyframes)
    kf_blobs = {}
    for kid in kids:
        kf = m.keyframes[kid]
        kf_blobs[f"kf{kid}_kpts_un"] = kf.kpts_un
        kf_blobs[f"kf{kid}_desc"] = kf.desc
        kf_blobs[f"kf{kid}_valid"] = kf.valid
        kf_blobs[f"kf{kid}_ur"] = kf.ur
        kf_blobs[f"kf{kid}_depth"] = kf.depth
        kf_blobs[f"kf{kid}_angle"] = kf.angle
        kf_blobs[f"kf{kid}_R"] = kf.R
        kf_blobs[f"kf{kid}_t"] = kf.t
        kf_blobs[f"kf{kid}_mp"] = kf.mp_ids
        kf_blobs[f"kf{kid}_meta"] = np.array(
            [kf.frame_id, kf.parent, kf.prev_kf], np.int64
        )
        kf_blobs[f"kf{kid}_ts"] = np.float64(kf.timestamp)
        # inertial state: velocity (nan when not yet estimated) + biases +
        # the flattened preintegration from prev_kf (empty when none)
        vel = np.full(3, np.nan, np.float32) if kf.vel is None else kf.vel
        kf_blobs[f"kf{kid}_imu"] = np.concatenate(
            [vel, kf.bg, kf.ba]).astype(np.float32)
        kf_blobs[f"kf{kid}_pre"] = (
            np.zeros(0, np.float32) if kf.pre_kf is None
            else _flatten_pre(kf.pre_kf)
        )
    n = m.points.n
    obs_flat = []
    for mp, o in m.obs.items():
        for kid, slot in o.items():
            obs_flat.append((mp, kid, slot))
    np.savez_compressed(
        f,
        header=np.bytes_(json.dumps({
            "version": FORMAT_VERSION,
            "map_id": m.map_id,
            "desc_dim": m.desc_dim,
            "scale_factor": m.scale_factor,
            "n_levels": m.n_levels,
            "kf_ids": kids,
            "kf_origin": m.kf_origin,
            "imu_initialized": m.imu_initialized,
            "imu_ba1": m.imu_ba1,
            "imu_ba2": m.imu_ba2,
            "imu_bg": [float(x) for x in m.imu_bg],
            "imu_ba": [float(x) for x in m.imu_ba],
            "checksum": _config_checksum(m.desc_dim),
        }).encode()),
        pts_pos=m.points.pos[:n],
        pts_desc=m.points.desc[:n],
        pts_normal=m.points.normal[:n],
        pts_nobs=m.points.n_obs[:n],
        pts_alive=m.points.alive[:n],
        pts_first=m.points.first_kf[:n],
        pts_angle=m.points.angle[:n],
        obs=np.asarray(obs_flat, np.int64).reshape(-1, 3),
        **kf_blobs,
    )


def load_map(f) -> SlamMap:
    data = np.load(f, allow_pickle=False)
    header = json.loads(bytes(data["header"]).decode())
    if header["checksum"] != _config_checksum(header["desc_dim"]):
        raise ValueError("atlas checkpoint checksum mismatch "
                         "(incompatible descriptor configuration)")
    m = SlamMap(map_id=header["map_id"], desc_dim=header["desc_dim"],
                scale_factor=header.get("scale_factor", 1.2),
                n_levels=header.get("n_levels", 1))
    for kid in header["kf_ids"]:
        meta = data[f"kf{kid}_meta"]
        kf = KeyFrame(
            kid=kid,
            frame_id=int(meta[0]),
            timestamp=float(data[f"kf{kid}_ts"]),
            kpts_un=data[f"kf{kid}_kpts_un"],
            desc=data[f"kf{kid}_desc"],
            valid=data[f"kf{kid}_valid"],
            ur=data[f"kf{kid}_ur"],
            depth=data[f"kf{kid}_depth"],
            angle=data[f"kf{kid}_angle"],
            R=data[f"kf{kid}_R"],
            t=data[f"kf{kid}_t"],
            mp_ids=data[f"kf{kid}_mp"].copy(),
        )
        kf.parent = int(meta[1])
        if len(meta) > 2:
            kf.prev_kf = int(meta[2])
        imu = data.get(f"kf{kid}_imu")
        if imu is not None:
            if np.isfinite(imu[0]):
                kf.vel = imu[0:3].copy()
            kf.bg = imu[3:6].copy()
            kf.ba = imu[6:9].copy()
        pre = data.get(f"kf{kid}_pre")
        if pre is not None and len(pre):
            kf.pre_kf = _unflatten_pre(pre)
        m.keyframes[kid] = kf
        m.covis.setdefault(kid, {})
    m.kf_origin = header["kf_origin"]
    m.imu_initialized = bool(header.get("imu_initialized", False))
    m.imu_ba1 = bool(header.get("imu_ba1", False))
    m.imu_ba2 = bool(header.get("imu_ba2", False))
    m.imu_bg = np.asarray(header.get("imu_bg", [0, 0, 0]), np.float32)
    m.imu_ba = np.asarray(header.get("imu_ba", [0, 0, 0]), np.float32)
    # point store
    n = len(data["pts_pos"])
    while m.points.cap < n:
        m.points._grow_to(m.points.cap * 2)
    m.points.n = n
    m.points.pos[:n] = data["pts_pos"]
    m.points.desc[:n] = data["pts_desc"]
    m.points.normal[:n] = data["pts_normal"]
    m.points.n_obs[:n] = data["pts_nobs"]
    m.points.alive[:n] = data["pts_alive"]
    m.points.first_kf[:n] = data["pts_first"]
    m.points.angle[:n] = data["pts_angle"]
    m.points.free = [i for i in range(n) if not m.points.alive[i]]
    # observations + graph relink (Atlas::PostLoad role)
    for (mp, kid, slot) in data["obs"]:
        if m.points.alive[mp] and kid in m.keyframes:
            m.obs.setdefault(int(mp), {})[int(kid)] = int(slot)
    for kid in header["kf_ids"]:
        kf = m.keyframes[kid]
        if kf.parent >= 0 and kf.parent in m.keyframes:
            m.keyframes[kf.parent].children.add(kid)
        m.update_connections(kid)
    return m


def save_atlas(atlas: Atlas, path: str):
    """One zip holding each map as an npz (the .osa role).

    A data-derived retrieval codebook, when installed, travels with the
    checkpoint: the stored per-KF global descriptors were aggregated under
    it, and a resumed process would otherwise aggregate queries under the
    seeded default codebook — silently breaking post-resume relocalization
    and merges. (The reference's analogue: the vocabulary file + MD5 check
    at /root/reference/src/System.cc:1403-1506.)"""
    from . import retrieval

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        meta = {
            "version": FORMAT_VERSION,
            "desc_dim": atlas.desc_dim,
            "active_id": atlas.active_id,
            "map_ids": sorted(atlas.maps),
        }
        z.writestr("atlas.json", json.dumps(meta))
        cb = retrieval.installed_codebook(atlas.desc_dim)
        if cb is not None:
            buf = io.BytesIO()
            np.save(buf, cb)
            z.writestr("codebook.npy", buf.getvalue())
        for mid, m in atlas.maps.items():
            buf = io.BytesIO()
            save_map(m, buf)
            z.writestr(f"map{mid}.npz", buf.getvalue())


def load_atlas(path: str) -> Atlas:
    from . import retrieval

    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("atlas.json").decode())
        atlas = Atlas(desc_dim=meta["desc_dim"])
        atlas.maps.clear()
        cb = None
        if "codebook.npy" in z.namelist():
            cb = np.load(io.BytesIO(z.read("codebook.npy")))
        for mid in meta["map_ids"]:
            buf = io.BytesIO(z.read(f"map{mid}.npz"))
            atlas.maps[mid] = load_map(buf)
        atlas.active_id = meta["active_id"]
        atlas._next_map_id = max(meta["map_ids"]) + 1 if meta["map_ids"] else 0
    # Install the checkpoint's codebook only after every map loaded (a
    # failed/corrupt load must not corrupt the process-global registry);
    # a checkpoint WITHOUT a codebook restores the seeded default — its
    # globals were aggregated under it, and leaving a previously fitted
    # codebook installed would mismatch queries against them.
    retrieval.use_codebook(cb, dim=atlas.desc_dim)
    return atlas
