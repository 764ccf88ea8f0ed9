"""Frame construction: extraction -> undistortion -> depth-to-virtual-right.

TPU-native equivalent of the XFeat Frame ctors
(/root/reference/src/Frame.cc:289-375 RGBD, :473 mono): one device call per
frame (extraction + undistortion fused), one host transfer, then cheap host
numpy for the depth lookup. No 64x48 feature grid — radius gating happens as
masks inside the batched matchers (ops/matching.py), so the grid structure
(Frame::AssignFeaturesToGrid) has no TPU counterpart by design.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.extractor import XFeatExtractor, extract_fn
from ..ops import camera as camera_ops
from ..ops import image as image_ops


@dataclass
class Frame:
    fid: int
    timestamp: float
    kpts: np.ndarray  # (K,2) raw pixel coords
    kpts_un: np.ndarray  # (K,2) undistorted
    desc: np.ndarray  # (K,64)
    scores: np.ndarray  # (K,)
    valid: np.ndarray  # (K,) bool
    depth: np.ndarray  # (K,) metric depth (<=0 none)
    ur: np.ndarray  # (K,) virtual right u (<0 none)
    angle: np.ndarray = None  # (K,) keypoint orientation (0 for XFeat)
    octave: np.ndarray = None  # (K,) pyramid level (0 for XFeat)
    R: Optional[np.ndarray] = None  # world->camera
    t: Optional[np.ndarray] = None
    mp_ids: np.ndarray = None  # (K,) int64 map-point binding, -1 free
    inlier: np.ndarray = None  # (K,) bool after pose opt
    # inertial state (Frame.h mVw/mImuBias/mpImuPreintegratedFrame)
    v_w: Optional[np.ndarray] = None  # (3,) body velocity in world
    bg: Optional[np.ndarray] = None  # (3,) gyro bias
    ba: Optional[np.ndarray] = None  # (3,) acc bias
    pre_last: object = None  # Preintegrated from the previous frame

    def __post_init__(self):
        K = len(self.kpts)
        if self.mp_ids is None:
            self.mp_ids = np.full(K, -1, np.int64)
        if self.inlier is None:
            self.inlier = np.zeros(K, bool)
        if self.angle is None:
            self.angle = np.zeros(K, np.float32)
        if self.octave is None:
            self.octave = np.zeros(K, np.int32)

    @property
    def n_valid(self):
        return int(self.valid.sum())

    def center(self):
        return (-self.R.T @ self.t).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("num_keypoints",))
def _extract_and_undistort(params, images, cam: camera_ops.Pinhole,
                           num_keypoints: int):
    out = extract_fn(params, images, num_keypoints)
    out["kpts_un"] = camera_ops.undistort_points(cam, out["kpts"])
    return out


class FramePipeline:
    """Builds Frames from (gray, depth) pairs.

    depth_factor: raw-depth / meters divisor (RGBD.DepthMapFactor, 5000 for
    TUM — /root/reference/examples/RGB-D/TUM1.yaml; applied like
    Tracking::GrabImageRGBD /root/reference/src/Tracking.cc:1532-1548).
    bf: stereo baseline x focal (Camera.bf) for the virtual right coordinate
    (Frame::ComputeStereoFromRGBD /root/reference/src/Frame.cc:1177-1198).
    """

    def __init__(self, extractor: XFeatExtractor, cam: camera_ops.Pinhole,
                 bf: float, depth_factor: float = 5000.0):
        self.extractor = extractor
        self.cam = cam
        self.bf = float(bf)
        self.depth_factor = float(depth_factor)
        self._next_id = 0

    def _extract(self, gray: np.ndarray):
        """Run the configured extractor. The XFeat path fuses extraction +
        undistortion in one jitted graph; other backends (ORB) extract then
        undistort separately. KB8 (fisheye) keypoints stay raw — the camera
        model unprojects them directly (the reference skips
        UndistortKeyPoints when mDistCoef is empty, Frame.cc:734)."""
        fisheye = isinstance(self.cam, camera_ops.KannalaBrandt8)
        if hasattr(self.extractor, "params"):
            # one batched device_get for the whole output tree: per-entry
            # np.asarray issues one synchronized transfer per array, which
            # through the remote-TPU tunnel costs ~30 ms EACH (45x the whole
            # extraction)
            if fisheye:
                x = image_ops.to_float_image(gray)
                out = jax.device_get(dict(extract_fn(
                    self.extractor.params, x, self.extractor.nfeatures)))
                out["kpts_un"] = out["kpts"]
                return out
            x = image_ops.to_float_image(gray)
            return jax.device_get(dict(_extract_and_undistort(
                self.extractor.params, x, self.cam, self.extractor.nfeatures
            )))
        out = self.extractor(gray)
        if fisheye:
            out["kpts_un"] = out["kpts"]
        else:
            out["kpts_un"] = np.asarray(
                camera_ops.undistort_points(self.cam, jnp.asarray(out["kpts"]))
            )
        return out

    def build_rgbd(self, gray: np.ndarray, depth_raw: np.ndarray,
                   timestamp: float) -> Frame:
        out = self._extract(gray)
        kpts = out["kpts"][0]
        kpts_un = out["kpts_un"][0]
        valid = out["valid"][0]

        if depth_raw.dtype != np.float32 or self.depth_factor != 1.0:
            depth_m = depth_raw.astype(np.float32) / self.depth_factor
        else:
            depth_m = depth_raw
        H, W = depth_m.shape
        xi = np.clip(np.round(kpts[:, 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(kpts[:, 1]).astype(int), 0, H - 1)
        d = np.where(valid, depth_m[yi, xi], 0.0).astype(np.float32)
        # reject depth at discontinuities: corners sit on object silhouettes
        # where a sub-pixel detection offset flips the depth between fore-
        # and background (meters of error along the ray). 3x3 min/max
        # consistency gate; failing keypoints become mono observations.
        import cv2

        k3 = np.ones((3, 3), np.uint8)
        dmin = cv2.erode(depth_m, k3)[yi, xi]
        dmax = cv2.dilate(depth_m, k3)[yi, xi]
        edge = (dmax - dmin) > 0.05 * np.maximum(d, 1e-6)
        d = np.where(edge | (dmin <= 0), 0.0, d).astype(np.float32)
        ur = np.where(d > 0, kpts_un[:, 0] - self.bf / np.maximum(d, 1e-6), -1.0)

        f = Frame(
            fid=self._next_id,
            timestamp=timestamp,
            kpts=kpts,
            kpts_un=kpts_un,
            desc=out["desc"][0],
            scores=out["scores"][0],
            valid=valid,
            depth=d,
            ur=ur.astype(np.float32),
            angle=out.get("angle", np.zeros((1, len(kpts)), np.float32))[0],
            octave=out.get("octave", np.zeros((1, len(kpts)), np.int32))[0],
        )
        self._next_id += 1
        return f

    def assemble_rgbd(self, out: dict, timestamp: float) -> Frame:
        """Build a Frame from extraction outputs computed elsewhere — the
        whole-frame fused graph (optim/track_step.xfeat_rgbd_frame_step)
        runs extraction, undistortion and the depth->virtual-right
        conversion in-graph and hands back the finished per-keypoint
        arrays (already unbatched)."""
        f = Frame(
            fid=self._next_id,
            timestamp=timestamp,
            kpts=out["kpts"],
            kpts_un=out["kpts_un"],
            desc=out["desc"],
            scores=out["scores"],
            valid=out["valid"],
            depth=out["depth"],
            ur=out["ur"],
        )
        self._next_id += 1
        return f

    def build_stereo(self, gray_l: np.ndarray, gray_r: np.ndarray,
                     timestamp: float, min_disp: float = 0.5,
                     max_disp: float = 192.0) -> Frame:
        """Rectified stereo frame (Frame stereo ctor role,
        /root/reference/src/Frame.cc:102-199: dual extraction +
        ComputeStereoMatches): extract both images, row-banded match, depth
        = bf/disparity."""
        from ..ops import matching

        out_l = self._extract(gray_l)
        out_r = self._extract(gray_r)
        K = len(out_l["kpts"][0])
        oct_l = out_l.get("octave", np.zeros((1, K), np.int32))[0]
        oct_r = out_r.get("octave", np.zeros((1, K), np.int32))[0]
        binary = out_l["desc"].shape[-1] > 64
        # thOrbDist = (TH_HIGH+TH_LOW)/2 in the active profile's distance
        # units (Frame::ComputeStereoMatches, /root/reference/src/Frame.cc:
        # 1027): 75 Hamming for ORB, 550 L2^2x512 for XFeat floats.
        th_orb_dist = (
            (matching.ORB_TH_HIGH + matching.ORB_TH_LOW) / 2 if binary
            else (matching.TH_HIGH + matching.TH_LOW) / 2
        )
        res, disp = matching.stereo_match_rows(
            jnp.asarray(out_l["kpts_un"][0]), jnp.asarray(out_l["desc"][0]),
            jnp.asarray(out_l["valid"][0]), jnp.asarray(oct_l),
            jnp.asarray(out_r["kpts_un"][0]), jnp.asarray(out_r["desc"][0]),
            jnp.asarray(out_r["valid"][0]), jnp.asarray(oct_r),
            min_disp=min_disp, max_disp=max_disp,
            max_dist=jnp.float32(th_orb_dist),
            binary=binary,
        )
        disp = np.asarray(disp)
        mask = np.asarray(res.mask)
        d = np.where(mask & (disp > min_disp), self.bf / np.maximum(disp, 1e-6), 0.0)
        kpts_un = out_l["kpts_un"][0]
        ur = np.where(d > 0, kpts_un[:, 0] - disp, -1.0)
        f = Frame(
            fid=self._next_id,
            timestamp=timestamp,
            kpts=out_l["kpts"][0],
            kpts_un=kpts_un,
            desc=out_l["desc"][0],
            scores=out_l["scores"][0],
            valid=out_l["valid"][0],
            depth=d.astype(np.float32),
            ur=ur.astype(np.float32),
            angle=out_l.get("angle", np.zeros((1, K), np.float32))[0],
            octave=oct_l.astype(np.int32),
        )
        self._next_id += 1
        return f

    def build_stereo_fisheye(self, gray_l: np.ndarray, gray_r: np.ndarray,
                             timestamp: float, cam2, T_c1_c2: np.ndarray,
                             lapping1=None, lapping2=None,
                             max_dist: float = None) -> Frame:
        """Two-camera (KannalaBrandt8) stereo frame: the role of the
        stereo-fisheye Frame ctor + ComputeStereoFishEyeMatches
        (/root/reference/src/Frame.cc:1227-1391). Extract both views, match
        descriptors restricted to the lapping columns, triangulate every
        match in ONE batched device call
        (ops/camera.stereo_triangulate_matches — the reference loops a
        scalar TriangulateMatches per pair, KannalaBrandt8.cpp:309); left
        keypoints whose triangulation survives carry metric depth.

        Design note: the reference additionally keeps right-camera keypoints
        as independent observations (Nleft+Nright frames); here the right
        view contributes depth only — the depth-carrying left frame drives
        the same initialization/point-creation path as RGB-D.
        """
        from ..ops import matching

        out_l = self._extract(gray_l)
        out_r = self._extract(gray_r)
        K = len(out_l["kpts"][0])
        kpts_l = out_l["kpts"][0]
        kpts_r = out_r["kpts"][0]
        valid_l = out_l["valid"][0].copy()
        valid_r = out_r["valid"][0].copy()
        # restrict matching to the overlapping FOV columns
        # (Frame::ComputeStereoFishEyeMatches "Speed it up by matching
        # keypoints in the lapping area")
        m_l = valid_l.copy()
        m_r = valid_r.copy()
        if lapping1 is not None:
            m_l &= (kpts_l[:, 0] >= lapping1[0]) & (kpts_l[:, 0] <= lapping1[1])
        if lapping2 is not None:
            m_r &= (kpts_r[:, 0] >= lapping2[0]) & (kpts_r[:, 0] <= lapping2[1])
        binary = out_l["desc"].shape[-1] > 64
        if max_dist is None:
            max_dist = (matching.ORB_TH_LOW if binary
                        else matching.TH_LOW * 6)
        res = matching.match_general(
            jnp.asarray(out_l["desc"][0]), jnp.asarray(m_l),
            jnp.asarray(out_r["desc"][0]), jnp.asarray(m_r),
            max_dist=jnp.float32(max_dist), ratio=0.7, binary=binary,
        )
        idx = np.asarray(res.idx)
        mask = np.asarray(res.mask)
        # batched TriangulateMatches over ALL candidate pairs
        oct_l = out_l.get("octave", np.zeros((1, K), np.int32))[0]
        oct_r = out_r.get("octave", np.zeros((1, K), np.int32))[0]
        sf = getattr(self.extractor, "scale_factor", 1.2)
        safe_idx = np.clip(idx, 0, None)
        X, z1, ok = camera_ops.stereo_triangulate_matches(
            self.cam, cam2,
            jnp.asarray(kpts_l), jnp.asarray(kpts_r[safe_idx]),
            jnp.asarray(T_c1_c2[:3, :3].astype(np.float32)),
            jnp.asarray(T_c1_c2[:3, 3].astype(np.float32)),
            sigma2_1=jnp.asarray((sf ** (2.0 * oct_l)).astype(np.float32)),
            sigma2_2=jnp.asarray(
                (sf ** (2.0 * oct_r[safe_idx])).astype(np.float32)),
        )
        ok = np.asarray(ok) & mask
        z1 = np.asarray(z1)
        d = np.where(ok & (z1 > 0.1), z1, 0.0).astype(np.float32)
        f = Frame(
            fid=self._next_id,
            timestamp=timestamp,
            kpts=kpts_l,
            kpts_un=out_l["kpts_un"][0],
            desc=out_l["desc"][0],
            scores=out_l["scores"][0],
            valid=valid_l,
            depth=d,
            ur=np.full(K, -1.0, np.float32),  # no rectified right coordinate
            angle=out_l.get("angle", np.zeros((1, K), np.float32))[0],
            octave=oct_l.astype(np.int32),
        )
        self._next_id += 1
        return f

    def build_mono(self, gray: np.ndarray, timestamp: float) -> Frame:
        K = self.extractor.nfeatures
        out = self._extract(gray)
        f = Frame(
            fid=self._next_id,
            timestamp=timestamp,
            kpts=out["kpts"][0],
            kpts_un=out["kpts_un"][0],
            desc=out["desc"][0],
            scores=out["scores"][0],
            valid=out["valid"][0],
            depth=np.zeros(K, np.float32),
            ur=np.full(K, -1.0, np.float32),
            angle=out.get("angle", np.zeros((1, K), np.float32))[0],
            octave=out.get("octave", np.zeros((1, K), np.int32))[0],
        )
        self._next_id += 1
        return f
