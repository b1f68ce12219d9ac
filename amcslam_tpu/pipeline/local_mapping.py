"""Local mapping (rebuild of src/LocalMapping.cc Run loop).

Sequential (or caller-threaded) consumer of new keyframes:
  ProcessNewKeyFrame -> MapPointCulling -> CreateNewMapPoints (epipolar
  search + batched DLT triangulation on device) -> SearchInNeighbors (fuse)
  -> LocalGPBA (the jitted Schur solver via extraction) -> pass to loop
  closing. KeyFrameCulling stays disabled, as in the reference — culling
  would break the temporal GP chain (LocalMapping.cc:160-162).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..frontend.cameras import triangulate_dlt
from ..solver.ba import local_gp_ba
from . import matcher
from .extraction import apply_local_ba, extract_local_ba
from .map_store import KeyFrame, Map, MapPoint
from ..utils.timing import GLOBAL_TIMER

# def-time jit; candidate counts are pow2-bucketed before the call so the
# batched SVD compiles O(log n) programs, not one per keyframe insertion
_triangulate_batch = jax.jit(jax.vmap(triangulate_dlt))
from .rig import Rig


def camera_Twc(kf: KeyFrame, cam: int, rig: Rig) -> np.ndarray:
    """Per-camera pose at that camera's own timestamp: the stereo camera
    is at the KF time; async cameras GP-interpolate between the previous
    keyframe and this one (GetCameraPose semantics, KeyFrame.cc:116-145 /
    LocalMapping.cc:360-393)."""
    if cam == rig.n_cams - 1:
        return kf.Twb @ rig.Tbc[cam]
    t = float(kf.cam_times[cam])
    prev = kf.prev_kf
    if prev is not None and prev.timestamp < t < kf.timestamp:
        from .tracking import interp_camera_pose

        Twb_t = interp_camera_pose(
            prev.Twb, prev.velocity, prev.timestamp,
            kf.Twb, kf.velocity, kf.timestamp, t,
        )
    else:
        # constant-twist extrapolation from the KF's own state
        from .tracking import _np_exp_se3

        Twb_t = kf.Twb @ _np_exp_se3(kf.velocity * (t - kf.timestamp))
    return Twb_t @ rig.Tbc[cam]


class LocalMapping:
    def __init__(self, rig: Rig, map_: Map, b_extrinsic: bool = False,
                 loop_closer=None):
        self.rig = rig
        self.map = map_
        self.b_extrinsic = b_extrinsic
        self.loop_closer = loop_closer
        self.recent_points: list[MapPoint] = []
        self.queue: list[KeyFrame] = []
        self._ba = jax.jit(
            lambda d, s: local_gp_ba(
                d, s, b_large=False, b_extrinsic=b_extrinsic,
                ext_min_obs=rig.ext_min_obs,
            )
        )

    def insert_keyframe(self, kf: KeyFrame):
        self.queue.append(kf)

    def run_once(self) -> bool:
        """One LocalMapping::Run iteration; returns False when idle."""
        if not self.queue:
            return False
        kf = self.queue.pop(0)
        T = GLOBAL_TIMER
        with T.span("lm.process_new_kf"):
            self.process_new_keyframe(kf)
        with T.span("lm.cull_map_points"):
            self.cull_map_points(kf)
        with T.span("lm.create_new_points"):
            self.create_new_map_points(kf)
        with T.span("lm.fuse_neighbors"):
            self.fuse_neighbors(kf)
        if self.map.n_keyframes() > 2:
            with T.span("lm.local_ba"):
                self.local_ba(kf)
        if self.loop_closer is not None:
            with T.span("lm.loop_closing"):
                self.loop_closer.insert_keyframe(kf)
        return True

    # ------------------------------------------------------------------
    def process_new_keyframe(self, kf: KeyFrame):
        """LocalMapping::ProcessNewKeyFrame (:225): observation registration
        happens at creation; refresh covisibility and track recent points."""
        kf.update_connections(self.map.map_points)
        # spanning tree: first connection sets the parent to the strongest
        # covisible keyframe (KeyFrame::UpdateConnections mbFirstConnection)
        if kf.parent is None and kf.covisibility and self.map.origin_kf is not kf:
            best = max(kf.covisibility, key=kf.covisibility.get)
            kf.parent = self.map.keyframes.get(best)
        for mp_id in kf.matches:
            if mp_id < 0:
                continue
            mp = self.map.map_points.get(int(mp_id))
            if mp is not None and mp.first_kf_id == kf.id:
                self.recent_points.append(mp)

    def cull_map_points(self, kf: KeyFrame):
        """LocalMapping::MapPointCulling (:273): found-ratio < 0.25 or too few
        observations within 2 KFs of creation. Probation ages count
        *keyframes* (kf_seq), not raw ids — ids come from a counter shared
        with Frames/MapPoints so consecutive KFs differ by 100+ ids."""
        keep = []
        for mp in self.recent_points:
            if mp.bad:
                continue
            first = self.map.keyframes.get(mp.first_kf_id)
            age = kf.kf_seq - first.kf_seq if first is not None else 3
            if mp.found_ratio() < 0.25:
                self.map.erase_map_point(mp)
            elif age >= 2 and mp.n_obs() <= 2:
                self.map.erase_map_point(mp)
            elif age >= 3:
                pass  # survived probation
            else:
                keep.append(mp)
        self.recent_points = keep

    # ------------------------------------------------------------------
    def _camera_Twc(self, kf: KeyFrame, cam: int) -> np.ndarray:
        return camera_Twc(kf, cam, self.rig)

    def _global_arrays(self, kf: KeyFrame):
        """Concatenate per-camera keypoint data into the global index order
        (the reference's flat `mvKeysUn`/`mmpKeyToCam` layout)."""
        C = self.rig.n_cams
        kp = np.concatenate([np.asarray(kf.keypoints[c]).reshape(-1, 2)
                             for c in range(C)])
        desc = np.concatenate([np.asarray(kf.descriptors[c]).reshape(-1, 32)
                               for c in range(C)]).astype(np.uint8)
        octv = np.concatenate([np.asarray(kf.kp_octaves[c]).reshape(-1)
                               for c in range(C)]).astype(int)
        cams = np.concatenate([np.full(len(kf.keypoints[c]), c, int)
                               for c in range(C)])
        ang = (
            np.concatenate([np.asarray(kf.kp_angles[c]).reshape(-1)
                            for c in range(C)])
            if kf.kp_angles is not None else None
        )
        return kp, desc, octv, cams, ang

    def create_new_map_points(self, kf: KeyFrame, n_neighbors: int = 10):
        """LocalMapping::CreateNewMapPoints (:311-569): descriptor matching
        across the GLOBAL keypoint sets of both keyframes (cross-camera pairs
        possible, ORBmatcher::SearchForTriangulation ORBmatcher.cc:947ff) with
        per-pair epipolar gating, then batched DLT triangulation and the full
        acceptance gates — parallax, cheirality in both views, reprojection
        chi2 in both views, octave scale consistency (LocalMapping.cc:434-569).
        Each camera observes at its own GP-interpolated pose."""
        neighbors = [
            self.map.keyframes[i]
            for i in kf.best_covisible(n_neighbors)
            if i in self.map.keyframes
        ]
        if kf.prev_kf is not None and kf.prev_kf not in neighbors:
            neighbors.append(kf.prev_kf)

        C = self.rig.n_cams
        sf = self.rig.scale_factor
        ratio_factor = 1.5 * sf
        Kmats, Kinvs = [], []
        for c in range(C):
            K4 = self.rig.K[c]
            Km = np.array([[K4[0], 0, K4[2]], [0, K4[1], K4[3]], [0, 0, 1.0]])
            Kmats.append(Km)
            Kinvs.append(np.linalg.inv(Km))
        Twc1 = [self._camera_Twc(kf, c) for c in range(C)]
        Tcw1 = [np.linalg.inv(T) for T in Twc1]
        kp1, d1, oct1, cam1, ang1 = self._global_arrays(kf)
        if len(kp1) == 0:
            return 0
        free1 = kf.matches < 0

        tri_r1, tri_r2, tri_T1, tri_T2, tri_meta = [], [], [], [], []
        for nb in neighbors:
            kp2, d2, oct2, cam2, ang2 = self._global_arrays(nb)
            if len(kp2) == 0:
                continue
            Twc2 = [self._camera_Twc(nb, c) for c in range(C)]
            Tcw2 = [np.linalg.inv(T) for T in Twc2]
            # per-(c1,c2) fundamental matrices from the relative camera poses
            F12 = np.zeros((C, C, 3, 3))
            base_ok = np.zeros((C, C), bool)
            for a in range(C):
                for b in range(C):
                    T12 = Tcw1[a] @ Twc2[b]
                    t12 = T12[:3, 3]
                    base_ok[a, b] = np.linalg.norm(t12) >= 0.05
                    tx = np.array(
                        [[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]],
                         [-t12[1], t12[0], 0]]
                    )
                    F12[a, b] = Kinvs[a].T @ tx @ T12[:3, :3] @ Kinvs[b]
            if not base_ok.any():
                continue
            idx2 = matcher.match_descriptors(
                d1, d2, max_dist=matcher.TH_LOW, ratio=0.9,
                ang1=ang1, ang2=ang2,
            )
            for g1, g2 in enumerate(idx2):
                if g2 < 0 or not free1[g1] or nb.matches[g2] >= 0:
                    continue
                c1, c2 = int(cam1[g1]), int(cam2[g2])
                if not base_ok[c1, c2]:
                    continue
                # epipolar gate: distance of kp2 from kp1's epipolar line
                # (CheckDistEpipolarLine, 3.84 * sigma2 of kp2's octave)
                l2 = F12[c1, c2].T @ np.append(kp1[g1], 1.0)
                num = l2 @ np.append(kp2[g2], 1.0)
                den = l2[0] ** 2 + l2[1] ** 2
                if den < 1e-12 or num * num / den > 3.84 * self.rig.level_sigma2[oct2[g2]]:
                    continue
                r1 = Kinvs[c1] @ np.append(kp1[g1], 1.0)
                r2 = Kinvs[c2] @ np.append(kp2[g2], 1.0)
                # parallax gate: nearly parallel rays triangulate badly
                # (cosParallaxRays < 0.9998, LocalMapping.cc:480)
                ray1 = Twc1[c1][:3, :3] @ r1
                ray2 = Twc2[c2][:3, :3] @ r2
                cos_par = ray1 @ ray2 / (
                    np.linalg.norm(ray1) * np.linalg.norm(ray2)
                )
                if cos_par >= 0.9998:
                    continue
                tri_r1.append(r1 / r1[2])
                tri_r2.append(r2 / r2[2])
                tri_T1.append(Tcw1[c1])
                tri_T2.append(Tcw2[c2])
                tri_meta.append((c1, g1, nb, c2, int(g2)))

        if not tri_r1:
            return 0
        n_tri = len(tri_r1)
        nbkt = 16
        while nbkt < n_tri:
            nbkt *= 2
        r1_a = np.stack(tri_r1)
        r2_a = np.stack(tri_r2)
        T1_a = np.stack(tri_T1)
        T2_a = np.stack(tri_T2)
        if nbkt > n_tri:
            pad = nbkt - n_tri
            ray = np.tile(np.array([0.0, 0.0, 1.0]), (pad, 1))
            eyeT = np.tile(np.eye(4), (pad, 1, 1))
            off = eyeT.copy()
            off[:, 0, 3] = 1.0  # baseline so the padded SVD is well-posed
            r1_a = np.concatenate([r1_a, ray])
            r2_a = np.concatenate([r2_a, ray])
            T1_a = np.concatenate([T1_a, eyeT])
            T2_a = np.concatenate([T2_a, off])
        X, w = _triangulate_batch(
            jnp.asarray(r1_a), jnp.asarray(r2_a),
            jnp.asarray(T1_a), jnp.asarray(T2_a),
        )
        X = np.asarray(X)[:n_tri]
        w = np.asarray(w)[:n_tri]
        created = 0
        for n, (c1, g1, nb, c2, g2) in enumerate(tri_meta):
            if not np.isfinite(X[n]).all():
                continue
            Tcw1_, Tcw2_ = tri_T1[n], tri_T2[n]
            Xc1 = Tcw1_[:3, :3] @ X[n] + Tcw1_[:3, 3]
            Xc2 = Tcw2_[:3, :3] @ X[n] + Tcw2_[:3, 3]
            # cheirality in both views
            if Xc1[2] <= 0 or Xc2[2] <= 0 or abs(w[n]) < 1e-9:
                continue
            # reprojection chi2 in both views (5.991 * sigma2 per octave)
            o1 = int(kf.kp_octaves[c1][g1 - kf.kp_offsets[c1]])
            o2 = int(nb.kp_octaves[c2][g2 - nb.kp_offsets[c2]])
            K1_, K2_ = self.rig.K[c1], self.rig.K[c2]
            e1 = np.array([
                K1_[0] * Xc1[0] / Xc1[2] + K1_[2],
                K1_[1] * Xc1[1] / Xc1[2] + K1_[3],
            ]) - kp1[g1]
            e2 = np.array([
                K2_[0] * Xc2[0] / Xc2[2] + K2_[2],
                K2_[1] * Xc2[1] / Xc2[2] + K2_[3],
            ]) - np.asarray(nb.keypoints[c2])[g2 - nb.kp_offsets[c2]]
            if (e1 @ e1) > 5.991 * self.rig.level_sigma2[o1]:
                continue
            if (e2 @ e2) > 5.991 * self.rig.level_sigma2[o2]:
                continue
            # octave scale consistency (LocalMapping.cc:552-560)
            dist1 = np.linalg.norm(X[n] - (-Tcw1_[:3, :3].T @ Tcw1_[:3, 3]))
            dist2 = np.linalg.norm(X[n] - (-Tcw2_[:3, :3].T @ Tcw2_[:3, 3]))
            if dist1 <= 0 or dist2 <= 0:
                continue
            ratio_dist = dist2 / dist1
            ratio_oct = sf ** o1 / sf ** o2
            if (ratio_dist * ratio_factor <= ratio_oct
                    or ratio_dist >= ratio_oct * ratio_factor):
                continue
            if kf.matches[g1] >= 0 or nb.matches[g2] >= 0:
                continue
            cam_l1 = g1 - kf.kp_offsets[c1]
            mp = MapPoint(position=X[n], descriptor=kf.descriptors[c1][cam_l1],
                          first_kf_id=kf.id)
            mp.add_observation(kf, c1, g1)
            mp.add_observation(nb, c2, g2)
            kf.matches[g1] = mp.id
            nb.matches[g2] = mp.id
            self.map.add_map_point(mp)
            mp.update_normal_and_depth(
                self.map.keyframes, self.rig.Tbc, sf, self.rig.n_levels
            )
            self.recent_points.append(mp)
            created += 1
        return created

    # ------------------------------------------------------------------
    def fuse_neighbors(self, kf: KeyFrame):
        """LocalMapping::SearchInNeighbors (:593): project this KF's points
        into neighbors and merge duplicates (keep the more-observed point)."""
        neighbors = [
            self.map.keyframes[i]
            for i in kf.best_covisible(10)
            if i in self.map.keyframes
        ]
        mps = [
            self.map.map_points[int(i)]
            for i in kf.matches
            if i >= 0 and int(i) in self.map.map_points
        ]
        if not mps:
            return
        pos = np.stack([mp.position for mp in mps])
        desc = np.stack([
            mp.descriptor if mp.descriptor is not None else np.zeros(32, np.uint8)
            for mp in mps
        ])
        for nb in neighbors:
            # project through EVERY camera at its own (GP-interpolated) pose
            # (ORBmatcher::Fuse loops cameras, ORBmatcher.cc:1133ff)
            for cam in range(self.rig.n_cams):
                if len(nb.keypoints[cam]) == 0:
                    continue
                Tcw = np.linalg.inv(self._camera_Twc(nb, cam))
                idx = matcher.search_by_projection(
                    pos, desc, nb.keypoints[cam], nb.descriptors[cam],
                    nb.kp_octaves[cam], Tcw, self.rig.K[cam], radius=3.0,
                    max_dist=matcher.TH_LOW,
                )
                for mi, ki in enumerate(idx):
                    if ki < 0:
                        continue
                    g = nb.global_index(cam, int(ki))
                    other_id = nb.matches[g]
                    mp = mps[mi]
                    if mp.bad:
                        continue
                    if other_id < 0:
                        nb.matches[g] = mp.id
                        mp.add_observation(nb, cam, g)
                        mp.update_normal_and_depth(
                            self.map.keyframes, self.rig.Tbc,
                            self.rig.scale_factor, self.rig.n_levels,
                        )
                    elif other_id != mp.id and int(other_id) in self.map.map_points:
                        other = self.map.map_points[int(other_id)]
                        # keep the better-observed one (ORBmatcher::Fuse)
                        winner, loser = (mp, other) if mp.n_obs() >= other.n_obs() else (other, mp)
                        for kf_id, slots in list(loser.observations.items()):
                            okf = self.map.keyframes.get(kf_id)
                            if okf is None:
                                continue
                            for c, gi in enumerate(slots):
                                if gi >= 0:
                                    okf.matches[gi] = winner.id
                                    winner.add_observation(okf, c, int(gi))
                        self.map.erase_map_point(loser)
                        winner.update_normal_and_depth(
                            self.map.keyframes, self.rig.Tbc,
                            self.rig.scale_factor, self.rig.n_levels,
                        )

    # ------------------------------------------------------------------
    def local_ba(self, kf: KeyFrame):
        """Optimizer::LocalGPBA via extraction + jitted Schur solver."""
        data, state, handles = extract_local_ba(
            kf, self.map.map_points, self.rig, kf_table=self.map.keyframes
        )
        res = self._ba(data, state)
        if bool(res.ok):
            apply_local_ba(res.state, handles, self.map.map_points)
            # refined extrinsics write back into the STATIC rig so subsequent
            # tracking/extraction uses them (Optimizer.cc:1419-1428 mutates
            # MultiKeyFrame::mTbc / MultiFrame::mTbc)
            if self.b_extrinsic:
                Cx = self.rig.n_cams - 1
                self.rig.Tbc[:Cx] = np.asarray(res.state.Text, np.float64)
            # erase outlier observations (Optimizer.cc:1257-1382):
            # stereo-cam KF obs -> EraseMapPointMatch + EraseObservation
            erase_st = np.asarray(res.erase_st)
            cam_s = self.rig.n_cams - 1
            for n, (kf_i, mp, g) in enumerate(handles["st_meta"]):
                if erase_st[n]:
                    mp.erase_observation(kf_i, cam_s)
                    kf_i.matches[g] = -1
            # mono-GP edges: KF async-cam obs erase as above; non-KF GPObs
            # records scrub via EraseGPObservation
            erase_m = np.asarray(res.erase_m)
            for n, meta in enumerate(handles["mg_meta"]):
                if not erase_m[n]:
                    continue
                if meta[0] == "kf":
                    _, kf_i, cam, mp, g = meta
                    mp.erase_observation(kf_i, cam)
                    kf_i.matches[g] = -1
                else:
                    _, kf_id, obs, mp = meta
                    mp.erase_gp_observation(kf_id, obs)
            erase_sg = np.asarray(res.erase_sg)
            for n, meta in enumerate(handles["sg_meta"]):
                if erase_sg[n]:
                    _, kf_id, obs, mp = meta
                    mp.erase_gp_observation(kf_id, obs)
            # refresh viewing geometry of moved landmarks
            # (pMP->UpdateNormalAndDepth after SetWorldPos, Optimizer.cc:1415)
            for mp in handles["lms"]:
                if not mp.bad:
                    mp.update_normal_and_depth(
                        self.map.keyframes, self.rig.Tbc,
                        self.rig.scale_factor, self.rig.n_levels,
                    )
            self.map.increase_change_index()
