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
            lambda d, s: local_gp_ba(d, s, b_large=False, b_extrinsic=b_extrinsic)
        )

    def insert_keyframe(self, kf: KeyFrame):
        self.queue.append(kf)

    def run_once(self) -> bool:
        """One LocalMapping::Run iteration; returns False when idle."""
        if not self.queue:
            return False
        kf = self.queue.pop(0)
        self.process_new_keyframe(kf)
        self.cull_map_points(kf)
        self.create_new_map_points(kf)
        self.fuse_neighbors(kf)
        if self.map.n_keyframes() > 2:
            self.local_ba(kf)
        if self.loop_closer is not None:
            self.loop_closer.insert_keyframe(kf)
        return True

    # ------------------------------------------------------------------
    def process_new_keyframe(self, kf: KeyFrame):
        """LocalMapping::ProcessNewKeyFrame (:225): observation registration
        happens at creation; refresh covisibility and track recent points."""
        kf.update_connections(self.map.map_points)
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

    def create_new_map_points(self, kf: KeyFrame, n_neighbors: int = 10):
        """LocalMapping::CreateNewMapPoints (:311-393): epipolar-gated
        descriptor matching against covisible + temporal neighbors THROUGH
        EVERY CAMERA (each at its own GP-interpolated pose), then one
        batched DLT triangulation over all candidate pairs of all cameras."""
        neighbors = [
            self.map.keyframes[i]
            for i in kf.best_covisible(n_neighbors)
            if i in self.map.keyframes
        ]
        if kf.prev_kf is not None and kf.prev_kf not in neighbors:
            neighbors.append(kf.prev_kf)

        tri_r1, tri_r2, tri_T1, tri_T2, tri_meta = [], [], [], [], []
        for cam in range(self.rig.n_cams):
            kp1 = kf.keypoints[cam]
            d1 = kf.descriptors[cam]
            if len(kp1) == 0:
                continue
            K4 = self.rig.K[cam]
            Km = np.array([[K4[0], 0, K4[2]], [0, K4[1], K4[3]], [0, 0, 1.0]])
            Kinv = np.linalg.inv(Km)
            Twc1 = self._camera_Twc(kf, cam)
            Tcw1 = np.linalg.inv(Twc1)
            free1 = np.array([
                kf.matches[kf.global_index(cam, i)] < 0 for i in range(len(kp1))
            ])
            for nb in neighbors:
                kp2 = nb.keypoints[cam]
                d2 = nb.descriptors[cam]
                if len(kp2) == 0:
                    continue
                Twc2 = self._camera_Twc(nb, cam)
                Tcw2 = np.linalg.inv(Twc2)
                baseline = np.linalg.norm(Twc2[:3, 3] - Twc1[:3, 3])
                if baseline < 0.05:
                    continue
                # fundamental matrix F12 from relative pose (ComputeF12)
                T12 = Tcw1 @ Twc2
                R12, t12 = T12[:3, :3], T12[:3, 3]
                tx = np.array(
                    [[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]],
                     [-t12[1], t12[0], 0]]
                )
                F12 = Kinv.T @ tx @ R12 @ Kinv
                idx2 = matcher.search_for_triangulation(
                    kp1, d1, kp2, d2, F12.T,
                    ang1=kf.kp_angles[cam] if kf.kp_angles is not None else None,
                    ang2=nb.kp_angles[cam] if nb.kp_angles is not None else None,
                )
                for i1, i2 in enumerate(idx2):
                    if i2 < 0 or not free1[i1]:
                        continue
                    g2 = nb.global_index(cam, int(i2))
                    if nb.matches[g2] >= 0:
                        continue
                    r1 = Kinv @ np.append(kp1[i1], 1.0)
                    r2 = Kinv @ np.append(kp2[int(i2)], 1.0)
                    tri_r1.append(r1 / r1[2])
                    tri_r2.append(r2 / r2[2])
                    tri_T1.append(Tcw1)
                    tri_T2.append(Tcw2)
                    tri_meta.append((cam, i1, nb, int(i2)))

        if not tri_r1:
            return 0
        X, w = jax.vmap(triangulate_dlt)(
            jnp.asarray(np.stack(tri_r1)), jnp.asarray(np.stack(tri_r2)),
            jnp.asarray(np.stack(tri_T1)), jnp.asarray(np.stack(tri_T2)),
        )
        X = np.asarray(X)
        w = np.asarray(w)
        created = 0
        for n, (cam, i1, nb, i2) in enumerate(tri_meta):
            if not np.isfinite(X[n]).all():
                continue
            # cheirality in both views
            Tcw1 = tri_T1[n]
            Tcw2 = tri_T2[n]
            z1 = (Tcw1[:3, :3] @ X[n] + Tcw1[:3, 3])[2]
            z2 = (Tcw2[:3, :3] @ X[n] + Tcw2[:3, 3])[2]
            if z1 <= 0 or z2 <= 0 or abs(w[n]) < 1e-9:
                continue
            g1 = kf.global_index(cam, i1)
            g2 = nb.global_index(cam, i2)
            if kf.matches[g1] >= 0 or nb.matches[g2] >= 0:
                continue
            mp = MapPoint(position=X[n], descriptor=kf.descriptors[cam][i1],
                          first_kf_id=kf.id)
            mp.add_observation(kf, cam, g1)
            mp.add_observation(nb, cam, g2)
            kf.matches[g1] = mp.id
            nb.matches[g2] = mp.id
            self.map.add_map_point(mp)
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

    # ------------------------------------------------------------------
    def local_ba(self, kf: KeyFrame):
        """Optimizer::LocalGPBA via extraction + jitted Schur solver."""
        data, state, handles = extract_local_ba(
            kf, self.map.map_points, self.rig, kf_table=self.map.keyframes
        )
        res = self._ba(data, state)
        if bool(res.ok):
            apply_local_ba(res.state, handles, self.map.map_points)
            # erase outlier observations (EraseGPObservation/EraseObservation)
            erase_st = np.asarray(res.erase_st)
            for n, (s, l, *_rest) in enumerate(handles["st_refs"]):
                if n < len(erase_st) and erase_st[n]:
                    mp = handles["lms"][int(l)]
                    kf_i = handles["kfs"][int(s)]
                    cam = self.rig.n_cams - 1
                    mp.erase_observation(kf_i, cam)
            self.map.increase_change_index()
