"""Float64 NumPy oracle of the MSCKF estimator (test-only).

An independent, dynamically-shaped implementation of the same published
algorithm (Sun et al. stereo MSCKF with OC-EKF + left-nullspace
marginalization) following the reference's exact semantics, used to validate
the fixed-shape JAX implementation step by step on synthetic data.
"""

from dataclasses import dataclass, field

import numpy as np
from scipy.stats import chi2

from .quat_oracle import (
    o_from_two_vectors,
    o_multiply,
    o_skew,
    o_small_angle,
    o_to_quaternion,
    o_to_rotation,
)


@dataclass
class OracleCam:
    q: np.ndarray
    p: np.ndarray
    q_null: np.ndarray
    p_null: np.ndarray
    timestamp: float


@dataclass
class OracleFeature:
    fid: int
    obs: dict = field(default_factory=dict)  # cam_key -> (4,) normalized
    position: np.ndarray = None
    initialized: bool = False


class MsckfOracle:
    def __init__(self, config, gyro_bias, acc_mean):
        self.cfg = config
        fc = config.filter
        g_norm = np.linalg.norm(acc_mean)
        self.gravity = np.array([0.0, 0.0, -g_norm])
        self.q = o_from_two_vectors(-self.gravity, np.asarray(acc_mean, np.float64))
        self.p = np.zeros(3)
        self.v = np.zeros(3)
        self.bg = np.asarray(gyro_bias, np.float64)
        self.ba = np.zeros(3)
        self.q_null = self.q.copy()
        self.p_null = np.zeros(3)
        self.v_null = np.zeros(3)

        T_c0_i = np.linalg.inv(config.np_T_imu_cam0())
        self.R_imu_cam0 = T_c0_i[:3, :3].T
        self.t_cam0_imu = T_c0_i[:3, 3]
        Tcc = config.np_T_cn_cnm1()
        self.R_c0c1 = Tcc[:3, :3]
        self.t_c0c1 = Tcc[:3, 3]

        self.qc = np.zeros((12, 12))
        self.qc[:3, :3] = np.eye(3) * fc.gyro_noise
        self.qc[3:6, 3:6] = np.eye(3) * fc.gyro_bias_noise
        self.qc[6:9, 6:9] = np.eye(3) * fc.acc_noise
        self.qc[9:, 9:] = np.eye(3) * fc.acc_bias_noise
        self.obs_noise = fc.observation_noise

        self.cams = {}  # insertion-ordered dict of key -> OracleCam
        self.features = {}  # fid -> OracleFeature
        self.P = self._init_cov()
        self.chi2_table = {i: chi2.ppf(0.05, i) for i in range(1, 100)}
        self.timestamp = None
        self.tracking_rate = None
        self.next_cam_key = 0
        self.started = False
        self.log = []

    def _init_cov(self):
        fc = self.cfg.filter
        P = np.zeros((21, 21))
        P[3:6, 3:6] = np.eye(3) * fc.gyro_bias_cov
        P[6:9, 6:9] = np.eye(3) * fc.velocity_cov
        P[9:12, 9:12] = np.eye(3) * fc.acc_bias_cov
        P[15:18, 15:18] = np.eye(3) * fc.extrinsic_rotation_cov
        P[18:21, 18:21] = np.eye(3) * fc.extrinsic_translation_cov
        return P

    # -- propagation ------------------------------------------------------
    def _integrate(self, dt, gyro, acc):
        n = np.linalg.norm(gyro)
        Om = np.zeros((4, 4))
        Om[:3, :3] = -o_skew(gyro)
        Om[:3, 3] = gyro
        Om[3, :3] = -gyro
        q, v, p = self.q, self.v, self.p
        if n > 1e-5:
            dq_dt = (np.cos(n * dt * 0.5) * np.eye(4) + np.sin(n * dt * 0.5) / n * Om) @ q
            dq_dt2 = (np.cos(n * dt * 0.25) * np.eye(4) + np.sin(n * dt * 0.25) / n * Om) @ q
        else:
            dq_dt = np.cos(n * dt * 0.5) * (np.eye(4) + Om * dt * 0.5) @ q
            dq_dt2 = np.cos(n * dt * 0.25) * (np.eye(4) + Om * dt * 0.25) @ q
        dRT = o_to_rotation(dq_dt).T
        dRT2 = o_to_rotation(dq_dt2).T

        k1v = o_to_rotation(q).T @ acc + self.gravity
        k1p = v
        v1 = v + k1v * dt / 2
        k2v = dRT2 @ acc + self.gravity
        k2p = v1
        v2 = v + k2v * dt / 2
        k3v = dRT2 @ acc + self.gravity
        k3p = v2
        v3 = v + k3v * dt
        k4v = dRT @ acc + self.gravity
        k4p = v3
        self.q = dq_dt / np.linalg.norm(dq_dt)
        self.v = v + (k1v + 2 * k2v + 2 * k3v + k4v) * dt / 6
        self.p = p + (k1p + 2 * k2p + 2 * k3p + k4p) * dt / 6

    def _process_model(self, t, wm, am):
        dt = t - self.timestamp
        gyro = wm - self.bg
        acc = am - self.ba
        Rwi = o_to_rotation(self.q)
        F = np.zeros((21, 21))
        F[:3, :3] = -o_skew(gyro)
        F[:3, 3:6] = -np.eye(3)
        F[6:9, :3] = -Rwi.T @ o_skew(acc)
        F[6:9, 9:12] = -Rwi.T
        F[12:15, 6:9] = np.eye(3)
        G = np.zeros((21, 12))
        G[:3, :3] = -np.eye(3)
        G[3:6, 3:6] = np.eye(3)
        G[6:9, 6:9] = -Rwi.T
        G[9:12, 9:12] = np.eye(3)

        Fdt = F * dt
        Phi = np.eye(21) + Fdt + Fdt @ Fdt / 2 + Fdt @ Fdt @ Fdt / 6
        self._integrate(dt, gyro, acc)

        Rk = o_to_rotation(self.q_null)
        Phi[:3, :3] = o_to_rotation(self.q) @ Rk.T
        u = Rk @ self.gravity
        s = u / (u @ u)
        A1 = Phi[6:9, :3]
        w1 = o_skew(self.v_null - self.v) @ self.gravity
        Phi[6:9, :3] = A1 - np.outer(A1 @ u - w1, s)
        A2 = Phi[12:15, :3]
        w2 = o_skew(dt * self.v_null + self.p_null - self.p) @ self.gravity
        Phi[12:15, :3] = A2 - np.outer(A2 @ u - w2, s)

        Q = Phi @ G @ self.qc @ G.T @ Phi.T * dt
        self.P[:21, :21] = Phi @ self.P[:21, :21] @ Phi.T + Q
        if len(self.cams) > 0:
            self.P[:21, 21:] = Phi @ self.P[:21, 21:]
            self.P[21:, :21] = self.P[21:, :21] @ Phi.T
        self.P = (self.P + self.P.T) / 2
        self.q_null = self.q.copy()
        self.p_null = self.p.copy()
        self.v_null = self.v.copy()
        self.timestamp = t

    # -- augmentation -----------------------------------------------------
    def _augment(self, t):
        Rwi = o_to_rotation(self.q)
        Rwc = self.R_imu_cam0 @ Rwi
        tcw = self.p + Rwi.T @ self.t_cam0_imu
        qc = o_to_quaternion(Rwc)
        key = self.next_cam_key
        self.next_cam_key += 1
        self.cams[key] = OracleCam(qc, tcw, qc.copy(), tcw.copy(), t)

        J = np.zeros((6, 21))
        J[:3, :3] = self.R_imu_cam0
        J[:3, 15:18] = np.eye(3)
        J[3:6, :3] = o_skew(Rwi.T @ self.t_cam0_imu)
        J[3:6, 12:15] = np.eye(3)
        J[3:6, 18:21] = np.eye(3)

        n = self.P.shape[0]
        P = np.zeros((n + 6, n + 6))
        P[:n, :n] = self.P
        P[n:, :n] = J @ P[:21, :n]
        P[:n, n:] = P[n:, :n].T
        P[n:, n:] = J @ P[:21, :21] @ J.T
        self.P = (P + P.T) / 2
        return key

    # -- triangulation ----------------------------------------------------
    def _views(self, feat):
        poses = []
        meas = []
        R10 = self.R_c0c1.T
        t10 = -self.R_c0c1.T @ self.t_c0c1
        for key, z in feat.obs.items():
            if key not in self.cams:
                continue
            cam = self.cams[key]
            R0w = o_to_rotation(cam.q).T  # cam0->world
            t0w = cam.p
            R1w = R0w @ R10
            t1w = R0w @ t10 + t0w
            poses.append((R0w, t0w))
            poses.append((R1w, t1w))
            meas.append(z[:2])
            meas.append(z[2:])
        Ra, ta = poses[0]
        rel = [(Rp.T @ Ra, Rp.T @ (ta - tp)) for Rp, tp in poses]
        return rel, meas, (Ra, ta)

    def _triangulate(self, feat):
        tri = self.cfg.triangulation
        rel, meas, (Ra, ta) = self._views(feat)
        R1, t1 = rel[1]
        z1, z2 = meas[0], meas[1]
        m = R1 @ np.array([*z1, 1.0])
        a = m[:2] - z2 * m[2]
        b = z2 * t1[2] - t1[:2]
        depth = (a @ b) / (a @ a)
        gp = np.array([*z1, 1.0]) * depth
        x = np.array([gp[0] / gp[2], gp[1] / gp[2], 1.0 / gp[2]])

        def cost_all(x):
            tot = 0.0
            for (R, t), z in zip(rel, meas):
                h = R @ np.array([x[0], x[1], 1.0]) + x[2] * t
                zh = h[:2] / h[2]
                tot += np.sum((zh - z) ** 2)
            return tot

        lam = tri.initial_damping
        outer = inner = 0
        dnorm = np.inf
        total = cost_all(x)
        while outer < tri.outer_loop_max_iteration and dnorm > tri.estimation_precision:
            A = np.zeros((3, 3))
            bb = np.zeros(3)
            for (R, t), z in zip(rel, meas):
                h = R @ np.array([x[0], x[1], 1.0]) + x[2] * t
                W = np.zeros((3, 3))
                W[:, :2] = R[:, :2]
                W[:, 2] = t
                J = np.zeros((2, 3))
                J[0] = W[0] / h[2] - W[2] * h[0] / h[2] ** 2
                J[1] = W[1] / h[2] - W[2] * h[1] / h[2] ** 2
                r = h[:2] / h[2] - z
                e = np.linalg.norm(r)
                w = 1.0 if e <= tri.huber_epsilon else tri.huber_epsilon / (2 * e)
                A += w * w * (J.T @ J)
                bb += w * w * (J.T @ r)
            reduced = False
            while inner < tri.inner_loop_max_iteration and not reduced:
                delta = np.linalg.solve(A + lam * np.eye(3), bb)
                xn = x - delta
                dnorm = np.linalg.norm(delta)
                cn = cost_all(xn)
                if cn < total:
                    reduced = True
                    x, total = xn, cn
                    lam = max(lam / 10, 1e-10)
                else:
                    lam = min(lam * 10, 1e12)
                inner += 1
            outer += 1

        final = np.array([x[0], x[1], 1.0]) / x[2]
        ok = all((R @ final + t)[2] > 0 for R, t in rel)
        feat.position = Ra @ final + ta
        feat.initialized = ok
        return ok

    # -- measurement model ------------------------------------------------
    def _cam_jacobian(self, cam, z, p_w):
        Rwc0 = o_to_rotation(cam.q)
        tc0 = cam.p
        Rwc1 = self.R_c0c1 @ Rwc0
        tc1 = tc0 - Rwc1.T @ self.t_c0c1
        pc0 = Rwc0 @ (p_w - tc0)
        pc1 = Rwc1 @ (p_w - tc1)
        dz0 = np.zeros((4, 3))
        dz0[0, 0] = 1 / pc0[2]
        dz0[1, 1] = 1 / pc0[2]
        dz0[0, 2] = -pc0[0] / pc0[2] ** 2
        dz0[1, 2] = -pc0[1] / pc0[2] ** 2
        dz1 = np.zeros((4, 3))
        dz1[2, 0] = 1 / pc1[2]
        dz1[3, 1] = 1 / pc1[2]
        dz1[2, 2] = -pc1[0] / pc1[2] ** 2
        dz1[3, 2] = -pc1[1] / pc1[2] ** 2
        dx0 = np.hstack([o_skew(pc0), -Rwc0])
        dx1 = np.hstack([self.R_c0c1 @ o_skew(pc0), -Rwc1])
        A = dz0 @ dx0 + dz1 @ dx1
        u = np.zeros(6)
        u[:3] = o_to_rotation(cam.q_null) @ self.gravity
        u[3:] = o_skew(p_w - cam.p_null) @ self.gravity
        Hx = A - np.outer(A @ u, u) / (u @ u)
        Hf = -Hx[:, 3:6]
        r = z - np.array([*pc0[:2] / pc0[2], *pc1[:2] / pc1[2]])
        return Hx, Hf, r

    def _feature_jacobian(self, feat, cam_keys):
        valid = [k for k in cam_keys if k in feat.obs]
        D = 21 + 6 * len(self.cams)
        Hx = np.zeros((4 * len(valid), D))
        Hf = np.zeros((4 * len(valid), 3))
        r = np.zeros(4 * len(valid))
        keys = list(self.cams.keys())
        for row, k in enumerate(valid):
            hx, hf, ri = self._cam_jacobian(self.cams[k], feat.obs[k], feat.position)
            idx = keys.index(k)
            Hx[4 * row : 4 * row + 4, 21 + 6 * idx : 27 + 6 * idx] = hx
            Hf[4 * row : 4 * row + 4] = hf
            r[4 * row : 4 * row + 4] = ri
        U, _, _ = np.linalg.svd(Hf)
        A = U[:, 3:]
        return A.T @ Hx, A.T @ r

    def _gate(self, H, r, dof):
        S = H @ self.P @ H.T + self.obs_noise * np.eye(len(H))
        gamma = r @ np.linalg.solve(S, r)
        return gamma < self.chi2_table[dof]

    def _update(self, H, r):
        if len(H) == 0:
            return
        if H.shape[0] > H.shape[1]:
            Q, R = np.linalg.qr(H, mode="reduced")
            H, r = R, Q.T @ r
        S = H @ self.P @ H.T + self.obs_noise * np.eye(len(H))
        K = np.linalg.solve(S, H @ self.P).T
        dx = K @ r
        di = dx[:21]
        self.q = o_multiply(o_small_angle(di[:3]), self.q)
        self.bg = self.bg + di[3:6]
        self.v = self.v + di[6:9]
        self.ba = self.ba + di[9:12]
        self.p = self.p + di[12:15]
        self.R_imu_cam0 = o_to_rotation(o_small_angle(di[15:18])) @ self.R_imu_cam0
        self.t_cam0_imu = self.t_cam0_imu + di[18:21]
        for i, cam in enumerate(self.cams.values()):
            dc = dx[21 + 6 * i : 27 + 6 * i]
            cam.q = o_multiply(o_small_angle(dc[:3]), cam.q)
            cam.p = cam.p + dc[3:]
        IKH = np.eye(len(K)) - K @ H
        P = IKH @ self.P
        self.P = (P + P.T) / 2

    # -- frame-level operations -------------------------------------------
    def _remove_lost(self, current_key):
        invalid, processed = [], []
        total_rows = 0
        for f in self.features.values():
            if current_key in f.obs:
                continue
            if len(f.obs) < 3:
                invalid.append(f.fid)
                continue
            if not f.initialized:
                if not self._triangulate(f):
                    invalid.append(f.fid)
                    continue
            total_rows += 4 * len(f.obs) - 3
            processed.append(f.fid)
        for fid in invalid:
            del self.features[fid]
        if not processed:
            return
        D = 21 + 6 * len(self.cams)
        H = np.zeros((total_rows, D))
        r = np.zeros(total_rows)
        count = 0
        for fid in processed:
            f = self.features[fid]
            Hj, rj = self._feature_jacobian(f, list(f.obs.keys()))
            if self._gate(Hj, rj, len(f.obs) - 1):
                H[count : count + Hj.shape[0]] = Hj
                r[count : count + len(rj)] = rj
                count += Hj.shape[0]
            if count > 1500:
                break
        self._update(H[:count], r[:count])
        for fid in processed:
            del self.features[fid]

    def _find_redundant(self):
        pairs = list(self.cams.items())
        key_idx = len(pairs) - 4
        cam_idx = key_idx + 1
        first = 0
        key_p = pairs[key_idx][1].p
        key_R = o_to_rotation(pairs[key_idx][1].q)
        rm = []
        for _ in range(2):
            p = pairs[cam_idx][1].p
            R = o_to_rotation(pairs[cam_idx][1].q)
            d = np.linalg.norm(p - key_p)
            ang = 2 * np.arccos(np.clip(o_to_quaternion(R @ key_R.T)[-1], -1, 1))
            if ang < 0.2618 and d < 0.4 and self.tracking_rate > 0.5:
                rm.append(pairs[cam_idx][0])
            else:
                rm.append(pairs[first][0])
                first += 1
            cam_idx += 1
        return sorted(rm)

    def _prune_cams(self):
        if len(self.cams) < self.cfg.filter.max_cam_state_size:
            return
        rm = self._find_redundant()
        total_rows = 0
        for f in self.features.values():
            involved = [k for k in rm if k in f.obs]
            if not involved:
                continue
            if len(involved) == 1:
                del f.obs[involved[0]]
                continue
            if not f.initialized:
                if not self._triangulate(f):
                    for k in involved:
                        del f.obs[k]
                    continue
            total_rows += 4 * len(involved) - 3
        D = 21 + 6 * len(self.cams)
        H = np.zeros((total_rows, D))
        r = np.zeros(total_rows)
        count = 0
        for f in self.features.values():
            involved = [k for k in rm if k in f.obs]
            if not involved:
                continue
            Hj, rj = self._feature_jacobian(f, involved)
            if self._gate(Hj, rj, len(involved)):
                H[count : count + Hj.shape[0]] = Hj
                r[count : count + len(rj)] = rj
                count += Hj.shape[0]
            for k in involved:
                del f.obs[k]
        self._update(H[:count], r[:count])
        keys = list(self.cams.keys())
        for k in rm:
            idx = keys.index(k)
            start, end = 21 + 6 * idx, 27 + 6 * idx
            P = self.P
            n = P.shape[0]
            keep = [i for i in range(n) if not (start <= i < end)]
            self.P = P[np.ix_(keep, keep)]
            del self.cams[k]
            keys = list(self.cams.keys())

    def _online_reset(self):
        thr = self.cfg.filter.position_std_threshold
        if thr <= 0:
            return False
        stds = np.sqrt(np.diag(self.P)[12:15])
        if stds.max() < thr:
            return False
        self.cams.clear()
        self.features.clear()
        self.P = self._init_cov()
        return True

    # -- public API --------------------------------------------------------
    def feature_frame(self, t, imu_msgs, measurements):
        """Process one frame.  imu_msgs: list of (t, w, a) already windowed to
        (prev_t, t]; measurements: list of (fid, u0, v0, u1, v1)."""
        if not self.started:
            self.timestamp = t
            self.started = True
        for mt, w, a in imu_msgs:
            if mt < self.timestamp:
                continue
            if mt > t:
                break
            self._process_model(mt, np.asarray(w, np.float64), np.asarray(a, np.float64))
        key = self._augment(t)
        n_before = len(self.features)
        tracked = 0
        for fid, u0, v0, u1, v1 in measurements:
            z = np.array([u0, v0, u1, v1], np.float64)
            if fid in self.features:
                self.features[fid].obs[key] = z
                tracked += 1
            else:
                f = OracleFeature(fid)
                f.obs[key] = z
                f.position = np.zeros(3)
                self.features[fid] = f
        self.tracking_rate = tracked / (n_before + 1e-5)
        self._remove_lost(key)
        self._prune_cams()
        out = (t, self.q.copy(), self.p.copy(), self.v.copy())
        self.log.append(out)
        self._online_reset()
        return out
