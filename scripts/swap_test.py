#!/usr/bin/env python
"""Cross-wire parity isolation on the SYN_PARITY dataset:

  A. reference frontend -> reference backend   (baseline, = parity run)
  B. reference frontend -> OUR backend         (isolates backend parity)
  C. OUR frontend       -> reference backend   (isolates frontend parity)
  D. OUR frontend       -> OUR backend         (= parity run)

plus per-frame frontend track statistics.  Prints one ATE per combination.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_SRC = os.environ.get("REFERENCE_SRC", "/root/reference/src")
DATASET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "datasets", "SYN_PARITY")
sys.path.insert(0, REFERENCE_SRC)


def load_streams():
    from streaming.dataset import EuRoCDataset

    ds = EuRoCDataset(DATASET)
    ds.set_starttime(offset=0.0)
    imu = list(ds.imu)
    stereo = list(ds.stereo)
    return imu, stereo


def run_ref_frontend(imu, stereo):
    """Reference ImageProcessor over the interleaved stream; returns per-frame
    (t, [(id,u0,v0,u1,v1)])."""
    from config import ConfigEuRoC
    from image_processing import ImageProcessor

    ip = ImageProcessor(ConfigEuRoC())
    out = []
    k = 0
    t0 = time.time()
    for msg in stereo:
        while k < len(imu) and imu[k].timestamp <= msg.timestamp:
            ip.imu_callback(imu[k])
            k += 1
        fmsg = ip.stereo_callback(msg)
        feats = [(f.id, f.u0, f.v0, f.u1, f.v1) for f in fmsg.features] if fmsg else []
        out.append((msg.timestamp, feats))
    print(f"[ref-fe] {len(out)} frames in {time.time()-t0:.1f}s", flush=True)
    return out


def run_our_frontend(imu, stereo):
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.compat import ImageProcessor

    ip = ImageProcessor(euroc_config())
    out = []
    k = 0
    t0 = time.time()
    for msg in stereo:
        while k < len(imu) and imu[k].timestamp <= msg.timestamp:
            ip.imu_callback(imu[k])
            k += 1
        fmsg = ip.stereo_callback(msg)
        feats = [(f.id, f.u0, f.v0, f.u1, f.v1) for f in fmsg.features]
        out.append((msg.timestamp, feats))
    print(f"[our-fe] {len(out)} frames in {time.time()-t0:.1f}s", flush=True)
    return out


def run_ref_backend(imu, tracks, tag):
    from config import ConfigEuRoC
    from msckf import MSCKF

    os.environ["DATASET_NAME"] = f"swap_{tag}"
    os.environ["TIME_OFFSET"] = "0"
    filt = MSCKF(ConfigEuRoC())

    class _F:  # reference FeatureMeasurement shape
        __slots__ = ("id", "u0", "v0", "u1", "v1")

        def __init__(self, fid, u0, v0, u1, v1):
            self.id, self.u0, self.v0, self.u1, self.v1 = fid, u0, v0, u1, v1

    class _Msg:
        __slots__ = ("timestamp", "features")

        def __init__(self, t, feats):
            self.timestamp = t
            self.features = [_F(*f) for f in feats]

    k = 0
    poses = []
    t0 = time.time()
    for (t, feats) in tracks:
        while k < len(imu) and imu[k].timestamp <= t:
            filt.imu_callback(imu[k])
            k += 1
        res = filt.feature_callback(_Msg(t, feats))
        if res is not None:
            poses.append((t, np.asarray(res.pose.t)))
    print(f"[ref-be:{tag}] {len(poses)} poses in {time.time()-t0:.1f}s", flush=True)
    return poses


def run_our_backend(imu, tracks, tag):
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.compat import MSCKF, FeatureMeasurement, feature_msg

    filt = MSCKF(euroc_config())
    k = 0
    poses = []
    t0 = time.time()
    for (t, feats) in tracks:
        while k < len(imu) and imu[k].timestamp <= t:
            filt.imu_callback(imu[k])
            k += 1
        res = filt.feature_callback(
            feature_msg(t, [FeatureMeasurement(*f) for f in feats]))
        if res is not None:
            poses.append((res.timestamp, res.position))
    print(f"[our-be:{tag}] {len(poses)} poses in {time.time()-t0:.1f}s", flush=True)
    return poses


def evaluate(poses, label):
    from uav_airvision_tpu.evaluation.metrics import ate
    from uav_airvision_tpu.streaming.dataset import GroundTruthReader

    gt = GroundTruthReader(os.path.join(
        DATASET, "mav0", "state_groundtruth_estimate0", "data.csv")).load()
    t = np.array([p[0] for p in poses])
    p = np.stack([p[1] for p in poses])
    a = ate(t, p, gt["timestamp"], gt["p"])
    print(f"ATE[{label}] rmse={a['rmse']:.5f}m  (n={a['n']})", flush=True)
    return a["rmse"]


def track_stats(tracks, label):
    counts = [len(f) for _, f in tracks]
    # track lengths
    seen = {}
    for _, feats in tracks:
        for f in feats:
            seen[f[0]] = seen.get(f[0], 0) + 1
    lens = np.array(list(seen.values()))
    print(f"[{label}] feats/frame mean={np.mean(counts):.1f} "
          f"min={np.min(counts)} max={np.max(counts)}  "
          f"track len mean={lens.mean():.2f} p90={np.percentile(lens, 90):.0f} "
          f"unique={len(lens)}", flush=True)


def main():
    imu, stereo = load_streams()
    print(f"loaded {len(imu)} imu msgs, {len(stereo)} frames", flush=True)

    ref_tracks = run_ref_frontend(imu, stereo)
    our_tracks = run_our_frontend(imu, stereo)
    track_stats(ref_tracks, "ref-fe")
    track_stats(our_tracks, "our-fe")

    results = {}
    results["ref->ref"] = evaluate(run_ref_backend(imu, ref_tracks, "rr"), "ref-fe -> ref-be")
    results["ref->ours"] = evaluate(run_our_backend(imu, ref_tracks, "ro"), "ref-fe -> our-be")
    results["ours->ref"] = evaluate(run_ref_backend(imu, our_tracks, "or"), "our-fe -> ref-be")
    results["ours->ours"] = evaluate(run_our_backend(imu, our_tracks, "oo"), "our-fe -> our-be")
    print(results)


if __name__ == "__main__":
    main()
