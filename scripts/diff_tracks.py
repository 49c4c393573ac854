#!/usr/bin/env python
"""Per-frame positional diff between the reference frontend's tracks and
ours on SYN_PARITY.  Caches both track sets to .npz on first run.

Matches features within a frame by nearest cam0 position and reports the
distribution of deltas in u0/v0/u1/v1 (normalized coords * f ~ pixels).
"""

import os
import sys
import pickle

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_SRC = os.environ.get("REFERENCE_SRC", "/root/reference/src")
DATASET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "datasets", "SYN_PARITY")
CACHE = "/tmp/tracks_cache.pkl"
sys.path.insert(0, REFERENCE_SRC)


def get_tracks():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    import scripts.swap_test as st

    imu, stereo = st.load_streams()
    ref = st.run_ref_frontend(imu, stereo)
    ours = st.run_our_frontend(imu, stereo)
    with open(CACHE, "wb") as f:
        pickle.dump((ref, ours), f)
    return ref, ours


def main():
    ref, ours = get_tracks()
    fx = 458.654  # cam0 focal for pixel-ish scaling of normalized deltas

    d_all = []
    unmatched_ref = unmatched_our = total_ref = 0
    for (tr, fr), (to, fo) in zip(ref, ours):
        assert abs(tr - to) < 1e-9
        if not fr or not fo:
            continue
        A = np.array([[f[1], f[2], f[3], f[4]] for f in fr])
        B = np.array([[f[1], f[2], f[3], f[4]] for f in fo])
        total_ref += len(A)
        # nearest-neighbour match on (u0, v0)
        d2 = ((A[:, None, :2] - B[None, :, :2]) ** 2).sum(-1)
        j = np.argmin(d2, axis=1)
        near = np.sqrt(d2[np.arange(len(A)), j]) * fx < 2.0  # within 2 px
        unmatched_ref += int((~near).sum())
        d_all.append((A[near] - B[j[near]]) * fx)
    d = np.concatenate(d_all)

    print(f"matched {len(d)} / {total_ref} reference observations "
          f"({unmatched_ref} unmatched > 2px)")
    for k, name in enumerate(["u0", "v0", "u1", "v1"]):
        print(f"  d{name}: mean={d[:, k].mean():+.4f}px  "
              f"std={d[:, k].std():.4f}px  p99={np.percentile(np.abs(d[:, k]), 99):.4f}px")
    # disparity error (u0-u1) drives triangulated depth
    dd = (d[:, 0] - d[:, 2])
    print(f"  d(disparity): mean={dd.mean():+.5f}px std={dd.std():.4f}px "
          f"p99={np.percentile(np.abs(dd), 99):.4f}px")


if __name__ == "__main__":
    main()
