"""Threaded streaming API: DataPublisher -> queues -> VIO orchestrator."""

import os
import sys
import time
from collections import namedtuple
from queue import Queue

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

imu_msg = namedtuple("imu_msg", ["timestamp", "angular_velocity", "linear_acceleration"])
stereo_msg = namedtuple(
    "stereo_msg", ["timestamp", "cam0_image", "cam1_image", "cam0_msg", "cam1_msg"]
)


class _ListStream:
    def __init__(self, msgs, starttime):
        self.msgs = msgs
        self.starttime = starttime

    def __iter__(self):
        return iter(self.msgs)


@pytest.mark.slow
def test_streaming_vio_end_to_end(tmp_path):
    from __graft_entry__ import _tiny_config
    from uav_airvision_tpu.simulation.world import StereoWorld
    from uav_airvision_tpu.streaming.publisher import DataPublisher
    from uav_airvision_tpu.utils.trajectory import TrajectoryWriter
    from uav_airvision_tpu.vio import VIO

    cfg = _tiny_config()
    world = StereoWorld(cfg)
    dur = 2.5

    ts_imu, ws, accs = world.imu_stream(dur)
    imu_msgs = [imu_msg(t, w, a) for t, w, a in zip(ts_imu, ws, accs)]
    fts = world.frame_times(dur)
    rng = np.random.default_rng(0)
    img_msgs = []
    for t in fts:
        i0, i1 = world.render_frame(t, rng)
        img_msgs.append(stereo_msg(t, i0, i1, None, None))

    img_q, imu_q = Queue(), Queue()
    writer = TrajectoryWriter(path=str(tmp_path / "traj.txt"))
    vio = VIO(cfg, img_q, imu_q, viewer=None, trajectory_writer=writer)
    vio.start()

    now = time.time()
    # 50x real time: the tiny step is fast once compiled
    imu_pub = DataPublisher(_ListStream(imu_msgs, 0.0), imu_q, ratio=50.0)
    img_pub = DataPublisher(_ListStream(img_msgs, 0.0), img_q, ratio=50.0)
    imu_pub.start(now)
    img_pub.start(now)
    vio.join()

    assert vio.is_gravity_set
    assert len(vio.results) > 5
    lines = open(writer.path).read().splitlines()
    assert len(lines) == len(vio.results)
    assert len(lines[0].split()) == 8
    # poses are finite and start near the origin
    p0 = np.array(lines[0].split()[1:4], float)
    assert np.linalg.norm(p0) < 0.2
