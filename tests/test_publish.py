"""Tests for the headless point-cloud publisher (pub_pcd role).

Reference: mapping/pub_pcd.cpp:18-62 — load a PCD, convert to
sensor_msgs/PointCloud2, republish at a fixed rate until shutdown.
"""

import threading

import numpy as np

from graph_slam_tpu.mapping import (
    decode_pointcloud2,
    encode_pointcloud2,
    publish_pcd,
    read_published,
    serve_pointcloud,
    write_pcd,
)


def _cloud(n=257, seed=3):
    r = np.random.default_rng(seed)
    pts = r.normal(size=(n, 3)).astype(np.float32)
    cols = r.integers(0, 256, size=(n, 3)).astype(np.uint8)
    return pts, cols


class TestEncoding:
    def test_roundtrip_rgb(self):
        pts, cols = _cloud()
        msg = encode_pointcloud2(pts, cols, frame_id="map", stamp=12.5)
        out_pts, out_cols, hdr = decode_pointcloud2(msg)
        np.testing.assert_array_equal(out_pts, pts)
        np.testing.assert_array_equal(out_cols, cols)
        assert hdr["frame_id"] == "map"
        assert hdr["stamp"] == 12.5
        # PCL PointXYZRGB layout (toROSMsg, pub_pcd.cpp:44-46)
        assert hdr["point_step"] == 16
        assert hdr["width"] == len(pts) and hdr["height"] == 1
        assert [f["name"] for f in hdr["fields"]] == ["x", "y", "z", "rgb"]
        assert [f["offset"] for f in hdr["fields"]] == [0, 4, 8, 12]
        assert hdr["row_step"] == 16 * len(pts)
        assert not hdr["is_bigendian"] and hdr["is_dense"]

    def test_roundtrip_xyz_only(self):
        pts, _ = _cloud(33)
        out_pts, out_cols, hdr = decode_pointcloud2(encode_pointcloud2(pts))
        np.testing.assert_array_equal(out_pts, pts)
        assert out_cols is None
        assert hdr["point_step"] == 12

    def test_data_blob_is_ros_layout(self):
        # the blob after the header must be exactly the PointCloud2
        # ``data`` array: x y z f32 LE + packed rgb u32 per point
        pts, cols = _cloud(5)
        msg = encode_pointcloud2(pts, cols)
        import json
        import struct
        (hlen,) = struct.unpack_from("<I", msg, 4)
        hdr = json.loads(msg[8:8 + hlen])
        blob = msg[8 + hlen:]
        assert len(blob) == hdr["row_step"]
        x0, y0, z0 = struct.unpack_from("<3f", blob, 0)
        (rgb0,) = struct.unpack_from("<I", blob, 12)
        assert (x0, y0, z0) == tuple(pts[0])
        assert rgb0 == (int(cols[0, 0]) << 16 | int(cols[0, 1]) << 8
                        | int(cols[0, 2]))


class TestPublishLoop:
    def test_serve_and_subscribe(self):
        pts, cols = _cloud(64)
        ready = threading.Event()
        ports = []
        t = threading.Thread(
            target=serve_pointcloud, args=(pts, cols),
            kwargs=dict(port=0, rate_hz=50.0, max_cycles=500,
                        ready=ready, port_out=ports),
            daemon=True)
        t.start()
        assert ready.wait(5.0)
        # read two consecutive frames — the publisher repeats the cloud
        # every cycle like the ros::Rate loop (pub_pcd.cpp:52-59)
        msgs = read_published("127.0.0.1", ports[0], n_messages=2)
        t.join(20.0)
        assert len(msgs) == 2
        for out_pts, out_cols, hdr in msgs:
            np.testing.assert_array_equal(out_pts, pts)
            np.testing.assert_array_equal(out_cols, cols)
            assert hdr["frame_id"] == "map"

    def test_publish_pcd_from_file(self, tmp_path):
        pts, cols = _cloud(21)
        pcd = str(tmp_path / "cloud.pcd")
        write_pcd(pcd, pts.astype(np.float64), cols)
        ready = threading.Event()
        ports = []
        t = threading.Thread(
            target=publish_pcd, args=(pcd,),
            kwargs=dict(port=0, rate_hz=100.0, max_cycles=500,
                        ready=ready, port_out=ports),
            daemon=True)
        t.start()
        assert ready.wait(5.0)
        msgs = read_published("127.0.0.1", ports[0], n_messages=1)
        t.join(20.0)
        out_pts, out_cols, _ = msgs[0]
        np.testing.assert_allclose(out_pts, pts, atol=1e-6)
        np.testing.assert_array_equal(out_cols, cols)
