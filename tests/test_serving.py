"""Streaming SLAM service (serving.py): frames in over TCP, poses out.

The headless stand-in for the reference's live ROS drivers
(test_gt_graph.cpp camera loop): a real socket round trip through the
full online pipeline — feature frontend, keyframe gates, periodic
optimize — plus the wire-format primitives.
"""

import threading

import numpy as np

from graph_slam_tpu.config import SR4000, SlamParams
from graph_slam_tpu.io.frames import decode_frame, encode_frame
from graph_slam_tpu.serving import SlamClient, serve_slam

from test_pipelines2 import render_wall_frame


def test_frame_bytes_round_trip():
    img, depth = render_wall_frame(SR4000, np.zeros(3))
    blob = encode_frame(img, depth)
    i2, d2 = decode_frame(blob)
    np.testing.assert_allclose(i2, np.round(img), atol=1.0)
    np.testing.assert_allclose(d2, depth, atol=1e-3)


def test_serve_slam_end_to_end():
    """Stream 4 wall frames through a live server; the per-frame pose
    replies and the final optimized trajectory must track the camera."""
    ready = threading.Event()
    ports: list = []
    th = threading.Thread(
        target=serve_slam,
        args=(SR4000, SlamParams(optimize_step=100)),
        kwargs=dict(port=0, ready=ready, port_out=ports,
                    slam_kwargs=dict(n_hyp=512, min_inliers=10)),
        daemon=True)
    th.start()
    assert ready.wait(30)

    client = SlamClient("127.0.0.1", ports[0], timeout=300.0)
    xs = [0.0, 0.12, 0.24, 0.36]
    statuses = []
    for seq, x in enumerate(xs):
        img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]))
        rep = client.send_frame(seq, img, depth)
        assert rep["type"] == "pose"
        assert rep["seq"] == seq
        statuses.append(rep["status"])
    assert statuses[0] == "first"
    assert statuses[1:] == ["keyframe"] * 3
    # streamed pose of the last keyframe tracks the camera x-translation
    assert abs(rep["t"][0] - 0.36) < 0.05

    summary = client.finish()
    th.join(timeout=120)
    assert summary["type"] == "summary"
    assert summary["keyframes"] == 4
    assert summary["chi2"] < 1.0
    t = np.asarray(summary["t"])
    for k, x in enumerate(xs):
        assert abs(t[k, 0] - x) < 0.05, (k, t[k], x)


def test_serve_cli_smoke():
    """Driver tier: `python -m graph_slam_tpu serve` accepts a frame over
    TCP and answers with a pose."""
    import os
    import socket
    import subprocess
    import sys
    import time

    from graph_slam_tpu.serving import recv_msg, send_msg

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "graph_slam_tpu", "serve", "--port",
         str(port), "--max-messages", "1"],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    try:
        conn = None
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                conn = socket.create_connection(("127.0.0.1", port),
                                                timeout=5)
                break
            except OSError:
                if proc.poll() is not None:
                    raise AssertionError(proc.communicate()[1][-800:])
                time.sleep(0.5)
        assert conn is not None, "server never came up"
        conn.settimeout(240)
        img, depth = render_wall_frame(SR4000, np.zeros(3))
        send_msg(conn, {"type": "frame", "seq": 0},
                 encode_frame(img, depth))
        header, _ = recv_msg(conn)
        assert header["type"] == "pose" and header["status"] == "first"
        conn.close()
        assert proc.wait(timeout=120) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_serve_slam_session_survives_reconnect_and_garbage():
    """The estimator session must persist across a dropped client AND a
    malformed message: reconnecting continues the same trajectory."""
    ready = threading.Event()
    ports: list = []
    th = threading.Thread(
        target=serve_slam,
        args=(SR4000, SlamParams(optimize_step=100)),
        kwargs=dict(port=0, ready=ready, port_out=ports,
                    slam_kwargs=dict(n_hyp=512, min_inliers=10)),
        daemon=True)
    th.start()
    assert ready.wait(30)

    xs = [0.0, 0.12, 0.24, 0.36]
    c1 = SlamClient("127.0.0.1", ports[0], timeout=300.0)
    for seq, x in enumerate(xs[:2]):
        img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]))
        assert c1.send_frame(seq, img, depth)["type"] == "pose"
    c1.sock.close()                      # client drops mid-session

    c2 = SlamClient("127.0.0.1", ports[0], timeout=300.0)
    # malformed frame: truncated payload -> error reply, session alive
    from graph_slam_tpu.serving import recv_msg, send_msg

    send_msg(c2.sock, {"type": "frame", "seq": 99}, b"garbage")
    rep, _ = recv_msg(c2.sock)
    assert rep["type"] == "error"
    for seq, x in enumerate(xs[2:], start=2):
        img, depth = render_wall_frame(SR4000, np.array([x, 0.0, 0.0]))
        rep = c2.send_frame(seq, img, depth)
        assert rep["type"] == "pose"
    summary = c2.finish()
    th.join(timeout=120)
    assert summary["keyframes"] == 4     # both connections' frames
    t = np.asarray(summary["t"])
    for k, x in enumerate(xs):
        assert abs(t[k, 0] - x) < 0.05, (k, t[k], x)
