"""SIBR remote-viewer protocol test: loopback client <-> NetworkGUI server.

Pins the wire protocol of train/network_gui.py against the reference's
gaussian_renderer/network_gui.py:26-86 semantics: length-prefixed JSON
header in, raw RGB bytes + length-prefixed source path out.
"""
from __future__ import annotations

import json
import socket
import struct

import numpy as np

from moss_tpu.train.network_gui import NetworkGUI


def _send_msg(sock, msg: dict):
    # the reference viewer sends each header field as its own little-endian
    # blob; our server reads one 4-byte length + JSON body
    body = json.dumps(msg).encode("utf-8")
    sock.sendall(struct.pack("<I", len(body)) + body)


def _viewer_msg(H, W, train=True, keep_alive=False):
    view = np.eye(4, dtype=np.float32)
    proj = np.eye(4, dtype=np.float32)
    return {
        "resolution_x": W, "resolution_y": H,
        "train": train, "fov_y": 0.8, "fov_x": 0.9,
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": keep_alive, "scale_modifier": 1.0,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": proj.reshape(-1).tolist(),
    }


class TestNetworkGUI:
    def test_roundtrip(self):
        gui = NetworkGUI(port=0)  # ephemeral port
        gui.init()
        port = gui.listener.getsockname()[1]

        client = socket.create_connection(("127.0.0.1", port), timeout=5)
        client.settimeout(5)
        H, W = 8, 16
        _send_msg(client, _viewer_msg(H, W, train=True))

        calls = {}

        def render_fn(spec):
            calls["spec"] = spec
            assert spec["height"] == H and spec["width"] == W
            assert spec["scale_modifier"] == 1.0
            img = np.zeros((H, W, 3), np.float32)
            img[0, 0] = [1.0, 0.5, 0.0]
            return img

        assert gui.poll(render_fn, "/data/subject", training_done=False)

        # client receives H*W*3 raw RGB bytes then the source path
        buf = b""
        while len(buf) < H * W * 3:
            buf += client.recv(4096)
        img = np.frombuffer(buf[: H * W * 3], np.uint8).reshape(H, W, 3)
        assert img[0, 0, 0] == 255 and img[0, 0, 1] == 127 and img[0, 0, 2] == 0
        rest = buf[H * W * 3:]
        while len(rest) < 4:
            rest += client.recv(4096)
        (n,) = struct.unpack("<I", rest[:4])
        path = rest[4:]
        while len(path) < n:
            path += client.recv(4096)
        assert path.decode("ascii") == "/data/subject"
        assert "spec" in calls

        client.close()
        gui.close()

    def test_camera_from_viewer_spec(self):
        from moss_tpu.render.camera import Camera

        spec = _viewer_msg(32, 64)
        cam_spec = {
            "width": 64, "height": 32, "fovy": 0.8, "fovx": 0.9,
            "znear": 0.01, "zfar": 100.0,
            "world_view_transform": np.eye(4, dtype=np.float32),
            "full_proj_transform": np.eye(4, dtype=np.float32),
            "scale_modifier": 1.0,
        }
        cam = Camera.from_viewer_spec(cam_spec)
        assert cam.height == 32 and cam.width == 64
        np.testing.assert_allclose(np.asarray(cam.tan_fovx), np.tan(0.45),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(cam.cam_center), 0.0, atol=1e-6)

    def test_trainer_gui_poll_renders(self):
        """End-to-end: a Trainer with a gui polls it at host boundaries and
        serves a render of the current cloud from the viewer's camera."""
        import threading

        from moss_tpu.config import Config, ModelConfig, OptimConfig
        from moss_tpu.data.synthetic import make_scene, make_frames
        from moss_tpu.train.trainer import Trainer

        scene = make_scene(n_verts=64)
        frames, _ = make_frames(scene, n_frames=2, H=64, W=64, crop=32)
        cfg = Config(
            model=ModelConfig(sh_degree=1, capacity=128, n_init_points=64),
            optim=OptimConfig(iterations=2, densify_from_iter=1000,
                              densify_until_iter=0),
        )
        gui = NetworkGUI(port=0)
        gui.init()
        port = gui.listener.getsockname()[1]
        tr = Trainer(scene, frames[:1], frames[1:], cfg, crop_hw=(32, 32),
                     gui=gui, source_path="/syn")

        H = W = frames[0].camera.height
        received = {}

        def client():
            c = socket.create_connection(("127.0.0.1", port), timeout=300)
            c.settimeout(300)
            spec = _viewer_msg(H, W, train=True)
            # a real viewer pose: reuse the training camera's matrices
            spec["view_matrix"] = np.asarray(
                frames[0].camera.world_view, np.float32).reshape(-1).tolist()
            spec["view_projection_matrix"] = np.asarray(
                frames[0].camera.full_proj, np.float32).reshape(-1).tolist()
            _send_msg(c, spec)
            buf = b""
            while len(buf) < H * W * 3:
                buf += c.recv(65536)
            received["img"] = np.frombuffer(
                buf[: H * W * 3], np.uint8).reshape(H, W, 3)
            c.close()

        t = threading.Thread(target=client)
        t.start()
        tr.train(2, eval_iters=[])
        t.join(timeout=300)
        assert "img" in received
        assert received["img"].sum() > 0  # the cloud is visible
        gui.close()
