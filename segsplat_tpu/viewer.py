"""SIBR-compatible network viewer bridge — rebuild of the reference's
gaussian_renderer/network_gui.py (:26-86): a nonblocking TCP listener that
receives JSON camera messages ({resolution, fov, view_matrix, ...}) and streams
raw rendered bytes back, polled from the training loop
(train_unified_lift.py:319-332).

Same wire protocol (4-byte little-endian length prefix + JSON / raw RGB bytes);
the received view matrix's Y/Z columns are negated exactly like the reference.
"""

from __future__ import annotations

import json
import socket
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


@dataclass
class ViewerCamera:
    """MiniCam equivalent (scene/cameras.py:69-81)."""
    width: int
    height: int
    fov_y: float
    fov_x: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray  # [4,4] row-vector convention (reference)

    def to_camera(self):
        """Convert to a core Camera pytree (column-vector W2C)."""
        import jax.numpy as jnp

        from segsplat_tpu.core.types import Camera

        w2c = self.world_view_transform.T      # reference stores the transpose
        R = w2c[:3, :3].T                      # c2w rotation
        T = w2c[:3, 3]
        return Camera(R=jnp.asarray(R, jnp.float32), T=jnp.asarray(T, jnp.float32),
                      fov_x=jnp.asarray(self.fov_x, jnp.float32),
                      fov_y=jnp.asarray(self.fov_y, jnp.float32),
                      width=self.width, height=self.height)


class NetworkGUI:
    def __init__(self):
        self.listener: Optional[socket.socket] = None
        self.conn: Optional[socket.socket] = None
        self.addr = None

    def init(self, host: str = "127.0.0.1", port: int = 6009) -> None:
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)

    def try_connect(self) -> bool:
        if self.listener is None:
            return False
        try:
            self.conn, self.addr = self.listener.accept()
            print(f"\nConnected by {self.addr}")
            self.conn.settimeout(None)
            return True
        except (BlockingIOError, OSError):
            return False

    def _read(self) -> dict:
        n = int.from_bytes(self.conn.recv(4), "little")
        buf = b""
        while len(buf) < n:
            chunk = self.conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("viewer closed")
            buf += chunk
        return json.loads(buf.decode("utf-8"))

    def send(self, image_bytes: Optional[bytes], verify: str) -> None:
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self) -> Tuple[Optional[ViewerCamera], Optional[bool],
                               Optional[bool], Optional[float]]:
        """Returns (camera, do_training, keep_alive, scaling_modifier)."""
        m = self._read()
        width, height = m["resolution_x"], m["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None
        wvt = np.asarray(m["view_matrix"], np.float32).reshape(4, 4)
        wvt[:, 1] = -wvt[:, 1]
        wvt[:, 2] = -wvt[:, 2]
        cam = ViewerCamera(width=width, height=height, fov_y=m["fov_y"],
                           fov_x=m["fov_x"], znear=m["z_near"], zfar=m["z_far"],
                           world_view_transform=wvt)
        return (cam, bool(m["train"]), bool(m["keep_alive"]),
                float(m["scaling_modifier"]))

    def poll_and_render(self, table, do_training: bool, source_path: str,
                        bg=None) -> bool:
        """One training-loop poll (train_unified_lift.py:319-332): accept a
        connection if pending, serve frames until the client pauses. Returns the
        possibly-updated do_training flag."""
        import jax.numpy as jnp

        from segsplat_tpu.render import render

        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                cam, train_flag, keep_alive, scale_mod = self.receive()
                net_image_bytes = None
                if cam is not None:
                    out = render(table, cam.to_camera(),
                                 bg if bg is not None else jnp.zeros((3,)),
                                 scaling_modifier=scale_mod)
                    img = np.asarray(out["render"])
                    img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                    net_image_bytes = memoryview(
                        img.transpose(1, 2, 0).copy()).tobytes()
                if train_flag is not None:
                    do_training = train_flag
                self.send(net_image_bytes, source_path)
                if do_training and (cam is None or not keep_alive):
                    break
            except Exception:
                self.conn = None
        return do_training
