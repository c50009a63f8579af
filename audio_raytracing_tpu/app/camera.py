"""Mouse-look fly camera + view-projection, reference-parity.

Port of Camera (src/main.zig:965-1029): yaw/pitch from mouse delta with
sensitivity 0.3 per tick, pitch clamped to ±0.49π, WASD planar movement at
speed 2 m/s plus vertical up/down, previous-state kept for interpolated
rendering; vp(alpha) builds lookAt·perspective (fov 69°, 4:3, 0.01..100)
from lerped pose.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from .input import GameInput, Input

MOUSE_SENSITIVITY = 0.3
MOVE_SPEED = 2.0
UP = np.asarray([0.0, 1.0, 0.0], np.float32)


@dataclass
class Camera:
    pos: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    yaw: float = 0.0
    pitch: float = 0.0
    prev_pos: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    prev_yaw: float = 0.0
    prev_pitch: float = 0.0

    def update(self, inp: Input, cfg: Config = DEFAULT_CONFIG) -> None:
        tick = cfg.tick
        self.prev_pos = self.pos.copy()
        self.prev_yaw = self.yaw
        self.prev_pitch = self.pitch

        self.yaw += float(inp.mouse_delta[0]) * MOUSE_SENSITIVITY * tick
        self.pitch -= float(inp.mouse_delta[1]) * MOUSE_SENSITIVITY * tick
        self.pitch = float(np.clip(self.pitch, -0.49 * math.pi, 0.49 * math.pi))

        fwd = np.asarray(
            [math.cos(self.yaw), 0.0, math.sin(self.yaw)], np.float32
        ) * (MOVE_SPEED * tick)
        right = np.asarray(
            [math.cos(self.yaw + 0.5 * math.pi), 0.0, math.sin(self.yaw + 0.5 * math.pi)],
            np.float32,
        ) * (MOVE_SPEED * tick)

        if inp.peek(GameInput.FORWARD).held:
            self.pos = self.pos + fwd
        if inp.peek(GameInput.BACKWARD).held:
            self.pos = self.pos - fwd
        if inp.peek(GameInput.RIGHT).held:
            self.pos = self.pos + right
        if inp.peek(GameInput.LEFT).held:
            self.pos = self.pos - right
        if inp.peek(GameInput.UP).held:
            self.pos = self.pos + UP * (MOVE_SPEED * tick)
        if inp.peek(GameInput.DOWN).held:
            self.pos = self.pos - UP * (MOVE_SPEED * tick)

    def facing(self, alpha: float = 1.0) -> np.ndarray:
        yaw = (1 - alpha) * self.prev_yaw + alpha * self.yaw
        pitch = (1 - alpha) * self.prev_pitch + alpha * self.pitch
        f = np.asarray(
            [
                math.cos(pitch) * math.cos(yaw),
                math.sin(pitch),
                math.cos(pitch) * math.sin(yaw),
            ],
            np.float32,
        )
        return f / np.linalg.norm(f)

    def vp(self, alpha: float = 1.0, fov_deg: float = 69.0, aspect: float = 4.0 / 3.0,
           near: float = 0.01, far: float = 100.0) -> np.ndarray:
        """Right-handed lookAt @ perspective (main.zig:1010-1028), row-major."""
        pos = (1 - alpha) * self.prev_pos + alpha * self.pos
        f = self.facing(alpha)
        z = -f  # RH: camera looks down -z
        x = np.cross(UP, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        view = np.eye(4, dtype=np.float32)
        view[:3, 0], view[:3, 1], view[:3, 2] = x, y, z
        view[3, 0] = -float(pos @ x)
        view[3, 1] = -float(pos @ y)
        view[3, 2] = -float(pos @ z)
        fov = math.radians(fov_deg)
        h = 1.0 / math.tan(fov * 0.5)
        w = h / aspect
        proj = np.zeros((4, 4), np.float32)
        proj[0, 0] = w
        proj[1, 1] = h
        proj[2, 2] = far / (near - far)
        proj[2, 3] = -1.0
        proj[3, 2] = near * far / (near - far)
        return view @ proj
