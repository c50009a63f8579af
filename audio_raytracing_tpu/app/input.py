"""Input mapping: backend events -> game actions with edge/held state.

Port of the reference Input layer (src/input.zig): a map from physical
inputs (key scancode / mouse button) to GameInput actions, each with
ButtonState {held, pressed, released, mouse positions}; `accumulate`
applies events, `decay` clears per-tick edges and the mouse delta
(input.zig:38-118). SDL is replaced by plain event dicts so the demo
driver runs headless and deterministic.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import numpy as np


class GameInput(enum.Enum):
    FIRE = "fire"
    GRAB = "grab"
    INTERACT = "interact"
    FORWARD = "forward"
    LEFT = "left"
    RIGHT = "right"
    BACKWARD = "backward"
    UP = "up"
    DOWN = "down"
    # TTY extension beyond the reference enum (input.zig:8-18): the
    # reference's pitch axis is continuous mouse delta (main.zig:996-1000),
    # which raw terminals lack — these discrete look actions carry the
    # arrow-key fallback; real pointer input still flows through
    # mouse_motion events when the terminal reports it (app/walkthrough.py
    # TTYKeys mouse=True).
    LOOK_UP = "look_up"
    LOOK_DOWN = "look_down"


@dataclass
class ButtonState:
    held: bool = False
    pressed: bool = False
    released: bool = False
    mouse_pos_pressed: np.ndarray = field(default_factory=lambda: np.zeros(2, np.float32))
    mouse_pos_released: np.ndarray = field(default_factory=lambda: np.zeros(2, np.float32))


class Input:
    """Events are dicts: {"type": "key_down"|"key_up"|"mouse_down"|
    "mouse_up", "code": key-or-button} and {"type": "mouse_motion",
    "pos": (x, y), "rel": (dx, dy)}."""

    def __init__(self):
        self.map: dict[tuple[str, object], GameInput] = {}
        self.mouse_pos = np.zeros(2, np.float32)
        self.mouse_delta = np.zeros(2, np.float32)
        self.states = {g: ButtonState() for g in GameInput}

    def bind_key(self, code, action: GameInput) -> None:
        self.map[("key", code)] = action

    def bind_mouse(self, button, action: GameInput) -> None:
        self.map[("mouse", button)] = action

    def peek(self, action: GameInput) -> ButtonState:
        return self.states[action]

    def consume(self, action: GameInput) -> ButtonState:
        s = self.states[action]
        out = ButtonState(s.held, s.pressed, s.released, s.mouse_pos_pressed, s.mouse_pos_released)
        s.held = s.pressed = s.released = False
        return out

    def accumulate(self, event: dict) -> None:
        et = event["type"]
        if et == "mouse_motion":
            self.mouse_pos = np.asarray(event["pos"], np.float32)
            self.mouse_delta = self.mouse_delta + np.asarray(event["rel"], np.float32)
            return
        kind = "key" if et.startswith("key") else "mouse"
        action = self.map.get((kind, event["code"]))
        if action is None:
            return
        s = self.states[action]
        if et.endswith("_down"):
            s.held = True
            if not s.pressed:
                s.mouse_pos_pressed = self.mouse_pos.copy()
            s.pressed = True
        else:
            s.held = False
            s.mouse_pos_released = self.mouse_pos.copy()
            s.released = True

    def decay(self) -> None:
        self.mouse_delta = np.zeros(2, np.float32)
        for s in self.states.values():
            s.pressed = False
            s.released = False
