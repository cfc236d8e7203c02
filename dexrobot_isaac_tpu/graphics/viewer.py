"""Interactive viewer controller.

Parity with the reference's ViewerController (components/graphics/
viewer_controller.py:29-659): camera follow modes, robot selection, and the
keyboard shortcut set (ENTER view-mode cycle, F follow toggle, UP/DOWN robot
select, E reset env, SPACE random actions, C contact visualization toggle).

On TPU hosts there is no Isaac viewer; this controller drives the host-side
`SceneRenderer` into either a live matplotlib window (when a display exists)
or the MJPEG streamer (headless), with the same interaction semantics.
Keyboard events come from the matplotlib window OR, when streaming, from the
browser via the streamer's `/control?key=` endpoint: `push_key` queues them
thread-safely and `render` drains the queue on the render thread (device
callbacks like the E-key reset must never run on an HTTP worker thread —
see CLAUDE.md TPU-tunnel gotchas).
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Callable, Optional

import numpy as np

from dexrobot_isaac_tpu.graphics.renderer import SceneRenderer
from dexrobot_isaac_tpu.utils.logging import get_logger

logger = get_logger(__name__)

VIEW_MODES = ("overview", "follow", "side", "top")


class ViewerController:
    def __init__(
        self,
        renderer: SceneRenderer,
        num_envs: int,
        on_reset_env: Optional[Callable[[int], None]] = None,
        on_toggle_random_actions: Optional[Callable[[], None]] = None,
        streamer=None,
        box2_size: Optional[float] = None,
    ):
        self.renderer = renderer
        self.num_envs = num_envs
        self.box2_size = box2_size
        self.on_reset_env = on_reset_env
        self.on_toggle_random_actions = on_toggle_random_actions
        self.streamer = streamer
        self.selected_env = 0
        self.view_mode_idx = 0
        self.follow = False
        self.show_contacts = True
        self._fig = None
        self._im = None
        self._pending: deque = deque(maxlen=32)
        self._pending_lock = threading.Lock()
        if streamer is not None and hasattr(streamer, "on_key"):
            streamer.on_key = self.push_key

    # ------------------------------------------------------------------
    # keyboard semantics (viewer_controller.py:185-350)
    # ------------------------------------------------------------------
    _BROWSER_KEYS = {
        "enter": "enter", "arrowup": "up", "arrowdown": "down",
        " ": " ", "spacebar": " ", "space": " ",
    }

    def push_key(self, key: str) -> None:
        """Thread-safe key enqueue (called from the streamer's HTTP worker
        threads). Accepts browser KeyboardEvent.key names ("Enter",
        "ArrowUp", " ", "e") and the internal names; `render` drains."""
        k = self._BROWSER_KEYS.get(key.lower(), key.lower())
        with self._pending_lock:
            self._pending.append(k)

    def drain_keys(self) -> None:
        """Apply queued browser keys on the caller's (render) thread."""
        while True:
            with self._pending_lock:
                if not self._pending:
                    return
                k = self._pending.popleft()
            self.handle_key(k)

    def handle_key(self, key: str) -> None:
        if key == "enter":
            self.view_mode_idx = (self.view_mode_idx + 1) % len(VIEW_MODES)
            logger.info(f"View mode: {VIEW_MODES[self.view_mode_idx]}")
        elif key == "f":
            self.follow = not self.follow
            logger.info(f"Camera follow: {self.follow}")
        elif key == "up":
            self.selected_env = (self.selected_env + 1) % self.num_envs
            logger.info(f"Selected env: {self.selected_env}")
        elif key == "down":
            self.selected_env = (self.selected_env - 1) % self.num_envs
            logger.info(f"Selected env: {self.selected_env}")
        elif key == "e" and self.on_reset_env:
            self.on_reset_env(self.selected_env)
        elif key == " " and self.on_toggle_random_actions:
            self.on_toggle_random_actions()
        elif key == "c":
            self.show_contacts = not self.show_contacts
            logger.info(f"Contact visualization: {self.show_contacts}")

    def _apply_view(self, hand_pos: np.ndarray) -> None:
        mode = VIEW_MODES[self.view_mode_idx]
        r = self.renderer
        if mode == "side":
            r.camera_pos = np.array([0.05, -0.9, 0.25])
        elif mode == "top":
            r.camera_pos = np.array([0.05, 0.0, 1.2])
        else:
            r.camera_pos = np.array([0.7, -0.7, 0.55])
        if self.follow or mode == "follow":
            r.camera_target = hand_pos
        else:
            r.camera_target = np.array([0.05, 0.0, 0.15])

    # ------------------------------------------------------------------
    def render(self, kin, physics, body_contact_force=None, has_box=True):
        """Render the selected env; display in window or stream."""
        self.drain_keys()
        e = self.selected_env
        hand_pos = np.asarray(kin.body_pos[e, 5])
        self._apply_view(hand_pos)
        cf = None
        if self.show_contacts and body_contact_force is not None:
            cf = np.linalg.norm(np.asarray(body_contact_force[e]), axis=-1)
        frame = self.renderer.render_state(
            np.asarray(kin.body_pos[e]), np.asarray(kin.body_quat[e]),
            box_pos=np.asarray(physics.box_pos[e]) if has_box else None,
            box_quat=np.asarray(physics.box_quat[e]),
            contact_force_bodies=cf,
            title=f"env {e} | {VIEW_MODES[self.view_mode_idx]}",
            box2_pos=(
                np.asarray(physics.box2_pos[e])
                if physics.box2_pos is not None else None
            ),
            box2_quat=(
                np.asarray(physics.box2_quat[e])
                if physics.box2_quat is not None else None
            ),
            box2_size=self.box2_size,
        )
        if self.streamer is not None:
            self.streamer.add_frame(frame)
        else:
            self._show_window(frame)
        return frame

    def _show_window(self, frame: np.ndarray) -> None:
        try:
            import matplotlib.pyplot as plt

            if self._fig is None:
                plt.ion()
                self._fig, ax = plt.subplots()
                ax.axis("off")
                self._im = ax.imshow(frame)
                self._fig.canvas.mpl_connect(
                    "key_press_event", lambda ev: self.handle_key(ev.key or "")
                )
            else:
                self._im.set_data(frame)
            self._fig.canvas.draw_idle()
            self._fig.canvas.flush_events()
        except Exception as e:  # headless host without display
            logger.debug(f"Viewer window unavailable ({e}); use videoStream")

    def close(self) -> None:
        if self._fig is not None:
            import matplotlib.pyplot as plt

            plt.close(self._fig)
            self._fig = None
