"""Host-side scene renderer: physics states -> RGB frames.

There is no Isaac-Gym-style GPU rasterizer/viewer on TPU, so rendering is a
host-side sidecar fed by device states (the reference's graphics stack --
GraphicsManager/ViewerController/VideoManager, SURVEY §2.7 -- hangs off the
env's render() the same way; here frames are drawn from the env state the
step function already returns, so rendering never touches the hot loop).

The renderer draws the hand's collision-sphere skeleton, fingertip/pad
markers, the box, and a ground grid with a simple painter's-algorithm
projection (matplotlib Agg). Intended for debugging, episode replay, video
recording, and MJPEG streaming -- not real-time raytracing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from dexrobot_isaac_tpu.models.dexhand021 import HandModel, build_hand_model
from dexrobot_isaac_tpu.ops import quat as qm


class SceneRenderer:
    def __init__(
        self,
        model: Optional[HandModel] = None,
        resolution: Tuple[int, int] = (640, 480),
        box_size: float = 0.05,
        box_color=(0.5, 0.8, 1.0),      # cfg task.visualization.box_color
        camera_pos=(0.7, -0.7, 0.55),
        camera_target=(0.05, 0.0, 0.15),
    ):
        self.model = model or build_hand_model()
        self.resolution = tuple(resolution)
        self.box_size = box_size
        self.box_color = tuple(box_color)
        self.camera_pos = np.asarray(camera_pos, dtype=np.float64)
        self.camera_target = np.asarray(camera_target, dtype=np.float64)
        self._fig = None

    def _ensure_fig(self):
        if self._fig is None:
            import matplotlib

            matplotlib.use("Agg", force=False)
            import matplotlib.pyplot as plt

            w, h = self.resolution
            self._fig = plt.figure(figsize=(w / 100, h / 100), dpi=100)
            self._ax = self._fig.add_subplot(111, projection="3d")

    def render_state(
        self,
        kin_body_pos: np.ndarray,     # (B, 3) one env's FK body positions
        kin_body_quat: np.ndarray,    # (B, 4)
        box_pos: Optional[np.ndarray] = None,
        box_quat: Optional[np.ndarray] = None,
        contact_force_bodies: Optional[np.ndarray] = None,  # (B,) magnitudes
        title: str = "",
        box2_pos: Optional[np.ndarray] = None,   # second free body
        box2_quat: Optional[np.ndarray] = None,  # (multi-object scenes)
        box2_size: Optional[float] = None,
    ) -> np.ndarray:
        """Render one env's state to an RGB uint8 frame (H, W, 3)."""
        self._ensure_fig()
        ax = self._ax
        ax.clear()
        m = self.model

        # collision spheres in world
        sb = m.sphere_body
        centers = np.asarray(kin_body_pos)[sb] + np.asarray(
            qm.quat_rotate(
                np.asarray(kin_body_quat, dtype=np.float32)[sb],
                np.asarray(m.sphere_pos, dtype=np.float32),
            )
        )
        sizes = (np.asarray(m.sphere_radius) * 2000) ** 2
        # RGB tuples throughout: a list mixing hex strings and tuples is
        # rejected by matplotlib's color array conversion
        colors = [(0.47, 0.47, 0.47)] * len(sb)
        if contact_force_bodies is not None:
            # contact coloring (parity: viewer_controller.py:462-594)
            for i, b in enumerate(sb):
                f = float(contact_force_bodies[b])
                if f > 0.1:
                    t = min(f / 10.0, 1.0)
                    colors[i] = (1.0, 0.2 * (1 - t), 0.2 * (1 - t))
        ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], s=sizes, c=colors,
                   depthshade=True)

        # finger chains as lines
        for f in range(1, 6):
            chain = [m.body_index(f"r_f_link{f}_{j}") for j in range(1, 5)]
            pts = np.asarray(kin_body_pos)[chain]
            ax.plot(pts[:, 0], pts[:, 1], pts[:, 2], "k-", lw=1)

        if box_pos is not None:
            self._draw_box(ax, np.asarray(box_pos), np.asarray(box_quat))
        if box2_pos is not None:
            self._draw_box(
                ax, np.asarray(box2_pos), np.asarray(box2_quat),
                size=box2_size, color=(0.9, 0.6, 0.2),
            )

        # ground grid
        g = np.linspace(-0.3, 0.5, 5)
        for v in g:
            ax.plot([g[0], g[-1]], [v, v], [0, 0], color="#cccccc", lw=0.5)
            ax.plot([v, v], [g[0], g[-1]], [0, 0], color="#cccccc", lw=0.5)

        ax.set_xlim(-0.2, 0.5)
        ax.set_ylim(-0.35, 0.35)
        ax.set_zlim(0.0, 0.7)
        ax.set_box_aspect((1, 1, 1))
        if title:
            ax.set_title(title, fontsize=8)
        ax.view_init(elev=25, azim=-60)

        self._fig.canvas.draw()
        buf = np.asarray(self._fig.canvas.buffer_rgba())
        return buf[..., :3].copy()

    def _draw_box(self, ax, pos, quat, size=None, color=None):
        h = (self.box_size if size is None else size) / 2
        corners = np.array(
            [[sx, sy, sz] for sx in (-h, h) for sy in (-h, h) for sz in (-h, h)]
        )
        R = np.asarray(qm.quat_to_rotmat(np.asarray(quat, dtype=np.float32)))
        world = pos + corners @ R.T
        edges = [
            (0, 1), (0, 2), (1, 3), (2, 3),
            (4, 5), (4, 6), (5, 7), (6, 7),
            (0, 4), (1, 5), (2, 6), (3, 7),
        ]
        for a, b in edges:
            ax.plot(
                *zip(world[a], world[b]),
                color=self.box_color if color is None else color, lw=1.5,
            )

    def close(self):
        if self._fig is not None:
            import matplotlib.pyplot as plt

            plt.close(self._fig)
            self._fig = None
