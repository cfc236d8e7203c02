"""Vectorized software 3D rasterizer (numpy) for the host-side viewer.

The reference renders its scene through Isaac Gym's GPU rasterizer
(components/graphics/graphics_manager.py + viewer_controller.py camera
drive); a TPU host has no GPU rasterizer, and the previous matplotlib
sphere-scatter was both low-fidelity (no occlusion-correct solids, no
shading) and slow (~6 FPS at 640x480). This module is a self-contained
pinhole rasterizer with:

- z-buffered **sphere impostors**: per-pixel spherical normals + Lambert
  shading, correct depth (near-surface), vectorized over each sphere's
  screen-space bounding rect;
- z-buffered **triangle meshes** for boxes (12 triangles each, flat-shaded
  by face normal) — solid, occlusion-correct cubes instead of wireframes;
- a **checkered ground plane** via per-pixel ray casting with distance fade,
  filling only pixels no geometry covered;
- a simple directional light + ambient term, sky gradient background.

Everything is numpy on the host; a 640x480 hand+cube scene renders in
~15-25 ms (>40 FPS), well above the 25 Hz control rate the viewer paces to.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_LIGHT = np.array([0.35, -0.5, 0.8])
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)
_AMBIENT = 0.35
_SKY_TOP = np.array([0.12, 0.13, 0.17])
_SKY_BOT = np.array([0.22, 0.24, 0.30])
_GROUND_A = np.array([0.30, 0.31, 0.33])
_GROUND_B = np.array([0.24, 0.25, 0.27])


class Rasterizer:
    def __init__(self, resolution: Tuple[int, int] = (640, 480),
                 fov_deg: float = 40.0):
        self.w, self.h = int(resolution[0]), int(resolution[1])
        self.fov_deg = float(fov_deg)
        # per-frame buffers
        self._rgb: Optional[np.ndarray] = None
        self._z: Optional[np.ndarray] = None
        # static sky gradient, built once
        t = np.linspace(0.0, 1.0, self.h, dtype=np.float32)[:, None, None]
        self._sky = (
            (_SKY_TOP * (1 - t) + _SKY_BOT * t)
            * np.ones((self.h, self.w, 3), np.float32)
        ).astype(np.float32)
        # per-camera static-background cache (sky + ground composite and
        # its depth map), keyed on (eye, R, cell, extent): the ground is
        # scene-static, so after the first frame at a given camera, begin()
        # installs it directly and ground() is a no-op
        self._ground_key = None
        self._ground_rgb = None
        self._ground_t = None
        self._ground_installed = False
        self._cell, self._extent = 0.08, 1.5

    # ------------------------------------------------------------------
    def begin(self, eye, target, up=(0.0, 0.0, 1.0)) -> None:
        eye = np.asarray(eye, np.float64)
        target = np.asarray(target, np.float64)
        fwd = target - eye
        fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
        right = np.cross(fwd, np.asarray(up, np.float64))
        n = np.linalg.norm(right)
        if n < 1e-6:  # looking straight up/down: pick any horizontal right
            right = np.array([1.0, 0.0, 0.0])
        else:
            right = right / n
        upv = np.cross(right, fwd)
        self.eye = eye
        self.R = np.stack([right, upv, fwd])     # world -> camera rows
        self.f = (self.w / 2.0) / np.tan(np.radians(self.fov_deg) / 2.0)
        self.cx, self.cy = self.w / 2.0, self.h / 2.0
        key = (tuple(self.eye), self.R.tobytes(), self._cell, self._extent)
        if key == self._ground_key:
            self._rgb = self._ground_rgb.copy()
            self._z = self._ground_t.copy()
            self._ground_installed = True
        else:
            self._rgb = self._sky.copy()
            self._z = np.full((self.h, self.w), np.inf, np.float32)
            self._ground_installed = False

    def _cam(self, pts: np.ndarray) -> np.ndarray:
        return (np.asarray(pts, np.float64) - self.eye) @ self.R.T

    def _screen(self, cam: np.ndarray) -> np.ndarray:
        """Camera-space -> pixel coords (x right, y down)."""
        z = np.maximum(cam[..., 2], 1e-6)
        x = self.f * cam[..., 0] / z + self.cx
        y = self.cy - self.f * cam[..., 1] / z
        return np.stack([x, y], axis=-1)

    # ------------------------------------------------------------------
    def spheres(self, centers, radii, colors) -> None:
        """Shaded sphere impostors with correct near-surface depth."""
        centers = np.asarray(centers, np.float64).reshape(-1, 3)
        radii = np.asarray(radii, np.float64).reshape(-1)
        colors = np.asarray(colors, np.float64).reshape(-1, 3)
        cam = self._cam(centers)
        # light direction in camera space (impostor normals live there)
        lc = self.R @ _LIGHT
        order = np.argsort(-cam[:, 2])  # far -> near (z-test makes it exact)
        for i in order:
            c = cam[i]
            if c[2] < 1e-3:
                continue
            scr = self._screen(c[None])[0]
            rs = self.f * radii[i] / c[2]
            if rs < 0.5:
                continue
            x0 = max(int(scr[0] - rs - 1), 0)
            x1 = min(int(scr[0] + rs + 2), self.w)
            y0 = max(int(scr[1] - rs - 1), 0)
            y1 = min(int(scr[1] + rs + 2), self.h)
            if x0 >= x1 or y0 >= y1:
                continue
            xs = np.arange(x0, x1) + 0.5
            ys = np.arange(y0, y1) + 0.5
            nx = (xs[None, :] - scr[0]) / rs
            ny = -(ys[:, None] - scr[1]) / rs
            rr = nx * nx + ny * ny
            inside = rr <= 1.0
            if not inside.any():
                continue
            nz = np.sqrt(np.maximum(1.0 - rr, 0.0))
            depth = c[2] - radii[i] * nz           # near surface
            zb = self._z[y0:y1, x0:x1]
            vis = inside & (depth < zb)
            if not vis.any():
                continue
            # impostor normal (camera space, +z toward viewer = -fwd)
            shade = _AMBIENT + (1 - _AMBIENT) * np.clip(
                nx * lc[0] + ny * lc[1] + nz * (-lc[2]), 0.0, 1.0
            )
            tile = self._rgb[y0:y1, x0:x1]
            tile[vis] = colors[i] * shade[vis][:, None]
            zb[vis] = depth[vis]

    # ------------------------------------------------------------------
    def mesh(self, verts, faces, color) -> None:
        """Flat-shaded triangle mesh (verts (V,3) world, faces (F,3) int)."""
        verts = np.asarray(verts, np.float64)
        color = np.asarray(color, np.float64)
        cam = self._cam(verts)
        scr = self._screen(cam)
        for f in np.asarray(faces, int):
            a, b, c = verts[f]
            n = np.cross(b - a, c - a)
            ln = np.linalg.norm(n)
            if ln < 1e-12:
                continue
            n = n / ln
            # backface: keep both sides (boxes are closed; z-test resolves),
            # shade by |n . L| so both windings light identically
            shade = _AMBIENT + (1 - _AMBIENT) * abs(float(n @ _LIGHT))
            ca = cam[f]
            if (ca[:, 2] < 1e-3).any():
                continue
            p = scr[f]
            x0 = max(int(p[:, 0].min()), 0)
            x1 = min(int(p[:, 0].max()) + 2, self.w)
            y0 = max(int(p[:, 1].min()), 0)
            y1 = min(int(p[:, 1].max()) + 2, self.h)
            if x0 >= x1 or y0 >= y1:
                continue
            xs = np.arange(x0, x1) + 0.5
            ys = np.arange(y0, y1) + 0.5
            px = xs[None, :]
            py = ys[:, None]
            # barycentric via edge functions
            (ax, ay), (bx, by), (cx2, cy2) = p
            den = (by - cy2) * (ax - cx2) + (cx2 - bx) * (ay - cy2)
            if abs(den) < 1e-9:
                continue
            w0 = ((by - cy2) * (px - cx2) + (cx2 - bx) * (py - cy2)) / den
            w1 = ((cy2 - ay) * (px - cx2) + (ax - cx2) * (py - cy2)) / den
            w2 = 1.0 - w0 - w1
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
            if not inside.any():
                continue
            # perspective-correct depth: interpolate 1/z
            iz = w0 / ca[0, 2] + w1 / ca[1, 2] + w2 / ca[2, 2]
            depth = 1.0 / np.maximum(iz, 1e-9)
            zb = self._z[y0:y1, x0:x1]
            vis = inside & (depth < zb)
            if not vis.any():
                continue
            self._rgb[y0:y1, x0:x1][vis] = color * shade
            zb[vis] = depth[vis]

    def capsule(self, p0, p1, radius, color, segments: int = 6) -> None:
        """Capsule between two world points: a cylinder triangle strip plus
        sphere-impostor caps (depth from the impostors is near-exact, the
        z-test composes them with the strip)."""
        p0 = np.asarray(p0, np.float64)
        p1 = np.asarray(p1, np.float64)
        axis = p1 - p0
        ln = np.linalg.norm(axis)
        if ln < 1e-9:
            self.spheres(p0[None], np.array([radius]), np.asarray(color)[None])
            return
        a = axis / ln
        # orthonormal ring basis
        ref = np.array([0.0, 0.0, 1.0]) if abs(a[2]) < 0.9 else np.array(
            [1.0, 0.0, 0.0]
        )
        u = np.cross(a, ref)
        u = u / np.linalg.norm(u)
        v = np.cross(a, u)
        th = np.linspace(0.0, 2 * np.pi, segments, endpoint=False)
        ring = radius * (np.cos(th)[:, None] * u + np.sin(th)[:, None] * v)
        verts = np.concatenate([p0 + ring, p1 + ring])   # (2S, 3)
        faces = []
        for i in range(segments):
            j = (i + 1) % segments
            faces.append((i, j, segments + i))
            faces.append((j, segments + j, segments + i))
        self.mesh(verts, faces, color)
        self.spheres(
            np.stack([p0, p1]), np.array([radius, radius]),
            np.tile(np.asarray(color, np.float64), (2, 1)),
        )

    def box(self, pos, rotmat, half_extents, color) -> None:
        h = np.asarray(half_extents, np.float64) * np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
        )
        verts = np.asarray(pos) + h @ np.asarray(rotmat).T
        faces = [
            (0, 1, 3), (0, 3, 2),   # -x
            (4, 6, 7), (4, 7, 5),   # +x
            (0, 4, 5), (0, 5, 1),   # -y
            (2, 3, 7), (2, 7, 6),   # +y
            (0, 2, 6), (0, 6, 4),   # -z
            (1, 5, 7), (1, 7, 3),   # +z
        ]
        self.mesh(verts, faces, color)

    # ------------------------------------------------------------------
    def _build_ground_cache(self, cell: float, extent: float) -> None:
        """Ray-cast the checkered z=0 plane over the sky into the static
        background cache (camera-dependent; built once per camera)."""
        xs = (np.arange(self.w, dtype=np.float32) + 0.5 - self.cx) / self.f
        ys = (self.cy - np.arange(self.h, dtype=np.float32) - 0.5) / self.f
        d = np.empty((self.h, self.w, 3), np.float32)
        d[..., 0] = xs[None, :]
        d[..., 1] = ys[:, None]
        d[..., 2] = 1.0
        # camera-space ray dirs -> world (R^T on row vectors == @ R)
        d = d @ self.R.astype(np.float32)
        rgb = self._sky.copy()
        t_full = np.full((self.h, self.w), np.inf, np.float32)
        dz = d[..., 2]
        hit = dz < -1e-9
        if hit.any():
            tv = (-self.eye[2] / dz[hit]).astype(np.float32)
            px = np.float32(self.eye[0]) + tv * d[..., 0][hit]
            py = np.float32(self.eye[1]) + tv * d[..., 1][hit]
            dist = np.sqrt(
                (px - self.eye[0]) ** 2 + (py - self.eye[1]) ** 2
            ).astype(np.float32)
            near = dist < extent
            if near.any():
                checker = (
                    np.floor(px[near] / cell).astype(np.int64)
                    + np.floor(py[near] / cell).astype(np.int64)
                ) % 2
                col = np.where(
                    checker[:, None] == 0,
                    _GROUND_A.astype(np.float32),
                    _GROUND_B.astype(np.float32),
                )
                fade = np.clip(1.0 - dist[near] / extent, 0.0, 1.0)[:, None]
                shade = col * (0.5 + 0.5 * fade)
                # soft blend toward sky at the fade edge
                a = np.clip(fade / 0.25, 0.0, 1.0)
                idx = np.nonzero(hit)
                sel = (idx[0][near], idx[1][near])
                rgb[sel] = (
                    shade * a + rgb[sel] * (1 - a)
                ).astype(np.float32)
                t_full[sel] = tv[near]
        self._ground_rgb = rgb
        self._ground_t = t_full
        self._ground_key = (
            tuple(self.eye), self.R.tobytes(), cell, extent,
        )

    def ground(self, cell: float = 0.08, extent: float = 1.5) -> None:
        """Checkered z=0 plane wherever no geometry was drawn. Cached per
        camera: when begin() already installed the background, a no-op."""
        if self._ground_installed and (cell, extent) == (
            self._cell, self._extent
        ):
            return
        self._cell, self._extent = cell, extent
        key = (tuple(self.eye), self.R.tobytes(), cell, extent)
        if key != self._ground_key:
            self._build_ground_cache(cell, extent)
        gt = self._ground_t
        vis = gt < self._z
        if vis.any():
            self._rgb[vis] = self._ground_rgb[vis]
            self._z[vis] = gt[vis]

    # ------------------------------------------------------------------
    def finish(self) -> np.ndarray:
        return (np.clip(self._rgb, 0.0, 1.0) * 255).astype(np.uint8)
