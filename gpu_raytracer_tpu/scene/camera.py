"""Camera: thin-lens / pinhole with view-pyramid ray-gen basis
(reference: Src/Renderer/Camera.{h,cpp}).

The device consumes a flat `CameraParams` pytree (the analog of the
`CUDACamera` struct upload, reference: Src/Renderer/Integrators/
Integrator.cpp:432-481): position, the rotated view-pyramid vectors
(bottom-left corner, x axis, y axis, all in *pixel units* so
`dir = bl + x*px + y*py`), aperture/focal parameters, and the pixel spread
angle for ray cones.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from gpu_raytracer_tpu.core import transform as xf


@dataclass
class Camera:
    fov: float = np.radians(85.0)  # vertical? no: horizontal-ish, see recalibrate
    near_plane: float = 0.1
    far_plane: float = 300.0

    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = field(default_factory=lambda: np.array([0, 0, 0, 1], np.float32))

    aperture_radius: float = 0.0
    focal_distance: float = 10.0

    screen_width: int = 1024
    screen_height: int = 768

    moved: bool = False

    def __post_init__(self):
        self.recalibrate()

    def resize(self, width: int, height: int) -> None:
        self.screen_width = width
        self.screen_height = height
        self.recalibrate()

    def set_fov(self, fov_radians: float) -> None:
        self.fov = fov_radians
        self.recalibrate()

    def recalibrate(self) -> None:
        """Build the view pyramid (reference: Camera.cpp:20-42). The FOV is
        measured across the image *width* (d = half_width / tan(fov/2))."""
        half_width = 0.5 * self.screen_width
        half_height = 0.5 * self.screen_height
        tan_half_fov = np.tan(0.5 * self.fov)
        d = half_width / tan_half_fov

        self.bottom_left_corner = np.array([-half_width, -half_height, -d], np.float32)
        self.x_axis = np.array([1.0, 0.0, 0.0], np.float32)
        self.y_axis = np.array([0.0, 1.0, 0.0], np.float32)

        # Texture-LOD eq. 30 (Akenine-Möller 2021): angle subtended by one pixel.
        self.pixel_spread_angle = float(np.arctan(2.0 * tan_half_fov / self.screen_width))

        self.projection = _perspective(self.fov, half_height / half_width,
                                       self.near_plane, self.far_plane)
        self.view_projection = np.eye(4, dtype=np.float32)
        self.view_projection_prev = np.eye(4, dtype=np.float32)
        self.update(0.0)

    def update(self, delta: float) -> None:
        """Rotate the view pyramid into world space and refresh the
        view-projection pair used by SVGF reprojection (Camera.cpp:88-99)."""
        self.bottom_left_corner_rotated = xf.quat_rotate(self.rotation, self.bottom_left_corner)
        self.x_axis_rotated = xf.quat_rotate(self.rotation, self.x_axis)
        self.y_axis_rotated = xf.quat_rotate(self.rotation, self.y_axis)

        self.view_projection_prev = self.view_projection
        rot_m = np.eye(4, dtype=np.float32)
        rot_m[:3, :3] = xf.from_quaternion(_conjugate(self.rotation))[:3, :3]
        trans_m = np.eye(4, dtype=np.float32)
        trans_m[:3, 3] = -self.position
        self.view_projection = self.projection @ rot_m @ trans_m

    def params(self) -> dict:
        """Flat float32 pytree for the jitted ray-gen stage."""
        return {
            "position": np.asarray(self.position, np.float32),
            "bottom_left_corner": self.bottom_left_corner_rotated.astype(np.float32),
            "x_axis": self.x_axis_rotated.astype(np.float32),
            "y_axis": self.y_axis_rotated.astype(np.float32),
            "aperture_radius": np.float32(self.aperture_radius),
            "focal_distance": np.float32(self.focal_distance),
            "pixel_spread_angle": np.float32(self.pixel_spread_angle),
        }


def _conjugate(q: np.ndarray) -> np.ndarray:
    return np.array([-q[0], -q[1], -q[2], q[3]], np.float32)


def _perspective(fov: float, aspect_h_over_w: float, near: float, far: float) -> np.ndarray:
    """Column-vector perspective matrix matching the reference's
    Matrix4::perspective (fov across width)."""
    tan_half = np.tan(0.5 * fov)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 1.0 / tan_half
    m[1, 1] = 1.0 / (tan_half * aspect_h_over_w)
    m[2, 2] = -(far + near) / (far - near)
    m[2, 3] = -2.0 * far * near / (far - near)
    m[3, 2] = -1.0
    return m
