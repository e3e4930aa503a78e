"""Camera model: pose, view/projection matrices, intrinsics, orbit controls.

Functional twin of the reference camera (reference: src/camera.rs:4-127 and
notes/util.py:8-119).  Conventions preserved exactly:

* right-handed ``look_at`` with COLMAP-style ``up = (0, -1, 0)``
  (src/camera.rs:31), so visible points have *negative* camera-space z;
* GL-style perspective with NDC z in [-1, 1] (nalgebra-glm / pyglm default,
  src/camera.rs:67);
* defaults znear=0.01, zfar=100, fovy=pi/2 (src/camera.rs:24-28);
* intrinsics helper returns (tan fovx/2, tan fovy/2, focal = h / (2 tan
  fovy/2)) (src/camera.rs:84-89);
* orbit controls: yaw about ``up``, then pitch about ``right = up x
  position`` with a pole guard (src/camera.rs:41-68).  Note the reference
  computes the pitch axis from the *unrotated base position* — reproduced
  here, quirk and all, so interactive trajectories match frame-for-frame.

The camera is a pytree: resolution is static metadata (it shapes the output
image) while the pose fields are traced, so moving the camera never triggers
a recompile.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


def _v3(x) -> jax.Array:
    return jnp.asarray(x, jnp.float32).reshape(3)


@partial(jax.tree_util.register_dataclass,
         data_fields=["position", "target", "up", "yaw", "pitch",
                      "znear", "zfar", "fovy"],
         meta_fields=["h", "w"])
@dataclasses.dataclass(frozen=True)
class Camera:
    """Orbit camera. ``h``/``w`` are static; everything else is traced."""

    position: jax.Array   # (3,) base position (pre-orbit), world space
    target: jax.Array     # (3,) orbit pivot
    up: jax.Array         # (3,)
    yaw: jax.Array        # () radians, rotation about `up`
    pitch: jax.Array      # () radians, rotation about `up x position`
    znear: jax.Array      # ()
    zfar: jax.Array       # ()
    fovy: jax.Array       # () radians
    h: int
    w: int

    @classmethod
    def create(cls, h: int, w: int, position=(0.0, 0.0, 3.0),
               target=(0.0, 0.0, 0.0), up=(0.0, -1.0, 0.0),
               yaw: float = 0.0, pitch: float = 0.0,
               znear: float = 0.01, zfar: float = 100.0,
               fovy: float = jnp.pi / 2) -> "Camera":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(position=_v3(position), target=_v3(target), up=_v3(up),
                   yaw=f32(yaw), pitch=f32(pitch), znear=f32(znear),
                   zfar=f32(zfar), fovy=f32(fovy), h=int(h), w=int(w))

    # -- pose updates (pure; return a new Camera) ---------------------------

    def with_pose(self, **kw) -> "Camera":
        return dataclasses.replace(self, **{
            k: jnp.asarray(v, jnp.float32) for k, v in kw.items()})

    def rotate(self, dyaw: float = 0.0, dpitch: float = 0.0) -> "Camera":
        """Reference viewer arrow-key behavior (src/main.rs:43-64)."""
        return dataclasses.replace(self, yaw=self.yaw + dyaw,
                                   pitch=self.pitch + dpitch)

    def reset(self) -> "Camera":
        """'R' key: zero the orbit angles (src/main.rs:65-68)."""
        zero = jnp.zeros((), jnp.float32)
        return dataclasses.replace(self, yaw=zero, pitch=zero)

    # -- derived quantities --------------------------------------------------

    @property
    def aspect(self) -> float:
        return self.w / self.h

    def eye(self) -> jax.Array:
        """World-space camera position after applying yaw/pitch orbit.

        Mirrors ``compute_matrices`` (src/camera.rs:41-64): pole-guard the
        pitch, rotate about `up` by yaw, then about ``up x base_position`` by
        pitch — both around the pivot (`target`).
        """
        viewdir = _normalize(self.position - self.target)
        cos_angle = jnp.dot(viewdir, self.up)
        pitch = jnp.where(cos_angle * jnp.sign(self.pitch) > 0.99,
                          0.0, self.pitch)
        p = self.position - self.target
        p = _axis_angle_rotate(p, self.up, self.yaw)
        right = jnp.cross(self.up, self.position)  # sic: base position
        p = _axis_angle_rotate(p, right, pitch)
        return p + self.target

    def view_matrix(self) -> jax.Array:
        return look_at(self.eye(), self.target, self.up)

    def projection_matrix(self) -> jax.Array:
        return perspective(self.fovy, self.aspect, self.znear, self.zfar)

    def htanfovxy_focal(self) -> tuple[jax.Array, jax.Array, jax.Array]:
        """(tan(fovx/2), tan(fovy/2), focal px) per src/camera.rs:84-89."""
        htany = jnp.tan(self.fovy / 2)
        htanx = htany / self.h * self.w
        focal = self.h / (2.0 * htany)
        return htanx, htany, focal


def _normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


def _axis_angle_rotate(v: jax.Array, axis: jax.Array,
                       angle: jax.Array) -> jax.Array:
    """Rodrigues rotation of v about (possibly unnormalized) axis."""
    k = _normalize(axis)
    c, s = jnp.cos(angle), jnp.sin(angle)
    return v * c + jnp.cross(k, v) * s + k * jnp.dot(k, v) * (1.0 - c)


def look_at(eye: jax.Array, center: jax.Array, up: jax.Array) -> jax.Array:
    """Right-handed look-at, glm convention (reference src/camera.rs:65)."""
    f = _normalize(center - eye)
    s = _normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)
    m = jnp.stack([
        jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
        jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
        jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
    ])
    return m.astype(jnp.float32)


def perspective(fovy, aspect, znear, zfar) -> jax.Array:
    """Right-handed GL perspective, NDC z in [-1, 1] (glm RH_NO).

    Matches nalgebra-glm's default used at reference src/camera.rs:67.
    """
    t = jnp.tan(jnp.asarray(fovy, jnp.float32) / 2)
    znear = jnp.asarray(znear, jnp.float32)
    zfar = jnp.asarray(zfar, jnp.float32)
    zero = jnp.zeros_like(t)
    one = jnp.ones_like(t)
    return jnp.stack([
        jnp.stack([1.0 / (aspect * t), zero, zero, zero]),
        jnp.stack([zero, 1.0 / t, zero, zero]),
        jnp.stack([zero, zero, -(zfar + znear) / (zfar - znear),
                   -(2.0 * zfar * znear) / (zfar - znear)]),
        jnp.stack([zero, zero, -one, zero]),
    ]).astype(jnp.float32)


def world_to_cam(camera: "Camera", points: jax.Array) -> jax.Array:
    """(N, 3) world -> camera space (reference notes/util.py:69-80)."""
    view = camera.view_matrix()
    points = jnp.asarray(points, jnp.float32)
    return points @ view[:3, :3].T + view[:3, 3]


def cam_to_ndc(camera: "Camera", points_cam: jax.Array) -> jax.Array:
    """(N, 3) camera space -> (N, 3) NDC with perspective divide
    (reference notes/util.py:86-93)."""
    proj = camera.projection_matrix()
    p = jnp.asarray(points_cam, jnp.float32)
    clip = p @ proj[:3, :3].T + proj[:3, 3]
    w_clip = p @ proj[3, :3] + proj[3, 3]
    return clip / w_clip[:, None]


def ndc_to_pixel(ndc_xy: jax.Array, w: int, h: int) -> jax.Array:
    """NDC [-1,1]^2 -> pixel coords with the y-flip the loaders use
    (reference notes/util.py:99-114):  x_px = (x+1) w/2,  y_px = (1-y) h/2.
    """
    x = (ndc_xy[..., 0] + 1.0) * (w / 2)
    y = (1.0 - ndc_xy[..., 1]) * (h / 2)
    return jnp.stack([x, y], axis=-1)


def orbit_trajectory(camera: Camera, num_frames: int,
                     yaw_sweep: float = 2 * jnp.pi,
                     pitch_sweep: float = 0.0) -> Camera:
    """A batched Camera whose leaves carry a leading frame axis.

    Use with ``jax.vmap(render_fn, in_axes=(None, 0))`` or ``lax.map`` for
    trajectory rendering (the reference's interactive loop, src/main.rs:42-80,
    recomputes only on pose change; here every frame is one jitted call with
    camera-only inputs).
    """
    ts = jnp.linspace(0.0, 1.0, num_frames, dtype=jnp.float32)
    yaws = camera.yaw + ts * yaw_sweep
    pitches = camera.pitch + ts * pitch_sweep
    tile = lambda a: jnp.broadcast_to(a, (num_frames,) + a.shape)
    return Camera(position=tile(camera.position), target=tile(camera.target),
                  up=tile(camera.up), yaw=yaws, pitch=pitches,
                  znear=tile(camera.znear), zfar=tile(camera.zfar),
                  fovy=tile(camera.fovy), h=camera.h, w=camera.w)
