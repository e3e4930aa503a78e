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

    def sh_eye(self, stale: bool = False) -> jax.Array:
        """Ray origin for SH color evaluation.

        ``stale=True`` reproduces the reference viewer's stale-eye bug:
        the Rust pipelines read ``camera.position`` for SH rays
        (src/pipelines.rs:99) but ``compute_matrices`` rotates a local
        copy and never writes it back (src/camera.rs:41-68), so its
        view-dependent color ignores the orbit.  Identity at
        yaw = pitch = 0.  See PARITY.md.
        """
        return jnp.asarray(self.position) if stale else self.eye()

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

    def intrinsics_px(self):
        """Pinhole intrinsics (fx, fy, cx, cy) in pixels.

        The camera-consumer protocol shared with :class:`SE3Camera`: the
        renderer maps camera space -> pixels as ``x_px = cx + fx·x/(-z)``,
        ``y_px = cy - fy·y/(-z)`` (the y-flip of notes/util.py:109-111).
        An orbit camera has square pixels and a centered principal point:
        fx = fy = focal, (cx, cy) = image center (src/camera.rs:84-89).
        """
        _, _, focal = self.htanfovxy_focal()
        return focal, focal, jnp.float32(self.w / 2), jnp.float32(self.h / 2)

    def scaled(self, ss: int) -> "Camera":
        """Resolution scaled by ``ss`` with the field of view unchanged
        (the supersampling transform).  For an orbit camera the focal is
        derived from h, so scaling h/w suffices."""
        return dataclasses.replace(self, h=self.h * ss, w=self.w * ss)

    def to_se3(self) -> "SE3Camera":
        """The same pose/intrinsics as an explicit SE(3) camera."""
        fx, fy, cx, cy = self.intrinsics_px()
        return SE3Camera(view=self.view_matrix(), fx=fx, fy=fy,
                         cx=cx, cy=cy, znear=self.znear, zfar=self.zfar,
                         h=self.h, w=self.w)


@partial(jax.tree_util.register_dataclass,
         data_fields=["view", "fx", "fy", "cx", "cy", "znear", "zfar"],
         meta_fields=["h", "w"])
@dataclasses.dataclass(frozen=True)
class SE3Camera:
    """Arbitrary-pose pinhole camera: an explicit world-to-camera matrix
    plus COLMAP-style intrinsics (fx≠fy and off-center principal point
    supported).

    The reference's camera is orbit-parameterized only
    (src/camera.rs:4-127: position/target/yaw/pitch) — fine for its
    interactive viewer, but real 3DGS datasets carry COLMAP
    world-to-camera extrinsics + PINHOLE intrinsics that an orbit cannot
    express.  This class extends the engine to those poses while keeping
    the pytree discipline: ``view`` and the intrinsics are TRACED leaves
    (pose changes never recompile), ``h``/``w`` static.

    Convention match (PARITY.md): ``view`` follows the same right-handed
    look-at frame as :func:`look_at` — rows are (right, up', -forward)
    with COLMAP y-down handled by the caller's up vector — so visible
    points have negative camera-space z, exactly as the orbit camera
    produces.  A COLMAP ``images.txt`` world-to-camera (y down, z
    FORWARD) converts via :meth:`from_colmap`, which flips the y and z
    rows.
    """

    view: jax.Array    # (4, 4) world-to-camera, rows (s, u, -f | t)
    fx: jax.Array      # () focal in pixels, x
    fy: jax.Array      # () focal in pixels, y
    cx: jax.Array      # () principal point x, pixels
    cy: jax.Array      # () principal point y, pixels
    znear: jax.Array   # ()
    zfar: jax.Array    # ()
    h: int
    w: int

    @classmethod
    def create(cls, h: int, w: int, view, fx, fy=None, cx=None, cy=None,
               znear: float = 0.01, zfar: float = 100.0) -> "SE3Camera":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(view=jnp.asarray(view, jnp.float32).reshape(4, 4),
                   fx=f32(fx), fy=f32(fy if fy is not None else fx),
                   cx=f32(cx if cx is not None else w / 2),
                   cy=f32(cy if cy is not None else h / 2),
                   znear=f32(znear), zfar=f32(zfar), h=int(h), w=int(w))

    @classmethod
    def from_colmap(cls, qvec, tvec, fx, fy, cx, cy, h: int, w: int,
                    znear: float = 0.01, zfar: float = 100.0
                    ) -> "SE3Camera":
        """From a COLMAP image record: world-to-camera rotation as a
        scalar-first quaternion + translation, PINHOLE intrinsics.

        COLMAP's camera frame is x right, y DOWN, z FORWARD (+z in front);
        this engine's frame is y up', z BACKWARD (-z in front, glm
        look_at).  The conversion flips rows 1 and 2 of [R|t].
        """
        q = jnp.asarray(qvec, jnp.float32)
        q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
        qw, qx, qy, qz = q[0], q[1], q[2], q[3]
        r = jnp.stack([
            jnp.stack([1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
                       2 * (qx * qz + qw * qy)]),
            jnp.stack([2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
                       2 * (qy * qz - qw * qx)]),
            jnp.stack([2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
                       1 - 2 * (qx * qx + qy * qy)]),
        ])
        t = jnp.asarray(tvec, jnp.float32).reshape(3)
        flip = jnp.asarray([1.0, -1.0, -1.0], jnp.float32)[:, None]
        rt = jnp.concatenate([r * flip, (t * flip[:, 0])[:, None]], axis=1)
        view = jnp.concatenate(
            [rt, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0)
        return cls(view=view, fx=jnp.float32(fx), fy=jnp.float32(fy),
                   cx=jnp.float32(cx), cy=jnp.float32(cy),
                   znear=jnp.float32(znear), zfar=jnp.float32(zfar),
                   h=int(h), w=int(w))

    # -- camera-consumer protocol (what ops/projection.py reads) ----------

    @property
    def aspect(self) -> float:
        return self.w / self.h

    def eye(self) -> jax.Array:
        """World-space camera center: view = [R|t] => eye = -Rᵀ t."""
        r = self.view[:3, :3]
        t = self.view[:3, 3]
        return -(r.T @ t)

    def sh_eye(self, stale: bool = False) -> jax.Array:
        """SH ray origin — an SE3 camera has no orbit state to go
        stale, so the flag is an identity here (see Camera.sh_eye)."""
        return self.eye()

    def view_matrix(self) -> jax.Array:
        return self.view

    def intrinsics_px(self):
        return self.fx, self.fy, self.cx, self.cy

    def htanfovxy_focal(self):
        """Orbit-protocol compat: per-axis half-tangents and the y focal.

        With fx≠fy callers should prefer :meth:`intrinsics_px`; the
        'focal' slot returns fy (the reference's focal is defined from
        the VERTICAL fov, src/camera.rs:84-89).
        """
        return (self.w / (2.0 * self.fx), self.h / (2.0 * self.fy),
                self.fy)

    def scaled(self, ss: int) -> "SE3Camera":
        """Resolution scaled by ``ss`` with the field of view unchanged
        (the supersampling transform): every pixel-unit intrinsic scales
        together with h/w."""
        return dataclasses.replace(
            self, h=self.h * ss, w=self.w * ss,
            fx=self.fx * ss, fy=self.fy * ss,
            cx=self.cx * ss, cy=self.cy * ss)

    def projection_matrix(self) -> jax.Array:
        """GL-style projection equivalent to the intrinsics, including
        principal-point offset terms (columns 2): clip = P @ p_cam maps
        to the same pixels as ``intrinsics_px`` under
        camera.ndc_to_pixel."""
        zn, zf = self.znear, self.zfar
        zero = jnp.zeros((), jnp.float32)
        return jnp.stack([
            jnp.stack([2.0 * self.fx / self.w, zero,
                       (2.0 * self.cx / self.w) - 1.0, zero]),
            jnp.stack([zero, 2.0 * self.fy / self.h,
                       1.0 - (2.0 * self.cy / self.h), zero]),
            jnp.stack([zero, zero, -(zf + zn) / (zf - zn),
                       -(2.0 * zf * zn) / (zf - zn)]),
            jnp.stack([zero, zero, -jnp.ones((), jnp.float32), zero]),
        ]).astype(jnp.float32)


def stack_cameras(cams: "list[SE3Camera] | list[Camera]"):
    """Batch a list of same-resolution cameras into one pytree with a
    leading view axis (the ``orbit_trajectory`` shape — what ``fit`` and
    the batch renderers take)."""
    if not cams:
        raise ValueError("stack_cameras: empty list")
    c0 = cams[0]
    if any((c.h, c.w) != (c0.h, c0.w) for c in cams):
        raise ValueError("stack_cameras: all cameras must share h, w "
                         "(static fields shape the output image)")
    return jax.tree.map(lambda *ls: jnp.stack(ls), *cams)


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
