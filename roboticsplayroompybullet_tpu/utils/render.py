"""TPU-native camera observations: a jit/vmap-able raycaster.

The reference renders 200x200 RGB camera images with Bullet's renderer
(reference environments.py:25 `pixels = 200`, 841-843 `getCameraImage` when
`record_images`; global camera environments.py:28-30: target [0, 0.25, 0],
distance 1.3, yaw -30, pitch -30, roll 0, up axis z, FOV 50, aspect 1;
wrist camera environments.py:33-49). There is no mesh pipeline here — the
scene is already analytic primitives (boxes, spheres, plane), so the
natural TPU renderer is a batched primary-ray caster with Lambert shading:
one fused elementwise program over (H*W, n_primitives), jit-clean, vmaps
over env batches, and runs on-device so image observations never require a
host round-trip.

Colors follow complex_scene's visual palette (reference scenes.py:52-56
blue/red blocks, 93-114 wood statics, 133 door, 241-248 button, 406-413
dial).
"""
from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.kinetree import KineTree
from ..models.arms import ArmConfig
from ..models.playroom import Scene
from ..ops import spatial as sp
from ..ops import dynamics as dyn
from ..envs.config import EnvConfig
from ..envs.state import EnvState
from ..envs import physics

# reference camera constants (environments.py:28-30)
CAM_TARGET = (0.0, 0.25, 0.0)
CAM_DISTANCE = 1.3
CAM_YAW = -30.0
CAM_PITCH = -30.0
CAM_FOV = 50.0
PIXELS = 200

_BIG = 1e9


class Camera(NamedTuple):
    eye: jnp.ndarray      # (3,)
    right: jnp.ndarray    # (3,)
    up: jnp.ndarray       # (3,)
    forward: jnp.ndarray  # (3,)
    tan_half_fov: float


def camera_from_yaw_pitch(target=CAM_TARGET, distance=CAM_DISTANCE,
                          yaw=CAM_YAW, pitch=CAM_PITCH,
                          fov=CAM_FOV) -> Camera:
    """Bullet-style orbit camera, up axis z (computeViewMatrixFromYawPitchRoll
    semantics: yaw about +z, pitch tilts toward/away, eye orbits target)."""
    t = jnp.asarray(target, jnp.float32)
    yr, pr = math.radians(yaw), math.radians(pitch)
    # eye offset in world: yaw=0 looks along +y; pitch<0 looks down
    cp, sp_ = math.cos(pr), math.sin(pr)
    cy, sy = math.cos(yr), math.sin(yr)
    back = jnp.array([sy * cp, -cy * cp, -sp_], jnp.float32)  # target->eye
    eye = t + distance * back
    fwd = -back
    world_up = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    right = jnp.cross(fwd, world_up)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)
    return Camera(eye, right, up, fwd, math.tan(math.radians(fov) / 2))


def camera_from_pose(eye, forward, up_hint=(0.0, 0.0, 1.0),
                     fov=CAM_FOV) -> Camera:
    """Free camera (wrist camera path, environments.py:33-49)."""
    eye = jnp.asarray(eye, jnp.float32)
    fwd = jnp.asarray(forward, jnp.float32)
    fwd = fwd / jnp.linalg.norm(fwd)
    hint = jnp.asarray(up_hint, jnp.float32)
    right = jnp.cross(fwd, hint)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-6)
    up = jnp.cross(right, fwd)
    return Camera(eye, right, up, fwd, math.tan(math.radians(fov) / 2))


# ---------------------------------------------------------------------------
# ray-primitive intersections (all batched over rays)
# ---------------------------------------------------------------------------

def _ray_plane_z(o, d, z):
    """t of intersection with plane z=z (inf if parallel/behind)."""
    dz = d[..., 2]
    t = (z - o[..., 2]) / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    return jnp.where((t > 1e-4) & (jnp.abs(dz) > 1e-9), t, _BIG)


def _ray_box(o, d, center, quat, half):
    """Oriented-box slab test. o,d: (R,3); box: (3,), (4,), (3,).
    Returns (t, normal_world) with t=_BIG on miss."""
    ol = sp.quat_rotate_inverse(quat, o - center)
    dl = sp.quat_rotate_inverse(quat, d)
    dl_safe = jnp.where(jnp.abs(dl) < 1e-9, 1e-9, dl)
    t1 = (-half - ol) / dl_safe
    t2 = (half - ol) / dl_safe
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    t_near = jnp.max(tmin, axis=-1)
    t_far = jnp.min(tmax, axis=-1)
    hit = (t_near <= t_far) & (t_far > 1e-4)
    t = jnp.where(t_near > 1e-4, t_near, t_far)
    t = jnp.where(hit, t, _BIG)
    # face normal: axis of t_near, sign of local dir
    ax = jnp.argmax(jnp.where(tmin == t_near[..., None], 1.0, 0.0), axis=-1)
    one_hot = jax.nn.one_hot(ax, 3, dtype=o.dtype)
    n_local = -one_hot * jnp.sign(jnp.take_along_axis(
        dl, ax[..., None], axis=-1))
    n_world = sp.quat_rotate(quat, n_local)
    return t, n_world


def _ray_sphere(o, d, center, radius):
    oc = o - center
    b = jnp.sum(oc * d, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius ** 2
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    t = jnp.where((disc > 0) & (t > 1e-4), t, _BIG)
    n = (o + t[..., None] * d - center)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return t, n


# ---------------------------------------------------------------------------
# scene assembly + shading
# ---------------------------------------------------------------------------

_WOOD = (0.72, 0.58, 0.42)
_BLOCK_COLORS = ((0.0, 0.3, 1.0), (1.0, 0.2, 0.2))   # blue, red
_ART_COLORS = (
    (0.85, 0.75, 0.55),   # drawer
    (0.55, 0.35, 0.2),    # door
    (1.0, 1.0, 1.0),      # button
    (0.2, 0.8, 0.3),      # dial
)
_PLANE_COLOR = (0.45, 0.45, 0.48)
_ARM_COLOR = (0.85, 0.85, 0.88)
_LIGHT = (0.4, -0.35, 0.85)


def render_state(cfg: EnvConfig, tree: KineTree, arm: ArmConfig,
                 scene: Scene, state: EnvState,
                 camera: Optional[Camera] = None,
                 pixels: int = PIXELS,
                 ghosts: Optional[tuple] = None,
                 ghost_boxes: Optional[tuple] = None) -> jnp.ndarray:
    """(pixels, pixels, 3) float32 RGB in [0, 1]. Jit/vmap-clean.

    ghosts: optional (centers (K,3), radii (K,), colors (K,3),
    alphas (K,)) traced arrays — translucent sub-goal marker spheres
    blended over the frame, the analogue of the reference's collision-
    masked rgba-0.3 ghost bodies (environments.py:606-703; scenes.py
    ghostly branches). alpha 0 disables a slot.

    ghost_boxes: optional (centers (K,3), quats (K,4), halves (K,3),
    colors (K,3), alphas (K,)) — translucent ORIENTED-BOX ghosts for
    block sub-goals and the ghost door/drawer/button/dial posed at
    sub-goal joint values (environments.py:684-717). Zero half disables.

    When cfg.show_goal (non-play), desired-goal spheres are rendered
    straight from state.goal — they track every reset_goal_pos like the
    reference's constraint-pinned goal bodies (environments.py:433-452,
    492-516)."""
    cam = camera if camera is not None else camera_from_yaw_pitch()
    H = W = pixels
    iy = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0 - 1.0
    ix = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0
    px, py = jnp.meshgrid(ix, -iy)                       # image plane coords
    d = (cam.forward[None, None]
         + cam.tan_half_fov * (px[..., None] * cam.right[None, None]
                               + py[..., None] * cam.up[None, None]))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d.reshape(-1, 3)                                  # (R,3)
    o = jnp.broadcast_to(cam.eye, d.shape)

    ident = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    boxes = []   # (center, quat, half, color)

    for i in range(scene.static_pos.shape[0]):
        boxes.append((scene.static_pos[i], ident, scene.static_half[i],
                      _WOOD))
    if scene.has_articulated:
        nK = scene.art_boxes_pos.shape[1]
        for k in range(4):
            bpos, bquat = physics.art_box_pose(scene, k, state.art_q)
            for b in range(nK):
                half = scene.art_boxes_half[k, b]
                center = bpos + sp.quat_rotate(bquat,
                                               scene.art_boxes_pos[k, b])
                boxes.append((center, bquat, half, _ART_COLORS[k]))
    for ob in range(cfg.num_objects):
        boxes.append((state.obj_pos[ob], state.obj_quat[ob],
                      scene.block_half, _BLOCK_COLORS[ob % 2]))

    # arm: bone spheres along consecutive link origins
    kin = dyn.fk_vel(tree, state.q, state.qd)
    spheres = []
    n_bone = 3
    for i in range(tree.n_dof):
        p_idx = tree.parent[i]
        a = kin.pos[p_idx] if p_idx >= 0 else tree.base_pos
        b = kin.pos[i]
        for s in range(n_bone):
            f = (s + 1) / n_bone
            spheres.append((a + f * (b - a), 0.045, _ARM_COLOR))

    best_t = _ray_plane_z(o, d, scene.plane_z)
    hit_pt = o + best_t[..., None] * d
    best_n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32),
                              d.shape)
    best_c = jnp.broadcast_to(jnp.asarray(_PLANE_COLOR, jnp.float32),
                              d.shape)

    def consider(best, t, n, color):
        bt, bn, bc = best
        closer = t < bt
        return (jnp.where(closer, t, bt),
                jnp.where(closer[..., None], n, bn),
                jnp.where(closer[..., None],
                          jnp.asarray(color, jnp.float32)[None], bc))

    best = (best_t, best_n, best_c)
    for center, quat, half, color in boxes:
        valid = jnp.sum(half) > 0
        t, n = _ray_box(o, d, center, quat, half)
        t = jnp.where(valid, t, _BIG)
        best = consider(best, t, n, color)
    for center, radius, color in spheres:
        t, n = _ray_sphere(o, d, center, radius)
        best = consider(best, t, n, color)
    best_t, best_n, best_c = best

    light = jnp.asarray(_LIGHT, jnp.float32)
    light = light / jnp.linalg.norm(light)
    lam = jnp.clip(jnp.sum(best_n * light, axis=-1), 0.0, 1.0)
    shade = 0.35 + 0.65 * lam
    sky = jnp.asarray((0.65, 0.75, 0.9), jnp.float32)
    img = jnp.where((best_t < _BIG * 0.5)[..., None],
                    best_c * shade[..., None], sky[None])

    # desired-goal markers (environments.py:433-452): per-goal colored
    # spheres at state.goal, repositioned implicitly on every
    # reset_goal_pos because they read straight from the state
    if cfg.show_goal and not cfg.play:
        for gi in range(cfg.num_goals):
            gp = state.goal[3 * gi: 3 * gi + 3]
            gcol = jnp.asarray(_BLOCK_COLORS[gi % 2], jnp.float32)
            t, _ = _ray_sphere(o, d, gp, 0.03)
            a = jnp.where(t < best_t, 0.45, 0.0)[..., None]
            img = img * (1.0 - a) + gcol[None] * a

    if ghosts is not None:
        g_pos, g_rad, g_col, g_alpha = ghosts
        for k in range(g_pos.shape[0]):
            t, _ = _ray_sphere(o, d, g_pos[k], g_rad[k])
            # visible wherever the ghost is in front of the opaque hit
            a = jnp.where(t < best_t, g_alpha[k], 0.0)[..., None]
            img = img * (1.0 - a) + g_col[k][None] * a

    if ghost_boxes is not None:
        b_pos, b_quat, b_half, b_col, b_alpha = ghost_boxes
        for k in range(b_pos.shape[0]):
            t, _ = _ray_box(o, d, b_pos[k], b_quat[k], b_half[k])
            t = jnp.where(jnp.sum(b_half[k]) > 0, t, _BIG)
            a = jnp.where(t < best_t, b_alpha[k], 0.0)[..., None]
            img = img * (1.0 - a) + b_col[k][None] * a

    return img.reshape(H, W, 3)


def wrist_camera(tree: KineTree, arm: ArmConfig, state: EnvState) -> Camera:
    """Wrist camera pose: ee frame pitched −π/2, forward = rotated x-axis
    (gripper_camera, environments.py:33-49)."""
    kin = dyn.fk_vel(tree, state.q, state.qd)
    from ..envs.obs import ee_state
    pos, quat, _, _ = ee_state(tree, arm, kin)
    rpy = sp.quat_to_euler(quat) + jnp.array([0.0, -jnp.pi / 2, 0.0])
    q2 = sp.quat_from_euler(rpy)
    fwd = sp.quat_rotate(q2, jnp.array([1.0, 0.0, 0.0], jnp.float32))
    up = sp.quat_rotate(q2, jnp.array([0.0, 0.0, 1.0], jnp.float32))
    return camera_from_pose(pos, fwd, up)


def write_png(path: str, img) -> None:
    """Minimal dependency-free PNG writer (8-bit RGB).

    The headless analogue of the reference's live GUI window
    (environments.py:220-224 p.connect(p.GUI)): render('human') streams
    frames to a file a viewer can watch. Pure stdlib (zlib/struct)."""
    import struct
    import zlib

    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)
    h, w = a.shape[:2]
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))

    def chunk(tag, data):
        body = tag + data
        return (struct.pack(">I", len(data)) + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(png)
    os.replace(tmp, path)
