"""Procedural ShapeNet-like shapes + jit-compiled multi-view rendering.

The reference ships Blender scripts that render 5 random views per ShapeNet
model (RGB + mask + depth + camera) and a mesh "densify" step for GT eval
clouds (SURVEY.md §2.2 #22, §3.5). This module is the TPU-native equivalent:
shapes are unions of axis-aligned boxes with category-specific structure
(chair / car / airplane), surface-sampled into point clouds entirely inside
jit, and views are rendered with the dpcx renderer itself at high fidelity
(dense GT cloud, small sigma, thresholded silhouette).

Everything is deterministic in the PRNG key, so the "dataset" is a pure
function of (seed, category, count) — no disk needed for tests, while
dataset.py can persist shards for training runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.geometry.camera import camera_from_view_angles
from dpcx.render.project import pointcloud_project

# --- category templates: each shape = K boxes (center xyz, half-size xyz) ---
# Randomization jitters the template params per model. All shapes fit in the
# [-0.5, 0.5]^3 box, y-up, "front" facing +z (matches SURVEY.md camera setup).


def _chair_boxes(u: jax.Array) -> jax.Array:
    """u: [8] uniform(0,1) jitter -> [7, 6] boxes (4 legs, seat, back,
    one-sided armrest).

    The armrest sits on ONE side only: a perfectly mirror-symmetric shape
    makes azimuth unidentifiable from silhouettes (the unsupervised-pose
    loss admits a reflected solution with identical renders — measured in
    round 2), so every category carries a symmetry-breaking feature, as
    real ShapeNet models do.
    """
    seat_h = 0.04 + 0.02 * u[0]
    seat_w = 0.26 + 0.10 * u[1]
    seat_d = 0.24 + 0.08 * u[2]
    leg_h = 0.12 + 0.06 * u[3]
    leg_t = 0.02 + 0.02 * u[4]
    back_h = 0.15 + 0.08 * u[5]
    back_t = 0.03 + 0.02 * u[6]
    seat_y = -0.5 + 2 * leg_h + seat_h
    lx, lz = seat_w - leg_t, seat_d - leg_t
    legs = [
        [sx * lx, -0.5 + leg_h, sz * lz, leg_t, leg_h, leg_t]
        for sx in (-1, 1)
        for sz in (-1, 1)
    ]
    seat = [0.0, seat_y, 0.0, seat_w, seat_h, seat_d]
    back = [0.0, seat_y + seat_h + back_h, -(seat_d - back_t),
            seat_w, back_h, back_t]
    arm_h = 0.06 + 0.04 * u[7]
    arm = [seat_w - leg_t, seat_y + seat_h + arm_h, 0.0,
           leg_t, arm_h, seat_d * 0.7]
    return jnp.asarray(legs + [seat, back, arm])


def _car_boxes(u: jax.Array) -> jax.Array:
    body_h = 0.10 + 0.04 * u[0]
    body_w = 0.18 + 0.06 * u[1]
    body_l = 0.40 + 0.08 * u[2]
    cab_h = 0.08 + 0.04 * u[3]
    cab_l = body_l * (0.4 + 0.15 * u[4])
    wheel_r = 0.05 + 0.02 * u[5]
    body_y = -0.5 + 2 * wheel_r + body_h
    body = [0.0, body_y, 0.0, body_w, body_h, body_l]
    cabin = [0.0, body_y + body_h + cab_h, -0.05 * body_l,
             body_w * 0.85, cab_h, cab_l]
    wheels = [
        [sx * body_w, -0.5 + wheel_r, sz * body_l * 0.6,
         wheel_r * 0.5, wheel_r, wheel_r]
        for sx in (-1, 1)
        for sz in (-1, 1)
    ]
    # one-sided mirror stalk: symmetry breaker (see _chair_boxes)
    mirror = [body_w + 0.02, body_y + body_h + cab_h * 0.8, cab_l * 0.45,
              0.02, 0.02 + 0.01 * u[6], 0.015]
    return jnp.asarray([body, cabin] + wheels + [mirror])


def _car_asym_boxes(u: jax.Array) -> jax.Array:
    """Identifiability CONTROL variant of the car (POSE_RESULTS findings
    8-9, NOTES round-3 candidate 4): the cab is strongly REAR-SET
    (pickup-truck-like), so the front/back silhouette symmetry — the
    180-degree mirror mode that dominates car pose errors — is broken by
    SHAPE. If unsupervised pose locks here with the same recipe that
    fails on `car`, the car failure is a data-identifiability limit of
    the near-symmetric synthetic family, not a framework limit."""
    body_h = 0.10 + 0.04 * u[0]
    body_w = 0.18 + 0.06 * u[1]
    body_l = 0.40 + 0.08 * u[2]
    cab_h = 0.11 + 0.05 * u[3]  # taller than the sedan cabin
    cab_l = body_l * (0.30 + 0.10 * u[4])
    wheel_r = 0.05 + 0.02 * u[5]
    body_y = -0.5 + 2 * wheel_r + body_h
    body = [0.0, body_y, 0.0, body_w, body_h, body_l]
    # cab centered over the rear axle instead of mid-body
    cabin = [0.0, body_y + body_h + cab_h, -(body_l - cab_l) * 0.85,
             body_w * 0.85, cab_h, cab_l]
    wheels = [
        [sx * body_w, -0.5 + wheel_r, sz * body_l * 0.6,
         wheel_r * 0.5, wheel_r, wheel_r]
        for sx in (-1, 1)
        for sz in (-1, 1)
    ]
    # keep the one-sided mirror stalk so left/right stays broken too
    mirror = [body_w + 0.02, body_y + body_h + cab_h * 0.8,
              -(body_l - cab_l) * 0.85 + cab_l * 0.9,
              0.02, 0.02 + 0.01 * u[6], 0.015]
    return jnp.asarray([body, cabin] + wheels + [mirror])


def _airplane_boxes(u: jax.Array) -> jax.Array:
    fus_r = 0.04 + 0.02 * u[0]
    fus_l = 0.40 + 0.08 * u[1]
    wing_span = 0.35 + 0.12 * u[2]
    wing_c = 0.08 + 0.04 * u[3]
    tail_span = wing_span * (0.35 + 0.1 * u[4])
    fuselage = [0.0, 0.0, 0.0, fus_r, fus_r, fus_l]
    wings = [0.0, 0.0, 0.05 * fus_l, wing_span, fus_r * 0.4, wing_c]
    tail_h = [0.0, 0.0, -(fus_l - wing_c * 0.5), tail_span, fus_r * 0.4,
              wing_c * 0.6]
    tail_v = [0.0, fus_r + 0.06, -(fus_l - wing_c * 0.5), fus_r * 0.3, 0.06,
              wing_c * 0.6]
    # one-sided wing pod: symmetry breaker (see _chair_boxes)
    pod = [wing_span * 0.55, -fus_r * 0.6, 0.05 * fus_l,
           0.03 + 0.01 * u[5], 0.03, 0.06]
    # pad to 7 boxes so every category has static shape [7, 6]
    pad = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    return jnp.asarray([fuselage, wings, tail_h, tail_v, pod, pad, pad])


_CATEGORY_FNS = {"chair": _chair_boxes, "car": _car_boxes,
                 "airplane": _airplane_boxes,
                 "car_asym": _car_asym_boxes}
CATEGORIES = tuple(_CATEGORY_FNS)
# "multi" datasets (BASELINE config 4) cycle the reference's trio only;
# car_asym is appended AFTER so existing category_idx values are stable
MULTI_CATEGORIES = CATEGORIES[:3]


def _sample_box_surface(
    key: jax.Array, boxes: jax.Array, n: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sample n points on the union of box surfaces, area-weighted.

    Returns (points [n, 3], box_idx [n], normals [n, 3]) — box ids and
    outward face normals feed the textured/shaded RGB render (the
    Blender-renders stand-in needs more than silhouette shading)."""
    kb, kf, ku = jax.random.split(key, 3)
    half = boxes[:, 3:]  # [K, 3]
    # face areas per box: 2*(hy*hz), 2*(hx*hz), 2*(hx*hy) pairs -> [K, 6]
    ax = half[:, 1] * half[:, 2]
    ay = half[:, 0] * half[:, 2]
    az = half[:, 0] * half[:, 1]
    areas = jnp.stack([ax, ax, ay, ay, az, az], axis=-1)  # [K, 6]
    flat = areas.reshape(-1)
    probs = flat / jnp.maximum(flat.sum(), 1e-9)
    choice = jax.random.choice(kb, flat.shape[0], (n,), p=probs)
    box_idx, face_idx = choice // 6, choice % 6
    c, h = boxes[box_idx, :3], boxes[box_idx, 3:]
    uv = jax.random.uniform(ku, (n, 2), minval=-1.0, maxval=1.0)
    axis = face_idx // 2  # 0:x, 1:y, 2:z
    sign = jnp.where(face_idx % 2 == 0, 1.0, -1.0)
    # build local offset: fixed coord = sign*h[axis], others = uv*h
    offs = jnp.zeros((n, 3))
    normals = jnp.zeros((n, 3))
    for a in range(3):
        others = [b for b in range(3) if b != a]
        local = jnp.zeros((n, 3))
        local = local.at[:, a].set(sign * h[:, a])
        local = local.at[:, others[0]].set(uv[:, 0] * h[:, others[0]])
        local = local.at[:, others[1]].set(uv[:, 1] * h[:, others[1]])
        offs = jnp.where((axis == a)[:, None], local, offs)
        nrm = jnp.zeros((n, 3)).at[:, a].set(sign)
        normals = jnp.where((axis == a)[:, None], nrm, normals)
    return c + offs, box_idx, normals


@partial(jax.jit, static_argnames=("category", "n"))
def sample_category_surface(
    key: jax.Array, category: str, n: int = 16000
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One model: random jitter + surface-sample -> (points [n, 3],
    box ids [n], outward normals [n, 3])."""
    kj, ks = jax.random.split(key)
    u = jax.random.uniform(kj, (8,))
    boxes = _CATEGORY_FNS[category](u)
    return _sample_box_surface(ks, boxes, n)


def sample_category_points(
    key: jax.Array, category: str, n: int = 16000
) -> jax.Array:
    """GT dense cloud [n, 3] — the analogue of the reference's densified
    GT eval clouds."""
    return sample_category_surface(key, category, n)[0]


def _render_gt_views(
    cfg: Config, points: jax.Array, quats: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Render GT masks + depths for all V views of one model.

    Uses the dpcx renderer at small fixed sigma with a dense cloud, then
    thresholds — the stand-in for Blender's rasterized masks.
    """
    V = quats.shape[0]
    pts = jnp.tile(points[None], (V, 1, 1))
    gt_cfg = cfg.replace(proj_depth=True, proj_type="drc")
    out = pointcloud_project(
        gt_cfg, pts, quats, jnp.asarray(1.0 / cfg.vox_size)
    )
    mask = (out.silhouette > 0.4).astype(jnp.float32)
    depth = jnp.where(mask > 0, out.depth, 1.0)
    return mask, depth


@partial(jax.jit, static_argnames=("cfg", "category", "gt_points"))
def make_model(
    key: jax.Array, cfg: Config, category: str, gt_points: int = 16000
) -> dict:
    """One dataset record: V views of one randomized model.

    Returns dict with images [V, H, W, 3] — TEXTURED, lambertian-shaded
    RGB renders (per-part albedo + procedural stripes + view-dependent
    lighting over a white background — the stand-in for the reference's
    Blender RGB renders, not mere silhouette shading) — plus masks
    [V, D, D], depths [V, D, D], quats [V, 4], gt_points [gt_points, 3].
    """
    kp, kv, kc, kt = jax.random.split(key, 4)
    points, box_idx, normals = sample_category_surface(
        kp, category, gt_points
    )
    ka, ke = jax.random.split(kv)
    V = cfg.num_views
    azim = jax.random.uniform(ka, (V,), minval=0.0, maxval=2 * jnp.pi)
    elev = jax.random.uniform(ke, (V,), minval=0.1, maxval=0.6)
    quats, _ = camera_from_view_angles(azim, elev, cfg.camera_distance)
    masks, depths = _render_gt_views(cfg, points, quats)

    # --- textured RGB appearance ---
    palette = jax.random.uniform(kc, (8, 3), minval=0.15, maxval=0.95)
    if cfg.texture_mode == "lowfreq":
        # Two-tone front/back albedo split (<1 cycle across the object):
        # the pose-identifiability control (VERDICT r2 item 2). The
        # problematic unsupervised-pose gauge is a ~180-deg flip about the
        # vertical axis ((x, z) -> (-x, -z)); a front/back color split is
        # anti-symmetric under exactly that flip, and at <1 spatial cycle
        # it SURVIVES the resize to mask resolution where the rgb loss
        # compares (the round-2 stripes were ~30+ cycles — aliased away
        # at D=32). Soft sigmoid edge; split axis mostly +z with a random
        # tilt so models are not all split identically.
        kd, kf, kb = jax.random.split(kt, 3)
        tilt = 0.35 * jax.random.normal(kd, (2,))
        axis = jnp.asarray([tilt[0], tilt[1], 1.0])
        axis = axis / jnp.linalg.norm(axis)
        t = jax.nn.sigmoid((points @ axis) / 0.06)[:, None]  # [N, 1]
        front = jax.random.uniform(kf, (3,), minval=0.55, maxval=0.95)
        back = jax.random.uniform(kb, (3,), minval=0.05, maxval=0.45)
        # shuffle which channels are bright per half so hue, not just
        # brightness, separates the halves
        two_tone = t * front + (1.0 - t) * back[::-1]
        albedo = 0.4 * palette[box_idx % 8] + 0.6 * two_tone  # [N, 3]
    else:
        stripe_dir = jax.random.normal(kt, (3,))
        stripes = 0.85 + 0.15 * jnp.sin(
            40.0 * points @ (stripe_dir / jnp.linalg.norm(stripe_dir))
        )
        albedo = palette[box_idx % 8] * stripes[:, None]  # [N, 3]
    # per-view lambertian shading: headlight-ish lamp fixed in CAMERA
    # space, rotated into the world frame per view
    from dpcx.geometry.quaternion import (
        quaternion_conjugate,
        quaternion_rotate,
    )

    light_cam = jnp.asarray([0.35, 0.5, 0.79])
    light_world = quaternion_rotate(
        jnp.tile(light_cam, (V, 1, 1)), quaternion_conjugate(quats)
    )  # [V, 1, 3]
    lambert = jnp.abs(
        jnp.einsum("nc,vkc->vn", normals, light_world)
    )  # two-sided
    shade = 0.35 + 0.65 * lambert  # [V, N]
    colors = albedo[None] * shade[..., None]  # [V, N, 3]

    # render expected color through the DRC rgb path + white background
    rgb_cfg = cfg.replace(proj_depth=False, proj_type="drc")
    pts_v = jnp.tile(points[None], (V, 1, 1))
    out = pointcloud_project(
        rgb_cfg, pts_v, quats, jnp.asarray(1.0 / cfg.vox_size), rgb=colors
    )
    img = out.rgb + (1.0 - out.silhouette[..., None])  # white bg
    images = jnp.clip(
        jax.image.resize(
            img, (V, cfg.image_size, cfg.image_size, 3), method="bilinear"
        ),
        0.0,
        1.0,
    )
    return {
        "images": images,
        "masks": masks,
        "depths": depths,
        "quats": quats,
        "gt_points": points,
    }


def make_dataset(
    cfg: Config, num_models: int, seed: int = 0, category: str | None = None,
    gt_points: int = 16000,
    process_index: int | None = None,
    process_count: int | None = None,
) -> dict:
    """Stacked records for ``num_models`` models (host-side loop over the
    jit-compiled per-model generator).

    ``category="multi"`` cycles through all categories (the joint
    multi-category training setup of BASELINE config 4); the per-model
    category index is recorded in ``category_idx``.

    Multi-host datagen (SURVEY.md §5 comm row: "datagen/eval over hosts
    via jax.process_index sharding"): on a multi-process runtime each host
    generates only the strided slice ``process_index::process_count`` of
    the model list — same per-model keys/categories as a single host (the
    global PRNG split happens before slicing), so shards from P hosts
    INTERLEAVE (shard p holds models p, p+P, p+2P, ...) back to exactly
    the 1-host dataset; plain concatenation permutes model order.
    Defaults read
    ``jax.process_index()/count()``; pass explicitly to test without a
    cluster.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    category = category or cfg.category
    keys = jax.random.split(jax.random.PRNGKey(seed), num_models)
    if category == "multi":
        cats = [
            MULTI_CATEGORIES[i % len(MULTI_CATEGORIES)]
            for i in range(num_models)
        ]
    else:
        if category not in _CATEGORY_FNS:
            category = "chair"
        cats = [category] * num_models
    mine = range(process_index, num_models, process_count)
    records = [make_model(keys[i], cfg, cats[i], gt_points) for i in mine]
    out = jax.tree.map(lambda *xs: jnp.stack(xs), *records)
    out["category_idx"] = jnp.asarray(
        [CATEGORIES.index(cats[i]) for i in mine], jnp.int32
    )
    return out
