"""On-device depth -> HHA encoding.

The reference loads HHA PNGs precomputed offline with the Gupta et al. recipe
(*Learning Rich Features from RGB-D Images*, ECCV 2014 — SURVEY.md section
3.4); BASELINE.json's north star explicitly moves the encoding on-device as
part of the fused preprocessing path. This is a fully jit-compatible
implementation: every step is dense vectorized math (finite differences,
3x3 eigendecomposition, elementwise trig), so XLA fuses it with the rest of
preprocessing and it runs on the VPU with no host round-trip.

Pipeline per image:
  1. back-project depth to a camera-space point cloud via intrinsics;
  2. surface normals from central-difference tangent vectors (cross product),
     oriented toward the camera;
  3. iterative gravity estimation (3 rounds a la Gupta): aligned/orthogonal
     normal sets by angle threshold -> gravity = dominant eigenvector of
     (sum_par n n^T - sum_perp n n^T);
  4. channels:  H  disparity  = 31000 / depth_mm
                H  height     = height above the lowest gravity-aligned
                                point, in cm
                A  angle      = angle(normal, gravity) in degrees + 38
     each clipped to [0, 255] — i.e. an image-like uint8 range, so HHA is
     normalized downstream exactly like an RGB image (reference behavior).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CameraIntrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float

    def scaled(self, sx: float, sy: float) -> "CameraIntrinsics":
        return CameraIntrinsics(self.fx * sx, self.fy * sy, self.cx * sx, self.cy * sy)


# NYUDv2 Kinect intrinsics (Silberman toolbox), for 640x480 frames.
NYU_INTRINSICS = CameraIntrinsics(fx=582.62, fy=582.69, cx=313.04, cy=238.44)


def default_intrinsics(h: int, w: int) -> CameraIntrinsics:
    """Scale the NYU Kinect intrinsics to an arbitrary frame size."""
    return NYU_INTRINSICS.scaled(w / 640.0, h / 480.0)


def _point_cloud(depth: jnp.ndarray, K: CameraIntrinsics) -> jnp.ndarray:
    """[H,W] meters -> [H,W,3] camera-space points, +Y pointing UP."""
    h, w = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x = (u - K.cx) * depth / K.fx
    y = -(v - K.cy) * depth / K.fy  # image v grows down; flip so +Y is up
    return jnp.stack([x, y, depth], axis=-1)


def _central_diff(p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Central differences with edge replication, [H,W,3] along H or W."""
    fwd = jnp.roll(p, -1, axis=axis)
    bwd = jnp.roll(p, 1, axis=axis)
    d = (fwd - bwd) * 0.5
    # fix the wrap-around rows/cols with one-sided differences
    if axis == 0:
        d = d.at[0].set(p[1] - p[0]).at[-1].set(p[-1] - p[-2])
    else:
        d = d.at[:, 0].set(p[:, 1] - p[:, 0]).at[:, -1].set(p[:, -1] - p[:, -2])
    return d


def _normals(points: jnp.ndarray) -> jnp.ndarray:
    """Unit surface normals oriented toward the camera, [H,W,3]."""
    du = _central_diff(points, axis=1)
    dv = _central_diff(points, axis=0)
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-8)
    # orient toward camera: the view ray is `points`; want n . view < 0
    flip = jnp.sum(n * points, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def estimate_gravity(
    normals: jnp.ndarray, valid: jnp.ndarray, n_iter: int = 3
) -> jnp.ndarray:
    """Iterative gravity direction (unit vector, roughly +Y/up).

    Gupta et al.'s scheme: normals within `thr` of the current gravity
    estimate are 'parallel' (floors/ceilings), those within `thr` of its
    orthogonal plane are 'perpendicular' (walls); the refined gravity is the
    dominant eigenvector of  sum_par n n^T - sum_perp n n^T. Thresholds
    anneal 45 -> 15 degrees over iterations.
    """
    g = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    w = valid.astype(jnp.float32)[..., None]
    nw = normals * w
    thresholds = jnp.linspace(45.0, 15.0, n_iter) * jnp.pi / 180.0

    def body(i, g):
        thr = thresholds[i]
        cos = jnp.abs(jnp.sum(normals * g, axis=-1))
        cos = jnp.clip(cos, -1.0, 1.0)
        ang = jnp.arccos(cos)
        par = (ang < thr)[..., None].astype(jnp.float32) * nw
        perp = (ang > (jnp.pi / 2 - thr))[..., None].astype(jnp.float32) * nw
        flat_par = par.reshape(-1, 3)
        flat_perp = perp.reshape(-1, 3)
        m = flat_par.T @ flat_par - flat_perp.T @ flat_perp
        _, vecs = jnp.linalg.eigh(m)  # ascending eigenvalues
        cand = vecs[:, -1]
        cand = jnp.where(jnp.sum(cand * g) < 0, -cand, cand)  # keep pointing up
        return cand / jnp.maximum(jnp.linalg.norm(cand), 1e-8)

    return jax.lax.fori_loop(0, n_iter, body, g)


def depth_to_hha(
    depth: jnp.ndarray,  # [H, W] meters, 0 / non-finite = missing
    intrinsics: CameraIntrinsics | None = None,
) -> jnp.ndarray:
    """Encode one depth map to HHA, float32 [H, W, 3] in [0, 255]."""
    h, w = depth.shape
    K = intrinsics or default_intrinsics(h, w)
    valid = jnp.isfinite(depth) & (depth > 1e-3)
    d = jnp.where(valid, depth, 1e3)  # missing -> far away

    points = _point_cloud(d, K)
    normals = _normals(points)
    g = estimate_gravity(normals, valid)

    # H1: horizontal disparity
    disparity = 31000.0 / (d * 1000.0)
    # H2: height above the lowest observed point along gravity, in cm
    height = jnp.sum(points * g, axis=-1)
    floor = jnp.min(jnp.where(valid, height, jnp.inf))
    floor = jnp.where(jnp.isfinite(floor), floor, 0.0)
    height_cm = (height - floor) * 100.0
    # A: angle between normal and gravity, degrees, shifted into uint8 range
    cos_a = jnp.clip(jnp.sum(normals * g, axis=-1), -1.0, 1.0)
    angle = jnp.degrees(jnp.arccos(cos_a)) + 38.0

    hha = jnp.stack([disparity, height_cm, angle], axis=-1)
    hha = jnp.where(valid[..., None], hha, 0.0)
    return jnp.clip(hha, 0.0, 255.0)


def depth_to_hha_batch(
    depth: jnp.ndarray,  # [B, H, W]
    intrinsics: CameraIntrinsics | None = None,
) -> jnp.ndarray:
    """Batched HHA encode, [B, H, W, 3] in [0, 255]."""
    if intrinsics is None:
        intrinsics = default_intrinsics(depth.shape[1], depth.shape[2])
    return jax.vmap(lambda d: depth_to_hha(d, intrinsics))(depth)
