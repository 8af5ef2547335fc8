"""On-device HHA encoding vs geometric ground truth on synthetic depth
(SURVEY.md section 4: 'HHA encoding vs a tiny golden depth image')."""

import jax
import jax.numpy as jnp
import numpy as np

from mcseg_tpu.ops.hha import (
    CameraIntrinsics,
    _normals,
    _point_cloud,
    depth_to_hha,
    depth_to_hha_batch,
    estimate_gravity,
)

H, W = 48, 64
K = CameraIntrinsics(fx=60.0, fy=60.0, cx=W / 2, cy=H / 2)


def _floor_depth():
    """A camera looking straight at a horizontal floor 1.5 m below, tilted so
    depth = cam_height * fy / (v - cy) for v > cy (classic ground plane)."""
    v = np.arange(H, dtype=np.float32)[:, None] + np.zeros((1, W), np.float32)
    cam_h = 1.5
    denom = v - K.cy
    depth = np.where(denom > 3, cam_h * K.fy / np.maximum(denom, 3), 0.0)
    return depth.astype(np.float32)


def _wall_depth(z=2.0):
    return np.full((H, W), z, np.float32)


def test_point_cloud_geometry():
    depth = jnp.asarray(_wall_depth(2.0))
    x, y, z = _point_cloud(depth, K)  # plane layout (see ops/hha.py)
    # center pixel maps to the optical axis
    c = [float(x[H // 2, W // 2]), float(y[H // 2, W // 2]), float(z[H // 2, W // 2])]
    np.testing.assert_allclose(c, [0, 0, 2.0], atol=2e-2 * 2)
    # +Y must point UP (smaller v = upper image = positive Y)
    assert float(y[0, W // 2]) > 0


def test_wall_normals_face_camera():
    depth = jnp.asarray(_wall_depth())
    _, _, nz = _normals(_point_cloud(depth, K))
    # frontal wall -> normal ~ (0, 0, -1) (toward camera)
    np.testing.assert_allclose(np.asarray(nz)[4:-4, 4:-4], -1.0, atol=1e-3)


def test_gravity_on_floor_scene_points_up():
    depth = jnp.asarray(_floor_depth())
    valid = depth > 0
    pts = _point_cloud(jnp.where(valid, depth, 1e3), K)
    n = _normals(pts)
    g = np.asarray(estimate_gravity(n, valid))
    # floor normals point up -> gravity estimate ~ +Y
    assert g[1] > 0.95, g


def test_hha_channels_ranges_and_semantics():
    depth = jnp.asarray(_floor_depth())
    hha = np.asarray(depth_to_hha(depth, K))
    assert hha.shape == (H, W, 3)
    assert hha.min() >= 0.0 and hha.max() <= 255.0
    valid = np.asarray(depth) > 0
    # disparity decreases with depth
    d = np.asarray(depth)
    rows = np.where(valid.any(axis=1))[0]
    r_near, r_far = rows.max(), rows.min() + 1
    assert hha[r_near, W // 2, 0] > hha[r_far, W // 2, 0]
    # floor pixels: normal ~ parallel to gravity -> angle ~ 0 deg -> channel ~38
    mid = hha[(r_near + r_far) // 2, W // 2, 2]
    assert mid < 60, mid
    # height above the floor ~ 0 everywhere on the floor
    assert np.median(hha[valid, 1]) < 30


def test_hha_wall_angle_is_orthogonal():
    # vertical wall: normal horizontal -> angle(gravity) ~ 90 deg -> ~128
    depth = jnp.asarray(_wall_depth())
    hha = np.asarray(depth_to_hha(depth, K))
    inner = hha[8:-8, 8:-8, 2]
    assert abs(np.median(inner) - 128.0) < 10, np.median(inner)


def test_hha_invalid_pixels_zero():
    depth = _wall_depth()
    depth[:10] = 0.0
    hha = np.asarray(depth_to_hha(jnp.asarray(depth), K))
    np.testing.assert_array_equal(hha[:5], 0.0)


def test_hha_batch_matches_single():
    d1, d2 = _floor_depth(), _wall_depth()
    batched = np.asarray(depth_to_hha_batch(jnp.asarray(np.stack([d1, d2])), K))
    single = np.asarray(depth_to_hha(jnp.asarray(d1), K))
    np.testing.assert_allclose(batched[0], single, atol=1e-4)


def test_hha_jit_compiles():
    f = jax.jit(lambda d: depth_to_hha_batch(d, K))
    out = f(jnp.asarray(np.stack([_wall_depth()] * 2)))
    assert out.shape == (2, H, W, 3)


def test_prepare_hha_tool_matches_on_device_encoder(tmp_path):
    """tools/prepare_hha CLI: 16-bit mm depth PNGs -> uint8 HHA PNGs equal to
    the on-device encoder's output (offline == online by construction)."""
    import os

    from PIL import Image

    from mcseg_tpu.ops.hha import default_intrinsics, depth_to_hha_batch
    from mcseg_tpu.tools.prepare_hha import main

    rng = np.random.RandomState(0)
    dmm = (rng.rand(2, 24, 32) * 4000 + 500).astype(np.uint16)
    ddir, odir = tmp_path / "depth", tmp_path / "hha"
    os.makedirs(ddir)
    for i in range(2):
        Image.fromarray(dmm[i]).save(ddir / f"{i:04d}.png")
    main([str(ddir), str(odir)])

    want = np.asarray(depth_to_hha_batch(
        jnp.asarray(dmm.astype(np.float32) / 1000.0),
        default_intrinsics(24, 32))).astype(np.uint8)
    for i in range(2):
        got = np.asarray(Image.open(odir / f"{i:04d}.png"))
        np.testing.assert_array_equal(got, want[i])
