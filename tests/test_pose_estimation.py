"""Native gravity-aware absolute pose: recovery on synthetic scenes.

The reference delegates to poselib/pycolmap (external native code); this
checks our native 2-point-gravity RANSAC + Gauss-Newton refinement and the
DLT PnP fallback recover known poses, including under outliers.
"""

import numpy as np
import pytest

from geocalib_tpu.pose_estimation import (
    estimate_absolute_pose,
    estimate_absolute_pose_gravity,
    project,
    quat_from_matrix,
    refine_pose_gravity,
    rotation_aligning,
    rot_z,
)

CAM = {"model": "PINHOLE", "width": 640, "height": 480, "params": [500.0, 500.0, 320.0, 240.0]}
G_W = np.array([0.0, 0.0, -1.0])


def _scene(seed=0, n=100, noise=0.0, outliers=0.0):
    rng = np.random.default_rng(seed)
    # ground-truth pose: modest rotation, camera looking at the cloud
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0.1, 0.6)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    t = rng.uniform(-1, 1, 3) + np.array([0, 0, 4.0])

    X = rng.uniform(-2, 2, (n, 3))
    cam_pts = (R @ X.T).T + t
    p2d, valid = project(cam_pts, CAM)
    X, p2d = X[valid], p2d[valid]
    if noise:
        p2d = p2d + rng.normal(0, noise, p2d.shape)
    n_out = int(outliers * len(p2d))
    if n_out:
        idx = rng.choice(len(p2d), n_out, replace=False)
        p2d[idx] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    g_cam = R @ G_W  # gravity direction seen in the camera
    return R, t, X, p2d, g_cam


def _pose_errors(R_est, t_est, R, t):
    dR = R_est @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    return ang, np.linalg.norm(t_est - t)


def test_gravity_minimal_exact():
    R, t, X, p2d, g_cam = _scene(seed=1)
    ret = estimate_absolute_pose_gravity(p2d, X, CAM, g_cam, G_W, max_reproj_error=2.0)
    assert ret["success"] and ret["num_inliers"] > 0.95 * len(p2d)
    ang, terr = _pose_errors(ret["R"], ret["tvec"], R, t)
    assert ang < 0.1 and terr < 0.01


def test_gravity_ransac_with_outliers_and_refinement():
    R, t, X, p2d, g_cam = _scene(seed=2, noise=0.5, outliers=0.3)
    ret = estimate_absolute_pose_gravity(p2d, X, CAM, g_cam, G_W, max_reproj_error=4.0)
    assert ret["success"]
    R2, t2 = refine_pose_gravity(
        ret["R"], ret["tvec"], p2d, X, CAM, ret["inliers"],
        gravity_cam=g_cam, gravity_world=G_W, gravity_weight=50_000.0,
    )
    ang, terr = _pose_errors(R2, t2, R, t)
    assert ang < 0.5 and terr < 0.05


def test_pnp_dlt_fallback():
    R, t, X, p2d, _ = _scene(seed=3)
    ret = estimate_absolute_pose(p2d, X, CAM, max_reproj_error=2.0)
    assert ret["success"]
    ang, terr = _pose_errors(ret["R"], ret["tvec"], R, t)
    assert ang < 0.5 and terr < 0.05


def test_quaternion_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        v = rng.normal(size=3)
        R = rotation_aligning(v, rng.normal(size=3)) @ rot_z(rng.uniform(-3, 3))
        q = quat_from_matrix(R)
        assert abs(np.linalg.norm(q) - 1) < 1e-9
        # rebuild matrix from quaternion and compare
        w, x, y, z = q
        R2 = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        np.testing.assert_allclose(R2, R, atol=1e-8)


def test_estimator_driver_with_stub_calibrator():
    """Full driver path with a stub calibrate() (no network weights)."""
    from geocalib_tpu.pose_estimation import AbsolutePoseEstimator, PoseOpts

    R, t, X, p2d, g_cam = _scene(seed=4, noise=0.3)

    class StubCalib:
        def calibrate(self, image, priors=None):
            class G:  # minimal Gravity stand-in
                vec3d = g_cam.astype(np.float32)

            return {"gravity": G(), "gravity_uncertainty": np.float32(0.01)}

    est = AbsolutePoseEstimator(PoseOpts(), calibrator=StubCalib())
    ret, calib = est(np.zeros((32, 32, 3), np.float32), p2d, X, CAM)
    assert ret["success"]
    ang, terr = _pose_errors(ret["R"], ret["tvec"], R, t)
    assert ang < 0.5 and terr < 0.05
    np.testing.assert_allclose(calib["gravity_vec"], g_cam, atol=1e-6)
