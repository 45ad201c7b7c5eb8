"""Distributed BA correctness: landmark-sharded solve matches single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visual_odometry_ros_tpu.ops import ba
from visual_odometry_ros_tpu.parallel import dist_ba
from visual_odometry_ros_tpu.parallel.mesh import make_mesh

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location("ba_fixtures", __file__.replace("test_dist_ba.py", "test_ba.py"))
_bafix = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_bafix)


@pytest.mark.parametrize("stereo", [False, True])
def test_distributed_matches_single_device(rng, stereo):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    problem, T_gt, X_gt, T_rl = _bafix._make_window(rng, stereo=stereo)
    # M=256 divisible by 8.

    res_single = ba.ba_solve(problem, _bafix.FX, _bafix.FY, _bafix.CX, _bafix.CY, jnp.asarray(T_rl))

    mesh = make_mesh(8)
    solve = dist_ba.make_distributed_ba(mesh)
    res_dist = solve(problem, _bafix.FX, _bafix.FY, _bafix.CX, _bafix.CY, jnp.asarray(T_rl))

    # Agreement up to f32 reduction order.
    np.testing.assert_allclose(np.asarray(res_dist.T_cw), np.asarray(res_single.T_cw), atol=2e-4)
    np.testing.assert_allclose(np.asarray(res_dist.Xw), np.asarray(res_single.Xw), atol=5e-3)
    assert abs(float(res_dist.mean_err_px) - float(res_single.mean_err_px)) < 1e-3
    assert int(res_dist.n_obs) == int(res_single.n_obs)

    # And it actually converges (not just agrees).
    et, er = _bafix._pose_errors(np.asarray(res_dist.T_cw), T_gt, 8)
    assert et[2:].max() < 0.03


def test_distributed_ba_mesh_sizes(rng):
    """Same problem over 2- and 4-device meshes: results consistent."""
    problem, T_gt, X_gt, T_rl = _bafix._make_window(rng)
    outs = []
    for n in (2, 4):
        mesh = make_mesh(n)
        solve = dist_ba.make_distributed_ba(mesh)
        res = solve(problem, _bafix.FX, _bafix.FY, _bafix.CX, _bafix.CY, jnp.asarray(T_rl))
        outs.append(np.asarray(res.T_cw))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)
