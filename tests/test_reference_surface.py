"""Reference-API attribute surface of the GPMPC wrapper.

A user migrating from the reference may poke at controller internals the
reference sets as instance attributes (/root/reference/gpmpc/gpmpc.py:35-92,
366-367: gaussian_process, gp_idx, traj_step, x_prev/u_prev in (nx, T+1)
orientation, ref_action, lqr_gain, inverse_cdf). The wrapper exposes each as
a read-only view over its real state so those call sites keep working.
"""

import numpy as np

from gpmpc_tpu.control.gpmpc import GPMPC
from gpmpc_tpu.envs import cartpole_env
from gpmpc_tpu.models import cartpole


def _make():
    env = cartpole_env.CartpoleTrackEnv(cartpole_env.EnvParams.default())
    model = cartpole.symbolic_cartpole(dt=0.02)
    ctrl = GPMPC(
        model, env.trajectory, None, horizon=8,
        q_mpc=[5.0, 0.1, 20.0, 0.5], r_mpc=[0.05],
        sparse_gp=True, max_gp_samples=10, seed=1, max_gp_points=32,
        sqp_iters=3, qp_iters=6,
        bounds=(cartpole.state_bounds(), cartpole.input_bounds()),
    )
    return env, ctrl


def test_reference_attribute_surface():
    env, ctrl = _make()
    T, nx, nu = 8, 4, 1

    # pre-training / pre-solve states mirror the reference's None sentinels
    assert ctrl.gaussian_process is None   # ≙ gpmpc.py:60
    assert ctrl.x_prev is None and ctrl.u_prev is None  # ≙ gpmpc.py:91-92
    assert ctrl.traj_step == 0
    assert ctrl.gp_idx == [[0, 2, 3], [1, 2, 3]]
    assert ctrl.ref_action.shape == (nu, T)  # ≙ ref_action (nu, T)
    assert ctrl.lqr_gain.shape == (nu, nx)
    assert np.isfinite(ctrl.inverse_cdf) and ctrl.inverse_cdf > 0

    rng = np.random.default_rng(0)
    xi = rng.normal(0, 0.3, (16, ctrl.spec.z_dim)).astype(np.float32)
    ti = rng.normal(0, 0.3, (16, ctrl.spec.num_gps)).astype(np.float32)
    ctrl.train_gp(xi, ti, lr=0.05, iterations=10)
    assert ctrl.gaussian_process is not None

    obs, _ = env.reset(seed=0)
    ctrl.select_action(np.asarray(obs))
    assert ctrl.traj_step == 1
    # reference orientation: (nx, T+1) / (nu, T)  (≙ gpmpc.py:366-367)
    assert ctrl.x_prev.shape == (nx, T + 1)
    assert ctrl.u_prev.shape == (nu, T)
    # reset clears the rollout state (≙ gpmpc.py:110-111)
    ctrl.reset()
    assert ctrl.traj_step == 0 and ctrl.x_prev is None
