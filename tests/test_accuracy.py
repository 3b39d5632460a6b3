"""Control-sequence accuracy: production settings vs a high-accuracy oracle.

BASELINE.md's parity bar is control-sequence RMSE <= 1e-3 against a
fully-converged solver at the same horizon. acados cannot run in this image
(tests/oracles/test_acados_parity.py covers it where it can); here the oracle is
this framework's own solver pushed to convergence — float64, 25 SQP x 30 IP
iterations — which bounds the combined float32 + truncated-iteration error of the
production configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.control.mpc import MPC
from gpmpc_tpu.envs.drone import DroneFigureEightEnv
from gpmpc_tpu.models.quadrotor import TRUE_PARAMS
from gpmpc_tpu.models.symbolic import symbolic_attitude

Q = [8, 0.1, 8, 0.1, 8, 0.1, 0.5, 0.5, 0.5, 0.001, 0.001, 0.001]
R = [3, 3, 3, 0.1]


def test_production_solver_meets_1e3_control_rmse():
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=TRUE_PARAMS)

    # High-accuracy oracle: full convergence budget.
    oracle = MPC(model, env.trajectory, Q, R, horizon=25, sqp_iters=25, qp_iters=30)
    # Production configuration (bench defaults).
    prod = MPC(model, env.trajectory, Q, R, horizon=25, sqp_iters=6, qp_iters=10)

    obs, _ = env.reset(seed=0)
    oracle.reset()
    prod.reset()
    u_oracle, u_prod = [], []
    for _ in range(15):
        uo = oracle.select_action(obs)
        up = prod.select_action(obs)
        u_oracle.append(uo)
        u_prod.append(up)
        # advance along the oracle's closed loop so both see identical states
        obs, _, _, _, _ = env.step(uo)

    rmse = np.sqrt(np.mean((np.asarray(u_oracle) - np.asarray(u_prod)) ** 2))
    assert rmse <= 1e-3, f"control-sequence RMSE {rmse} exceeds the 1e-3 parity bar"


def test_lanes_backend_meets_1e3_control_rmse():
    """The Pallas lanes backend against the XLA path over a closed loop."""
    from gpmpc_tpu.control import gpmpc as gpmpc_mod
    from gpmpc_tpu.control import mpc as mpc_mod
    from gpmpc_tpu.control.gpmpc import GPMPC
    from gpmpc_tpu.envs.drone import env_step, env_reset

    prior = {"a": 12.1432, "b": 1.8118, "c": -72.08, "d": -7.5755,
             "e": 39.8653, "f": -72.08, "h": -7.5755, "l": 39.8653}
    env = DroneFigureEightEnv()
    model = symbolic_attitude(dt=0.02, params=prior)
    ctrl = GPMPC(model, env.trajectory, prior, horizon=8, q_mpc=Q, r_mpc=R,
                 sparse_gp=True, max_gp_samples=8, seed=0, max_gp_points=32,
                 sqp_iters=3, qp_iters=8)
    rng = np.random.default_rng(0)
    ctrl.train_gp(rng.normal(0, 0.3, (16, 7)).astype(np.float32),
                  rng.normal(0, 0.3, (16, 3)).astype(np.float32), lr=0.05, iterations=20)

    es, obs = env_reset(env.p, jax.random.PRNGKey(0))
    st_x = mpc_mod.init_state(8, 12, 4)
    st_l = jax.tree.map(lambda a: a[None], st_x)  # batch of 1 for the lanes path
    us_x, us_l = [], []
    for _ in range(4):
        u_x, st_x, _ = gpmpc_mod.select_action(
            model, ctrl.cfg, ctrl.consts, ctrl.gp_model, st_x, obs
        )
        u_l, st_l, _ = gpmpc_mod.batched_select_action_lanes(
            model, ctrl.cfg, ctrl.consts, ctrl.gp_model, st_l, obs[None], interpret=True
        )
        us_x.append(np.asarray(u_x))
        us_l.append(np.asarray(u_l[0]))
        es, obs, _, _, _ = env_step(env.p, es, u_x)
    rmse = np.sqrt(np.mean((np.asarray(us_x) - np.asarray(us_l)) ** 2))
    assert rmse <= 1e-3, rmse
