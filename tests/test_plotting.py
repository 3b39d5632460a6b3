"""Plotting surface: artifact-set parity with the reference output files."""

import numpy as np

from gpmpc_tpu.utils.plotting import get_runtime, make_quad_plots, plot_quad_eval


def fake_run(n_steps=40, nx=12, nu=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "obs": rng.normal(size=(n_steps, nx)),
        "action": rng.normal(size=(n_steps, nu)),
        "reward": rng.normal(size=n_steps),
        "inference_time_data": list(rng.uniform(0.001, 0.01, n_steps)),
    }


def test_make_quad_plots_artifacts(tmp_path):
    test_runs = {0: fake_run(seed=0), 1: fake_run(seed=1), 2: fake_run(seed=2)}
    train_runs = {0: fake_run(seed=3), 1: fake_run(seed=4), 2: fake_run(seed=5)}
    traj = np.random.default_rng(9).normal(size=(40, 12))
    make_quad_plots(test_runs, train_runs, traj, tmp_path)
    figs = tmp_path / "figs"
    expected = (
        ["xyz_path.png", "runtime.png", "runtime.csv"]
        + [f"x{i}.png" for i in range(12)]
        + [f"u{i}.png" for i in range(4)]
    )
    for name in expected:  # same artifact names as the reference bundle
        assert (figs / name).exists(), name


def test_plot_quad_eval_artifact(tmp_path):
    run = fake_run(seed=1)
    reference = np.random.default_rng(2).normal(size=(12, 40))
    plot_quad_eval(run, reference, dt=0.02, save_path=tmp_path)
    assert (tmp_path / "state_trajectories.png").exists()


def test_get_runtime_drops_first_sample():
    runs = {0: fake_run(seed=0)}
    out = get_runtime(runs, runs)
    expect = np.asarray(runs[0]["inference_time_data"][1:])
    np.testing.assert_allclose(out["mean"][0], expect.mean())
    np.testing.assert_allclose(out["max"][0], expect.max())


def test_plot_learning_curve_band_artifacts(tmp_path):
    import numpy as np

    from gpmpc_tpu.utils.plotting import plot_learning_curve_band

    costs = np.array([[3.0, 3.2, 2.9], [1.0, 1.1, 0.9], [0.5, 0.6, 0.4]])
    plot_learning_curve_band(costs, [0, 15, 30], "learning_curve_seeds", tmp_path)
    assert (tmp_path / "learning_curve_seeds.png").exists()
    csv = (tmp_path / "learning_curve_seeds.csv").read_text().splitlines()
    assert csv[0].lstrip("# ").strip() == "train_steps,mean,std,min,max"
    row1 = [float(v) for v in csv[2].split(",")]  # epoch-1 row
    assert row1[0] == 15.0 and abs(row1[1] - 1.0) < 1e-6
    assert row1[3] == 0.9 and row1[4] == 1.1
