

def test_al_resamples_arbitrary_length_init_near_margin():
    """al_traj_optimize must accept planner inits of any length
    (regression: a 70-waypoint RRT path at N_WAYPOINTS=60 crashed with a
    broadcast error — the only optimizer core without _resample_init).
    Variant with scores near the margin (-10)."""
    import jax.numpy as jnp
    from diffco_tpu import optim
    from diffco_tpu.robots import RevolutePlanarRobot

    robot = RevolutePlanarRobot(1.0, link_width=0.3, dof=2)

    def dist_est(q):
        return jnp.sum(q * q, axis=-1) - 10.0  # always "free"

    s = jnp.zeros(2)
    t = jnp.ones(2)
    init = jnp.linspace(s, t, 13)  # deliberately != N_WAYPOINTS
    rec = optim.al_traj_optimize(robot, dist_est, s, t, {
        'N_WAYPOINTS': 8, 'NUM_RE_TRIALS': 1, 'MAXITER': 10,
        'safety_margin': 0.0, 'max_speed': 2.0, 'seed': 0,
        'init_solution': init})
    assert len(rec['solution']) == 8


def test_al_resamples_arbitrary_length_init():
    """al_traj_optimize must accept planner inits of any length
    (regression: a 70-waypoint RRT path at N_WAYPOINTS=60 crashed with a
    broadcast error — the only optimizer core without _resample_init)."""
    import jax.numpy as jnp
    from diffco_tpu import optim
    from diffco_tpu.robots import RevolutePlanarRobot

    robot = RevolutePlanarRobot(1.0, link_width=0.3, dof=2)

    def dist_est(q):
        return jnp.sum(q * q, axis=-1) - 100.0  # always "free"

    s = jnp.zeros(2)
    t = jnp.ones(2)
    init = jnp.linspace(s, t, 13)  # deliberately != N_WAYPOINTS
    rec = optim.al_traj_optimize(robot, dist_est, s, t, {
        'N_WAYPOINTS': 8, 'NUM_RE_TRIALS': 1, 'MAXITER': 10,
        'safety_margin': 0.0, 'max_speed': 2.0, 'seed': 0,
        'init_solution': init})
    assert len(rec['solution']) == 8


def test_trustconstr_free_waypoints():
    """options['free_waypoints']=K optimizes K control points but returns
    (and constrains) the full N_WAYPOINTS interpolated path: solution
    shape, pinned endpoints, feasibility on an easy world, and the
    control rows must actually steer the dense rows (interp contract)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from diffco_tpu import optim
    from diffco_tpu.robots import RevolutePlanarRobot
    from diffco_tpu.geometry import Obstacles2D, planar_robot_signed_dist

    robot = RevolutePlanarRobot(3.5, link_width=0.3, dof=2)
    obs = Obstacles2D.from_obstacle_list([('circle', (5.0, 5.0), 1.0)])

    def dist_est(q):
        return jnp.max(planar_robot_signed_dist(robot, obs, q), axis=-1)

    start = jnp.asarray([-2.0, 0.5])
    target = jnp.asarray([2.0, -0.5])
    options = {
        'N_WAYPOINTS': 12, 'NUM_RE_TRIALS': 1, 'MAXITER': 80,
        'safety_margin': -0.1, 'max_speed': 1.5, 'seed': 0, 'num_sub': 3,
        'free_waypoints': 5,
    }
    rec = optim.trustconstr_traj_optimize(robot, dist_est, start, target,
                                          options)
    sol = np.asarray(rec['solution'])
    assert sol.shape == (12, 2)
    assert np.allclose(sol[0], np.asarray(start), atol=1e-6)
    assert np.allclose(sol[-1], np.asarray(target), atol=1e-6)
    assert rec['feasible'], 'easy world must be feasible at K=5'
    # the 12-row path is a piecewise-linear function of 5 controls: the
    # second derivative along each control segment must vanish (rows
    # strictly inside a control segment are collinear)
    t = np.linspace(0.0, 4.0, 12)
    seg = np.minimum(t.astype(int), 3)
    inner = (seg[1:-1] == seg[:-2]) & (seg[1:-1] == seg[2:])
    d2 = sol[:-2] - 2 * sol[1:-1] + sol[2:]
    assert np.allclose(d2[inner], 0.0, atol=1e-5)


def test_al_feasibility_restoration_closes_residual_violation():
    """The restoration epilogue (optim._al_traj_core restore_iters) must
    close the mm-scale residual the AL outer loop leaves when the
    collision constraint is active at the optimum (measured on
    baxter_default: benchmarks/baxter_al_budget.json — violation decays
    22mm -> 0.3mm over a 16x budget sweep but plateaus above the 1e-4
    strict gate). Starved-budget AL on a disk obstacle reproduces the
    plateau deterministically; restoration alone must reach the gate."""
    import jax.numpy as jnp
    import numpy as np
    from diffco_tpu import optim

    class PointRobot:
        limits = jnp.asarray([[-4.0, 4.0]] * 2, jnp.float32)

        @staticmethod
        def fkine(p):
            return p

    def dist_est(q):  # disk obstacle at the origin, radius 1
        return 1.0 - jnp.linalg.norm(q, axis=-1)

    s = jnp.asarray([-2.0, -2.0], jnp.float32)
    t = jnp.asarray([2.0, 2.0], jnp.float32)
    base = {'N_WAYPOINTS': 12, 'NUM_RE_TRIALS': 1, 'MAXITER': 100,
            'safety_margin': -0.05, 'seed': 3, 'outer_iters': 2,
            'inner_iters': 5}
    starved = optim.al_traj_optimize(
        PointRobot, dist_est, s, t, dict(base, restore_iters=0))
    restored = optim.al_traj_optimize(
        PointRobot, dist_est, s, t, dict(base, restore_iters=200))
    # the starved run must actually exhibit the plateau for the test to
    # mean anything
    assert not starved['success']
    assert starved['max_violation'] > 1e-4
    assert restored['success']
    assert restored['max_violation'] <= 1e-4
    # restoration only pushes the path AWAY from the obstacle: every
    # waypoint of the restored path clears the (negative) margin
    sol = np.asarray(restored['solution'])
    assert (1.0 - np.linalg.norm(sol, axis=-1) <= -0.05 + 1e-4).all()
