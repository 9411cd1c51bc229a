

def test_al_resamples_arbitrary_length_init():
    """al_traj_optimize must accept planner inits of any length
    (regression: a 70-waypoint RRT path at N_WAYPOINTS=60 crashed with a
    broadcast error — the only optimizer core without _resample_init)."""
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
