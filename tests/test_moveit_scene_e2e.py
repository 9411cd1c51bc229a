"""End-to-end over a MoveIt .scene fixture: file -> ShapeEnv ->
ForwardKinematicsDiffCo fit -> proxy trajopt -> exact-geometry
validation. Mirrors the reference's MoveIt-scene usage
(diffco/envs/moveit scene fixtures feeding the FKDiffCo examples)
without a ROS stack."""
import numpy as np
import jax
import jax.numpy as jnp

import diffco_tpu as dc
from diffco_tpu import optim
from diffco_tpu.envs.moveit_scene import load_moveit_scene

# obstacles inside the Panda's ~0.8 m reach; old-format serialization
# (shape count before pose), plus one inline mesh to cover the
# decomposition path end-to-end
SCENE = """\
panda_world
* shelf
1
box
0.25 0.5 0.03
0.45 0.0 0.45
0 0 0 1
0 0 0 0
* ball
1
sphere
0.09
0.35 -0.35 0.55
0 0 0 1
0 0 0 0
* wedge
1
mesh
4 4
0 0 0
0.12 0 0
0 0.12 0
0 0 0.12
0 1 2
0 1 3
0 2 3
1 2 3
0.3 0.35 0.3
0 0 0 1
0 0 0 0
.
"""


def test_scene_file_to_validated_trajectory(tmp_path):
    p = tmp_path / 'panda_world.scene'
    p.write_text(SCENE)
    env = load_moveit_scene(str(p), mesh_spheres=6)
    assert env.name == 'panda_world'

    robot = dc.FrankaPanda(load_gripper=False, setup_acm=True,
                           link_spheres=12)
    fkdc = dc.ForwardKinematicsDiffCo(robot=robot, environment=env)
    acc, tpr, tnr = fkdc.fit(num_samples=3000)
    # same gate as the reference's fkine example (TPR >= 0.9; the /3
    # safety bias deliberately trades TNR)
    assert tpr >= 0.9, (acc, tpr, tnr)

    # a free start/target pair from the fitted world's own sampler
    q = robot.rand_configs(128, jax.random.PRNGKey(11))
    in_col = np.asarray(robot.collision(q, other=env))
    idx = np.where(~in_col)[0]
    assert len(idx) >= 2, 'scene too cluttered for the e2e'
    s, t = q[idx[0]], q[idx[-1]]

    dist_est = fkdc.score_fn(bias=0.0)
    rec = optim.adam_traj_optimize(
        robot, dist_est, s, t,
        {'N_WAYPOINTS': 8, 'NUM_RE_TRIALS': 2, 'MAXITER': 60,
         'safety_margin': -float(fkdc.safety_bias), 'seed': 5,
         'dense_sub': 3})
    sol = jnp.asarray(rec['solution'], jnp.float32)
    from diffco_tpu import utils
    dense = utils.dense_path(sol, 4)
    col = np.asarray(robot.collision(dense, other=env))
    assert not col.any(), 'trajectory through the .scene world collides'
