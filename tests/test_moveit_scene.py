"""MoveIt .scene loader: both serializations, all shape kinds, and the
loaded env drives the normal checker path."""
import numpy as np
import jax.numpy as jnp
import pytest

from diffco_tpu.envs import ShapeEnv
from diffco_tpu.envs.moveit_scene import parse_scene_text, \
    load_moveit_scene

OLD_FORMAT = """\
myscene
* shelf
1
box
0.4 0.8 0.02
-0.6 0 0.5
0 0 0 1
0 0 0 0
* ball
1
sphere
0.15
1.0 0.1 0.0
0 0 0 1
0 0 0 0
* pole
1
cylinder
0.05 1.2
0.5 0.5 0.6
0 0 0 1
0 0 0 0
* funnel
1
cone
0.1 0.2
0.7 0.4 0.05
0 0 0 1
0 0 0 0
* wedge
1
mesh
4 4
0 0 0
0.2 0 0
0 0.2 0
0 0 0.2
0 1 2
0 1 3
0 2 3
1 2 3
0.3 -0.4 0.1
0 0 0 1
0 0 0 0
.
"""

# newer MoveIt writes an object-level pose before the shape count
NEW_FORMAT = """\
newscene
* crate
0.5 0 0.25
0 0 0 1
1
box
0.3 0.3 0.3
0 0 0
0 0 0 1
0 0 0 0
.
"""


@pytest.mark.smoke
def test_parse_old_format_all_kinds():
    name, shapes = parse_scene_text(OLD_FORMAT)
    assert name == 'myscene'
    assert set(shapes) == {'shelf', 'ball', 'pole', 'funnel', 'wedge'}
    assert shapes['shelf']['type'] == 'Box'
    assert shapes['shelf']['params']['extents'] == [0.4, 0.8, 0.02]
    assert np.allclose(shapes['shelf']['transform'][:3, 3],
                       [-0.6, 0, 0.5])
    assert shapes['ball']['type'] == 'Sphere'
    assert shapes['pole']['type'] == 'Cylinder'
    # cone -> bounding cylinder (conservative)
    assert shapes['funnel']['type'] == 'Cylinder'
    assert shapes['funnel']['params'] == {'radius': 0.1, 'height': 0.2}
    assert shapes['wedge']['type'] == 'Mesh'
    assert shapes['wedge']['params']['vertices'].shape == (4, 3)
    assert shapes['wedge']['params']['faces'].shape == (4, 3)
    # the dict builds a real scene (inline-mesh decomposition path)
    env = ShapeEnv(shapes, mesh_spheres=4)
    assert env.n_objects == 5


@pytest.mark.smoke
def test_parse_new_format_object_pose_composes():
    _, shapes = parse_scene_text(NEW_FORMAT)
    # object pose (0.5, 0, 0.25) composes with the identity shape pose
    assert np.allclose(shapes['crate']['transform'][:3, 3],
                       [0.5, 0, 0.25])


@pytest.mark.smoke
def test_load_scene_drives_collision_checking(tmp_path):
    p = tmp_path / 'world.scene'
    p.write_text(OLD_FORMAT)
    env = load_moveit_scene(str(p), mesh_spheres=4)
    assert env.name == 'myscene'
    # signed distances of probe spheres against the loaded scene: the
    # shelf center must be inside (positive = penetration), far away not
    from diffco_tpu.geometry.geometry3d import spheres_vs_scene_signed_dist
    for probe, expect_hit in (([-0.6, 0.0, 0.5], True),
                              ([5.0, 5.0, 5.0], False)):
        d = np.asarray(spheres_vs_scene_signed_dist(
            jnp.asarray([probe]), jnp.asarray([0.01]), env.scene))
        assert (d.max() > 0) == expect_hit, (probe, d)
