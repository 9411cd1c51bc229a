"""Branching-robot e2e: FK-DiffCo fit on the vendored trifinger
(three 3-DOF fingers off one base — ref TrifingerEdu coverage,
urdf_interface.py:871-934 + examples/tests fit gates)."""
import numpy as np
import jax
import jax.numpy as jnp

import diffco_tpu as dc
from diffco_tpu import robot_data


def _T(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def test_trifinger_fit_tpr():
    robot_data.ensure_default_assets()
    import os
    path = os.path.join(robot_data.data_dir, 'trifinger_simple.urdf')
    robot = dc.URDFRobot(path, setup_acm=False, link_spheres=3)
    assert robot._n_dofs == 9
    # an object in the manipulation workspace between the fingers. The
    # three-thin-finger union boundary is measurably harder than the
    # serial-arm worlds (unbiased ACC ~0.91 at 8k samples, vs ~0.97 for
    # Panda) — gamma 30 and the gates below reflect that.
    env = dc.ShapeEnv(shapes={
        'cube': {'type': 'Box', 'params': {'extents': [0.16, 0.16, 0.16]},
                 'transform': _T([0.0, 0.0, -0.14])},
    })
    fkdc = dc.ForwardKinematicsDiffCo(robot=robot, environment=env,
                                      gamma=30)
    acc, tpr, tnr = fkdc.fit(num_samples=8000, verbose=True)
    assert tpr >= 0.95  # biased TPR: reference gate (test_fkine_diffco:44)

    q = robot.rand_configs(2000, jax.random.PRNGKey(42))
    lab = np.asarray(fkdc.gt_check_func(q)).astype(bool)
    scores = np.asarray(fkdc.perceptron.poly_score(q)).reshape(-1)
    assert ((scores > 0) == lab).mean() >= 0.87   # unbiased ACC
    assert (scores[lab] > 0).mean() >= 0.85       # unbiased TPR
