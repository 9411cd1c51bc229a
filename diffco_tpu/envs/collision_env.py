"""Abstract collision-environment template.

Parity with /root/reference/diffco/envs/collision_env.py:1-25 — the
tutorial interface implemented by e.g. the RTB Panda environments
(envs/rtb/panda_envs.py). Concrete JAX-native environments are provided in
diffco_tpu.envs.panda_envs.
"""


class CollisionEnv:
    '''
    A template class for collision environment.
    Use as the ground-truth checker of a proxy collision checker.
    '''

    def __init__(self):
        pass

    def is_collision(self, qs):
        raise NotImplementedError

    def distance(self, qs):
        raise NotImplementedError

    def sample_q(self):
        raise NotImplementedError

    def plot(self, qs):
        raise NotImplementedError
