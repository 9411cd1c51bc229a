import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. The ambient environment may have already
# imported jax (TPU plugin sitecustomize) and pinned jax_platforms — so set
# XLA_FLAGS first, then override the platform via jax.config before any
# backend is instantiated.
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'
# cache compiled programs across test runs (compiles dominate CI time)
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_diffco')

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
