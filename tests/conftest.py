"""Test config: run JAX on a virtual 8-device CPU mesh (SURVEY.md §4 item d).

The axon sitecustomize may import jax and pin JAX_PLATFORMS=axon before this
file runs, so setting env vars alone is not enough — update the live jax
config too (same trick as __graft_entry__.py).
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu', (
    'tests must run on the virtual CPU mesh, got %s' % jax.devices())

# persistent XLA compile cache: the slow tier re-compiles the same tiny
# models every run — cache hits cut the suite several-fold (VERDICT r2 #9)
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '.xla_cache')
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
