"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The environment's sitecustomize registers the axon TPU plugin and calls
jax.config.update('jax_platforms', 'axon,cpu') at interpreter startup, so
env vars alone are not enough — override the config after import.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
