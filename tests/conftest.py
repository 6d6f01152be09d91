"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding tests run anywhere (the reference has no distributed
test harness; SURVEY.md section 4 prescribes host-count emulation).

The environment auto-imports jax with the axon TPU platform at interpreter
startup (sitecustomize), so setting env vars here is too late — we must
update jax.config and clear the already-initialized backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend as _jeb

    _jeb.clear_backends()

# Persistent compilation cache: the big pairing/tower graphs compile once
# ever, then hit the on-disk cache across pytest runs. CPU runs get their
# OWN directory: executable (de)serialization on the CPU backend is
# best-effort, and long suite runs were segfaulting inside zstd cache
# reads of entries from the shared dir (see round-2 notes) — never mix
# CPU- and TPU-written caches.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

