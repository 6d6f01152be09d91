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
#
# The dir is additionally keyed by a fingerprint of the host CPU's feature
# flags: XLA:CPU AOT executables embed the compile machine's features and
# loading one compiled on a different machine can SIGILL/SIGSEGV ("Machine
# type used for XLA:CPU compilation doesn't match the machine type for
# execution"). A stale cache left behind by a different host must start
# cold, not be deserialized.
import hashlib


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.blake2s(
                        " ".join(sorted(line.split()[2:])).encode(),
                        digest_size=6,
                    ).hexdigest()
    except OSError:
        pass
    import platform

    return hashlib.blake2s(
        platform.processor().encode(), digest_size=6
    ).hexdigest()


jax.config.update(
    "jax_compilation_cache_dir",
    f"/root/repo/.jax_cache_cpu_{_cpu_fingerprint()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

