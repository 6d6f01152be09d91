"""Disk cache of serialized XLA executables for the TPU's big programs.

The axon backend cannot round-trip TPU executables through jax's
persistent compilation cache (round-3 finding; fresh processes paid
~10 min of XLA compiles before every first prove), but
jax.experimental.serialize_executable DOES round-trip across processes
(measured: ~1 s to deserialize+run in a fresh process vs minutes of
compile). AotJit wraps a jittable function with a shape-specialized
executable cache on disk:

  - first call in the fleet: lower+compile, serialize to
    .aot_cache/<tag>-<digest>.aot (atomic rename; concurrent writers
    race benignly);
  - first call in a later process: deserialize_and_load, skipping the
    compile entirely.

Cache keys include the argument shapes/dtypes, a fingerprint of the
KERNEL-RELEVANT source (ops/ + parallel/ + snark/accel.py + this file
— round-5 fix: hashing the whole package meant any docstring edit
anywhere orphaned every entry, which was the root cause of round 4's
37% cold-start variance), the jax version and the device kind — any
kernel change or platform change invalidates the entry (stale
executables must never load: they would silently compute with old
code). Every load/compile logs one `[aot] ...` line to stderr so cache
hit/miss behavior is observable in perf logs (VERDICT r4 Next #2).

A per-instance lock serializes concurrent first calls for the same
shape: without it the prewarm thread (snark/accel.py prewarm_prove)
and the prover's main thread both compiled the same program
back-to-back on the axon compile service.

CPU backend passes straight through to plain jit: XLA:CPU executable
(de)serialization is the component whose crashes are documented in
tests/conftest.py.

Security note: entries are pickles and are only ever produced and
consumed by the local machine (.aot_cache/ is gitignored and must never
be committed or distributed — loading a foreign pickle would execute
arbitrary code). The fingerprint key means any kernel-source edit
orphans old entries; _compile_and_store garbage-collects those local
artifacts.
"""

import hashlib
import os
import pickle
import sys
import threading
import time

import jax

CACHE_DIR = os.environ.get("CELO_AOT_CACHE", "/root/repo/.aot_cache")

_FINGERPRINT = None

# Package paths whose source shapes the compiled device programs. Host
# protocol logic (bls/, snark/ apart from accel, gadgets/, hashers/,
# utils/, ffi/, examples) never changes an XLA program and must not
# invalidate the cache.
_KERNEL_PATHS = ("ops", "parallel", os.path.join("snark", "accel.py"),
                 os.path.join("utils", "aotcache.py"))


def _log(msg: str) -> None:
    print(f"[aot] {msg}", file=sys.stderr, flush=True)


def _fingerprint() -> str:
    """Kernel source + jax version + device kind, hashed."""
    global _FINGERPRINT
    if _FINGERPRINT is None:
        h = hashlib.blake2s(digest_size=10)
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for rel in _KERNEL_PATHS:
            path = os.path.join(pkg, rel)
            if os.path.isfile(path):
                with open(path, "rb") as f:
                    h.update(f.read())
                continue
            for root, dirs, files in sorted(os.walk(path)):
                dirs.sort()
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        with open(os.path.join(root, fn), "rb") as f:
                            h.update(f.read())
        h.update(jax.__version__.encode())
        try:
            h.update(jax.devices()[0].device_kind.encode())
        except Exception:
            pass
        _FINGERPRINT = h.hexdigest()
    return _FINGERPRINT


def _arg_key(args):
    def leaf(a):
        return (tuple(getattr(a, "shape", ())), str(getattr(a, "dtype", type(a))))

    return repr(jax.tree.map(leaf, args))


class AotJit:
    """jax.jit with a cross-process executable cache (TPU backends)."""

    def __init__(self, tag: str, fn):
        self.tag = tag
        self._jit = jax.jit(fn)
        self._mem = {}
        self._lock = threading.Lock()

    def __call__(self, *args):
        if jax.default_backend() == "cpu":
            return self._jit(*args)
        key = _arg_key(args)
        ex = self._mem.get(key)
        if ex is None:
            with self._lock:
                ex = self._mem.get(key)  # a concurrent caller may have won
                if ex is None:
                    fp = _fingerprint()
                    digest = hashlib.blake2s(
                        key.encode(), digest_size=10
                    ).hexdigest()
                    path = os.path.join(
                        CACHE_DIR, f"{self.tag}-{fp}-{digest}.aot"
                    )
                    ex = self._load(path)
                    if ex is None:
                        ex = self._compile_and_store(path, args)
                    self._mem[key] = ex
        return ex(*args)

    def _load(self, path):
        from jax.experimental import serialize_executable as se

        if not os.path.exists(path):
            return None
        t0 = time.perf_counter()
        try:
            with open(path, "rb") as f:
                ser, in_tree, out_tree = pickle.load(f)
            ex = se.deserialize_and_load(ser, in_tree, out_tree)
        except Exception as e:
            _log(f"LOAD-FAIL {os.path.basename(path)}: {e!r} — recompiling")
            return None  # corrupt/incompatible entry: recompile below
        _log(f"hit {os.path.basename(path)} ({time.perf_counter() - t0:.1f}s)")
        return ex

    def _compile_and_store(self, path, args):
        from jax.experimental import serialize_executable as se

        t0 = time.perf_counter()
        _log(f"MISS {os.path.basename(path)} — compiling")
        comp = self._jit.lower(*args).compile()
        _log(f"compiled {self.tag} ({time.perf_counter() - t0:.1f}s)")
        try:
            os.makedirs(CACHE_DIR, exist_ok=True)
            # GC: entries for this tag written under a different source
            # fingerprint can never load again
            fp = _fingerprint()
            for fn in os.listdir(CACHE_DIR):
                if fn.startswith(self.tag + "-") and fp not in fn:
                    try:
                        os.remove(os.path.join(CACHE_DIR, fn))
                    except OSError:
                        pass
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(se.serialize(comp), f)
            os.replace(tmp, path)
        except Exception:
            pass  # cache write is best-effort
        return comp
