"""Typed configuration for the TPU build (SURVEY.md §5 "config/flag system").

The reference scatters its knobs across function arguments and cargo
features (e.g. the compat sign-bit in hash_to_curve, the 2-SNARK mode flag
in epoch-snark's API); here every tunable lives in one frozen dataclass so
a deployment can pin them in a single place. Every field can be overridden
by an environment variable `CELO_BLS_TPU_<FIELD>` (uppercased), read once
at first `get_config()`.

Kernel-shape knobs (msm window/lanes, fixed-base window) default to the
auto heuristics in ops/msm.py when None.
"""

import os
from dataclasses import dataclass, fields, replace
from typing import Optional


@dataclass(frozen=True)
class Config:
    # --- kernel shapes -----------------------------------------------------
    msm_window: Optional[int] = None      # Pippenger c (None = _auto_c)
    msm_lanes: Optional[int] = None       # Pippenger L (None = size heuristic)
    fixed_base_window: int = 8            # setup fixed-base table c
    msum_fold_lanes: int = 128            # tree-sum scan width
    msm_cache_bases: bool = True          # keep prover MSM bases on device

    # --- parallelism -------------------------------------------------------
    mesh_axis: str = "data"               # name of the 1-D mesh axis

    # --- behavior ----------------------------------------------------------
    compat_sign_bit: int = 377            # hash-to-curve compat y-sign bit
    # Prove-side arkworks byte-parity mode. This build's circuit is
    # deliberately leaner than the deployed Celo constraint system
    # (18,439 constraints per in-circuit BLS verify vs the reference's
    # 18,702 — crates/bls-gadgets/src/bls.rs:401); proofs made here
    # verify only under keys set up here. VERIFY-side interop is exact
    # (the deployed pinned proof verifies: tests/test_snark_verify.py).
    # Requesting ark_parity=True makes setup/prove FAIL FAST instead of
    # silently producing keys that are not byte-compatible with a
    # deployed Celo ceremony. tests/test_ark_parity.py pins both the
    # divergence numbers and this boundary.
    ark_parity: bool = False
    profile: bool = False                 # enable utils.profiling stage log
    profile_trace_dir: Optional[str] = None  # jax.profiler trace output

    # --- caches ------------------------------------------------------------
    jax_cache_dir: Optional[str] = None   # persistent compilation cache


_CONFIG: Optional[Config] = None


_INT_FIELDS = {"msm_window", "msm_lanes", "fixed_base_window",
               "msum_fold_lanes", "compat_sign_bit"}
_BOOL_FIELDS = {"profile", "msm_cache_bases", "ark_parity"}


def _from_env(base: Config) -> Config:
    updates = {}
    for f in fields(Config):
        raw = os.environ.get(f"CELO_BLS_TPU_{f.name.upper()}")
        if raw is None:
            continue
        if f.name in _INT_FIELDS:
            updates[f.name] = int(raw)
        elif f.name in _BOOL_FIELDS:
            updates[f.name] = raw.lower() in ("1", "true", "yes")
        else:
            updates[f.name] = raw
    return replace(base, **updates) if updates else base


def get_config() -> Config:
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = _from_env(Config())
    return _CONFIG


def set_config(cfg: Config) -> None:
    """Pin the process-wide config (tests / embedding applications)."""
    global _CONFIG
    _CONFIG = cfg
