"""Device (TPU) backends for the Groth16 hot paths.

The reference gets its prover/setup throughput from arkworks' rayon MSM +
FFT (invoked at crates/epoch-snark/src/api/prover.rs:78, setup.rs:87-99);
here the same stages run as sharded device kernels:

  - msm_g1 / msm_g2        -> Pippenger (ops/msm.py), the prover MSMs
  - fixed_base_g1/g2       -> window-table batch scalar-mul, the setup's
                              millions of generator multiples
  - compute_h_evals        -> the h(X) = (A(X)B(X) - C(X))/t(X) coset
                              NTT pipeline fully on device (ops/ntt.py)

One DeviceAccel instance per pairing engine ("bls12_377", "bw6_761" — for
BW6-761 both G1 and G2 live over Fq761; ops/curve.py::bw6_g1/bw6_g2 differ in the curve constant b). Passed as
the optional `accel` argument of snark/groth16.py entry points.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath import curves as hcurves
from ..hostmath import bw6 as hbw6
from ..hostmath import fp2 as hfp2
from ..hostmath.params import R as BLS_R, P as BLS_P, BW6_P
from ..ops import curve as dc
from ..ops import msm as dmsm
from ..ops import ntt as dntt
from ..ops import bls as dbls
from ..ops.field import FQ, FR, FQ761, fq, fr, fq761

def _fixed_c() -> int:
    """Fixed-base window bits (table = W * 2^c points, host-cheap);
    Config.fixed_base_window, default 8."""
    from ..utils.config import get_config

    return get_config().fixed_base_window


def _pack_affine_f2(points):
    return dbls.pack_g2_affine(points)


def _unpack_jac_f2(dev_pt):
    return dc.g2_unpack(dev_pt)


class _Group:
    """One group's device plumbing: curve ops + pack/unpack + fixed-base."""

    def __init__(self, key, curve, host_curve, generator, nbits,
                 pack_fn, unpack_fn, spec=None, owner=None,
                 fops=None, host_inv=None, template=None):
        self.key = key
        self.curve = curve
        self.host_curve = host_curve
        self.generator = generator
        self.nbits = nbits
        self.pack_fn = pack_fn
        self.unpack_fn = unpack_fn
        self.spec = spec
        self.owner = owner  # DeviceAccel (for the configured mesh)
        self.fops = fops          # coordinate field ops (fq/fq761)
        self.host_inv = host_inv  # host field inverse for batch inversion
        self.template = template  # host affine structure, e.g. (0, 0)
        self._table = None

    def msm(self, bases, scalars, c=None, L=None, cache_key=None):
        mesh = self.owner.mesh if self.owner is not None else None
        key = (self.key, cache_key) if cache_key is not None else None
        raw = isinstance(scalars, dmsm.RawScalarVec)
        if mesh is not None and mesh.devices.size > 1 and len(bases) >= 4 * mesh.devices.size:
            from ..parallel import mesh as pmesh

            return pmesh.sharded_msm_pippenger(
                mesh,
                list(bases),
                scalars.to_ints() if raw else [int(s) for s in scalars],
                c=c,
                L=L,
                curve=self.curve,
                nbits=self.nbits,
                pack_fn=self.pack_fn,
                unpack_fn=self.unpack_fn,
                cache_key=key,
            )
        return dmsm.msm_pippenger(
            bases if isinstance(bases, dc.PointVec) else list(bases),
            scalars if raw else [int(s) for s in scalars],
            curve=self.curve,
            nbits=self.nbits,
            c=c,
            L=L,
            pack_fn=self.pack_fn,
            unpack_fn=self.unpack_fn,
            cache_key=key,
        )

    def fixed_base_batch(self, scalars):
        """[k_i] -> [k_i * generator] as a PointVec (acts as a list of
        host affine points; stays packed for MSM/serialization)."""
        from ..utils.profiling import stage, device_sync

        c = _fixed_c()
        if self._table is None:
            with stage(f"fixed_base.table.{self.key}"):
                tbl = dmsm.fixed_base_table(
                    self.host_curve, self.generator, self.nbits, c
                )
                self._table = jax.tree.map(jnp.asarray, self.pack_fn(tbl))
        digits = dmsm.fixed_base_plan(
            [int(s) for s in scalars], self.nbits, c
        )
        with stage(f"fixed_base.device.{self.key}"):
            out = dmsm.fixed_base_batch_mul(
                self.curve, self.key, self._table, digits
            )
            device_sync(out)
        with stage(f"fixed_base.affine.{self.key}"):
            # device batch inversion + raw uint16 fetch — replaces the
            # round-4 fixed_base.unpack host bigint path (484 s/setup)
            fn = dc.affine_raw_fn(
                self.curve, self.fops, self.host_inv, self.template,
                f"aff_{self.key}",
            )
            return fn(out)


class DeviceAccel:
    def __init__(self, engine_name: str):
        self.name = engine_name
        self.mesh = None  # set_mesh() routes MSM/NTT through parallel/mesh.py
        if engine_name == "bls12_377":
            self.r = BLS_R
            self.fspec, self.fops, self.nttops = FR, fr, dntt.ntt_fr
            self.g1 = _Group(
                "bls-g1", dc.g1, hcurves.G1, None, 253,
                lambda pts: dc.pack_affine(FQ, pts),
                lambda dev: dc.unpack_jac(dc.g1, FQ, dev),
                spec=FQ, owner=self,
                fops=fq, host_inv=lambda t: (pow(t[0], -1, BLS_P),),
                template=(0, 0),
            )
            self.g2 = _Group(
                "bls-g2", dc.g2, hcurves.G2, None, 253,
                _pack_affine_f2, _unpack_jac_f2, owner=self,
                fops=fq, host_inv=lambda t: hfp2.inv((t[0], t[1])),
                template=((0, 0), (0, 0)),
            )
            from ..hostmath.params import G1_GENERATOR, G2_GENERATOR

            self.g1.generator = G1_GENERATOR
            self.g2.generator = G2_GENERATOR
        elif engine_name == "bw6_761":
            self.r = BLS_P  # BW6-Fr == BLS12-377 Fq
            self.fspec, self.fops, self.nttops = FQ, fq, dntt.ntt_bw6
            self.g1 = _Group(
                "bw6-g1", dc.bw6_g1, hbw6.G1, hbw6.G1_GENERATOR, 377,
                lambda pts: dc.pack_affine(FQ761, pts),
                lambda dev: dc.unpack_jac(dc.bw6_g1, FQ761, dev),
                spec=FQ761, owner=self,
                fops=fq761, host_inv=lambda t: (pow(t[0], -1, BW6_P),),
                template=(0, 0),
            )
            self.g2 = _Group(
                "bw6-g2", dc.bw6_g2, hbw6.G2, hbw6.G2_GENERATOR, 377,
                lambda pts: dc.pack_affine(FQ761, pts),
                lambda dev: dc.unpack_jac(dc.bw6_g2, FQ761, dev),
                spec=FQ761, owner=self,
                fops=fq761, host_inv=lambda t: (pow(t[0], -1, BW6_P),),
                template=(0, 0),
            )
        else:
            raise ValueError(engine_name)
        self._h_jit = {}

    def _ensure_h_jits(self):
        # SPLIT jits (one 20-stage NTT graph each + trivial pointwise ops)
        # instead of one fused 140-stage pipeline: the monolith's XLA
        # compile ran ~5 minutes on the axon remote-compile service every
        # fresh process (its persistent-cache entry rarely hit), while the
        # split graphs compile fast and cost only ~15 extra dispatches.
        if "split" not in self._h_jit:
            from ..utils.aotcache import AotJit

            f, nttops = self.fops, self.nttops
            # EVERY program goes through the AOT executable cache — the
            # axon compile service charges ~30-200s (highly variable)
            # even for small pointwise programs, and a fresh process
            # used to pay 3-4 of those inside h_poly.device (round-5
            # final3: 680s first h-poly on all-AOT-hit NTTs, all of it
            # plain-jit compiles of from_raw/mul/combine)
            self._h_jit["split"] = {
                "from_raw": AotJit(f"hp_fromraw_{self.name}", f.from_raw),
                "mul": AotJit(f"hp_mul_{self.name}", f.mul),
                "ntt_f": AotJit(
                    f"ntt_f_{self.name}",
                    lambda x, m: nttops.ntt(x, master=m),
                ),
                "ntt_i": AotJit(
                    f"ntt_i_{self.name}",
                    lambda x, m: nttops.ntt(x, inverse=True, master=m),
                ),
                # final Montgomery-strip with a device-side uint16 cast:
                # halves the D2H bytes on the ~8-16 MB/s axon tunnel
                "to_raw16": AotJit(
                    f"hp_toraw16_{self.name}",
                    lambda x: f.to_raw(x).astype(jnp.uint16),
                ),
                "combine": AotJit(
                    f"hp_combine_{self.name}",
                    lambda ae, be, ce, ti: f.mul(
                        f.sub(f.mul(ae, be), ce),
                        jnp.broadcast_to(ti, ae.shape),
                    ),
                ),
            }
        return self._h_jit["split"]

    def prewarm_prove(self, pk, block=False):
        """Build ALL of the prover's device programs in a background
        thread for a fresh process.

        Shapes are derived from the proving key alone (d = len(h_query)+1,
        MSM widths = query lengths), so this starts before the circuit is
        synthesized and overlaps the Python witness pass. The programs go
        through utils/aotcache.py: the first-ever process compiles and
        serializes each executable; every later process deserializes in
        ~1 s instead of minutes of XLA compile (the axon persistent
        compilation cache cannot round-trip TPU executables; measured
        r4: threading the compiles does NOT parallelize them — big
        compiles serialize — hence one worker thread, whose real win is
        populating/loading the AOT cache early)."""
        import threading

        from ..ops import msm as dmsm
        from ..utils.config import get_config

        d = len(pk.h_query) + 1
        assert d & (d - 1) == 0, d
        cfg = get_config()
        spec, nttops = self.fspec, self.nttops
        J = self._ensure_h_jits()
        m_fwd = nttops.master_table(d, False)
        m_inv = nttops.master_table(d, True)
        x0 = jnp.zeros((spec.n, d), jnp.int32)
        ti0 = spec.const(1, (1,))
        jobs = [
            lambda: jax.block_until_ready(J["ntt_f"](x0, m_fwd)),
            lambda: jax.block_until_ready(J["ntt_i"](x0, m_inv)),
            # the pointwise programs too: each is ~30-200s of compile
            # service latency on a fresh fleet otherwise
            lambda: jax.block_until_ready(J["from_raw"](x0)),
            lambda: jax.block_until_ready(J["mul"](x0, x0)),
            lambda: jax.block_until_ready(J["to_raw16"](x0)),
            lambda: jax.block_until_ready(J["combine"](x0, x0, x0, ti0)),
        ]
        seen = set()
        for grp, B0 in (
            (self.g1, len(pk.a_query)),
            (self.g2, len(pk.b_g2_query)),
            (self.g1, len(pk.l_query)),
            (self.g1, d - 1),
        ):
            if B0 < 1:
                continue
            c = cfg.msm_window or dmsm._auto_c(B0, grp.nbits)
            L = cfg.msm_lanes or (1 << max(3, min(15, B0.bit_length() - 5)))
            perm, lin, lane, valid, B = dmsm.plan_msm(
                [0] * B0, grp.nbits, c, L
            )
            key = (grp.key, c, L, B)
            if key in seen:
                continue
            seen.add(key)
            tmpl = grp.pack_fn([None])
            pts = jax.tree.map(
                lambda t: jnp.zeros((np.asarray(t).shape[0], B), jnp.int32),
                tmpl,
            )
            fn = dmsm._pippenger_jit(id(grp.curve), grp.curve, c, L)
            args = (pts, jnp.asarray(perm), jnp.asarray(lin),
                    jnp.asarray(lane), jnp.asarray(valid))
            jobs.append(
                lambda fn=fn, args=args: jax.block_until_ready(fn(*args))
            )
        # ONE worker thread running the jobs serially: measured on the
        # axon backend, concurrent big compiles serialize anyway (and
        # contend); the win here is (a) overlapping the compile/AOT-load
        # chain with the Python witness-synthesis pass and (b) populating
        # the utils/aotcache.py executable cache for later processes.
        def run_all():
            for j in jobs:
                try:
                    j()
                except Exception:
                    pass  # prewarm is best-effort; the real call reports

        t = threading.Thread(target=run_all, daemon=True)
        t.start()
        if block:
            t.join()
        return [t]

    def set_mesh(self, mesh):
        """Route the prover's MSM and h-poly NTT stages through the
        mesh-sharded kernels (parallel/mesh.py) when `mesh` spans more than
        one device — the multi-chip form of arkworks' rayon MSM/FFT
        parallelism (SURVEY.md §2.5 row 4). Pass None to go single-chip."""
        self.mesh = mesh

    # --- Groth16 prover stage: h = (AB - C)/t on the coset ----------------
    def compute_h_evals(self, a_evals, b_evals, c_evals, d: int, g: int):
        """Domain evaluations (lists of ints mod r) -> h coefficients
        [0, d-1) — the coset-NTT pipeline of groth16._compute_h, fully on
        device: 3 iNTT + 3 coset NTT + pointwise + 1 coset iNTT.

        The twiddle/coset tables are passed as traced ARGUMENTS (cached
        device-resident), never as baked HLO literals: at d=2^20 over
        BW6-Fr the literals alone exceed 300MB and the axon remote-compile
        request is rejected (HTTP 413)."""
        r = self.r
        spec, f = self.fspec, self.fops
        if self.mesh is not None and self.mesh.devices.size > 1:
            from ..parallel import mesh as pmesh
            from ..utils.profiling import stage

            D = self.mesh.devices.size
            if d % (D * D) == 0:  # four-step N1/N2 divisibility
                with stage("h_poly.pack"):
                    raws = (
                        np.asarray(spec.pack_raw(a_evals)),
                        np.asarray(spec.pack_raw(b_evals)),
                        np.asarray(spec.pack_raw(c_evals)),
                    )
                with stage("h_poly.sharded"):
                    h_raw = pmesh.sharded_compute_h(
                        self.mesh, self.nttops, *raws, d, g
                    )
                from ..ops.msm import RawScalarVec

                return RawScalarVec(np.asarray(h_raw)[..., : d - 1], spec)
        t_c_inv = pow((pow(g, d, r) - 1) % r, -1, r)
        nttops = self.nttops
        J = self._ensure_h_jits()
        from ..utils.profiling import stage

        with stage("h_poly.tables"):
            m_fwd = nttops.master_table(d, False)
            m_inv = nttops.master_table(d, True)
            sc_g = nttops.coset_scale(d, g)
            sc_ginv = nttops.coset_scale(d, pow(g, -1, r))
            tinv_c = spec.const(t_c_inv, (1,))
        with stage("h_poly.pack"):
            args = (
                jnp.asarray(self.fspec.pack_raw(a_evals)),
                jnp.asarray(self.fspec.pack_raw(b_evals)),
                jnp.asarray(self.fspec.pack_raw(c_evals)),
            )
        from ..utils.profiling import device_sync

        with stage("h_poly.device"):
            evs = []
            for raw in args:
                coeffs = J["ntt_i"](J["from_raw"](raw), m_inv)
                evs.append(J["ntt_f"](J["mul"](coeffs, sc_g), m_fwd))
            hc_ = J["combine"](*evs, tinv_c)
            h = J["mul"](J["ntt_i"](hc_, m_inv), sc_ginv)
            out = J["to_raw16"](h)
            device_sync(out)
        with stage("h_poly.fetch"):
            # RAW canonical uint16 limbs straight into MSM planning —
            # round-4's h_poly.unpack (53-123 s of host python-int
            # reconstruction, VERDICT r4 Next #3) no longer exists
            raw16 = np.asarray(out)
        from ..ops.msm import RawScalarVec

        return RawScalarVec(raw16[..., : d - 1], self.fspec)


_ACCEL_CACHE = {}


def get_accel(engine_name: str) -> DeviceAccel:
    if engine_name not in _ACCEL_CACHE:
        _ACCEL_CACHE[engine_name] = DeviceAccel(engine_name)
    return _ACCEL_CACHE[engine_name]
