"""Aux subsystems: typed config, profiling registry, multi-host bring-up."""

import os

import jax
import pytest

from celo_bls_snark_tpu.utils import config as ucfg
from celo_bls_snark_tpu.utils import profiling as uprof
from celo_bls_snark_tpu.parallel import distributed as pdist


class TestConfig:
    def teardown_method(self):
        ucfg.set_config(None)
        os.environ.pop("CELO_BLS_TPU_MSM_WINDOW", None)
        os.environ.pop("CELO_BLS_TPU_PROFILE", None)

    def test_defaults(self):
        ucfg.set_config(None)
        cfg = ucfg.get_config()
        assert cfg.fixed_base_window == 8
        assert cfg.msm_window is None
        assert cfg.compat_sign_bit == 377
        assert cfg.mesh_axis == "data"

    def test_env_override(self):
        os.environ["CELO_BLS_TPU_MSM_WINDOW"] = "12"
        os.environ["CELO_BLS_TPU_PROFILE"] = "true"
        ucfg.set_config(None)
        cfg = ucfg.get_config()
        assert cfg.msm_window == 12
        assert cfg.profile is True

    def test_set_config_pins(self):
        ucfg.set_config(ucfg.Config(msm_lanes=64))
        assert ucfg.get_config().msm_lanes == 64

    def test_frozen(self):
        with pytest.raises(Exception):
            ucfg.get_config().msm_window = 5


class TestProfiling:
    def test_stage_accumulates(self):
        uprof.reset()
        with uprof.stage("unit.x"):
            pass
        with uprof.stage("unit.x"):
            pass
        rep = uprof.report()
        assert rep["unit.x"]["calls"] == 2
        assert rep["unit.x"]["total_s"] >= 0.0

    def test_stage_syncs_device_work(self):
        import jax.numpy as jnp

        uprof.reset()
        with uprof.stage("unit.devwork", sync=None):
            y = jnp.arange(8) * 2
        with uprof.stage("unit.devwork2", sync=y):
            pass
        assert "unit.devwork2" in uprof.report()

    def test_report_json_and_metric(self):
        uprof.reset()
        uprof.add_metric("verifs_per_s", 123.0)
        assert "verifs_per_s" in uprof.report_json()


class TestDistributed:
    def test_single_process_noop(self):
        pdist._INITIALIZED = False
        pdist.init_distributed(num_processes=1)  # must not need a coordinator
        assert pdist._INITIALIZED

    def test_global_mesh_covers_all_devices(self):
        mesh = pdist.global_mesh()
        assert mesh.devices.size == len(jax.devices())
        assert mesh.axis_names == ("data",)

    def test_global_mesh_host_contiguous(self):
        mesh = pdist.global_mesh()
        procs = [d.process_index for d in mesh.devices.reshape(-1)]
        assert procs == sorted(procs)

    def test_coordinator_predicates(self):
        assert pdist.process_count() >= 1
        assert pdist.is_coordinator() in (True, False)


class TestInjectableSetup:
    """setup.rs:58-105 — the consumer may inject the Groth16 parameter
    generators (e.g. to load MPC-ceremony outputs). Validates the plumbing:
    each injected fn receives the synthesized ConstraintSystem + rng and
    its returns land in Parameters verbatim."""

    def test_setup_fns_injected(self):
        from types import SimpleNamespace
        from celo_bls_snark_tpu.hostmath.params import G1_GENERATOR, G2_GENERATOR
        from celo_bls_snark_tpu.snark.api import setup
        from celo_bls_snark_tpu.snark.groth16 import VerifyingKey

        calls = []

        def helper_setup(hcs, rng):
            calls.append(("helper", hcs.num_constraints))
            # MPC stand-in: a vk of the right SHAPE (the outer circuit embeds
            # it as constants), generator-valued
            vk = VerifyingKey(
                alpha_g1=G1_GENERATOR,
                beta_g2=G2_GENERATOR,
                gamma_g2=G2_GENERATOR,
                delta_g2=G2_GENERATOR,
                gamma_abc_g1=[G1_GENERATOR] * hcs.num_instance,
            )
            return SimpleNamespace(vk=vk, tag="helper-pk")

        def epoch_setup(cs, rng):
            calls.append(("epochs", cs.num_constraints))
            return SimpleNamespace(vk=None, tag="epoch-pk")

        params = setup(2, 1, 0, None, helper_setup, epoch_setup,
                       hashes_in_bls12_377=True)
        assert [c[0] for c in calls] == ["helper", "epochs"]
        assert all(n > 0 for _, n in calls)
        assert params.hash_to_bits.tag == "helper-pk"
        assert params.epochs.tag == "epoch-pk"

    def test_one_snark_mode_skips_helper(self):
        from types import SimpleNamespace
        from celo_bls_snark_tpu.snark.api import setup

        def boom(hcs, rng):
            raise AssertionError("helper setup must not run")

        params = setup(
            2, 1, 0, None, boom,
            lambda cs, rng: SimpleNamespace(vk=None), hashes_in_bls12_377=False,
        )
        assert params.hash_to_bits is None
