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
