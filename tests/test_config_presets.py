"""Launch-file-equivalent JSON presets (reference launch/**/*.launch ->
graph_slam_tpu/configs/*.json; SURVEY §5 'launch-file presets become
YAML/JSON configs')."""

import json

import pytest

from graph_slam_tpu.config import (
    SlamParams,
    load_config_dict,
    load_params,
    preset_names,
    preset_path,
)
from graph_slam_tpu.pipelines.vio import VioConfig

pytestmark = pytest.mark.fast


EXPECTED = {
    "g2o_go", "gtsam_go", "gtsam_imuMEMS_go", "gtsam_imuVN100_go",
    "gtsam_imuVN100_planes", "rgbdslam_imu_offline", "rgbdslam_offline",
}


def test_preset_inventory():
    assert EXPECTED <= set(preset_names())


def test_every_preset_loads_as_slamparams_and_vioconfig():
    for name in preset_names():
        params = load_params(name)
        assert isinstance(params, SlamParams)
        data = load_config_dict(name)
        assert "description" in data and "source" in data
        # vio sections must be valid VioConfig overrides
        VioConfig(**data.get("vio", {}))


def test_gtsam_go_matches_launch_values():
    # launch/graph_slam/gtsam_go.launch: vo_small_translation 0.04,
    # vo_small_rotation 2, gt_lookback_nodes 5
    p = load_params("gtsam_go")
    assert p.small_translation == 0.04
    assert p.small_rotation == 2.0
    assert p.lookback_nodes == 5


def test_mems_preset_pitch_and_lookback():
    # gtsam_imuMEMS_go.launch: gt_initial_pitch -14.7, gt_lookback_nodes 0
    p = load_params("gtsam_imuMEMS_go")
    assert p.initial_pitch_degree == -14.7
    assert p.lookback_nodes == 0
    assert load_config_dict("gtsam_imuMEMS_go")["imu_type"] == "mems"


def test_flagship_vio_preset_matches_launch():
    # gtsam_imuVN100_go.launch: plane_aided false, chi2_for_vro false,
    # min_num_pts_of_plane 5000
    d = load_config_dict("gtsam_imuVN100_go")
    assert d["vio"]["plane_mode"] == "off"
    assert d["vio"]["chi2_vro_gate"] is False
    assert d["vio"]["min_plane_support"] == 5000
    # the plane-aided variant flips only the plane policy
    d2 = load_config_dict("gtsam_imuVN100_planes")
    assert d2["vio"]["plane_mode"] == "rescue"


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"optimize_step": 5, "not_a_param": 1}))
    with pytest.raises(ValueError, match="not_a_param"):
        load_params(str(bad))


def test_missing_preset_message():
    with pytest.raises(FileNotFoundError, match="gtsam_go"):
        load_params("no_such_preset")


def test_path_still_works(tmp_path):
    p = tmp_path / "ovr.json"
    p.write_text(json.dumps({"optimize_step": 3}))
    assert load_params(str(p)).optimize_step == 3
    assert preset_path("gtsam_go").endswith("configs/gtsam_go.json")


def test_cli_presets_command(capsys):
    from graph_slam_tpu.cli import main

    main(["presets"])
    out = capsys.readouterr().out
    for name in EXPECTED:
        assert name in out
