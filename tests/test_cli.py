"""CLI/config plumbing: reference-style flags, YAML presets, overrides."""

import numpy as np
import pytest

from gdmcf_tpu.config import Config, load_config, parse_args


def test_reference_style_invocation_parses():
    """The README recipe's exact flag syntax (ref README.md:29)."""
    cfg = parse_args([
        "--dataset=yelp_clean", "--data_path=./Datasets/yelp_clean/",
        "--lr=0.00001", "--weight_decay=0.0", "--batch_size=400",
        "--dims=[1000]", "--steps=5", "--noise_scale=0.01",
        "--log_name=log", "--gpu=0", "--random_seed=0"])
    assert cfg.lr == 1e-5
    assert cfg.batch_size == 400
    assert cfg.dims == [1000]
    assert cfg.steps == 5
    assert cfg.random_seed == 0


def test_yaml_preset_with_cli_override(tmp_path):
    preset = tmp_path / "p.yaml"
    preset.write_text("backbone: 'DNN'\nlr: 0.001\nbatch_size: 64\n"
                      "dims: [128]\nsteps: 5\n")
    cfg = parse_args(["-c", str(preset), "--lr=0.01"])
    assert cfg.backbone == "DNN"
    assert cfg.lr == 0.01          # CLI wins over YAML
    assert cfg.batch_size == 64    # YAML wins over default
    assert cfg.dims == [128]


def test_shipped_presets_load():
    for preset in ("configs/yelpOneEmbGcn.yaml", "configs/amazonOneEmbGcn.yaml"):
        cfg = load_config(preset)
        assert cfg.backbone == "DNNOneHotEmbeddingGCN"
        assert cfg.OneHotMatrix == 2
        assert cfg.steps == 5


def test_optional_int_and_none_coercion():
    cfg = parse_args(["--n_user_cap=3000"])
    assert cfg.n_user_cap == 3000 and isinstance(cfg.n_user_cap, int)
    cfg2 = parse_args(["--n_user_cap=none"])
    assert cfg2.n_user_cap is None


def test_bool_flag_forms():
    cfg = parse_args(["--debug", "--tst_w_val=true", "--norm=false"])
    assert cfg.debug is True
    assert cfg.tst_w_val is True
    assert cfg.norm is False


def test_unknown_yaml_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("not_a_flag: 1\n")
    with pytest.raises(KeyError, match="not_a_flag"):
        load_config(str(bad))


def test_topn_string_form():
    cfg = parse_args(["--topN=[10, 20, 50, 100]"])
    assert cfg.topN == [10, 20, 50, 100]


def test_dims_and_out_dims_onehot1():
    cfg = Config(dims=[300, 1000], batch_size=7, OneHotMatrix=1)
    assert cfg.out_dims(50) == [300, 1000, 57]
    assert cfg.in_dims(50) == [57, 1000, 300]


def test_package_lazy_api_exports():
    """`from gdmcf_tpu import Trainer, Recommender, ...` works (PEP 562
    lazy exports keep bare import cheap); unknown names raise."""
    import gdmcf_tpu

    assert gdmcf_tpu.Trainer.__name__ == "Trainer"
    assert gdmcf_tpu.Recommender.__name__ == "Recommender"
    assert gdmcf_tpu.Diffusion.__name__ == "Diffusion"
    assert callable(gdmcf_tpu.import_reference_checkpoint)
    import pytest
    with pytest.raises(AttributeError):
        gdmcf_tpu.not_a_thing


def test_list_flags_accept_scalars_and_comma_lists():
    """Reference CLI style: --dims takes bare ints (ref parse_args_util
    action='append'); '10,20' is a natural shell form. The old parser
    crashed on scalars and exploded comma lists into characters."""
    from gdmcf_tpu.config import parse_args

    cfg = parse_args(["--dims", "1000", "--topN", "10,20"])
    assert cfg.dims == [1000]
    assert cfg.topN == [10, 20]

    import pytest
    with pytest.raises(ValueError, match="dims"):
        parse_args(["--dims", "not_a_number"])
