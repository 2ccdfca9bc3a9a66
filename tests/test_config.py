"""CLI / config layer tests (flag surface + vanilla profile + path defaults)."""

import pytest

from nerf_sandbox_tpu.config import (
    Config, apply_path_defaults, apply_vanilla_profile, build_argparser,
    make_cfg_from_args, parse_scheduler_params, str2bool)


def _parse(extra):
    args = build_argparser().parse_args(
        ["--data_root", "/tmp/x", "--out_dir", "/tmp/y"] + extra)
    return make_cfg_from_args(args)


def test_minimal_parse_defaults():
    cfg = _parse([])
    assert cfg.nc == 64 and cfg.nf == 128
    assert cfg.rays_per_batch == 2048
    assert cfg.max_steps == 200_000
    # 'auto' data kind: centering resolved by the CLI after kind detection
    assert cfg.centering is None
    assert make_cfg_from_args(build_argparser().parse_args(
        ["--data_root", "/tmp/x", "--out_dir", "/tmp/y",
         "--data_kind", "blender"])).centering == "none"
    assert cfg.lr_scheduler == "cosine"
    assert isinstance(cfg.lr_scheduler_params, dict)


def test_scheduler_params_json_and_literal():
    assert parse_scheduler_params('{"T_max": 100, "eta_min": 1e-6}') == \
        {"T_max": 100, "eta_min": 1e-6}
    assert parse_scheduler_params("{'T_max': 100}") == {"T_max": 100}
    assert parse_scheduler_params("") == {}
    assert parse_scheduler_params("garbage") == {}


def test_str2bool():
    assert str2bool("True") and str2bool("1") and str2bool("yes")
    assert not str2bool("false") and not str2bool("off")
    with pytest.raises(Exception):
        str2bool("maybe")


def test_vanilla_blender_profile():
    cfg = _parse(["--data_kind", "blender", "--vanilla"])
    cfg = apply_vanilla_profile(cfg)
    assert cfg.rays_per_batch == 1024
    assert cfg.white_bkgd is True and cfg.use_ndc is False
    assert cfg.sample_from_single_frame is False
    assert cfg.precrop_iters == 0
    assert cfg.infinite_last_bin is True
    assert cfg.raw_noise_std == 1.0
    assert cfg.sigma_activation == "relu"


def test_vanilla_llff_profile():
    cfg = _parse(["--data_kind", "llff", "--vanilla"])
    cfg = apply_vanilla_profile(cfg)
    assert cfg.use_ndc is True and cfg.ndc_near_plane_world == 1.0
    assert cfg.sample_from_single_frame is True
    assert cfg.precrop_iters == 1000 and cfg.precrop_frac == 0.5
    assert cfg.white_bkgd is True


def test_vanilla_resets_ert_unless_explicit():
    """--vanilla means exact reference eval semantics: early ray termination
    off, unless the user explicitly opted back in (ADVICE r2)."""
    from nerf_sandbox_tpu.config import explicit_flag_names
    cfg = _parse(["--data_kind", "blender", "--vanilla"])
    cfg = apply_vanilla_profile(cfg)
    assert cfg.eval_ert_eps == 0.0
    argv = ["--data_root", "x", "--out_dir", "y", "--vanilla",
            "--eval_ert_eps", "1e-4"]
    cfg = _parse(["--data_kind", "blender", "--vanilla",
                  "--eval_ert_eps", "1e-4"])
    cfg = apply_vanilla_profile(cfg, explicit=explicit_flag_names(argv))
    assert cfg.eval_ert_eps == 1e-4


def test_llff_centering_default():
    cfg = _parse(["--data_kind", "llff"])
    assert cfg.centering == "auto"


def test_path_defaults_blender():
    cfg = _parse(["--data_kind", "blender"])
    cfg = apply_path_defaults(cfg, "blender")
    assert cfg.path_type == "blender"
    assert cfg.bl_phi_deg == -30.0 and cfg.bl_rots == 1.0
    assert cfg.bl_theta_start_deg == -180.0 and cfg.bl_radius is None


def test_path_defaults_llff():
    cfg = _parse(["--data_kind", "llff"])
    cfg = apply_path_defaults(cfg, "llff")
    assert cfg.path_type == "llff_spiral"
    assert cfg.rots == 2.0 and cfg.zrate == 0.5 and cfg.path_zflat is False


def test_explicit_flags_survive_path_defaults():
    cfg = _parse(["--data_kind", "llff", "--rots", "5.0"])
    cfg = apply_path_defaults(cfg, "llff")
    assert cfg.rots == 5.0


def test_micro_chunk_derivation():
    cfg = _parse(["--micro_chunks", "4"])
    assert cfg.train_micro_chunks == 4 and cfg.eval_micro_chunks == 4
    cfg = _parse(["--micro_chunks", "4", "--train_micro_chunks", "2"])
    assert cfg.train_micro_chunks == 2 and cfg.eval_micro_chunks == 4


def test_vanilla_forces_with_warning(capsys):
    from nerf_sandbox_tpu.config import (
        Config, apply_vanilla_profile, explicit_flag_names)
    argv = ["--data_root", "x", "--out_dir", "y", "--vanilla", "--nf", "64"]
    explicit = explicit_flag_names(argv)
    assert "nf" in explicit and "nc" not in explicit
    cfg = Config(data_kind="blender", nf=64)
    cfg = apply_vanilla_profile(cfg, explicit=explicit)
    assert cfg.nf == 128                      # reference semantics: forced
    out = capsys.readouterr().out
    assert "overriding --nf" in out           # ...but no longer silent


def test_noop_flag_notes(capsys):
    from nerf_sandbox_tpu.config import explicit_flag_names, warn_noop_flags
    warn_noop_flags(explicit_flag_names(
        ["--data_root", "x", "--out_dir", "y", "--train_chunk", "4096"]))
    assert "--train_chunk" in capsys.readouterr().out
    warn_noop_flags(explicit_flag_names(["--data_root", "x", "--out_dir", "y"]))
    assert capsys.readouterr().out == ""
