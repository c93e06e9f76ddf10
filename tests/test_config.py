"""Config/CLI surface tests: upstream names, defaults, parse behavior
(reference src/arguments/params.{h,cpp})."""

from gsplat_tpu.config import (
    MeshParams,
    ModelParams,
    OptimizationParams,
    OtherParams,
    PipelineParams,
    cfg_args_string,
    parse_parameters,
    print_params,
)


def test_defaults_match_reference():
    opt = OptimizationParams()
    # reference src/arguments/params.h:50-91
    assert opt.iterations == 30_000
    assert abs(opt.position_lr_init - 1.6e-4) < 1e-12
    assert abs(opt.position_lr_final - 1.6e-6) < 1e-12
    assert opt.position_lr_delay_mult == 0.01
    assert opt.position_lr_max_steps == 30_000
    assert opt.feature_lr == 0.0025
    assert opt.opacity_lr == 0.05
    assert opt.scaling_lr == 0.005
    assert opt.rotation_lr == 0.001
    assert opt.percent_dense == 0.01
    assert opt.lambda_dssim == 0.2
    assert opt.densification_interval == 100
    assert opt.opacity_reset_interval == 3000
    assert opt.densify_from_iter == 500
    assert opt.densify_until_iter == 15_000
    assert opt.densify_grad_threshold == 0.0002
    assert not opt.random_background

    model = ModelParams()
    assert model.sh_degree == 3
    assert model.images == "images"
    assert model.resolution == -1
    assert not model.white_background and not model.eval

    other = OtherParams()
    assert other.ip == "127.0.0.1" and other.port == 6009
    assert other.save_iterations == [7_000, 30_000]
    assert other.test_iterations == [7_000, 30_000]
    assert other.checkpoint_iterations == []

    pipe = PipelineParams()
    assert not pipe.convert_SHs_python and not pipe.compute_cov3D_python and not pipe.debug


def test_parse_parameters_cli():
    model, opt, pipe, other, mesh = parse_parameters(
        [
            "--source_path", "/data/garden",
            "--white_background",
            "--eval",
            "--iterations", "7000",
            "--save_iterations", "1000", "2000",
            "--tile_axis", "4",
        ]
    )
    assert model.source_path == "/data/garden"
    assert model.white_background and model.eval
    assert opt.iterations == 7000
    assert other.save_iterations == [1000, 2000]
    assert mesh.tile_axis == 4
    assert isinstance(mesh, MeshParams)


def test_print_and_cfg_args():
    s = print_params(ModelParams())
    assert "> Model parameters:" in s and "sh_degree: 3" in s
    cfg = cfg_args_string(ModelParams(source_path="/x"))
    assert cfg.startswith("Namespace(") and "source_path='/x'" in cfg
