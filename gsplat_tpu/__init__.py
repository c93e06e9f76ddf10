"""gsplat-tpu: a TPU-native 3D Gaussian Splatting training framework in JAX.

Built from scratch against the capability surface of the reference
``seiya-kumada/3d_gaussian_splatting`` C++/LibTorch trainer (see SURVEY.md), with the
parts the reference leaves unimplemented (differentiable rasterizer, loss,
densification, point-cloud init, PLY export) completed TPU-first:

- projection / SH / EWA as pure-jnp autodiff-able ops,
- tile binning as XLA lexicographic sort with static pair budgets,
- forward/backward tile compositing as Pallas TPU kernels (hand-written custom_vjp),
- densify/clone/split/prune as jitted ops on capacity-padded HBM arrays,
- multi-chip scaling via jax.sharding Mesh + shard_map over ("data", "tile") axes.
"""

__version__ = "0.1.0"

from gsplat_tpu.config import (  # noqa: F401
    ModelParams,
    OptimizationParams,
    PipelineParams,
    OtherParams,
    MeshParams,
    parse_parameters,
)


def __getattr__(name):
    # lazy: importing the package must not pull in jax (CLI tools set jax
    # config before first jax import)
    if name == "render":
        from gsplat_tpu.render.render import render
        return render
    if name == "train":
        from gsplat_tpu.train.loop import train
        return train
    if name == "Scene":
        from gsplat_tpu.scene import Scene
        return Scene
    if name == "Gaussians":
        from gsplat_tpu.core.gaussians import Gaussians
        return Gaussians
    raise AttributeError(name)
