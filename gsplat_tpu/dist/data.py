"""Multi-host input pipeline helpers.

SURVEY.md §2.2 'Data parallel' row: shard the camera batch over the `data` mesh
axis with per-host input pipelines feeding
`jax.make_array_from_process_local_data`. Single-process meshes work unchanged
(the local data IS the global batch); on a multi-host pod slice each process
passes only the batch rows its own data-axis columns consume.

Validated single-process on virtual CPU meshes; multi-host paths follow the
documented JAX contract (no multi-host hardware is available in CI).
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsplat_tpu.core.camera import Camera
from gsplat_tpu.dist.mesh import DATA_AXIS


def camera_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (camera-batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def global_camera_batch(mesh: Mesh, local_cams: List[Camera]) -> Camera:
    """Assemble a globally-sharded camera batch from process-local cameras.

    Every leaf becomes a global jax.Array of global batch size
    mesh.shape['data'], sharded over the data axis; each process contributes
    the rows owned by its addressable devices (single-process: all of them).
    """
    sharding = camera_batch_sharding(mesh)
    n_local = len(local_cams)

    def leaf(name):
        vals = np.stack([np.asarray(getattr(c, name)) for c in local_cams])
        return jax.make_array_from_process_local_data(sharding, vals)

    first = local_cams[0]
    assert all(
        (c.width, c.height) == (first.width, first.height) for c in local_cams
    ), "mixed resolutions in a camera batch"
    has_img = first.image is not None
    return Camera(
        world_view=leaf("world_view"),
        full_proj=leaf("full_proj"),
        cam_center=leaf("cam_center"),
        tan_fovx=leaf("tan_fovx"),
        tan_fovy=leaf("tan_fovy"),
        image=leaf("image") if has_img else None,
        width=first.width,
        height=first.height,
        image_name="",
        uid=0,
    )


def replicate_gaussians(mesh: Mesh, g):
    """Place the Gaussian pytree fully replicated on every device of the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(g, rep)


def shard_gaussians(mesh: Mesh, g, opt_state=None):
    """Shard every (CAP, ...) leaf of the Gaussian pytree (and optionally the
    Adam state) over the `data` axis — the memory layout of
    make_sharded_spmd_train_step. Scalars stay replicated."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    g_sharded = jax.tree.map(
        lambda x: jax.device_put(x, row if getattr(x, "ndim", 0) >= 1 else rep), g
    )
    if opt_state is None:
        return g_sharded
    opt_sharded = jax.tree.map(
        lambda x: jax.device_put(x, row if getattr(x, "ndim", 0) >= 1 else rep),
        opt_state,
    )
    return g_sharded, opt_sharded
