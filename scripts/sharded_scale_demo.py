"""Sharded-Gaussian scale demonstration (VERDICT r1 item 9 'Done =' criterion).

Runs ONE sharded-Gaussian SPMD train step at 4M Gaussians on an 8-virtual-
device CPU mesh (SURVEY.md §2.2 'Gaussians ... gathered per-tile at large N';
the ZeRO-3-style layout of dist.spmd.make_sharded_spmd_train_step) and prints
a JSON line with the per-device memory accounting:

  - sharded: params + Adam moments + densify accumulators live split over the
    `data` axis (~59 f32/Gaussian / n_data per device),
  - replicated baseline: the same state x1 on EVERY device — at 4M Gaussians
    that is ~0.94 GB/device of state alone, vs ~0.12 GB/device sharded; on a
    16 GB-HBM v5e the replicated layout tops out near 8M Gaussians total while
    the sharded one scales with the mesh.

    python scripts/sharded_scale_demo.py [--capacity 4194304] [--data 4 --tile 2]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=1 << 22)  # 4,194,304
    ap.add_argument("--data", type=int, default=4)
    ap.add_argument("--tile", type=int, default=2)
    ns = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    import numpy as np

    from gsplat_tpu.config import MeshParams, OptimizationParams
    from gsplat_tpu.core.camera import make_camera
    from gsplat_tpu.core.gaussians import create_from_pcd
    from gsplat_tpu.dist.data import shard_gaussians
    from gsplat_tpu.dist.mesh import make_mesh
    from gsplat_tpu.dist.spmd import make_sharded_spmd_train_step, stack_cameras
    from gsplat_tpu.train.optim import init_adam_state
    from tests.fixtures import look_at_rig

    W, H = 128, 64
    mp = MeshParams(tile_size=16, chunk_size=32, pair_budget=1 << 15)
    ndev = ns.data * ns.tile
    mesh = make_mesh(data=ns.data, tile=ns.tile, devices=jax.devices()[:ndev])

    rng = np.random.default_rng(0)
    cap = ns.capacity
    # live points fill the whole capacity — the honest large-N case
    g = create_from_pcd(
        rng.normal(size=(cap, 3)).astype(np.float32) * 2.0,
        rng.random((cap, 3)).astype(np.float32),
        capacity=cap,
    )
    opt_state = init_adam_state(g.params())

    param_floats = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(g.params()))
    state_floats = param_floats * 3  # params + Adam mu + nu
    per_dev_sharded = state_floats * 4 / ns.data / 1e9
    per_dev_replicated = state_floats * 4 / 1e9

    g_sh, st_sh = shard_gaussians(mesh, g, opt_state)
    del g, opt_state

    cams = []
    for R, T in look_at_rig(ns.data):
        img = rng.random((H, W, 3)).astype(np.float32)
        cams.append(make_camera(R, T, fovx=0.9, fovy=0.6, width=W, height=H,
                                image=img))
    cam_batch = stack_cameras(cams)
    bg = jnp.zeros(3)

    step_fn = make_sharded_spmd_train_step(
        mesh, OptimizationParams(), mp, 1.0, W, H, interpret=True
    )
    t0 = time.time()
    g2, st2, loss, ema, n_pairs, n_dropped, n_culled, n_contrib, _ = step_fn(
        g_sh, st_sh, cam_batch, bg, jnp.asarray(1, jnp.int32),
        jnp.zeros((), jnp.float32),
    )
    loss = float(loss)
    dt = time.time() - t0

    from jax.sharding import PartitionSpec as P

    assert g2.xyz.sharding.spec == P("data"), g2.xyz.sharding
    assert st2.mu["xyz"].sharding.spec == P("data")
    shard_rows = g2.xyz.addressable_shards[0].data.shape[0]
    assert shard_rows == cap // ns.data, (shard_rows, cap, ns.data)
    assert np.isfinite(loss)

    print(json.dumps({
        "capacity": cap,
        "mesh": {"data": ns.data, "tile": ns.tile},
        "loss": loss,
        "n_pairs": int(n_pairs),
        "n_dropped": int(n_dropped),
        "rows_per_device": shard_rows,
        "state_gb_per_device_sharded": round(per_dev_sharded, 3),
        "state_gb_per_device_replicated": round(per_dev_replicated, 3),
        "step_seconds_cpu_mesh": round(dt, 1),
        "ok": True,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
