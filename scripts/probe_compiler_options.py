"""Probe which per-compile XLA compiler options the TPU backend accepts.

Evidence artifact for the collective-overlap / scheduler flag path (VERDICT r2
item 8): the axon-tunneled backend VALIDATES compiler options — a bogus name
raises — so an accepted name provably reaches the real compiler. Run on TPU:

    python scripts/probe_compiler_options.py

Prints one line per candidate: ACCEPTED / REJECTED(<err head>). The accepted
set is recorded in BASELINE.md; gsplat_tpu.dist.mesh uses the same mechanism
to evidence the latency-hiding-scheduler flags.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

CANDIDATES = [
    # control (must accept)
    {"xla_tpu_scoped_vmem_limit_kib": "16384"},
    # control (must reject)
    {"xla_tpu_definitely_not_a_real_flag_gsplat": "1"},
    # latency-hiding scheduler (the LIBTPU_INIT_ARGS analogue, per-compile)
    {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    {"xla_latency_hiding_scheduler_rerun": "2"},
    # memory-space-assignment cost model / limits
    {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.1"},
    {"xla_tpu_memory_space_assignment_max_repacks": "0"},
    {"xla_tpu_alternate_memory_benefit_scaling_factor": "0.1"},
    {"xla_tpu_enable_alternate_memory": "false"},
    {"xla_tpu_alternate_memory_size": "0"},
    {"xla_tpu_msa_max_outstanding_prefetches": "1"},
    {"xla_tpu_memory_space_assignment_max_outstanding_async_copies": "1"},
    {"xla_tpu_prefetch_interval_picker_size_override": "0"},
    {"xla_tpu_cross_program_prefetch_limit": "0"},
    {"xla_tpu_enable_vmem_prefetching": "false"},
    {"xla_tpu_vmem_prefetch_limit_bytes": "0"},
    # scheduler memory pressure
    {"xla_tpu_scheduler_percent_shared_memory_limit": "90"},
    # misc perf knobs worth knowing about
    {"xla_tpu_enable_aggressive_loop_fusion": "true"},
    {"xla_tpu_licm_size_inflation_ratio": "1"},
    {"xla_tpu_enable_dot_strength_reduction": "false"},
]


def main():
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev.device_kind}")

    def f(x):
        return (x @ x).sum()

    x = jnp.ones((256, 256), jnp.float32)
    lowered = jax.jit(f).lower(x)
    accepted = []
    for opts in CANDIDATES:
        name = next(iter(opts))
        try:
            lowered.compile(compiler_options=opts)
            print(f"ACCEPTED  {name}={opts[name]}")
            accepted.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue probing
            msg = str(e).split("\n")[0][:110]
            print(f"REJECTED  {name}  ({msg})")
    print(f"\naccepted: {accepted}")


if __name__ == "__main__":
    main()
