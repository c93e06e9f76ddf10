"""Stable persistent-compile-cache keys for Pallas kernels.

Round-5 root-cause (VERDICT r4 ask #1, the 12-17-min-per-executable rerun
misses): a Pallas TPU kernel lowers to a `tpu_custom_call` whose
backend_config embeds the serialized Mosaic module — INCLUDING its MLIR
debug locations, which carry absolute file:line for the *whole Python call
stack* above the `pallas_call`. JAX's cache key canonicalizes the outer
StableHLO with `strip-debuginfo`, but that pass cannot see inside the
base64 payload. Net effect: editing ANY source line above a kernel's trace
path — a docstring in loop.py, a comment in a script that wraps the CLI —
silently changes the persistent cache key of every executable whose call
stack shifted, while location-free executables keep hitting. (Diagnosed by
byte-diffing `JAX_DUMP_IR_TO` dumps across runs: the only
post-strip-debuginfo difference was the Mosaic `body` payload, and the
outer `#loc` lines pinpointed the shifted files.)

Fix: run `strip-debuginfo` on the Mosaic module BEFORE mosaic-serde
serialization, by wrapping `jax._src.tpu_custom_call
._lower_mosaic_module_to_asm`. The payload (and therefore the cache key,
and the axon sidechannel's blake3(code) staging key) becomes a pure
function of the traced computation. Cost: Mosaic compile errors lose their
Python source pointers — set GSPLAT_STRIP_KERNEL_LOCS=0 while debugging a
kernel to restore them.

Validated on-chip by scripts/kernel_key_probe.py: two drivers differing
only in leading blank lines lower the same kernel to different canonical
IR without the patch, identical with it.
"""

from __future__ import annotations

import os

_INSTALLED = [False]


def install_stable_kernel_keys() -> bool:
    """Idempotently install the Mosaic-payload location strip. Returns True
    when active (also if already installed), False when disabled by env or
    the jax internals moved (best-effort: degrade to the old behavior)."""
    if os.environ.get("GSPLAT_STRIP_KERNEL_LOCS", "1") != "1":
        return False
    if _INSTALLED[0]:
        return True
    try:
        from jax._src import tpu_custom_call as _tcc
        from jax._src.lib.mlir import passmanager as _pm

        _PM = _pm.PassManager

        orig = _tcc._lower_mosaic_module_to_asm

        def _stripped(module, *, ir_version=None):
            try:
                with module.context as ctx:
                    clone = module.operation.clone()
                    prev = ctx.allow_unregistered_dialects
                    ctx.allow_unregistered_dialects = True
                    try:
                        _PM.parse(
                            "builtin.module(strip-debuginfo)"
                        ).run(clone.operation)
                    finally:
                        ctx.allow_unregistered_dialects = prev
                module = clone
            except Exception:
                pass  # best-effort: fall through with locations intact
            return orig(module, ir_version=ir_version)

        _tcc._lower_mosaic_module_to_asm = _stripped
        _INSTALLED[0] = True
        return True
    except Exception:
        return False
