"""cache_keys installer: env gating, idempotency, and graceful degradation.

The real effect (Mosaic payloads stripped of source locations -> stable
persistent-cache keys) needs the TPU lowering path and is validated on
hardware by scripts/kernel_key_probe.py; these tests pin the installer's
contract, which must hold on any backend."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(code: str, **env_over):
    import os

    env = dict(os.environ, **env_over)
    return subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd=str(REPO), env=env,
    )


def test_install_idempotent_and_wraps():
    p = _run(
        "import sys; sys.path.insert(0, '.');"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from jax._src import tpu_custom_call as t;"
        "orig = t._lower_mosaic_module_to_asm;"
        "from gsplat_tpu.cache_keys import install_stable_kernel_keys as i;"
        "assert i() is True;"
        "wrapped = t._lower_mosaic_module_to_asm;"
        "assert wrapped is not orig;"
        "assert i() is True;"
        "assert t._lower_mosaic_module_to_asm is wrapped, 'double-wrapped';"
        "print('OK')"
    )
    assert p.returncode == 0 and "OK" in p.stdout, (p.stdout, p.stderr[-2000:])


def test_env_disable():
    p = _run(
        "import sys; sys.path.insert(0, '.');"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from jax._src import tpu_custom_call as t;"
        "orig = t._lower_mosaic_module_to_asm;"
        "from gsplat_tpu.cache_keys import install_stable_kernel_keys as i;"
        "assert i() is False;"
        "assert t._lower_mosaic_module_to_asm is orig, 'patched while disabled';"
        "print('OK')",
        GSPLAT_STRIP_KERNEL_LOCS="0",
    )
    assert p.returncode == 0 and "OK" in p.stdout, (p.stdout, p.stderr[-2000:])
