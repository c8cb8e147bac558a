"""ephemeris_explorer_tpu: a TPU-native ephemeris generation & exploration engine.

A ground-up JAX/XLA rebuild of the compute core of Canleskis/ephemeris-explorer
(N-body propagation, piecewise-polynomial ephemerides, spacecraft flight-plan
propagation) designed TPU-first: lax.scan time stepping, batched least-squares
fits, vmapped spacecraft ensembles, shard_map scale-out.

f64 note: the engine computes in f64.  On CPU that is native IEEE double; on
TPU, XLA lowers f64 to fast double-word f32 emulation (~48-bit mantissa),
which is the extended-precision strategy this package is designed around.
"""

import os as _os

import jax as _jax

# The engine requires x64 semantics everywhere (km-scale positions at mm-scale
# precision).  Must run before any array is created.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: scan-heavy programs take minutes to compile
# through remote-compile TPU setups; cached executables bring warm starts to
# seconds.  Override the location with EET_JAX_CACHE_DIR ("" disables).
_cache_dir = _os.environ.get(
    "EET_JAX_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "ephemeris_explorer_tpu", "jax"),
)
if _cache_dir:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from . import ftime  # noqa: E402
from .ftime import Duration, Epoch  # noqa: E402

__version__ = "0.1.0"
