

# initDep parity (util/SystemUtil.h:36-41): the reference installs
# SIGSEGV/FPE/ILL/ABRT/TERM handlers that dump stack traces; Python's
# faulthandler provides the fatal-signal set, and SIGTERM is registered
# explicitly (dump-and-continue, so orchestrators' soft kills leave a trace
# of where the process was — the reference's sigtermHandler behavior).
import faulthandler as _faulthandler

if not _faulthandler.is_enabled():
    _faulthandler.enable()

import signal as _signal
import sys as _sys

if hasattr(_faulthandler, "register") and hasattr(_signal, "SIGTERM"):
    try:
        _faulthandler.register(_signal.SIGTERM, file=_sys.stderr, chain=True)
    except (ValueError, OSError):  # non-main thread / exotic platforms
        pass

# Large-buffer allocator tuning (see core/hostmem.py): without it every
# image-sized numpy temp re-pays first-touch page faults per call.
from ..core.hostmem import tune_malloc as _tune_malloc

_tune_malloc()

# Platform override for CLI processes: the environment may force-set
# JAX_PLATFORMS (e.g. to a tunneled accelerator), and farm worker
# subprocesses must be steerable to the CPU backend for tests/host-only
# stages. Honored before any CLI touches jax.
import os as _os

_plat = _os.environ.get("DEP_JAX_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
