

# initDep parity (util/SystemUtil.h:36-41): the reference installs
# SIGSEGV/FPE/ILL/ABRT handlers that dump stack traces; Python's
# faulthandler provides the same for every CLI entry point.
import faulthandler as _faulthandler

if not _faulthandler.is_enabled():
    _faulthandler.enable()

# Platform override for CLI processes: the environment may force-set
# JAX_PLATFORMS (e.g. to a tunneled accelerator), and farm worker
# subprocesses must be steerable to the CPU backend for tests/host-only
# stages. Honored before any CLI touches jax.
import os as _os

_plat = _os.environ.get("DEP_JAX_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
