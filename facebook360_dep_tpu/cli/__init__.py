

# initDep parity (util/SystemUtil.h:36-41): the reference installs
# SIGSEGV/FPE/ILL/ABRT handlers that dump stack traces; Python's
# faulthandler provides the same for every CLI entry point.
import faulthandler as _faulthandler

if not _faulthandler.is_enabled():
    _faulthandler.enable()
