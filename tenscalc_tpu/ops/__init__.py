from . import fns, tseries  # noqa: F401
