from .mpc import Mpc  # noqa: F401
from .mpcmhe import Mpcmhe  # noqa: F401
from .lasso import Lasso  # noqa: F401
from .nlss import NLSS  # noqa: F401
from .sysid import Sysid  # noqa: F401
