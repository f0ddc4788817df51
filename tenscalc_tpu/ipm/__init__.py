from .options import SolverOptions  # noqa: F401
from .status import SolverStatus, describe_status  # noqa: F401
