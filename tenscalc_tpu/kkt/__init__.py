from .dense import ldl_factor, ldl_solve, ldl_inertia, symmetric_solve  # noqa: F401
