from .batch import batched_solve_fn, solve_batched, make_mesh  # noqa: F401
