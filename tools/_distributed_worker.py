"""Worker for the 2-process jax.distributed smoke test."""
import json, os, sys

REPO = os.environ.get("TC_REPO", "/root/repo")
sys.path.insert(0, REPO)
pid = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coord, num_processes=nproc, process_id=pid
)
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

n_local = len(jax.local_devices())
n_global = len(jax.devices())
assert n_global == nproc * n_local, (n_global, nproc, n_local)

import tenscalc_tpu as tc
from examples import mpc_dcmotor
from tenscalc_tpu.parallel import batched_solve_fn

# ---- phase 1: batch-sharded fleet across the process mesh ----------
T = 6
ns = "dw_"
solver = mpc_dcmotor.build_solver(T=T, namespace=ns)
base = mpc_dcmotor.default_params(T, ns)
B = 2 * n_global
rng = np.random.default_rng(0)
params = {}
for k, v in base.items():
    arr = np.asarray(v, float)
    params[k] = np.broadcast_to(arr, (B,) + arr.shape).copy()
params[ns + "ref"] = np.stack(
    [mpc_dcmotor.reference_signal(t0 + np.arange(T) * 0.1)[None, :]
     for t0 in np.linspace(0.0, 2.0, B)]
)
params[ns + "xinit"] = rng.uniform(-0.1, 0.1, (B, 2, 1))
inits = {
    ns + "x": params[ns + "xinit"] + 0.01 * rng.random((B, 2, T)),
    ns + "u": 0.01 * rng.random((B, 1, T - 1)),
}
env = {v.name: jnp.asarray(np.asarray(inits[v.name]), float).reshape(B, -1)
       for v in solver.variables}
u0_host = np.concatenate(
    [np.asarray(env[nm]) for nm in solver.packing.names], axis=1
)
penv_host = {p.name: np.asarray(params[p.name], float)
             for p in solver.parameters}

mesh = Mesh(np.array(jax.devices()), ("batch",))
sh = NamedSharding(mesh, P("batch"))

def to_global(a):
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("batch")), a[pid * (B // nproc):(pid + 1) * (B // nproc)]
    )

u0 = to_global(u0_host)
penv = {k: to_global(v) for k, v in penv_host.items()}
dt = solver.opts.np_dtype
fn = batched_solve_fn(solver, mesh=mesh)
res = fn(jnp.asarray(u0, dt), penv, jnp.asarray(1e-3, dt), 40,
         jnp.asarray(1e-9, dt), jnp.asarray(1e-9, dt))
from jax.experimental import multihost_utils
statuses = np.asarray(multihost_utils.process_allgather(res.status, tiled=True))
iters = np.asarray(multihost_utils.process_allgather(res.iters, tiled=True))
fleet_ok = int((statuses == 0).sum())

# ---- phase 2: SPIKE horizon-sharded KKT across the process mesh ----
smesh = Mesh(np.array(jax.devices()), ("stages",))
Ts_, n_ = 16, 2
x = tc.variable(ns + "spk_x", (Ts_, n_))
u = tc.variable(ns + "spk_u", (Ts_,))
x0 = tc.parameter(ns + "spk_x0", (n_,))
A = np.array([[0.95, 0.1], [0.0, 0.9]])
Bm = np.array([0.0, 1.0])
dyn = x[1:] - (x[:-1] @ A.T + u[:-1, None] * Bm)
J = tc.norm2(x) + 0.1 * tc.norm2(u)
spk = tc.optimize(
    J, [x, u],
    constraints=[dyn == 0, x[0] == x0, u >= -1.0, u <= 1.0],
    parameters=[x0], kkt_backend="spike", kkt_mesh=smesh,
)
sol = spk.solve(
    parameters={ns + "spk_x0": np.array([1.0, -0.5])},
    init={ns + "spk_x": np.zeros((Ts_, n_)), ns + "spk_u": np.zeros(Ts_)},
    max_iter=40,
)
out = dict(
    process=pid, n_local=n_local, n_global=n_global,
    fleet_batch=B, fleet_converged=fleet_ok,
    fleet_statuses=statuses.tolist(), fleet_iters=iters.tolist(),
    spike_status=int(sol.status), spike_iters=int(sol.iters),
    spike_J=float(sol.objective),
)
print("RESULT:" + json.dumps(out), flush=True)
jax.distributed.shutdown()
