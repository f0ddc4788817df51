"""Fisher-information tutorial — port of the reference
/root/reference/examples/csparse/tutorialFIM.m.

A camera at position ``p`` with projection matrix ``M`` observes a
target moving as ``q(t) = theta[0:3] + theta[3:6] t``; the projected
measurement is ``mu = (M[0:2] (p-q)) / (M[2] (p-q))`` and the Fisher
information about the motion parameters ``theta`` accumulated over many
(t, p) samples is ``sum_s g_s' invS g_s`` with ``g_s = d mu_s / d theta``
(tutorialFIM.m:18-24: g = gradient(mu, theta); FIM = tprod(g, [-1,1],
invS, [-1,-2], g, [-2,2])).

The reference accumulates the FIM with a 100000-iteration MATLAB loop
around a compiled per-sample kernel (tutorialFIM.m:57-64).  The
TPU-native design batches the samples as a leading axis *inside the
expression layer*: ``gradient`` of the batched measurement gives the
stacked (S, 2, 6) Jacobian in one shot and ``tprod`` contracts the whole
batch on the MXU — no Python loop, one fused jit.
"""

from __future__ import annotations

import numpy as np

import tenscalc_tpu as tc


def build(S, ns="fim_"):
    theta = tc.variable(ns + "theta", (6,))   # initial position/velocity
    t = tc.variable(ns + "t", (S,))           # sample times
    M = tc.variable(ns + "M", (3, 3))         # camera matrix
    p = tc.variable(ns + "p", (S, 3))         # camera positions
    invS = tc.variable(ns + "invS", (2, 2))   # error information matrix

    # q_s = theta[0:3] + theta[3:6] * t_s   — (S, 3)
    q = tc.tprod(tc.Tones((S,)), [1], theta[0:3], [2]) + tc.tprod(
        t, [1], theta[3:6], [2]
    )
    d = p - q                                  # (S, 3)
    num = d @ M[0:2].T                         # (S, 2)
    den = d @ M[2:3].T                         # (S, 1)
    mu = num / den                             # (S, 2), broadcast divide

    # stacked per-sample Jacobian d mu / d theta: (S, 2, 6)
    g = tc.gradient(mu, theta)

    # FIM = sum_s g_s' invS g_s  — one MXU contraction over the batch
    FIM = tc.tprod(g, [-3, -1, 1], invS, [-1, -2], g, [-3, -2, 2])

    return tc.compute([theta, t, M, p, invS], {"FIM": FIM, "mu": mu})


def main(S=100000, seed=0):
    fn = build(S)
    rng = np.random.default_rng(seed)
    theta = rng.random(6)
    M = np.eye(3) + rng.random((3, 3))
    R = rng.random((2, 2))
    invS = R.T @ R
    t = rng.random(S)
    p = 5.0 + rng.random((S, 3))  # 5+ keeps p away from q (tutorialFIM.m:60)

    out = fn(fim_theta=theta, fim_t=t, fim_M=M, fim_p=p, fim_invS=invS)
    FIM = np.asarray(out["FIM"])

    # oracle on a subsample: finite-difference-free numpy Jacobian
    def mu_np(th, ti, pi):
        q = th[:3] + th[3:] * ti
        d = pi - q
        return (M[:2] @ d) / (M[2] @ d)

    import jax

    jac = jax.jacfwd(lambda th, ti, pi: mu_np(th, ti, pi))
    # full-batch oracle (vectorized with jax for speed)
    gall = np.asarray(jax.vmap(jac, in_axes=(None, 0, 0))(theta, t, p))
    full = np.einsum("sij,ik,skl->jl", gall, invS, gall)
    err = np.abs(FIM - full).max() / max(np.abs(full).max(), 1.0)
    print(f"S={S}  ||FIM||_max={np.abs(FIM).max():.4f}  rel err={err:.2e}")
    assert err < 1e-4, err
    assert np.allclose(FIM, FIM.T, atol=1e-5 * np.abs(FIM).max())
    return FIM


if __name__ == "__main__":
    main()
