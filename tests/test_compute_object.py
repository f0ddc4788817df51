"""Stateful compute object (csparse declareSet/Get/Copy parity —
lib/@csparse/csparse.m:296,345,406) and the extended tutorial ports
that drive it (tutorialLQextended / NN1 / NNextended / FIMextended)."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import tenscalc_tpu as tc


def test_compute_object_atomic_copy():
    """declareCopy semantics: all right-hand sides evaluate BEFORE any
    assignment (atomic multi-assign, csparse.m:406)."""
    a = tc.variable("co_a", (2,))
    b = tc.variable("co_b", (2,))
    obj = tc.compute_object(
        inputs=[],
        outputs={"a": a, "b": b},
        state={a: np.array([1.0, 2.0]), b: np.array([10.0, 20.0])},
        updates={"swap": {a: b, b: a}},
    )
    obj.copy("swap")
    np.testing.assert_allclose(np.asarray(obj.get("a")), [10.0, 20.0])
    np.testing.assert_allclose(np.asarray(obj.get("b")), [1.0, 2.0])


def test_compute_object_validates_targets():
    a = tc.variable("cov_a", (2,))
    x = tc.variable("cov_x", (2,))
    with pytest.raises(ValueError, match="non-state"):
        tc.compute_object(
            inputs=[x], outputs={"a": a}, state={a: np.zeros(2)},
            updates={"bad": {x: a}},
        )


def test_tutorial_lq_extended():
    from examples import tutorial_lq_extended

    out = tutorial_lq_extended.main(verbose=False)
    # both factorization routes land on the closed-form optimum
    np.testing.assert_allclose(out["u2"], out["ustar"], atol=1e-8)
    np.testing.assert_allclose(out["J1"], out["J2"], rtol=1e-10)
    assert out["J1"] < out["J0"]
    # J* == ||A x0||^2 - x0'A'B H^-1 B'A x0 + ... : just check optimality
    # via a perturbation
    assert out["J1"] <= out["J0"]


def test_tutorial_nn1_trains():
    from examples import tutorial_nn1

    losses = tutorial_nn1.main(n_batches=120, verbose=False)
    assert losses[-10:].mean() < 0.5 * losses[:10].mean(), (
        losses[:10].mean(), losses[-10:].mean(),
    )


def test_tutorial_nn_extended_trains_with_adaptive_alpha():
    from examples import tutorial_nn_extended

    losses, alphas = tutorial_nn_extended.main(n_batches=60, verbose=False)
    assert losses[-10:].mean() < losses[:10].mean()
    assert (alphas > 0).all()


def test_tutorial_fim_extended_matches_batched():
    """Streaming accumulation == the one-shot batched FIM of the base
    tutorial (same samples)."""
    from examples import tutorial_fim_extended

    chunk, n_chunks = 256, 4
    obj, ns = tutorial_fim_extended.build(chunk)
    rng = np.random.default_rng(0)
    theta = rng.random(6)
    M = np.eye(3) + rng.random((3, 3))
    R = rng.random((2, 2))
    invS = R.T @ R
    obj.set(ns + "theta", theta)
    obj.set(ns + "M", M)
    obj.set(ns + "invS", invS)
    obj.copy("reset")
    ts, ps = [], []
    for _ in range(n_chunks):
        t = rng.random(chunk)
        p = 5.0 + rng.random((chunk, 3))
        ts.append(t), ps.append(p)
        obj.set(ns + "t", t)
        obj.set(ns + "p", p)
        obj.copy("accumulate")
    FIM_stream = np.asarray(obj.get("FIM"))

    from examples import tutorial_fim

    fn = tutorial_fim.build(chunk * n_chunks, ns="fimref_")
    out = fn(
        fimref_theta=theta,
        fimref_t=np.concatenate(ts),
        fimref_M=M,
        fimref_p=np.concatenate(ps),
        fimref_invS=invS,
    )
    np.testing.assert_allclose(FIM_stream, np.asarray(out["FIM"]), rtol=1e-9)
    assert np.all(np.linalg.eigvalsh(FIM_stream) >= -1e-9)
