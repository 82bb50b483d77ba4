"""adagrad_torch must be bit-compatible with torch.optim.Adagrad.

The eps placement difference vs optax.adagrad (eps inside vs outside the
sqrt) materially changes first-step updates for small-gradient parameters,
and Adagrad's accumulator freezes that into the whole trajectory — see the
BASELINE.md PRSrank at-scale investigation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from ultra_pytorch_tpu.algorithms.base import adagrad_torch


def test_adagrad_matches_torch_across_gradient_scales():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(6, 5)).astype(np.float32)
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.Adagrad([tp], lr=0.05)
    jopt = adagrad_torch(0.05)
    params = {"w": jnp.array(p0.copy())}
    st = jopt.init(params)

    for step in range(25):
        # Gradient magnitudes sweep 1e-8 .. 1e0: the regime where the
        # optax eps-inside-sqrt variant diverges from torch.
        g = (rng.normal(size=(6, 5))
             * (10.0 ** rng.integers(-8, 1))).astype(np.float32)
        tp.grad = torch.tensor(g.copy())
        topt.step()
        upd, st = jopt.update({"w": jnp.array(g)}, st)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), atol=2e-6)


def test_optax_adagrad_would_not_match():
    """Documents WHY the custom transform exists: stock optax.adagrad
    attenuates the first-step update of a tiny-gradient parameter where
    torch applies a full ±lr kick."""
    g = {"w": jnp.array([1e-7], jnp.float32)}
    params = {"w": jnp.zeros(1, jnp.float32)}

    ours = adagrad_torch(0.05)
    upd, _ = ours.update(g, ours.init(params))
    # torch: -lr * g / (|g| + 1e-10) ~= -lr
    np.testing.assert_allclose(np.asarray(upd["w"]), [-0.05], rtol=1e-3)

    stock = optax.adagrad(0.05, initial_accumulator_value=0.0, eps=1e-10)
    supd, _ = stock.update(g, stock.init(params), params)
    # optax: -lr * g * rsqrt(g^2 + eps) — attenuated ~100x at |g|=1e-7.
    assert abs(float(supd["w"][0])) < 0.002


def test_adagrad_reset_matches_fresh_torch_instance_per_step():
    """The reference DLA instantiates a NEW torch.optim.Adagrad every
    train step (ref dla.py:127,153-154), so its accumulator never
    persists; grad_strategy=ada_reset reproduces that exactly."""
    from ultra_pytorch_tpu.algorithms.base import adagrad_reset

    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    jopt = adagrad_reset(0.05)
    params = {"w": jnp.array(p0.copy())}
    st = jopt.init(params)

    for step in range(10):
        g = (rng.normal(size=(4, 3))
             * (10.0 ** rng.integers(-8, 1))).astype(np.float32)
        # fresh optimizer instance each step, like the reference's DLA
        topt = torch.optim.Adagrad([tp], lr=0.05)
        tp.grad = torch.tensor(g.copy())
        topt.step()
        upd, st = jopt.update({"w": jnp.array(g)}, st)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   tp.detach().numpy(), atol=2e-6)
    # and it is NOT what persistent Adagrad does: after 10 unit-scale
    # steps the persistent accumulator shrinks updates ~sqrt(10)x.
    g = {"w": jnp.ones((4, 3), jnp.float32)}
    pers = adagrad_torch(0.05)
    pst = pers.init({"w": jnp.zeros((4, 3))})
    for _ in range(10):
        pupd, pst = pers.update(g, pst)
    rupd, _ = jopt.update(g, st)
    assert float(jnp.abs(rupd["w"]).mean()) > 2.5 * float(
        jnp.abs(pupd["w"]).mean())
