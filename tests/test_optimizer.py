"""Optimizer semantics: parity with an independent numpy restatement of the
reference Adam (weight decay folded into grads, per-epoch bias correction,
step-decay schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qfa_tpu.train import adam


def numpy_reference_adam(params, grad_seq, epochs_per_step, cfg):
    """Independent restatement of the reference update rule
    (/root/reference/QFA/optimizer.py:37-52,79-99) in plain numpy."""
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v = {k: np.zeros_like(val) for k, val in params.items()}
    p = {k: val.copy() for k, val in params.items()}
    i = 0
    for step, grads in enumerate(grad_seq):
        g = {k: grads[k] + cfg.weight_decay * p[k] for k in p}
        m = {k: (1 - cfg.b1) * g[k] + cfg.b1 * m[k] for k in p}
        v = {k: (1 - cfg.b2) * g[k] ** 2 + cfg.b2 * v[k] for k in p}
        mhat = {k: m[k] / (1 - cfg.b1 ** (i + 1)) for k in p}
        vhat = {k: v[k] / (1 - cfg.b2 ** (i + 1)) for k in p}
        lr = cfg.learning_rate * cfg.decay_alpha ** ((i + 1) // cfg.decay_step)
        p = {k: p[k] - lr * mhat[k] / (np.sqrt(vhat[k]) + cfg.eps) for k in p}
        if (step + 1) % epochs_per_step == 0:
            i += 1  # per-epoch counter advance
    return p


def test_adam_matches_reference_semantics():
    rng = np.random.default_rng(0)
    params = {
        "a": rng.normal(size=(5, 3)).astype(np.float32),
        "b": rng.normal(size=(4,)).astype(np.float32),
    }
    n_epochs, batches_per_epoch = 3, 4
    grad_seq = [
        {k: rng.normal(size=v.shape).astype(np.float32) for k, v in params.items()}
        for _ in range(n_epochs * batches_per_epoch)
    ]
    cfg = adam.AdamConfig(
        learning_rate=0.05, weight_decay=0.01, decay_alpha=0.8, decay_step=2
    )
    expect = numpy_reference_adam(params, grad_seq, batches_per_epoch, cfg)

    jp = {k: jnp.asarray(v) for k, v in params.items()}
    state = adam.init(jp)
    it = iter(grad_seq)
    for _ in range(n_epochs):
        for _ in range(batches_per_epoch):
            g = {k: jnp.asarray(v) for k, v in next(it).items()}
            jp, state = adam.apply_update(jp, g, state, cfg)
        state = adam.next_epoch(state)

    for k in params:
        np.testing.assert_allclose(np.asarray(jp[k]), expect[k], rtol=3e-4, atol=5e-6)


def test_schedule_matches_reference_rule():
    cfg = adam.AdamConfig(learning_rate=1e-3, decay_alpha=0.9, decay_step=10)
    for i in [0, 8, 9, 10, 19, 20, 99]:
        lr = float(adam.scheduled_lr(cfg, jnp.asarray(i)))
        assert lr == pytest.approx(1e-3 * 0.9 ** ((i + 1) // 10), rel=1e-6)


def test_epoch_counter_freezes_bias_correction_within_epoch():
    """Updates within one epoch use identical bias correction (the
    reference advances the correction/schedule counter once per EPOCH,
    /root/reference/QFA/model.py:214-215) — verified against a numpy
    restatement for two consecutive same-epoch updates and one after
    next_epoch."""
    lr, b1, b2, eps = 0.1, 0.9, 0.999, 1e-8
    p = {"x": jnp.ones((3,))}
    g = {"x": jnp.full((3,), 0.1)}
    cfg = adam.AdamConfig(learning_rate=lr, weight_decay=0.0, b1=b1, b2=b2,
                          eps=eps, decay_alpha=1.0)
    s0 = adam.init(p)
    p1, s1 = adam.apply_update(p, g, s0, cfg)
    assert int(s1.epoch) == 0  # update does not advance the counter
    p2, s2 = adam.apply_update(p1, g, s1, cfg)
    assert int(s2.epoch) == 0

    def np_update(pv, m, v, t):
        gv = 0.1
        m = b1 * m + (1 - b1) * gv
        v = b2 * v + (1 - b2) * gv * gv
        bc1, bc2 = 1 - b1 ** t, 1 - b2 ** t
        return pv - lr * (m / bc1) / (np.sqrt(v / bc2) + eps), m, v

    # both same-epoch updates use t = epoch+1 = 1
    e1, m, v = np_update(1.0, 0.0, 0.0, t=1)
    e2, m, v = np_update(e1, m, v, t=1)
    np.testing.assert_allclose(np.asarray(p1["x"]), e1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p2["x"]), e2, rtol=1e-5)

    # after next_epoch the third update switches to t = 2
    s3 = adam.next_epoch(s2)
    assert int(s3.epoch) == 1
    p3, _ = adam.apply_update(p2, g, s3, cfg)
    e3, _, _ = np_update(e2, m, v, t=2)
    np.testing.assert_allclose(np.asarray(p3["x"]), e3, rtol=1e-5)


def test_as_optax_interop():
    import optax

    p = {"x": jnp.ones((3,))}
    cfg = adam.AdamConfig(learning_rate=0.1, weight_decay=0.0)
    tx = adam.as_optax(cfg)
    state = tx.init(p)
    g = {"x": jnp.full((3,), 0.5)}
    updates, state = tx.update(g, state, p)
    p2 = optax.apply_updates(p, updates)
    # first Adam step moves by ~lr in the gradient direction
    np.testing.assert_allclose(np.asarray(p2["x"]), 1.0 - 0.1, rtol=1e-4)
