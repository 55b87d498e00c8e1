"""Conditional density estimation of the latent factors: P(h | z, lum).

The reference delegates this to the external ``sbi`` package (SNPE) in
``/root/reference/nb/generate_mock_continuum.ipynb``: fit the conditional
distribution of the 8-dim latent embedding given quasar redshift and
luminosity, sample it, and synthesize mock continua ``F h + mu``. Here the
estimator is a self-contained JAX **mixture density network** — a small MLP
emitting a full-covariance Gaussian mixture over ``h`` — trained by maximum
likelihood with optax. That covers the notebook's use case (amortized
conditional sampling) without external dependencies, jit end to end.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray

__all__ = ["MDNConfig", "MDNParams", "init_mdn", "mdn_log_prob", "mdn_sample",
           "fit_mdn", "sample_mock_continua"]


class MDNConfig(NamedTuple):
    """Architecture of the conditional mixture density network."""

    cond_dim: int = 2  #: conditioning variables (z, lum).
    out_dim: int = 8  #: latent dimension Nh.
    n_components: int = 8  #: mixture components.
    hidden: tuple = (64, 64)  #: MLP widths.


class MDNParams(NamedTuple):
    layers: tuple  #: ((W, b), ...) MLP trunk.
    head_logits: tuple  #: (W, b) -> (n_components,)
    head_mean: tuple  #: (W, b) -> (n_components * out_dim,)
    head_scale: tuple  #: (W, b) -> diag log-scales
    head_tril: tuple  #: (W, b) -> strictly-lower Cholesky entries


def _dense_init(key, n_in, n_out, scale=None):
    scale = scale if scale is not None else (2.0 / (n_in + n_out)) ** 0.5
    wk, _ = jax.random.split(key)
    w = scale * jax.random.normal(wk, (n_in, n_out), jnp.float32)
    return w, jnp.zeros((n_out,), jnp.float32)


def init_mdn(key: jax.Array, config: MDNConfig = MDNConfig()) -> MDNParams:
    keys = jax.random.split(key, len(config.hidden) + 4)
    layers = []
    n_in = config.cond_dim
    for i, width in enumerate(config.hidden):
        layers.append(_dense_init(keys[i], n_in, width))
        n_in = width
    k, d = config.n_components, config.out_dim
    n_tril = d * (d - 1) // 2
    return MDNParams(
        layers=tuple(layers),
        head_logits=_dense_init(keys[-4], n_in, k),
        head_mean=_dense_init(keys[-3], n_in, k * d),
        head_scale=_dense_init(keys[-2], n_in, k * d, scale=1e-2),
        head_tril=_dense_init(keys[-1], n_in, k * n_tril, scale=1e-2),
    )


def _trunk(params: MDNParams, cond: Array) -> Array:
    x = cond
    for w, b in params.layers:
        x = jnp.tanh(x @ w + b)
    return x


def _heads(params: MDNParams, cond: Array, config: MDNConfig):
    """Mixture parameters for each condition: logits, means, scale_tril."""
    x = _trunk(params, cond)
    k, d = config.n_components, config.out_dim
    logits = x @ params.head_logits[0] + params.head_logits[1]
    means = (x @ params.head_mean[0] + params.head_mean[1]).reshape(
        x.shape[:-1] + (k, d)
    )
    log_scale = (x @ params.head_scale[0] + params.head_scale[1]).reshape(
        x.shape[:-1] + (k, d)
    )
    log_scale = jnp.clip(log_scale, -7.0, 3.0)
    tril_flat = (x @ params.head_tril[0] + params.head_tril[1]).reshape(
        x.shape[:-1] + (k, d * (d - 1) // 2)
    )
    rows, cols = jnp.tril_indices(d, -1)
    tril = jnp.zeros(x.shape[:-1] + (k, d, d), jnp.float32)
    tril = tril.at[..., rows, cols].set(tril_flat)
    # diag = exp(log_scale), strictly-below-diag from the tril head
    scale_tril = tril + jnp.exp(log_scale)[..., :, None] * jnp.eye(d)
    return logits, means, scale_tril, log_scale


def mdn_log_prob(
    params: MDNParams, cond: Array, h: Array, config: MDNConfig = MDNConfig()
) -> Array:
    """log P(h | cond) under the mixture; shapes (..., cond_dim), (..., d)."""
    logits, means, scale_tril, log_scale = _heads(params, cond, config)
    d = config.out_dim
    diff = h[..., None, :] - means  # (..., k, d)
    # solve L y = diff  (lower triangular, batched small — unrolled)
    y = jax.scipy.linalg.solve_triangular(
        scale_tril, diff[..., None], lower=True
    )[..., 0]
    quad = jnp.sum(y * y, axis=-1)
    logdet = jnp.sum(log_scale, axis=-1)
    comp_lp = -0.5 * (quad + d * jnp.log(2 * jnp.pi)) - logdet
    return jax.nn.logsumexp(jax.nn.log_softmax(logits, -1) + comp_lp, axis=-1)


def mdn_sample(
    params: MDNParams,
    key: jax.Array,
    cond: Array,
    n: int,
    config: MDNConfig = MDNConfig(),
) -> Array:
    """Draw ``n`` samples of h for each condition row; returns (n, ..., d)."""
    logits, means, scale_tril, _ = _heads(params, cond, config)
    k_comp, k_norm = jax.random.split(key)
    comp = jax.random.categorical(
        k_comp, jnp.broadcast_to(logits, (n,) + logits.shape)
    )  # (n, ...)
    eps = jax.random.normal(
        k_norm, (n,) + cond.shape[:-1] + (config.out_dim,), jnp.float32
    )
    mean_sel = jnp.take_along_axis(
        jnp.broadcast_to(means, (n,) + means.shape),
        comp[..., None, None],
        axis=-2,
    )[..., 0, :]
    tril_sel = jnp.take_along_axis(
        jnp.broadcast_to(scale_tril, (n,) + scale_tril.shape),
        comp[..., None, None, None],
        axis=-3,
    )[..., 0, :, :]
    return mean_sel + jnp.einsum("...ij,...j->...i", tril_sel, eps)


def fit_mdn(
    key: jax.Array,
    cond: Array,
    h: Array,
    config: MDNConfig = MDNConfig(),
    *,
    n_steps: int = 2000,
    batch_size: int = 512,
    learning_rate: float = 1e-3,
    normalize: bool = True,
) -> tuple[MDNParams, dict]:
    """Maximum-likelihood fit of the MDN; returns (params, fit_info).

    ``fit_info`` carries the CONDITIONING normalizers used at fit time
    (``cond_mean``/``cond_std``; apply the same transform to ``cond``
    before ``mdn_log_prob``/``mdn_sample``). The targets ``h`` are modeled
    in their raw scale — standardize them yourself if they are far from
    unit variance (the mixture scale head is bounded at ``exp(+-3)``).
    """
    cond = jnp.asarray(cond, jnp.float32)
    h = jnp.asarray(h, jnp.float32)
    info = {}
    if normalize:
        info["cond_mean"] = jnp.mean(cond, 0)
        info["cond_std"] = jnp.std(cond, 0) + 1e-6
        cond = (cond - info["cond_mean"]) / info["cond_std"]

    k_init, k_loop = jax.random.split(key)
    params = init_mdn(k_init, config)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    n = cond.shape[0]
    bs = min(batch_size, n)

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (bs,), 0, n)

        def loss_fn(p):
            return -jnp.mean(mdn_log_prob(p, cond[idx], h[idx], config))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    keys = jax.random.split(k_loop, n_steps)
    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state, keys[i])
        if i % 100 == 0:
            losses.append(float(loss))
    info["losses"] = losses
    return params, info


def sample_mock_continua(
    mdn_params: MDNParams,
    key: jax.Array,
    cond: Array,
    f: Array,
    mu: Array,
    n: int,
    config: MDNConfig = MDNConfig(),
    fit_info: dict | None = None,
) -> Array:
    """Mock continua ``F h + mu`` from MDN samples of h (notebook cell 7)."""
    if fit_info and "cond_mean" in fit_info:
        cond = (jnp.asarray(cond, jnp.float32) - fit_info["cond_mean"]) / fit_info[
            "cond_std"
        ]
    h = mdn_sample(mdn_params, key, cond, n, config)
    return h @ f.T + mu
