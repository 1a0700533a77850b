"""On-device multinomial logistic-regression probe (L-BFGS), sklearn-compatible.

The reference fits sklearn ``StandardScaler + LogisticRegression(max_iter=5000)``
per probe key (linear_probing.py:154-164) — host-bound and the wall-time
bottleneck of probing (SURVEY §7.3 #7). This is the optional on-device
equivalent: standardization + L2-regularized softmax regression minimized with
``optax.lbfgs`` on the accelerator. sklearn's LogisticRegression(C=1) objective
is ``sum_i CE_i + 0.5/C ||W||²`` — reproduced exactly (bias unregularized), so
accuracies match sklearn's to within optimization tolerance.

Select via ``probe_impl='jax'`` in the linear-probing app (default 'sklearn'
for strict fidelity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _standardize(train: jnp.ndarray, test: jnp.ndarray):
    mean = train.mean(axis=0, keepdims=True)
    std = train.std(axis=0, keepdims=True)
    std = jnp.where(std == 0, 1.0, std)
    return (train - mean) / std, (test - mean) / std


def fit_logreg_lbfgs(x: jnp.ndarray, y: jnp.ndarray, n_classes: int,
                     c: float = 1.0, max_iter: int = 200,
                     tol: float = 1e-6):
    """L2-regularized multinomial logistic regression via L-BFGS.

    Returns (W, b). Objective matches sklearn LogisticRegression(C=c):
    sum of per-sample CE + 0.5/c * ||W||^2 (bias unregularized).
    """
    n, d = x.shape
    w0 = jnp.zeros((d, n_classes), jnp.float32)
    b0 = jnp.zeros((n_classes,), jnp.float32)
    params0 = (w0, b0)

    def objective(params):
        w, b = params
        logits = x @ w + b
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, y).sum()
        return ce + 0.5 / c * jnp.sum(jnp.square(w))

    solver = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(objective)

    def step(carry):
        params, opt_state, _ = carry
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=objective
        )
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grad)
        return params, opt_state, gnorm

    def cond(carry):
        _, opt_state, gnorm = carry
        count = optax.tree_utils.tree_get(opt_state, "count")
        return jnp.logical_and(count < max_iter, gnorm > tol)

    init = (params0, solver.init(params0), jnp.asarray(jnp.inf))
    params, _, _ = jax.lax.while_loop(cond, step, init)
    return params


def probe_accuracy_jax(train_x: np.ndarray, train_y: np.ndarray,
                       test_x: np.ndarray, test_y: np.ndarray,
                       n_classes: int | None = None, c: float = 1.0,
                       max_iter: int = 200) -> float:
    """Standardize → fit on device → test accuracy (one probe key)."""
    if n_classes is None:
        n_classes = int(max(train_y.max(), test_y.max())) + 1
    xtr = jnp.asarray(train_x, jnp.float32)
    xte = jnp.asarray(test_x, jnp.float32)
    xtr, xte = _standardize(xtr, xte)
    w, b = fit_logreg_lbfgs(xtr, jnp.asarray(train_y, jnp.int32), n_classes,
                            c=c, max_iter=max_iter)
    pred = jnp.argmax(xte @ w + b, axis=-1)
    return float((pred == jnp.asarray(test_y)).mean())
