"""JAX L-BFGS probe vs sklearn LogisticRegression parity."""

import numpy as np
import pytest


def _synthetic(n=300, d=16, k=4, seed=0, sep=2.0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * sep
    y = rng.integers(0, k, size=n)
    x = centers[y] + rng.normal(size=(n, d))
    return x.astype(np.float32), y


def test_jax_probe_matches_sklearn():
    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler

    from vitef_tpu.probe import probe_accuracy_jax

    xtr, ytr = _synthetic(seed=0)
    xte, yte = _synthetic(seed=1)

    clf = make_pipeline(StandardScaler(), LogisticRegression(max_iter=5000))
    clf.fit(xtr, ytr)
    sk_acc = clf.score(xte, yte)

    jax_acc = probe_accuracy_jax(xtr, ytr, xte, yte, n_classes=4)
    assert abs(jax_acc - sk_acc) < 0.02, (jax_acc, sk_acc)


def test_jax_probe_hard_problem():
    """Non-separable data: both probes should land on the same plateau."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler

    from vitef_tpu.probe import probe_accuracy_jax

    xtr, ytr = _synthetic(n=500, d=8, k=6, seed=2, sep=0.7)
    xte, yte = _synthetic(n=500, d=8, k=6, seed=3, sep=0.7)
    clf = make_pipeline(StandardScaler(), LogisticRegression(max_iter=5000))
    clf.fit(xtr, ytr)
    sk_acc = clf.score(xte, yte)
    jax_acc = probe_accuracy_jax(xtr, ytr, xte, yte, n_classes=6, max_iter=400)
    assert abs(jax_acc - sk_acc) < 0.04, (jax_acc, sk_acc)
