"""Banana classification thresholds for the WISKI Dirichlet classifier
(reference pattern: ``tests/classification/test_ski_classifier.py`` —
batch >= 0.85 eye / >= 0.75 linear stem; online >= 0.75 / >= 0.70).
The banana data here is the vendored deterministic generator
(network-free environment); thresholds kept at the reference's levels.
"""

import numpy as np
import pytest

from online_gp_tpu.api import OnlineSKIClassifier, IdentityStem, LinearStem
from online_gp_tpu.data import banana_dataset


@pytest.fixture(scope="module")
def banana():
    return banana_dataset(n=1200, seed=0)


def test_batch_eye_stem(banana):
    tr_x, tr_y, te_x, te_y = banana
    clf = OnlineSKIClassifier(IdentityStem(2), tr_x[:100], tr_y[:100], alpha_eps=0.01, lr=0.05, grid_size=16, grid_bound=1.0)
    clf.fit(tr_x, tr_y, num_epochs=50)
    acc = clf.evaluate(te_x, te_y)
    assert acc >= 0.85
    # the generator is calibrated to the published banana's difficulty:
    # near-1.0 accuracy would mean the >=0.85 threshold tests nothing
    assert acc <= 0.97, f"banana too easy ({acc}); reference thresholds wouldn't discriminate"


@pytest.mark.slow
def test_batch_linear_stem(banana):
    tr_x, tr_y, te_x, te_y = banana
    clf = OnlineSKIClassifier(LinearStem(2, 2), tr_x[:100], tr_y[:100], alpha_eps=0.01, lr=0.05, grid_size=16, grid_bound=1.0)
    clf.fit(tr_x, tr_y, num_epochs=60)
    assert clf.evaluate(te_x, te_y) >= 0.75


@pytest.mark.slow
def test_online_eye_stem(banana):
    tr_x, tr_y, te_x, te_y = banana
    n_init = 100
    clf = OnlineSKIClassifier(IdentityStem(2), tr_x[:n_init], tr_y[:n_init], alpha_eps=0.01, lr=0.05, grid_size=16, grid_bound=1.0)
    clf.fit(tr_x[:n_init], tr_y[:n_init], num_epochs=30)
    clf.set_lr(0.01)
    correct = 0
    stream = range(n_init, min(len(tr_x), n_init + 400))
    for i in stream:
        pred = clf.predict(tr_x[i : i + 1])
        correct += int(pred[0] == tr_y[i])
        clf.update(tr_x[i : i + 1], tr_y[i : i + 1])
    cum_acc = correct / len(list(stream))
    test_acc = clf.evaluate(te_x, te_y)
    assert cum_acc >= 0.70
    assert test_acc >= 0.75


def test_classifier_absorb_bulk_stream():
    """OnlineSKIClassifier.absorb == the update() conditioning channel."""
    import numpy as np
    import jax.numpy as jnp
    from online_gp_tpu.api.classification import OnlineSKIClassifier
    from online_gp_tpu.api.stems import IdentityStem

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (96, 2)).astype(np.float32)
    labels = (x[:, 0] * x[:, 1] > 0).astype(np.int32)

    a = OnlineSKIClassifier(IdentityStem(2), x[:32], labels[:32], grid_size=8)
    b = OnlineSKIClassifier(IdentityStem(2), x[:32], labels[:32], grid_size=8)
    a.absorb(x[32:], labels[32:])
    for i in range(32, 96):
        b.update(x[i : i + 1], labels[i : i + 1], update_stem=False, update_gp=False)
    np.testing.assert_allclose(
        np.asarray(a.state.roots.root), np.asarray(b.state.roots.root), rtol=1e-4, atol=1e-5
    )
    assert int(a.state.num_data) == int(b.state.num_data)
    acc_a = a.evaluate(x, labels)
    acc_b = b.evaluate(x, labels)
    assert abs(acc_a - acc_b) < 0.05 and acc_a > 0.7
