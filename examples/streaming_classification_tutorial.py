"""Tutorial: streaming Dirichlet-GP classification on the banana dataset.

Script equivalent of the reference's streaming-classification notebook:
integer labels are Dirichlet-transformed into per-class regression targets
with heteroscedastic noise, a class-batched WISKI GP regresses them, and
decisions are the argmax of class posterior means — so the whole online
machinery (constant-time conditioning, Woodbury MLL hyper steps) carries
over unchanged.

Run:  python examples/streaming_classification_tutorial.py
"""

import jax.numpy as jnp

from online_gp_tpu.api import OnlineSKIClassifier, LinearStem
from online_gp_tpu.data import banana_dataset
from online_gp_tpu.likelihoods import dirichlet_transform

train_x, train_y, test_x, test_y = banana_dataset(n=1600, seed=0)
n_init = 120

# the transform the classifier applies under the hood:
targets, alpha, sigma2 = dirichlet_transform(jnp.asarray(train_y[:3]), num_classes=2)
print("Dirichlet transform of labels", train_y[:3], "->")
print("  targets:\n", targets, "\n  per-class noise:\n", sigma2)

clf = OnlineSKIClassifier(
    LinearStem(2, 2), train_x[:n_init], train_y[:n_init],
    alpha_eps=0.01, lr=0.05, grid_size=16, grid_bound=1.0,
)

print("== batch pretraining ==")
clf.fit(train_x[:n_init], train_y[:n_init], num_epochs=40)
print(f"  test acc after pretrain: {clf.evaluate(test_x, test_y):.3f}")

print("== streaming ==")
clf.set_lr(0.01)
correct = 0
stream = range(n_init, 800)
for t in stream:
    pred = clf.predict(train_x[t : t + 1])
    correct += int(pred[0] == train_y[t])
    clf.update(train_x[t : t + 1], train_y[t : t + 1])
print(f"  cumulative accuracy {correct / len(stream):.3f}, "
      f"final test accuracy {clf.evaluate(test_x, test_y):.3f}")
