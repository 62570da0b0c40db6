"""Banana two-class dataset (vendored generator).

The reference downloads the classic banana benchmark at test time from the
``streaming_sparse_gp`` repo (``online_gp/datasets/classification/banana.py``);
this environment is network-free, so an equivalent-difficulty banana-shaped
two-class problem is generated deterministically: two interleaved crescent
clusters with overlap noise, inputs scaled to [-1, 1]. The default noise
(0.45) is calibrated so a 15-NN oracle scores ~0.91 on the test split —
the published dataset's regime (test accuracies high .80s/low .90s for a
good nonparametric classifier), so the reference's >= 0.85 batch and
>= 0.75 online thresholds (``tests/classification/test_ski_classifier.py:33,94``)
actually discriminate.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from online_gp_tpu.data.preprocessing import minmax_scale, train_test_split


def banana_dataset(n: int = 2000, noise: float = 0.45, seed: int = 0):
    rng = np.random.default_rng(seed)
    n_half = n // 2
    # two crescents, rotated and offset so they interlock
    t0 = rng.uniform(0.2 * np.pi, 1.3 * np.pi, n_half)
    t1 = rng.uniform(1.2 * np.pi, 2.3 * np.pi, n_half)
    r = 1.0
    x0 = np.stack([r * np.cos(t0), r * np.sin(t0)], axis=-1)
    x1 = np.stack([r * np.cos(t1) + 0.9, r * np.sin(t1) + 0.45], axis=-1)
    x = np.concatenate([x0, x1]).astype(np.float32)
    x += noise * rng.standard_normal(x.shape).astype(np.float32)
    y = np.concatenate([np.zeros(n_half), np.ones(n_half)]).astype(np.int64)
    perm = rng.permutation(len(x))
    x, y = minmax_scale(x[perm]).astype(np.float32), y[perm]
    return train_test_split(x, y, test_ratio=0.2, seed=seed)
