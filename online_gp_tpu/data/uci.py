"""UCI streaming-regression dataset loaders.

Reference datasets (``online_gp/datasets/regression/``): powerplant
(xlsx), skillcraft (.mat), elevators, protein, 3droad, plus the MuJoCo
hopper/walker2d pickles. Shared semantics: min-max inputs to [-1, 1],
z-scored targets, seeded split with ``subsample_ratio``/``test_ratio=0.1``.

This environment has no network access and ships no UCI files, so each
loader reads a local file when present (``data_dir``; csv/npy) and
otherwise falls back to a *deterministic synthetic surrogate* with the
same dimensionality and preprocessing — clearly flagged in the returned
metadata so experiment logs can't silently conflate the two.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from online_gp_tpu.data.preprocessing import minmax_scale, zscore, train_test_split

# name -> (input_dim, baseline_rmse from reference config/dataset/*.yaml:6)
UCI_DATASETS = {
    "skillcraft": (19, 1.8619),
    "powerplant": (4, 0.2169),
    "elevators": (18, 0.475),
    "protein": (9, 2.1227),
    "3droad": (2, 0.3711),
    "hopper": (11, None),
    "walker2d": (17, None),
}


@dataclass
class DatasetBundle:
    train_x: np.ndarray
    train_y: np.ndarray
    test_x: np.ndarray
    test_y: np.ndarray
    name: str
    synthetic: bool
    baseline_rmse: Optional[float]

    @property
    def train_dataset(self):
        return self.train_x, self.train_y

    @property
    def test_dataset(self):
        return self.test_x, self.test_y


def _synthetic_surrogate(name: str, input_dim: int, n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic nonlinear surface with dataset-specific seed."""
    rng = np.random.default_rng(abs(hash(name)) % (2**32) + seed)
    x = rng.standard_normal((n, input_dim))
    w1 = rng.standard_normal((input_dim, 8)) / np.sqrt(input_dim)
    w2 = rng.standard_normal((8,))
    y = np.tanh(x @ w1) @ w2 + 0.5 * np.sin(2.0 * x[:, 0])
    y = y + 0.15 * rng.standard_normal(n)
    return x.astype(np.float32), y[:, None].astype(np.float32)


def load_uci(
    name: str,
    data_dir: Optional[str] = None,
    subsample_ratio: float = 1.0,
    test_ratio: float = 0.1,
    seed: int = 0,
    synthetic_n: int = 4000,
) -> DatasetBundle:
    if name not in UCI_DATASETS:
        raise ValueError(f"unknown dataset {name!r}; known: {sorted(UCI_DATASETS)}")
    input_dim, baseline = UCI_DATASETS[name]

    x = y = None
    synthetic = True
    if data_dir:
        for ext, loader in ((".npy", _load_npy), (".csv", _load_csv)):
            path = os.path.join(data_dir, name + ext)
            if os.path.exists(path):
                x, y = loader(path)
                synthetic = False
                break
    if x is None:
        x, y = _synthetic_surrogate(name, input_dim, synthetic_n, seed)

    x = minmax_scale(np.asarray(x, np.float32))
    y = zscore(np.asarray(y, np.float32).reshape(len(x), -1))
    tr_x, tr_y, te_x, te_y = train_test_split(x, y, test_ratio, subsample_ratio, seed)
    return DatasetBundle(tr_x, tr_y, te_x, te_y, name, synthetic, baseline)


def _load_npy(path: str):
    arr = np.load(path)
    return arr[:, :-1], arr[:, -1:]


def _load_csv(path: str):
    try:
        from online_gp_tpu.native import fast_csv_read

        arr = fast_csv_read(path, skip_header=1)
    except Exception:
        arr = np.loadtxt(path, delimiter=",", skiprows=1)
    return arr[:, :-1], arr[:, -1:]
