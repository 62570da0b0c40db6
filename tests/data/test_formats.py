"""Real-data format parsers against tiny checked-in fixtures.

Proves each reader end-to-end without the (multi-MB, network-gated) real
files: dropping a real file into ``data_dir`` exercises exactly these code
paths. Formats mirror the reference's ingestion
(``/root/reference/online_gp/datasets/regression/powerplant.py:17-41``,
``skillcraft.py:14-20``, ``classification/svm_guide_1.py``, ``hopper.py``,
``experiments/active_learning/data.py:19-89``).
"""

import os

import numpy as np
import pytest

from online_gp_tpu.data.formats import (
    read_libsvm,
    read_mat,
    read_pandas_hdf5,
    read_torch_pickle,
    read_xlsx,
)
from online_gp_tpu.data.malaria import malaria_dataset
from online_gp_tpu.data.uci import load_uci
from online_gp_tpu.data.classification_extra import svmguide1_dataset

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def test_read_xlsx_numeric_body():
    arr = read_xlsx(os.path.join(FIX, "tiny.xlsx"))
    expected = np.load(os.path.join(FIX, "tiny_xlsx_expected.npy"))
    np.testing.assert_allclose(arr, expected, rtol=1e-12)


def test_read_mat_data_matrix():
    arr = read_mat(os.path.join(FIX, "tiny.mat"))
    expected = np.load(os.path.join(FIX, "tiny_mat_expected.npy"))
    np.testing.assert_allclose(arr, expected, rtol=1e-12)


def test_read_libsvm_dense_and_labels():
    x, y = read_libsvm(os.path.join(FIX, "tiny.libsvm"))
    assert x.shape == (4, 4)
    np.testing.assert_array_equal(y, [1, 0, 0, 1])  # -1 clamps to 0
    np.testing.assert_allclose(x[0], [0.5, 0, -1.25, 0])
    np.testing.assert_allclose(x[1], [0, 2.0, 0, 0])
    np.testing.assert_allclose(x[3], [0, 0, 0, 0.25])


def test_read_torch_pickle():
    arr = read_torch_pickle(os.path.join(FIX, "Hopper-v2", "train_x.pkl"))
    assert arr.shape == (8, 11) and arr.dtype == np.float32


@pytest.mark.parametrize("fname", ["tiny_malaria_plain.h5", "tiny_malaria_fixed.h5"])
def test_read_pandas_hdf5_layouts(fname):
    cols = read_pandas_hdf5(os.path.join(FIX, fname))
    expected = np.load(os.path.join(FIX, "tiny_malaria_expected.npz"))
    np.testing.assert_allclose(cols["longitude"], expected["lon"])
    np.testing.assert_allclose(cols["std_dev"], expected["std"])
    np.testing.assert_array_equal(np.asarray(cols["is_ng"], np.int64), expected["is_ng"])


# -- loader integration: a real-format file in data_dir is picked up -------


def test_load_uci_xlsx_via_data_dir(tmp_path):
    src = os.path.join(FIX, "tiny.xlsx")
    dst_dir = tmp_path / "powerplant"
    dst_dir.mkdir()
    (dst_dir / "Folds5x2_pp.xlsx").write_bytes(open(src, "rb").read())
    bundle = load_uci("powerplant", data_dir=str(tmp_path), seed=0)
    assert not bundle.synthetic
    assert bundle.train_x.shape[1] == 4
    assert len(bundle.train_x) + len(bundle.test_x) == 12


def test_load_uci_mat_via_data_dir(tmp_path):
    src = os.path.join(FIX, "tiny.mat")
    (tmp_path / "skillcraft.mat").write_bytes(open(src, "rb").read())
    bundle = load_uci("skillcraft", data_dir=str(tmp_path), seed=0)
    assert not bundle.synthetic
    assert bundle.train_x.shape[1] == 3  # fixture has 4 cols -> 3 features


def test_load_uci_mujoco_presplit(tmp_path):
    import shutil

    shutil.copytree(os.path.join(FIX, "Hopper-v2"), tmp_path / "Hopper-v2")
    bundle = load_uci("hopper", data_dir=str(tmp_path))
    assert not bundle.synthetic
    # pre-split, un-normalized (reference hopper.py applies no scaling)
    assert bundle.train_x.shape == (8, 11) and bundle.test_x.shape == (4, 11)
    raw = read_torch_pickle(os.path.join(FIX, "Hopper-v2", "train_x.pkl"))
    np.testing.assert_allclose(bundle.train_x, raw)


def test_svmguide1_libsvm_via_data_dir(tmp_path):
    (tmp_path / "svmguide1").write_bytes(open(os.path.join(FIX, "tiny.libsvm"), "rb").read())
    tr_x, tr_y, te_x, te_y, synthetic = svmguide1_dataset(data_dir=str(tmp_path), balance=False)
    assert not synthetic
    assert tr_x.shape[1] == 4


def test_malaria_hdf5_via_path():
    data = malaria_dataset(path=os.path.join(FIX, "tiny_malaria_plain.h5"))
    assert not data.synthetic
    expected = np.load(os.path.join(FIX, "tiny_malaria_expected.npz"))
    keep = (expected["is_ng"] == 1) & (expected["year"] == 2012)
    assert len(data.x) == int(keep.sum())
    assert data.x.min() >= 0.0 and data.x.max() <= 1.0
    np.testing.assert_allclose(
        data.y_var, (expected["std"][keep] ** 2 + 1e-6).astype(np.float32), rtol=1e-5
    )
