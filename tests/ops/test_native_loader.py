import numpy as np
import os
import tempfile

from online_gp_tpu.native import native_available, fast_csv_read, BatchStream


def test_csv_roundtrip():
    arr = np.random.default_rng(0).standard_normal((200, 5)).astype(np.float32)
    path = tempfile.mktemp(suffix=".csv")
    np.savetxt(path, arr, delimiter=",", header="a,b,c,d,e")
    got = fast_csv_read(path, skip_header=1)
    np.testing.assert_allclose(got, arr, atol=1e-5)
    os.remove(path)


def test_batch_stream_covers_epoch():
    arr = np.arange(100, dtype=np.float32)[:, None]
    bs = BatchStream(arr, batch_size=25, shuffle=True, seed=1)
    seen = []
    for _ in range(4):
        (xb,) = bs.next()
        seen.extend(xb[:, 0].tolist())
    assert sorted(seen) == list(map(float, range(100)))
