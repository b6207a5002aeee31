"""Field-artifact output (the reference drivers' imshow role)."""

import numpy as np

from fast_solver_lippmann_schwinger_tpu.utils.fields import save_field


def test_save_field_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    u = rng.standard_normal(30 * 40) + 1j * rng.standard_normal(30 * 40)
    res = np.array([1.0, 0.3, 0.01, 0.0, 0.0])
    base = str(tmp_path / "field")
    files = save_field(base, u, (30, 40), residuals=res, title="t")
    assert files[0].endswith(".npz")
    data = np.load(files[0])
    np.testing.assert_allclose(data["u"], u.reshape(30, 40))
    np.testing.assert_allclose(data["residuals"], res[res > 0])


def test_save_field_3d_slice(tmp_path):
    u = np.arange(4 * 5 * 6).astype(complex)
    files = save_field(str(tmp_path / "f3.npz"), u, (4, 5, 6))
    assert np.load(files[0])["u"].shape == (4, 5, 6)
