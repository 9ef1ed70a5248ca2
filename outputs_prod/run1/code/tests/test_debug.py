"""Debug/sanitizer toggles (reference: diff_gaussian_rasterization
__init__.py:83-91 snapshot dumps; SURVEY.md section 5.2 NaN toggle)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.core import debug as dbg


@pytest.fixture(autouse=True)
def _reset():
    yield
    dbg.enable_debug(False)
    os.environ.pop("GD_DEBUG", None)


def test_disabled_by_default():
    assert not dbg.debug_enabled()
    # wrappers are pass-through when off
    f = dbg.snapshot_on_error(lambda x: x + 1)
    assert f(1) == 2
    dbg.check_finite({"a": jnp.array([np.nan])})  # no raise when off


def test_env_flag_enables():
    os.environ["GD_DEBUG"] = "1"
    assert dbg.debug_enabled()


def test_snapshot_dump_on_error(tmp_path):
    dbg.enable_debug(True, nan_checks=False)

    def boom(x, y):
        raise RuntimeError("kaboom")

    f = dbg.snapshot_on_error(boom, tag="fw", out_dir=str(tmp_path))
    with pytest.raises(RuntimeError):
        f(jnp.arange(4.0), jnp.ones((2, 2)))
    z = np.load(tmp_path / "snapshot_fw.npz")
    assert len(z.files) == 2
    np.testing.assert_array_equal(z["arg0"], np.arange(4.0))


def test_check_finite_raises_when_on():
    dbg.enable_debug(True, nan_checks=False)
    dbg.check_finite({"ok": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="1 NaN"):
        dbg.check_finite({"bad": jnp.array([1.0, np.nan])}, "loss")


def test_nan_checks_toggle_jax_config():
    import jax

    dbg.enable_debug(True, nan_checks=True)
    assert jax.config.jax_debug_nans
    dbg.enable_debug(False, nan_checks=True)
    assert not jax.config.jax_debug_nans
