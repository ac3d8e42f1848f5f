"""Profiling/observability utility tests."""

import numpy as np
import pytest

from vdm4cdm_tpu.utils.profiling import StepTimer, assert_finite


class TestStepTimer:
    def test_rates(self):
        t = StepTimer(window=4)
        assert t.tick() is None
        for _ in range(4):
            dt = t.tick()
            assert dt is not None and dt >= 0
        assert t.mean >= 0 and t.p50 >= 0
        assert t.rate(100.0) > 0


class TestAssertFinite:
    def test_passes_on_finite(self):
        assert_finite({"a": np.ones(3), "b": [np.zeros(2)]})

    def test_raises_with_path(self):
        with pytest.raises(AssertionError) as e:
            assert_finite({"ok": np.ones(2), "bad": np.array([1.0, np.nan])}, "grads")
        assert "bad" in str(e.value) and "grads" in str(e.value)
