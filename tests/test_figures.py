"""Validation-figure rendering tests (both flavors, with all hooks)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from vdm4cdm_tpu.evals import draw_figure, draw_figure_sfm


def _hooks():
    def pk_func(field, i_channel):
        ks = np.arange(1, 9)
        return ks, np.abs(np.fft.rfft(np.asarray(field).ravel()))[1:9] + 1e-6

    def cc_func(f1, f2, i_channel):
        ks = np.arange(1, 9)
        return ks, np.linspace(1, 0.5, 8)

    return dict(
        x_to_im=lambda f: f[0],
        conditioning_to_im=lambda f: f[0],
        conditioning_values_to_str=str,
        pk_func=pk_func,
        cc_func=cc_func,
    )


def test_vdm_figure():
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.standard_normal((2, 16, 16, 1)).astype(np.float32),
        "conditioning": rng.standard_normal((2, 16, 16, 1)).astype(np.float32),
        "conditioning_values": [rng.uniform(size=(2, 6)).astype(np.float32)],
    }
    samples = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
    fig = draw_figure(batch, samples, **_hooks())
    assert len(fig.axes) == 6
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_sfm_figure_and_unconditional():
    rng = np.random.default_rng(1)
    batch = {
        "x1": rng.standard_normal((1, 16, 16, 1)).astype(np.float32),
        "x0": rng.standard_normal((1, 16, 16, 1)).astype(np.float32),
        "conditioning_values": [rng.uniform(size=(1, 6)).astype(np.float32)],
    }
    samples = rng.standard_normal((1, 16, 16, 1)).astype(np.float32)
    fig = draw_figure_sfm(batch, samples, **_hooks())
    assert len(fig.axes) == 6
    import matplotlib.pyplot as plt

    plt.close(fig)

    # unconditional VDM flavor: conditioning None
    batch2 = {"x": samples, "conditioning": None, "conditioning_values": None}
    fig2 = draw_figure(batch2, samples, x_to_im=lambda f: f[0])
    plt.close(fig2)
