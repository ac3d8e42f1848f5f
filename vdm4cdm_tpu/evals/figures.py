"""Validation figure rendering — the 2x3 panel the reference logs to Comet.

Parity with reference src/utils.py:131-275: panels are
  [conditioning image | GT target image | sampled target image]
  [histograms (bins -4..4) | log-log raw P(k) | cross-correlation r(k)]
VDM flavor keys on batch["x"]/["conditioning"]; SFM flavor on ["x1"]/["x0"].

Batches/samples here are channels-LAST (B, *spatial, C) device arrays; hook
functions (x_to_im, pk_func, cc_func, ...) receive channels-first per-sample
arrays (C, *spatial) to match the reference's hook signatures.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..utils.array import to_np


def _nlast_to_cfirst(a) -> np.ndarray:
    a = to_np(a)
    return np.moveaxis(a, -1, 1)


_DEFAULTS = dict(
    index=0,
    fontsize=16,
    x_to_im=None,
    conditioning_to_im=None,
    conditioning_values_to_str=None,
    pk_func=None,
    cc_func=None,
)


def _draw(x, conditioning, conditioning_values, samples, params: Dict[str, Any]):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    p = dict(_DEFAULTS)
    p.update(params)
    idx, fs = p["index"], p["fontsize"]

    fig, axes = plt.subplots(2, 3, figsize=(20, 12))
    if conditioning is not None and p["conditioning_to_im"] is not None:
        axes.flat[0].imshow(p["conditioning_to_im"](conditioning[idx]))
        axes.flat[0].set_title("Conditioning", fontsize=fs)
    if p["x_to_im"] is not None:
        axes.flat[1].imshow(p["x_to_im"](x[idx]))
        axes.flat[1].set_title("GT Target", fontsize=fs)
        axes.flat[2].imshow(p["x_to_im"](samples[idx]))
        axes.flat[2].set_title("Sampled Target", fontsize=fs)

    bins = np.linspace(-4, 4, 50)
    for c in range(x.shape[1]):
        axes.flat[3].hist(x[idx, c].ravel(), bins=bins, histtype="step",
                          label=f"GT Channel {c}")
        axes.flat[3].hist(samples[idx, c].ravel(), bins=bins, histtype="step",
                          label=f"Sampled Channel {c}")
    if conditioning is not None:
        for c in range(conditioning.shape[1]):
            axes.flat[3].hist(conditioning[idx, c].ravel(), bins=bins,
                              histtype="step", label=f"Conditioning Channel {c}")
    axes.flat[3].legend(fontsize=fs)

    if p["pk_func"] is not None:
        for c in range(x.shape[1]):
            ks, pks = p["pk_func"](x[idx, c], c)
            axes.flat[4].plot(ks, pks, label=f"GT Channel {c}")
            ks, pks = p["pk_func"](samples[idx, c], c)
            axes.flat[4].plot(ks, pks, label=f"Sampled Channel {c}")
        if conditioning is not None:
            for c in range(conditioning.shape[1]):
                ks, pks = p["pk_func"](conditioning[idx, c], c)
                axes.flat[4].plot(ks, pks, label=f"Conditioning Channel {c}")
        axes.flat[4].legend(fontsize=fs)
        axes.flat[4].set_xscale("log")
        axes.flat[4].set_yscale("log")
        axes.flat[4].set_xlabel("k/k_grid", fontsize=fs)
        axes.flat[4].set_ylabel("Raw Pk", fontsize=fs)
        axes.flat[4].set_title("Powerspectra", fontsize=fs)

    if p["cc_func"] is not None:
        for c in range(x.shape[1]):
            ks, ccs = p["cc_func"](x[idx, c], samples[idx, c], c)
            axes.flat[5].plot(ks, ccs, label=f"CC GT-Sampled Channel {c}")
        axes.flat[5].legend(fontsize=fs)
        axes.flat[5].set_xscale("log")
        axes.flat[5].set_xlabel("k", fontsize=fs)
        axes.flat[5].set_ylabel("CC", fontsize=fs)
        axes.flat[5].set_title("Cross Correlation", fontsize=fs)

    if p["conditioning_values_to_str"] is not None and conditioning_values is not None:
        cv = conditioning_values[0] if isinstance(conditioning_values, list) else conditioning_values
        text = p["conditioning_values_to_str"](to_np(cv[idx]))
        axes.flat[0].annotate(text, xy=(0, 0), xytext=(0.5, 0.5),
                              textcoords="axes fraction", fontsize=fs,
                              ha="center", va="center")
    return fig


def draw_figure(batch: Dict[str, Any], samples, **kwargs):
    """VDM flavor: batch keys x / conditioning / conditioning_values
    (channels-last); samples channels-last."""
    x = _nlast_to_cfirst(batch["x"])
    cond = batch.get("conditioning")
    cond = _nlast_to_cfirst(cond) if cond is not None else None
    return _draw(x, cond, batch.get("conditioning_values"), _nlast_to_cfirst(samples), kwargs)


def draw_figure_sfm(batch: Dict[str, Any], samples, **kwargs):
    """SFM flavor: batch keys x1 (target) / x0 (conditioning)."""
    x = _nlast_to_cfirst(batch["x1"])
    cond = _nlast_to_cfirst(batch["x0"])
    return _draw(x, cond, batch.get("conditioning_values"), _nlast_to_cfirst(samples), kwargs)
