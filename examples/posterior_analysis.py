"""Posterior analysis figures — the scripted equivalent of the reference's
ICML_figures.ipynb: from a calc_ss ``summary.pkl``, plot sample-vs-GT power
spectra, log-PDFs, reduced wavelet scattering coefficients, and (for CV_1_128)
the posterior mean/std maps over the 128 reps.

    python examples/posterior_analysis.py --summary out/summary.pkl --out figs/
"""

import argparse
import os
import pickle

import numpy as np


def _collect(stats: dict, prefix: str, key: str):
    gt, gen = [], []
    for name, st in stats.items():
        if key not in st:
            continue
        (gt if name.startswith(f"{prefix}_GT") else gen).append(np.asarray(st[key]))
    return (np.concatenate(gt) if gt else None,
            np.concatenate(gen) if gen else None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--summary", required=True)
    ap.add_argument("--out", default="figs")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out, exist_ok=True)
    summary = pickle.load(open(args.summary, "rb"))

    for campaign, results in summary.items():
        stats = results["stats"]
        fig, axes = plt.subplots(1, 3, figsize=(16, 4.5))

        for ax, key, title, logy in [
            (axes[0], "3d_pk", "3D P(k)", True),
            (axes[1], "3d_logpdf", "3D log-PDF", False),
            (axes[2], "2d_half_rwst", "half-depth RWST", False),
        ]:
            gt, gen = _collect(stats, "Mcdm", key)
            if gen is None:
                ax.set_visible(False)
                continue
            xs = np.arange(gen.shape[-1])
            lo, med, hi = np.percentile(gen, [16, 50, 84], axis=0)
            ax.fill_between(xs, lo, hi, alpha=0.3, label="samples 16-84%")
            ax.plot(xs, med, label="sample median")
            if gt is not None:
                ax.plot(np.arange(gt.shape[-1]), gt.mean(0), "k--", label="GT")
            if logy:
                ax.set_yscale("log")
                ax.set_xscale("log")
            ax.set_title(f"{campaign}: {title}")
            ax.legend(fontsize=8)
        fig.savefig(os.path.join(args.out, f"{campaign}_stats.png"), dpi=90,
                    bbox_inches="tight")
        plt.close(fig)

        if "post_means" in results:
            fig, axes = plt.subplots(1, 2, figsize=(10, 4.5))
            pm = np.asarray(results["post_means"])[0, 0]
            ps = np.asarray(results["post_stds"])[0, 0]
            half = pm.shape[0] // 2
            axes[0].imshow(np.log10(pm[:half].sum(0) + 1))
            axes[0].set_title("posterior mean (half-depth projection)")
            axes[1].imshow(np.log10(ps[:half].sum(0) + 1))
            axes[1].set_title("posterior std")
            for ax in axes:
                ax.axis("off")
            fig.savefig(os.path.join(args.out, f"{campaign}_posterior.png"),
                        dpi=90, bbox_inches="tight")
            plt.close(fig)
        print(f"[posterior_analysis] {campaign} done")


if __name__ == "__main__":
    main()
