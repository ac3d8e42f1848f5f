"""vdm4cdm_tpu — TPU-native generative framework for cosmological field emulation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``cfpark00/vdm4cdm`` research codebase (see SURVEY.md): Variational Diffusion
Models (learned monotonic gamma(t) schedule, diffusion ELBO, ancestral + DDNM
samplers) and flow matching (SFM), both driven by a shared conditional 2D/3D
UNet, trained and sampled fully jitted, with spatial-domain sharding over TPU
meshes (halo-exchanged convolutions) replacing the reference's single-GPU,
downsample-to-fit strategy.

Layout:
    utils/     pure-JAX primitives: PRNG threading, pytrees, to_np, mesh setup
    ops/       sharding-aware compute ops (conv, groupnorm, attention, resample)
               with Pallas TPU kernels and XLA reference paths
    parallel/  mesh axes, halo exchange (ppermute), shard_map wrappers
    models/    CUNet conditional UNet (2D/3D by shape; s/v/t conditioning)
    diffusion/ VDM: gamma schedules, ELBO loss, ancestral sampler, DDNM
    flows/     SFM flow matching: interpolant loss + ODE sampler
    data/      registry-driven grid loader, invertible transforms, augmentation,
               synthetic Gaussian-random-field datasets
    train/     step-based train loop, orbax checkpoints, loggers
    evals/     physics metrics: P(k), cross-correlation, log-PDF, wavelet
               scattering (RWST), GPR toolkit, validation figures
    cli/       train / generate / calc_ss / prepare_data entry points
"""

__version__ = "0.1.0"
