"""Isotropic power spectra and cross-correlations — jitted XLA FFT path.

Semantics-equivalent to the reference's src/utils.py:16-128 (itself adapted
from nbodykit's FFTPower): rfftn -> P = x1 * conj(x2) -> radial binning by
bincount with Hermitian double-count weights (N=2 except the DC and, for even
sizes, Nyquist planes of the last axis) -> drop k=0 -> cut at the smallest
Nyquist. k in units of the fundamental frequency; power unnormalized.

Bins use the reference's ceil(k) convention. Implemented with
jnp.bincount(length=static) so the whole metric jits and vmaps (the reference
loops per-sample on the host; here ``pk`` is one vmapped kernel).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _kgrid_and_weights(spatial: Tuple[int, ...]) -> tuple[np.ndarray, np.ndarray, int]:
    """|k| grid of the rfftn output, Hermitian weights, and kmax. Host-side
    (static shapes), cached per spatial shape (at 256^3 the meshgrid builds
    ~270 MB arrays — building them once per shape, not per trace, matters)."""
    *full, last = spatial
    rlast = last // 2 + 1
    axes = [np.fft.fftfreq(n) * n for n in full] + [np.arange(rlast)]
    grids = np.meshgrid(*axes, indexing="ij")
    k = np.sqrt(sum(g**2 for g in grids))
    n = np.full(k.shape, 2, np.float32)
    n[..., 0] = 1
    if last % 2 == 0:
        n[..., -1] = 1
    kmax = min(spatial) // 2
    return k.astype(np.float32), n, kmax


def power(
    x: jnp.ndarray, x2: Optional[jnp.ndarray] = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x: (B, C, *spatial) or (B, *spatial, C) is NOT guessed — this function
    follows the reference convention (B, C, *spatial). Power summed over
    channels, averaged over batch. Returns (k, P, N) of length kmax."""
    signal_ndim = x.ndim - 2
    spatial = x.shape[-signal_ndim:]
    kgrid, weights, kmax = _kgrid_and_weights(spatial)

    fx = jnp.fft.rfftn(x.astype(jnp.float32), axes=range(2, x.ndim))
    fx2 = fx if x2 is None else jnp.fft.rfftn(x2.astype(jnp.float32), axes=range(2, x.ndim))
    P = (fx * jnp.conj(fx2)).real
    P = P.mean(axis=0).sum(axis=0)  # avg batch, sum channels

    kbin = jnp.asarray(np.ceil(kgrid).astype(np.int32).ravel())
    w = jnp.asarray(weights.ravel())
    kflat = jnp.asarray(kgrid.ravel())
    length = int(np.ceil(kgrid).max()) + 1

    ksum = jnp.bincount(kbin, weights=kflat * w, length=length)
    psum = jnp.bincount(kbin, weights=P.ravel() * w, length=length)
    nsum = jnp.bincount(kbin, weights=w, length=length)

    sl = slice(1, 1 + kmax)
    k = ksum[sl] / nsum[sl]
    Pk = psum[sl] / nsum[sl]
    return k, Pk, nsum[sl]


def pk(
    fields: jnp.ndarray, fields2: Optional[jnp.ndarray] = None
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample spectra, batched: fields (B, C, *spatial) -> (B, kmax) each
    (reference src/utils.py:85-102, vmapped instead of host-looped)."""
    f = lambda a: power(a[None])
    f2 = lambda a, b: power(a[None], b[None])
    if fields2 is None:
        return jax.vmap(f)(fields)
    return jax.vmap(f2)(fields, fields2)


def pk_conversion(dim: int = 2, boxsize: float = 25.0):
    """Unit conversion to physical k [h/Mpc] and P(k) (reference
    src/utils.py:104-108, generalized to 3D)."""
    k_conv = 2 * np.pi / boxsize
    p_conv = boxsize**dim
    return k_conv, p_conv


def get_ccs(
    fields1: jnp.ndarray, fields2: jnp.ndarray, full: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized cross-correlation r(k) = P12 / sqrt(P1 P2) (reference
    src/utils.py:110-128). full=True: all pairs (n1, n2, kmax)."""
    ks, pks1, _ = pk(fields1)
    pks2 = pk(fields2)[1]
    if full:
        n2 = fields2.shape[0]
        def one(f1):
            rep = jnp.broadcast_to(f1[None], (n2,) + f1.shape)
            return pk(rep, fields2)[1]
        ccs = jax.vmap(one)(fields1)
        ccs = ccs / jnp.sqrt(pks1[:, None] * pks2[None, :])
    else:
        assert fields1.shape[0] == fields2.shape[0]
        ccs = pk(fields1, fields2)[1]
        ccs = ccs / jnp.sqrt(pks1 * pks2)
    return ks, ccs
