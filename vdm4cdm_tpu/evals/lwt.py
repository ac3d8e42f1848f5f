"""LWT — 2D wavelet scattering transform (order 2) + reduced (RWST) summary.

Capability parity with the reference's ``mltools.archive.LWT`` as used by
calc_SS.py:30-49: ``make_wavelets(N=128, NR=4, NT=4, sqrt=True)`` builds an
NR-scale x NT-orientation Morlet filter bank; ``WST_abs2(fields, ..., m=2)``
computes |x * psi|^2-style scattering coefficients to order 2; ``get_rwst``
rotation-averages them. The mltools internals are not public (SURVEY.md §2b
LWT row) — this is an independent, standard Bruna–Mallat scattering
implementation with the same call surface and summary semantics:

  order 0: mean and mean power of the field                    (2 coeffs)
  order 1: S1[j, t]        = mean(|x * psi_{j,t}|^2)           (NR*NT)
  order 2: S2[j1,t1,j2,t2] = mean(||x * psi_{j1,t1}| * psi_{j2,t2}|^2),
           j2 > j1                                             (C(NR,2)*NT^2)

RWST averages over global rotation: S1 -> per-scale (NR), S2 -> per
(j1, j2, Δt) (C(NR,2)*NT). Output layout: [order0 (2) | S1 | S2]; the
reference's usage slices [:, 2:] to drop order 0 (calc_SS.py:48) — identical
here. Runs fully jitted (FFT-domain convolutions, vmapped over the bank).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _morlet_bank_np(N: int, NR: int, NT: int, sqrt: bool = True) -> np.ndarray:
    """Fourier-domain Morlet-like filters, shape (NR*NT, N, N), float64.

    Scale j has center frequency k_j = 0.4*N / 2^j cycles/box and bandwidth
    sigma_j proportional to k_j; orientation t rotates the center by
    t*pi/NT. Filters are zero-mean by construction (no DC response).
    """
    kx = np.fft.fftfreq(N) * N
    ky = np.fft.fftfreq(N) * N
    KX, KY = np.meshgrid(kx, ky, indexing="ij")
    filters = []
    for j in range(NR):
        k0 = 0.4 * N / (2.0**j)
        sigma = k0 / 2.0
        for t in range(NT):
            theta = np.pi * t / NT
            cx, cy = k0 * np.cos(theta), k0 * np.sin(theta)
            g = np.exp(-((KX - cx) ** 2 + (KY - cy) ** 2) / (2 * sigma**2))
            g[0, 0] = 0.0  # kill DC
            # L2 normalize so each scale contributes comparably
            g = g / np.sqrt((g**2).mean() + 1e-30)
            filters.append(np.sqrt(g) if sqrt else g)
    return np.stack(filters)


def make_wavelets(
    N: int = 128,
    NR: int = 4,
    NT: int = 4,
    twopi: bool = False,
    dtype=np.float64,
    return_bases: bool = False,
    verbose: bool = False,
    sqrt: bool = True,
) -> Tuple[tuple, list]:
    """Reference call surface (calc_SS.py:30-38). Returns (wavelet_mms,
    wavelet_vals): metadata tuple + the filter bank list."""
    bank = _morlet_bank_np(N, NR, NT, sqrt=sqrt).astype(dtype)
    wavelet_mms = (N, NR, NT)
    wavelet_vals = [jnp.asarray(b) for b in bank]
    if return_bases:
        return wavelet_mms, wavelet_vals, bank
    return wavelet_mms, wavelet_vals


@partial(jax.jit, static_argnames=("mms", "m"))
def _wst_abs2_jit(fields: jnp.ndarray, bank: jnp.ndarray, mms, m: int) -> jnp.ndarray:
    N, NR, NT = mms
    nf = NR * NT
    x = fields.astype(jnp.float32)
    fx = jnp.fft.fft2(x)  # (B, N, N)

    def conv_abs(f_spectrum, filt):
        return jnp.abs(jnp.fft.ifft2(f_spectrum * filt))

    # order 1 moduli: (B, nf, N, N)
    u1 = jax.vmap(lambda filt: conv_abs(fx, filt), out_axes=1)(bank)
    s0 = jnp.stack([x.mean(axis=(1, 2)), (x**2).mean(axis=(1, 2))], axis=1)
    s1 = (u1**2).mean(axis=(2, 3))  # (B, nf)

    coeffs = [s0, s1]
    if m >= 2:
        fu1 = jnp.fft.fft2(u1)  # (B, nf, N, N)
        s2 = []
        for i1 in range(nf):
            j1 = i1 // NT
            for i2 in range(nf):
                j2 = i2 // NT
                if j2 <= j1:
                    continue
                u2 = jnp.abs(jnp.fft.ifft2(fu1[:, i1] * bank[i2]))
                s2.append((u2**2).mean(axis=(1, 2)))
        coeffs.append(jnp.stack(s2, axis=1))
    return jnp.concatenate(coeffs, axis=1)


def WST_abs2(fields, wavelet_mms, wavelet_vals, m: int = 2, verbose: bool = False):
    """fields: (B, N, N) -> (B, 2 + NR*NT + n2) scattering coefficients."""
    bank = jnp.stack(wavelet_vals).astype(jnp.complex64)
    fields = jnp.asarray(fields)
    squeeze = fields.ndim == 2
    if squeeze:
        fields = fields[None]
    out = _wst_abs2_jit(fields, bank, tuple(wavelet_mms), m)
    return out[0] if squeeze else out


def get_rwst(wst: np.ndarray, NR: int = 4, NT: int = 4) -> np.ndarray:
    """Reduce by rotation averaging (reference calc_SS.py:48). wst: (B, D) ->
    (B, 2 + NR + C(NR,2)*NT): order-0 passthrough, S1 averaged over
    orientation, S2 averaged over (t1, t2) pairs with fixed Δt = t2 - t1 mod NT."""
    wst = np.asarray(wst)
    squeeze = wst.ndim == 1
    if squeeze:
        wst = wst[None]
    B = wst.shape[0]
    s0 = wst[:, :2]
    nf = NR * NT
    s1 = wst[:, 2 : 2 + nf].reshape(B, NR, NT).mean(axis=2)

    # rebuild the (j1,t1,j2,t2) index list used by WST_abs2
    pair_index = []
    for i1 in range(nf):
        j1, t1 = divmod(i1, NT)
        for i2 in range(nf):
            j2, t2 = divmod(i2, NT)
            if j2 <= j1:
                continue
            pair_index.append((j1, t1, j2, t2))
    s2_flat = wst[:, 2 + nf :]
    assert s2_flat.shape[1] == len(pair_index)

    jpairs = sorted({(j1, j2) for j1, _, j2, _ in pair_index})
    out2 = np.zeros((B, len(jpairs), NT))
    counts = np.zeros((len(jpairs), NT))
    for col, (j1, t1, j2, t2) in enumerate(pair_index):
        jp = jpairs.index((j1, j2))
        dt = (t2 - t1) % NT
        out2[:, jp, dt] += s2_flat[:, col]
        counts[jp, dt] += 1
    out2 = out2 / np.maximum(counts, 1)
    out = np.concatenate([s0, s1, out2.reshape(B, -1)], axis=1)
    return out[0] if squeeze else out
