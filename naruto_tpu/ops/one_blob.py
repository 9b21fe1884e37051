"""One-blob positional encoding (NRC / tcnn OneBlob, n_bins=16).

Replaces tcnn's OneBlob used for the decoder's positional input
(configs/Replica/replica_coslam.yaml pos: n_bins=16 -> input_ch_pos = 48).

Each input dimension x in [0,1] is encoded as the integral of a Gaussian
kernel (sigma = 1/n_bins) centered at x over each of the n_bins equal bins:
  f_i = Phi((e_{i+1} - x)/sigma) - Phi((e_i - x)/sigma)
with Phi the standard normal CDF. This is the smooth generalization of
one-hot binning from the neural-radiosity-cache paper; exact bitwise parity
with tcnn's quartic-kernel variant is not required — the encoding only feeds
a learned MLP.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def one_blob_encode(x: jnp.ndarray, n_bins: int = 16) -> jnp.ndarray:
    """x: [..., D] in [0,1] -> [..., D*n_bins]."""
    edges = jnp.linspace(0.0, 1.0, n_bins + 1, dtype=x.dtype)
    sigma = 1.0 / n_bins
    # z: [..., D, n_bins+1]
    z = (edges - x[..., None]) / (sigma * jnp.sqrt(2.0).astype(x.dtype))
    cdf = 0.5 * (1.0 + jax.lax.erf(z))
    feats = cdf[..., 1:] - cdf[..., :-1]
    return feats.reshape(*x.shape[:-1], x.shape[-1] * n_bins)
