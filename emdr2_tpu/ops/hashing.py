"""Shared integer-hash pieces for counter-based dropout masks.

Both the Pallas flash kernels' in-kernel attention dropout
(``ops/fid_attention._keep_mask``) and the elementwise hidden-dropout
module (``models/layers.PackedDropout``) derive their keep masks from the
same murmur3-style construction: mix per-axis element coordinates with odd
primes, then avalanche. Keeping the finalizer and the prime table here —
pure jnp, usable from flax modules and inside Pallas kernels alike — means
a future tweak cannot silently diverge the two masks' statistics.
"""

from __future__ import annotations

import jax.numpy as jnp

# odd 32-bit mixing primes (golden-ratio + murmur/xxhash constants)
MIX_PRIMES = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F,
              0x165667B1, 0xFF51AFD7, 0xC4CEB9FF, 0x2545F491)


def murmur_fin(h):
    """murmur3 finalizer: avalanche a u32 so low-entropy (e.g. linear
    counter) inputs produce decorrelated bits."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h
