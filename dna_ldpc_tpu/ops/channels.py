"""Simulation channels: AWGN / BSC / BEC LLR generation and fault
injection (puncturing/shortening erasures).

Parity with the reference's channel layer (``LDPC_dec/ldpc/channel.cpp``:
EbNo->sigma at :9-16, BPSK AWGN LLR = 2r/sigma^2 at :23-35, BSC :37-89,
BEC with ERASE_MARK=2 :95-120) and the erasure-injection paths of
``DNA_main.cpp:1353-1558``. Vectorized over whole codeword batches with a
jax PRNG key instead of the MKL VSL stream (rand.cpp:11-15).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

ERASE_MARK = 2


def ebno_to_sigma(ebno_db: float, rate: float) -> float:
    """Noise std-dev for BPSK at the given Eb/No (getStd_dev)."""
    return math.sqrt(1.0 / (2.0 * rate * 10.0 ** (ebno_db / 10.0)))


def awgn_llr(key, codewords: jax.Array, sigma: float) -> jax.Array:
    """BPSK-modulate bits (0 -> +1, 1 -> -1), add N(0, sigma^2), return
    LLR = 2r/sigma^2 (channel.cpp:23-35; LLR >= 0 <=> bit 0)."""
    x = 1.0 - 2.0 * codewords.astype(jnp.float32)
    r = x + sigma * jax.random.normal(key, codewords.shape)
    return 2.0 * r / (sigma * sigma)


def bsc_llr(key, codewords: jax.Array, p: float) -> jax.Array:
    """Flip each bit w.p. p; LLR = +/- log((1-p)/p)."""
    flips = jax.random.bernoulli(key, p, codewords.shape)
    rx = jnp.logical_xor(codewords.astype(bool), flips)
    mag = math.log((1 - p) / p)
    return jnp.where(rx, -mag, mag).astype(jnp.float32)


def bec_values(key, codewords: jax.Array, p: float) -> jax.Array:
    """Erase each bit w.p. p -> int8 values {0, 1, ERASE_MARK}."""
    erase = jax.random.bernoulli(key, p, codewords.shape)
    return jnp.where(erase, ERASE_MARK, codewords.astype(jnp.int8)).astype(jnp.int8)


def inject_erasures(llr: jax.Array, positions) -> jax.Array:
    """Zero the LLRs at the given positions (puncturing fault injection,
    DNA_main.cpp:1440-1470 analog in the soft domain)."""
    return llr.at[..., jnp.asarray(positions)].set(0.0)


def puncture(llr: jax.Array, positions) -> jax.Array:
    """Puncturing: the transmitter skips these code bits, so the receiver
    has no observation — LLR 0 (DNA_main.cpp puncture path, :1440-1470)."""
    return inject_erasures(llr, positions)


SHORTEN_LLR = 1e9


def shorten(llr: jax.Array, positions) -> jax.Array:
    """Shortening: these code bits are known zero a priori — saturated
    positive LLR (DNA_main.cpp shortening path, :1472-1520)."""
    return llr.at[..., jnp.asarray(positions)].set(SHORTEN_LLR)
