"""Lane-vectorized SHA-256 tagged hash for the BIP-352 shared-secret step.

TPU-native replacement for gECC's device sha256 + the reference's
ComputeTaggedHashesKernel (/root/reference/src/cudasp_gpu.cu:288-314), with
two structural wins:

  * The tag midstate (SHA256(tag)||SHA256(tag) is exactly one 64-byte
    block) is precomputed on the host, so each row costs ONE compression
    instead of two.
  * The hash never leaves the device: the reference round-trips all hashes
    D2H, repacks limbs on the host, and copies back
    (src/cudasp_gpu.cu:836-911); here the output words feed the comb
    multiply directly.

All state is (B,) uint32 vectors; the compression is a fully unrolled
64-round straight-line program on the VPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..oracle.sha256 import K as _K_HOST
from ..oracle.sha256 import tagged_midstate

TAG = b"BIP0352/SharedSecret"
_MIDSTATE = tagged_midstate(TAG)
# total message length: 64 (tag block) + 37 (serialized) bytes = 808 bits
_BITLEN = (64 + 37) * 8


def _rotr(x, n):
    return (x >> np.uint32(n)) | (x << np.uint32(32 - n))


def compress_block(words, state=None):
    """words: list of 16 (B,) uint32 arrays; returns 8 (B,) uint32."""
    if state is None:
        state = [jnp.full_like(words[0], np.uint32(s)) for s in _MIDSTATE]
    w = list(words)
    for t in range(16, 64):
        s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> np.uint32(3))
        s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> np.uint32(10))
        w.append(w[t - 16] + s0 + w[t - 7] + s1)
    a, b, c, d, e, f, g, h = state
    for t in range(64):
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + np.uint32(_K_HOST[t]) + w[t]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        h, g, f, e, d, c, b, a = g, f, e, d + t1, c, b, a, t1 + t2
    out = (a, b, c, d, e, f, g, h)
    return [s + v for s, v in zip(state, out)]


def tagged_hash_serialized(x_words, parity):
    """BIP-352 shared-secret hash of serialize(ecdh) = prefix || x || 0^4.

    x_words: (8, B) uint32, big-endian words of the canonical affine x.
    parity:  (B,) uint32, 0 or 1 (y parity -> prefix 0x02/0x03).
    Returns (8, B) uint32 hash words (big-endian word order)."""
    xw = [x_words[i] for i in range(8)]
    prefix = np.uint32(0x02) + parity
    b = x_words.shape[1]

    w = []
    w.append((prefix << np.uint32(24)) | (xw[0] >> np.uint32(8)))
    for i in range(1, 8):
        w.append((xw[i - 1] << np.uint32(24)) | (xw[i] >> np.uint32(8)))
    # bytes 32..35 = [x_byte31, 0, 0, 0]; byte 36 = 0, byte 37 = 0x80 pad
    w.append((xw[7] & np.uint32(0xFF)) << np.uint32(24))
    w.append(jnp.full((b,), np.uint32(0x00800000)))
    for _ in range(5):
        w.append(jnp.zeros((b,), np.uint32))
    w.append(jnp.full((b,), np.uint32(_BITLEN)))
    # NOTE: returned as a tuple of 8 (B,) arrays, NOT stacked. Stacking the
    # eight deep dependency chains into one buffer inside the same program
    # deadlocks the XLA:CPU thunk executor (observed hang, 0% CPU); callers
    # that need an (8, B) array must stack across a jit boundary where the
    # words are materialized inputs.
    return tuple(compress_block(w))
