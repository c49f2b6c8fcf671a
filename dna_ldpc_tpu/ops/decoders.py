"""Additional batched LDPC decoders: min-sum family, Gallager A/B, BEC
peeling — the rest of the reference's decoder zoo (``LDPC_dec/ldpc/
dec.cpp``), re-designed as batched array programs over the same dense edge
tables as the BP decoder.

- ``min_sum_decode``: the float min-sum of ``Run_MSA_Decoder_INF``
  (dec.cpp check update :1357-1436 / Check_Update_MSA_INF): check message
  = product of signs x min magnitude over the other edges, with optional
  offset (offset_beta, Check_Update_MSA) and normalization factors;
  decision sum > 0 -> 0 (Decision_MSA_INF), zero-LLR init ties broken by a
  seeded RNG (Init_MSA's rand_int(2));
- ``gallager_decode``: Gallager A/B on +/-1 messages
  (Run_Gallager_Decoder, dec.cpp:699-835): flip to -recv when at least b
  incoming check messages disagree with the channel value, with the
  reference's per-variant thresholds (A: b=dv-1, B: b=dv-2, decision
  thresholds dv / dv-1);
- ``bec_peel``: erasure-channel peeling (Run_BEC_Decoder family,
  dec.cpp:243-580): repeatedly solve checks with exactly one erased
  variable until no progress.

All decoders run the reference's control flow: syndrome check before each
iteration, stop at zero syndrome or max_iter, per-codeword result latching
across the batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ldpc_graph import LdpcGraph
from .bp import BpResult, _syndrome_unsat


def _gather_checkmajor(llr, check_vars):
    return jnp.take(llr, jnp.maximum(check_vars, 0).reshape(-1), axis=1)


@functools.lru_cache(maxsize=16)
def _min_sum_jit(graph: LdpcGraph, max_iter: int, offset: float, normalize: float):
    tables = graph.device_tables()
    check_vars = tables["check_vars"]
    check_mask = tables["check_mask"]
    var_edge_ids = tables["var_edge_ids"].reshape(-1)
    edge_perm = tables["edge_perm"]
    M, N = graph.n_checks, graph.n_vars
    dc, dv = graph.dc_max, graph.dv_max

    def check_update(v2c):
        B = v2c.shape[0]
        v = v2c.reshape(B, M, dc)
        mag = jnp.where(check_mask[None], jnp.abs(v), jnp.inf)
        neg = jnp.where(check_mask[None], v < 0, False)
        # exclusive min via two smallest magnitudes
        min1 = jnp.min(mag, axis=-1, keepdims=True)
        arg1 = jnp.argmin(mag, axis=-1)
        mag2 = jnp.where(jax.nn.one_hot(arg1, dc, dtype=bool), jnp.inf, mag)
        min2 = jnp.min(mag2, axis=-1, keepdims=True)
        is_min = jax.nn.one_hot(arg1, dc, dtype=bool)
        excl_min = jnp.where(is_min, min2, min1)
        n_neg = jnp.sum(neg, axis=-1, keepdims=True)
        excl_neg = n_neg - neg.astype(n_neg.dtype)
        sign = 1.0 - 2.0 * (excl_neg % 2).astype(v.dtype)
        m = jnp.maximum(excl_min - offset, 0.0) * normalize
        return (sign * m).reshape(B, M * dc)

    def decode(llr, tie_bits):
        B = llr.shape[0]
        dtype = llr.dtype
        bits0 = jnp.where(llr == 0, tie_bits, (llr < 0).astype(jnp.uint8))
        unsat0 = _syndrome_unsat(bits0.astype(jnp.int32), check_vars, check_mask)
        done0 = unsat0 == 0
        v0 = _gather_checkmajor(llr, check_vars)

        def cond(state):
            n, _, _, _, done, _ = state
            return (n < max_iter) & ~jnp.all(done)

        def body(state):
            n, v2c, bits, iters, done, unsat = state
            c2v = check_update(v2c)
            c2v = jax.lax.optimization_barrier(c2v)
            c2v_pad = jnp.concatenate([c2v, jnp.zeros((B, 1), dtype)], axis=1)
            cv = jnp.take(c2v_pad, var_edge_ids, axis=1).reshape(B, N, dv)
            post = llr + jnp.sum(cv, axis=-1)
            new_bits = (~(post > 0)).astype(jnp.uint8)  # sum > 0 -> 0
            v2c_vm = post[:, :, None] - cv
            v2c_pad = jnp.concatenate(
                [v2c_vm.reshape(B, N * dv), jnp.zeros((B, 1), dtype)], axis=1
            )
            new_v2c = jnp.take(v2c_pad, edge_perm, axis=1)
            new_unsat = _syndrome_unsat(new_bits.astype(jnp.int32), check_vars, check_mask)
            bits = jnp.where(done[:, None], bits, new_bits)
            unsat = jnp.where(done, unsat, new_unsat)
            iters = jnp.where(done, iters, n + 1)
            done = done | (new_unsat == 0)
            return (n + 1, new_v2c, bits, iters, done, unsat)

        state = (jnp.int32(0), v0, bits0, jnp.zeros(B, jnp.int32), done0, unsat0)
        _, _, bits, iters, done, unsat = jax.lax.while_loop(cond, body, state)
        return BpResult(bits=bits, success=done, iterations=iters, unsat=unsat)

    return jax.jit(decode)


def min_sum_decode(
    graph: LdpcGraph,
    llr: jax.Array,
    max_iter: int = 200,
    offset: float = 0.0,
    normalize: float = 1.0,
    tie_seed: int = 0,
) -> BpResult:
    """Float min-sum with optional offset/normalization. llr: [B, N]."""
    llr = jnp.atleast_2d(jnp.asarray(llr))
    key = jax.random.PRNGKey(tie_seed)
    tie_bits = jax.random.bernoulli(key, 0.5, llr.shape).astype(jnp.uint8)
    return _min_sum_jit(graph, max_iter, float(offset), float(normalize))(llr, tie_bits)


def quantize_llr(llr: jax.Array, precision: int, step: float) -> jax.Array:
    """Uniform LLR quantizer of the reference (Cal_MSA_Q, dec.cpp:
    1708-1765 / Set_MSA): integer levels round(LLR/step) clipped to
    +/-(2^(precision-1) - 1)."""
    lim = float((1 << (precision - 1)) - 1)
    q = jnp.round(jnp.asarray(llr) / step)
    return jnp.clip(q, -lim, lim)


def quantize_llr_quasi_uniform(
    llr: jax.Array,
    precision: int,
    step: float,
    uniform_levels: int | None = None,
    growth: float = 2.0,
) -> jax.Array:
    """Quasi-uniform LLR quantizer: uniform spacing ``step`` for the
    inner ``uniform_levels`` levels (default: half the level range),
    geometrically growing decision thresholds (factor ``growth``) for the
    outer levels — the standard low-error-floor companion quantizer to
    quantized min-sum (Zhang & Siegel-style).

    NOTE on reference parity: the reference's DECODER_MSA_QUASI_UNIFORM
    dispatches to ``Cal_MSA_Q(x, 1)`` whose quasi-uniform branch is an
    EMPTY stub (dec.cpp:1737-1740) — it returns 0 for every input, i.e.
    the shipped quasi-uniform decoder quantizes the whole channel to
    erasures. This implementation provides the real scheme the enum
    advertises; pass ``growth=None`` via quantize_llr_reference_stub for
    the literal shipped behavior."""
    lim = (1 << (precision - 1)) - 1
    nu = uniform_levels if uniform_levels is not None else max(1, lim // 2)
    nu = min(nu, lim)
    # decision thresholds t_k, k = 1..lim: level k chosen when |x| >= t_k
    t = np.empty(lim, np.float64)
    for k in range(1, nu + 1):
        t[k - 1] = (k - 0.5) * step          # reference uniform rounding
    for k in range(nu + 1, lim + 1):
        t[k - 1] = t[nu - 1] * growth ** (k - nu)
    x = jnp.asarray(llr)
    mag = jnp.abs(x)
    k = jnp.sum(mag[..., None] >= jnp.asarray(t, x.dtype), axis=-1)
    return jnp.sign(x) * k.astype(x.dtype)


def quantize_llr_reference_stub(llr: jax.Array) -> jax.Array:
    """The literal behavior of the reference's quasi-uniform branch
    (``Cal_MSA_Q(x, 1)``, dec.cpp:1737-1740): an unimplemented stub that
    maps every LLR to level 0. Kept for strict parity experiments."""
    return jnp.zeros_like(jnp.asarray(llr))


def quantized_min_sum_decode(
    graph: LdpcGraph,
    llr: jax.Array,
    precision: int = 5,
    step: float = 0.5,
    max_iter: int = 200,
    offset: float = 0.0,
    tie_seed: int = 0,
    quantizer: str = "uniform",
) -> BpResult:
    """Quantized offset min-sum (Run_MSA_Decoder, dec.cpp:1174-1436):
    channel LLRs quantized to ``precision``-bit integer levels with step
    size ``step``; the integer offset ``offset`` is subtracted in the
    check update (offset_beta). Message arithmetic runs on the integer
    levels (carried in f32 lanes — exact for these magnitudes).

    ``quantizer``: "uniform" (Cal_MSA_Q type 0), "quasi-uniform" (real
    scheme; see quantize_llr_quasi_uniform — the reference's enum-22
    branch is an empty stub), or "reference-quasi-stub" (the literal
    all-zeros shipped behavior)."""
    llr = jnp.atleast_2d(jnp.asarray(llr, jnp.float32))
    if quantizer == "uniform":
        q = quantize_llr(llr, precision, step)
    elif quantizer == "quasi-uniform":
        q = quantize_llr_quasi_uniform(llr, precision, step)
    elif quantizer == "reference-quasi-stub":
        q = quantize_llr_reference_stub(llr)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    key = jax.random.PRNGKey(tie_seed)
    tie_bits = jax.random.bernoulli(key, 0.5, q.shape).astype(jnp.uint8)
    return _min_sum_jit(graph, max_iter, float(offset), 1.0)(q, tie_bits)


@functools.lru_cache(maxsize=16)
def _gallager_jit(graph: LdpcGraph, max_iter: int, variant: int):
    tables = graph.device_tables()
    check_vars = tables["check_vars"]
    check_mask = tables["check_mask"]
    var_edge_ids = tables["var_edge_ids"].reshape(-1)
    edge_perm = tables["edge_perm"]
    M, N = graph.n_checks, graph.n_vars
    dc, dv = graph.dc_max, graph.dv_max

    # thresholds (Variable_Update_Gallager / Decision_Gallager):
    if variant == 0:      # Gallager A
        b_var, b_dec = dv - 1, dv
    elif variant == 1:    # Gallager B (strength 1)
        b_var, b_dec = dv - 2, dv - 1
    else:                 # majority variant
        b_var, b_dec = dv // 2 + dv % 2, dv // 2 + 1

    def decode(recv):
        """recv: [B, N] int8 in {+1, -1} (channel hard values)."""
        B = recv.shape[0]
        bits0 = (recv < 0).astype(jnp.uint8)
        unsat0 = _syndrome_unsat(bits0.astype(jnp.int32), check_vars, check_mask)
        done0 = unsat0 == 0
        v0 = _gather_checkmajor(recv, check_vars)

        def cond(state):
            n, _, _, _, done, _ = state
            return (n < max_iter) & ~jnp.all(done)

        def body(state):
            n, v2c, bits, iters, done, unsat = state
            v = v2c.reshape(B, M, dc)
            vm = jnp.where(check_mask[None], v, 1)
            neg = vm < 0
            n_neg = jnp.sum(neg, axis=-1, keepdims=True)
            excl_neg = n_neg - neg.astype(n_neg.dtype)
            c2v = (1 - 2 * (excl_neg % 2)).astype(jnp.int8).reshape(B, M * dc)
            c2v_pad = jnp.concatenate([c2v, jnp.zeros((B, 1), jnp.int8)], axis=1)
            cv = jnp.take(c2v_pad, var_edge_ids, axis=1).reshape(B, N, dv)
            flipped = cv == -recv[:, :, None]  # message == -m0
            agree_counts = jnp.sum(flipped, axis=-1)  # [B, N] total count
            # per-edge exclusive count
            excl = agree_counts[:, :, None] - flipped.astype(jnp.int32)
            new_v2c_vm = jnp.where(excl >= b_var, -recv[:, :, None], recv[:, :, None])
            v2c_pad = jnp.concatenate(
                [new_v2c_vm.reshape(B, N * dv).astype(jnp.int8), jnp.zeros((B, 1), jnp.int8)],
                axis=1,
            )
            new_v2c = jnp.take(v2c_pad, edge_perm, axis=1)
            dec_val = jnp.where(agree_counts >= b_dec, -recv, recv)
            new_bits = (dec_val < 0).astype(jnp.uint8)
            new_unsat = _syndrome_unsat(new_bits.astype(jnp.int32), check_vars, check_mask)
            bits = jnp.where(done[:, None], bits, new_bits)
            unsat = jnp.where(done, unsat, new_unsat)
            iters = jnp.where(done, iters, n + 1)
            done = done | (new_unsat == 0)
            return (n + 1, new_v2c, bits, iters, done, unsat)

        state = (jnp.int32(0), v0, bits0, jnp.zeros(B, jnp.int32), done0, unsat0)
        _, _, bits, iters, done, unsat = jax.lax.while_loop(cond, body, state)
        return BpResult(bits=bits, success=done, iterations=iters, unsat=unsat)

    return jax.jit(decode)


def gallager_decode(
    graph: LdpcGraph, hard_bits: jax.Array, max_iter: int = 200, variant: int = 0
) -> BpResult:
    """Gallager A (variant 0) / B (1) / majority (2). hard_bits: [B, N]
    0/1 channel hard decisions."""
    bits = jnp.atleast_2d(jnp.asarray(hard_bits))
    recv = (1 - 2 * bits.astype(jnp.int8)).astype(jnp.int8)
    return _gallager_jit(graph, max_iter, variant)(recv)


ERASE_MARK = 2  # channel.cpp:95-120


@functools.lru_cache(maxsize=16)
def _bec_peel_jit(graph: LdpcGraph, max_iter: int):
    tables = graph.device_tables()
    check_vars = tables["check_vars"]
    check_mask = tables["check_mask"]
    M, N = graph.n_checks, graph.n_vars
    dc = graph.dc_max

    def decode(vals):
        """vals: [B, N] int8 in {0, 1, 2=erased}."""
        B = vals.shape[0]
        gather_idx = jnp.maximum(check_vars, 0).reshape(-1)

        def cond(state):
            n, vals, changed = state
            return (n < max_iter) & changed

        def body(state):
            n, vals, _ = state
            g = jnp.take(vals, gather_idx, axis=1).reshape(B, M, dc)
            g = jnp.where(check_mask[None], g, 0)
            erased = g == ERASE_MARK
            n_erased = jnp.sum(erased, axis=-1)  # [B, M]
            known_parity = jnp.sum(jnp.where(erased, 0, g), axis=-1) % 2
            solvable = n_erased == 1
            # the single erased variable of each solvable check
            var_of = jnp.sum(
                jnp.where(erased, jnp.maximum(check_vars, 0)[None], 0), axis=-1
            )
            target = jnp.where(solvable, var_of, N)  # dummy slot N
            value = known_parity.astype(jnp.int8)
            upd = jnp.full((B, N + 1), ERASE_MARK, jnp.int8)
            upd = upd.at[jnp.arange(B)[:, None], target].set(value)
            new_vals = jnp.where(
                (vals == ERASE_MARK) & (upd[:, :N] != ERASE_MARK), upd[:, :N], vals
            )
            changed = jnp.any(new_vals != vals)
            return (n + 1, new_vals, changed)

        n, vals, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), vals, jnp.bool_(True)))
        bits = jnp.where(vals == ERASE_MARK, 0, vals).astype(jnp.uint8)
        unsat = _syndrome_unsat(bits.astype(jnp.int32), check_vars, check_mask)
        resolved = ~jnp.any(vals == ERASE_MARK, axis=1)
        return BpResult(
            bits=bits,
            success=resolved & (unsat == 0),
            iterations=jnp.full(vals.shape[0], n, jnp.int32),
            unsat=unsat,
        )

    return jax.jit(decode)


def bec_peel(graph: LdpcGraph, values: jax.Array, max_iter: int = 200) -> BpResult:
    """Peeling decoder for the binary erasure channel. values: [B, N] with
    0/1 known bits and 2 marking erasures."""
    vals = jnp.atleast_2d(jnp.asarray(values, jnp.int8))
    return _bec_peel_jit(graph, max_iter)(vals)
