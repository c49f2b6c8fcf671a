"""Finite-alphabet iterative decoders (FAID).

Batched TPU re-design of the reference's LUT-driven FAID family
(``LDPC_dec/ldpc/dec.cpp:837-1171``): messages live on a small symmetric
level alphabet {-L_s..-L_1, 0, L_1..L_s}; the check node is the usual
sign x min rule; the variable node is an arbitrary *lookup table*
Phi(channel sign, incoming messages) — the nonlinearity that lets FAIDs
beat floating BP in the error floor on column-weight-3 codes.

Engine design: messages are carried as level *values* (small floats) in
the same dense edge tables as the other decoders; the variable-node LUT
is applied as a quantizer over (weighted channel + exclusive message
sums), which expresses every threshold-symmetric FAID: a table
Phi(y, m1..m_{dv-1}) that is symmetric and monotone in the sum collapses
to level thresholds on w*y + sum(m). ``default_faid_rule`` is the
standard 7-level instance; custom (weight, thresholds, levels) tuples
express other published tables.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..models.ldpc_graph import LdpcGraph
from .bp import BpResult, _syndrome_unsat


@dataclasses.dataclass(frozen=True)
class FaidRule:
    """A threshold-symmetric FAID variable-node rule.

    new_level = sign(s) * levels[ #thresholds below |s| ]   with
    s = channel_weight * y + sum(incoming c2v), y = +/-C channel value.
    """

    levels: tuple          # (L1, L2, ..., Ls), positive ascending
    thresholds: tuple      # (T1, ..., Ts): |s| >= T_k -> at least level k
    channel_value: float   # C, the +/-channel magnitude
    channel_weight: float  # w applied to the channel term


def default_faid_rule() -> FaidRule:
    """7-level (3-bit) FAID for column-weight-3 codes: levels {1, 2, 3},
    channel +/-1.5 weighted 1, thresholds placed between level sums."""
    return FaidRule(
        levels=(1.0, 2.0, 3.0),
        thresholds=(0.5, 2.5, 4.5),
        channel_value=1.5,
        channel_weight=1.0,
    )


def faid_decode(
    graph: LdpcGraph,
    hard_bits,
    max_iter: int = 200,
    rule: FaidRule | None = None,
) -> BpResult:
    """Decode hard-decision input (BSC) with a finite-alphabet decoder.

    hard_bits: [B, N] 0/1 channel hard decisions. Returns the usual
    BpResult with the reference's syndrome-before-iteration semantics."""
    import jax.numpy as jnp

    rule = rule or default_faid_rule()
    bits = jnp.atleast_2d(jnp.asarray(hard_bits))
    y = jnp.where(bits == 0, rule.channel_value, -rule.channel_value).astype(jnp.float32)
    return _faid_jit(graph, max_iter, rule)(y)


@functools.lru_cache(maxsize=16)
def _faid_jit(graph: LdpcGraph, max_iter: int, rule: FaidRule):
    import jax
    import jax.numpy as jnp

    tables = graph.device_tables()
    check_vars = tables["check_vars"]
    check_mask = tables["check_mask"]
    var_edge_ids = tables["var_edge_ids"].reshape(-1)
    edge_perm = tables["edge_perm"]
    M, N = graph.n_checks, graph.n_vars
    dc, dv = graph.dc_max, graph.dv_max
    levels = np.asarray(rule.levels, np.float32)
    thresholds = np.asarray(rule.thresholds, np.float32)

    def quantize(s):
        """Map s to sign(s) * levels[#thresholds <= |s|], 0 below T1."""
        mag = jnp.abs(s)
        k = jnp.sum(mag[..., None] >= thresholds, axis=-1)  # 0..len(levels)
        lv = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.asarray(levels)])
        return jnp.sign(s) * lv[k]

    def check_update(v2c):
        B = v2c.shape[0]
        v = v2c.reshape(B, M, dc)
        mag = jnp.where(check_mask[None], jnp.abs(v), jnp.inf)
        neg = jnp.where(check_mask[None], v < 0, False)
        min1 = jnp.min(mag, axis=-1, keepdims=True)
        arg1 = jnp.argmin(mag, axis=-1)
        is_min = jax.nn.one_hot(arg1, dc, dtype=bool)
        min2 = jnp.min(jnp.where(is_min, jnp.inf, mag), axis=-1, keepdims=True)
        excl_min = jnp.where(is_min, min2, min1)
        n_neg = jnp.sum(neg, axis=-1, keepdims=True)
        excl_neg = n_neg - neg.astype(n_neg.dtype)
        sign = 1.0 - 2.0 * (excl_neg % 2).astype(v.dtype)
        return (sign * excl_min).reshape(B, M * dc)

    def decode(y):
        """y: [B, N] +/-C channel values."""
        B = y.shape[0]
        bits0 = (y < 0).astype(jnp.uint8)
        unsat0 = _syndrome_unsat(bits0.astype(jnp.int32), check_vars, check_mask)
        done0 = unsat0 == 0
        v0 = quantize(jnp.take(y, jnp.maximum(check_vars, 0).reshape(-1), axis=1))

        def cond(state):
            n, _, _, _, done, _ = state
            return (n < max_iter) & ~jnp.all(done)

        def body(state):
            n, v2c, bits, iters, done, unsat = state
            c2v = check_update(v2c)
            c2v = jax.lax.optimization_barrier(c2v)
            c2v_pad = jnp.concatenate([c2v, jnp.zeros((B, 1), jnp.float32)], axis=1)
            cv = jnp.take(c2v_pad, var_edge_ids, axis=1).reshape(B, N, dv)
            total = rule.channel_weight * y + jnp.sum(cv, axis=-1)  # [B, N]
            new_bits = (~(total > 0)).astype(jnp.uint8)
            # variable update: LUT over channel + exclusive message sum
            v2c_vm = quantize(total[:, :, None] - cv)
            v2c_pad = jnp.concatenate(
                [v2c_vm.reshape(B, N * dv), jnp.zeros((B, 1), jnp.float32)], axis=1
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
