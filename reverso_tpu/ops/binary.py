"""Binary-quantized candidate scan (qdrant BinaryQuantization role).

qdrant's binary quantization keeps a 1-bit-per-dimension copy of every
vector in RAM, scans it for candidates, then rescores the survivors
against the full-precision originals (the `rescore`/`oversampling`
search params). The reference app never enabled it (cosine-only qdrant
local mode, reference core_system.py:600-622) — this is the capacity
feature that makes the single-chip story scale: a packed row costs
d/8 bytes of HBM, 16x less than bf16, so 1M x 1024 fits in 128 MB and
a v5e chip holds ~100M vectors of candidate index next to a model.

TPU-native shape of the scan: the packed [N, d/8] uint8 matrix streams
through a `lax.scan`; each chunk is unpacked to {-1, +1} bf16 (3 VPU
ops per element: shift, mask, select — XLA fuses them) and hits the
MXU against the FULL-PRECISION query block. This asymmetric scoring
(f32 query x sign(db)) is strictly more accurate than symmetric
XOR+popcount hamming at the same storage cost, and it turns the scan
into standard matmul work instead of VPU popcounts. Candidate scores
are `sum_i q_i * sign(x_i)` — a monotone proxy for cosine on
unit-normalized data, NOT the true score; callers that need true
scores rescore the top oversample*k candidates against the f32 rows
(store/index.py BinaryIndex + the engine adapter do exactly that,
matching qdrant's semantics).

Result contract matches every other scan: ordered by (-score, idx),
ties to the lower row id, -1 in absent slots.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .topk import _pad_dim, _round_up

# packed rows per scan step: big chunks amortize the per-step
# lax.top_k merge (the dominant non-matmul cost — each step pays a
# [Q, chunk+k] partial sort), at the price of a transient
# chunk * d * 2-byte unpacked bf16 block (64k rows x 1024 d = 128 MB)
_CHUNK_ROWS = 65536


def pack_signs(vectors: np.ndarray,
               plane_width: Optional[int] = None) -> np.ndarray:
    """[N, d] float -> [N, W] uint8 of sign bits (x > 0) in PLANAR
    layout: bit j of byte b is dimension j*W + b (W = plane_width,
    default ceil(d/8); dims >= d read as zeros -> bit 0). Planar
    instead of byte-major because the device unpack then needs no bit
    interleave: plane j is just `(packed >> j) & 1`, a full-width
    shifted copy, and the 8 planes concatenate along columns back into
    the ORIGINAL dimension order — so queries never permute, and XLA /
    Mosaic never materialize a [C, W, 8] bit tensor. The Pallas scan
    passes `plane_width=round_up(ceil(d/8), 128)` so each plane is a
    whole number of VMEM lane tiles (its unpack writes planes straight
    into lane slices of the ±1 scratch)."""
    v = np.asarray(vectors)
    n = len(v)
    d = v.shape[1] if v.ndim == 2 and v.size else 0
    w = plane_width if plane_width is not None else max((d + 7) // 8, 1)
    if 8 * w < d:
        raise ValueError(f"plane_width {w} too small for d={d}")
    bits = np.zeros((n, 8 * w), np.uint8)
    bits[:, :d] = v > 0
    planes = bits.reshape(n, 8, w)
    weights = (1 << np.arange(8, dtype=np.uint16))[None, :, None]
    return (planes.astype(np.uint16) * weights).sum(axis=1).astype(np.uint8)


def _unpack_pm1(packed, d: int):
    """[C, d8] planar uint8 -> [C, d] bf16 in {-1, +1} (bit -> 2b-1).
    8 shifted full-width copies + one lane concat — no 3-D bit tensor,
    no interleave (see pack_signs on the layout)."""
    planes = [((packed >> j) & jnp.uint8(1)) for j in range(8)]
    u = jnp.concatenate(planes, axis=1)[:, :d].astype(jnp.bfloat16)
    return u * 2 - 1


@functools.partial(jax.jit, static_argnames=("k", "d", "chunk"))
def binary_topk_xla(packed: jnp.ndarray, queries: jnp.ndarray, k: int,
                    d: int, n_valid=None, row_mask=None, *,
                    chunk: int = _CHUNK_ROWS):
    """Candidate top-k over a sign-packed database.

    packed: [N, ceil(d/8)] uint8 (pack_signs layout). queries: [Q, d]
    full-precision. Returns (scores [Q, k] f32, idx [Q, k] i32) where
    scores are the asymmetric binary similarities `sum q_i * sign(x_i)`
    accumulated in f32 from one bf16 MXU pass (the same single-pass
    precision every bf16 scan here uses). `row_mask` ([N] bool)
    excludes rows exactly; `n_valid` masks trailing padding rows.
    """
    n, d8 = packed.shape
    q = queries.shape[0]
    assert d8 * 8 >= d, (d8, d)
    if n == 0:
        return (jnp.full((q, k), -jnp.inf, jnp.float32),
                jnp.full((q, k), -1, jnp.int32))
    if n_valid is None:
        n_valid = n
    n_valid = jnp.asarray(n_valid, jnp.int32)
    chunk = min(chunk, _round_up(n, 128))
    qb = queries.astype(jnp.bfloat16)
    k_eff = min(k, n)
    # chunks are DYNAMIC-SLICED out of the resident matrix — the
    # former pad-to-chunk-multiple materialized a full padded COPY
    # (a transient the size of the whole packed index; see the same
    # fix in ops/topk.py cosine_topk_int8_xla). The tail chunk clamps
    # its start and drops the re-read overlap rows.
    mask_arr = (jnp.asarray(row_mask, jnp.bool_)
                if row_mask is not None else None)
    if mask_arr is not None and mask_arr.shape[0] < n:
        mask_arr = _pad_dim(mask_arr, 0, n)
    if n <= chunk:
        packed = _pad_dim(packed, 0, chunk)
        if mask_arr is not None:
            mask_arr = _pad_dim(mask_arr, 0, chunk)
        n_rows, n_steps = chunk, 1
    else:
        n_rows, n_steps = n, -(-n // chunk)

    def body(carry, i):
        s_c, i_c = carry
        base = i * chunk
        start = jnp.minimum(base, n_rows - chunk)   # tail clamps
        block = jax.lax.dynamic_slice(packed, (start, 0), (chunk, d8))
        u = _unpack_pm1(block, d)                          # [C, d] ±1
        s = jax.lax.dot_general(
            qb, u, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [Q, C]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + start
        # col >= base drops the clamped tail's re-read rows exactly
        s = jnp.where((col >= base) & (col < n_valid), s, -jnp.inf)
        if mask_arr is not None:
            mblk = jax.lax.dynamic_slice(mask_arr, (start,), (chunk,))
            s = jnp.where(mblk[None, :], s, -jnp.inf)
        # stable merge: carry (lower ids) precedes the chunk, lax.top_k
        # keeps the leftmost of equal scores -> (-score, idx) order
        all_s = jnp.concatenate([s_c, s], axis=1)
        all_i = jnp.concatenate([i_c, col], axis=1)
        top_s, pos = jax.lax.top_k(all_s, k_eff)
        return (top_s, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (jnp.full((q, k_eff), -jnp.inf, jnp.float32),
            jnp.full((q, k_eff), -1, jnp.int32))
    (top_s, top_i), _ = jax.lax.scan(
        body, init, jnp.arange(n_steps, dtype=jnp.int32))
    if k_eff < k:
        top_s = _pad_dim(top_s, 1, k)
        top_s = top_s.at[:, k_eff:].set(-jnp.inf)
        top_i = _pad_dim(top_i, 1, k)
    top_i = jnp.where(jnp.isneginf(top_s), -1, top_i)
    return top_s, top_i.astype(jnp.int32)


def lane_plane_width(d: int) -> int:
    """Plane width the Pallas scan needs: ceil(d/8) rounded up to a
    whole VMEM lane tile (128 uint8 columns). Costs at most one lane
    tile of padding per plane — 0 at d=1024, 2x at d=512 (still 8x
    smaller than int8 rows)."""
    return _round_up(max((d + 7) // 8, 1), 128)


def binary_topk_pallas(packed: jnp.ndarray, queries: jnp.ndarray, k: int,
                       d: int, *, q_tile: int = 256, db_tile: int = 1024,
                       n_valid=None, interpret=None, row_mask=None):
    """Fused binary candidate top-k — the streaming-kernel mode of the
    packed scan. Same results as `binary_topk_xla`, at kernel speed:
    the DMA ring moves [db_tile, W] uint8 tiles (16x less HBM than the
    bf16 scan), each tile unpacks once into a ±1 bf16 VMEM scratch (8
    shifted plane stores — the planar pack layout exists for this),
    and the existing MXU matmul + fused k-select run unchanged.

    packed: [N, W] uint8 with W = lane_plane_width(d) (whole lane
    tiles — `pack_signs(v, plane_width=W)`). queries: [Q, d] full
    precision (cast to bf16; products against ±1 are exact). k <= 128.
    """
    import jax

    from .topk import _Q_RESIDENT, _topk_pallas_jit

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, w = packed.shape
    if w % 128 != 0 or 8 * w < d:
        raise ValueError(f"packed plane width {w} must be a 128-multiple "
                         f">= ceil(d/8) (d={d}); pack with "
                         f"pack_signs(v, plane_width=lane_plane_width(d))")
    if k > 128:
        raise ValueError("fused kernel supports k <= 128")
    q = queries.shape[0]
    if n_valid is None:
        n_valid = n
    qs = _pad_dim(jnp.asarray(queries, jnp.bfloat16), 1, 8 * w)
    kpad = _round_up(max(k, 8), 8)
    q_tile = min(q_tile, _round_up(q, 8))
    group, n_bufs = 2, 4
    d_full = 8 * w

    def _vmem_total(q_rows: int) -> int:
        q_p = _round_up(q_rows, q_tile)
        return (q_p * d_full * 2                  # resident bf16 queries
                + n_bufs * db_tile * w            # u8 ring
                + db_tile * d_full * 2            # unpack scratch
                + q_p * kpad * 16                 # state + outputs
                + q_tile * group * db_tile * 4    # column iota
                + q_p * group * db_tile * 4)      # group scores

    q_chunk = min(_Q_RESIDENT, _round_up(q, q_tile))
    while q_chunk > q_tile and _vmem_total(q_chunk) > 14 * 2 ** 20:
        q_chunk -= q_tile

    if row_mask is not None:
        row_mask = jnp.asarray(row_mask, jnp.int8)
        if row_mask.shape[0] < n:
            row_mask = _pad_dim(row_mask, 0, n)
        row_mask = row_mask[:n]
    outs = [
        _topk_pallas_jit(packed, qs[lo:lo + q_chunk], n_valid,
                         k=k, kpad=kpad, q_tile=q_tile, db_tile=db_tile,
                         interpret=interpret,
                         q_out=min(q_chunk, q - lo), n_bufs=n_bufs,
                         group=group, db_mask=row_mask)
        for lo in range(0, q, q_chunk)
    ]
    if len(outs) == 1:
        return outs[0]
    return (jnp.concatenate([s for s, _ in outs], axis=0),
            jnp.concatenate([i for _, i in outs], axis=0))


def binary_topk(packed: jnp.ndarray, queries: jnp.ndarray, k: int,
                d: int, **kw):
    """Dispatch: fused kernel when its contract holds (k <= 128,
    lane-aligned planes), chunked XLA otherwise."""
    if k <= 128 and packed.shape[1] % 128 == 0:
        return binary_topk_pallas(packed, queries, k, d, **kw)
    kw.pop("interpret", None)
    return binary_topk_xla(packed, queries, k, d, **kw)


def sharded_binary_topk(packed: jnp.ndarray, queries: jnp.ndarray, k: int,
                        d: int, mesh: Mesh, axis: str = "data",
                        n_valid=None, row_mask=None):
    """Binary candidate top-k over a row-sharded packed database:
    per-shard scan + one all_gather + lexsort merge, identical results
    to the single-device scan (deterministic (-score, global id) tie
    order) — the same two-level shape as `sharded_cosine_topk`."""
    n, _ = packed.shape
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (n, n_shards)
    local_n = n // n_shards
    if n_valid is None:
        n_valid = n
    if row_mask is not None:
        assert row_mask.shape == (n,), (row_mask.shape, n)

    def local_scan(db_shard, qs, mask_shard):
        shard_id = jax.lax.axis_index(axis)
        local_valid = jnp.clip(jnp.asarray(n_valid) - shard_id * local_n,
                               0, local_n)
        # fused kernel per shard when its contract holds (same
        # dispatch rule as the single-device path)
        if k <= 128 and packed.shape[1] % 128 == 0:
            s, i = binary_topk_pallas(db_shard, qs, k, d,
                                      n_valid=local_valid,
                                      row_mask=mask_shard)
        else:
            s, i = binary_topk_xla(db_shard, qs, k, d,
                                   n_valid=local_valid,
                                   row_mask=mask_shard)
        i = jnp.where(i >= 0, i + shard_id * local_n, i)
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        qn = qs.shape[0]
        all_s = jnp.transpose(all_s, (1, 0, 2)).reshape(qn, -1)
        all_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, -1)
        order = jnp.lexsort((all_i, -all_s), axis=1)[:, :k]
        return (jnp.take_along_axis(all_s, order, axis=1),
                jnp.take_along_axis(all_i, order, axis=1))

    if row_mask is None:
        fn = shard_map(lambda db_, qs_: local_scan(db_, qs_, None),
                       mesh=mesh, in_specs=(P(axis), P()),
                       out_specs=(P(), P()), check_vma=False)
        return fn(packed, queries)
    fn = shard_map(local_scan, mesh=mesh,
                   in_specs=(P(axis), P(), P(axis)),
                   out_specs=(P(), P()), check_vma=False)
    return fn(packed, queries, jnp.asarray(row_mask, jnp.bool_))
