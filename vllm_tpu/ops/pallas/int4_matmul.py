"""Pallas TPU kernel: fused int4-dequant matmul (w4a8).

No reference counterpart (the reference's quantization story is fp16
weights; INT4 is this framework's north-star extension): group-wise
int4 scales can't fold into a single XLA dot the way per-column int8
scales do (ops/quant.py), and unpacking nibbles through XLA would
materialize a full-width weight temp in HBM — exactly the bandwidth
the format exists to save.

Design (measured rules from the round-1/2 kernels):
- ONE query-row block: activations stay VMEM-resident for the whole
  matmul ([T, in] int8 — 12 MB at the largest 7B bucket), so weight
  bytes stream exactly once. The grid walks output tiles; Pallas
  double-buffers each [in/2, BO] packed strip automatically.
- The kernel loops over scale groups; each iteration slices 128 input
  rows (= one MXU contraction tile) from BOTH nibble planes, feeds the
  int8 codes straight into the MXU (int8 dots run at 2x bf16 rate and
  the int4->int8 shifts are the only VPU work — ~3 ops/byte, hidden
  under the weight DMA on decode rows and under the MXU on prefill
  rows), and folds the [out]-vector group scale into the f32
  accumulator with one multiply-add.
- Activations pre-quantize per-token OUTSIDE the kernel (one cheap XLA
  pass that fuses with the producing op); the [T, 1] token scales
  multiply the result outside too, so the kernel is a pure
  int8 x int4-codes -> f32 contraction.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_tpu.ops.quant import (Int4Linear, int4_matmul_xla,
                                quantize_activations_int8,
                                quantize_linear_int4)


def _interpret() -> bool:
    return bool(os.environ.get("VLLM_TPU_INTERPRET"))


# Set by probe_int4_kernel() when the kernel fails to compile on the
# real backend: flips every int4 matmul to the numerically-identical
# XLA formulation instead of failing the whole step-program compile.
_KERNEL_BROKEN = [False]


def _use_pallas() -> bool:
    if _KERNEL_BROKEN[0]:
        return False
    if os.environ.get("VLLM_TPU_FORCE_XLA_OPS"):
        return False
    if os.environ.get("VLLM_TPU_FORCE_PALLAS_OPS"):
        return True  # tests: interpret-mode kernels off-TPU
    # Opt-in on hardware (VLLM_TPU_INT4_PALLAS=1): inside the fused
    # step programs the XLA w4a8 formulation measured FASTER end to
    # end than this kernel (1902 vs 1446 tok/s, int4+int4 7B bench at
    # 128 seqs, 2026-08-20) even though the kernel benches at parity
    # standalone — the pallas_call is a fusion/overlap barrier where
    # XLA can schedule the per-group dots with neighboring ops. Keep
    # the kernel for shapes/configs where it wins and as the vehicle
    # for the packing identities (the XLA path shares its unpack).
    if os.environ.get("VLLM_TPU_INT4_PALLAS"):
        return jax.default_backend() == "tpu"
    return False


def probe_int4_kernel() -> bool:
    """Compile-and-run the kernel once on tiny shapes, standalone.

    The int4 kernel is the one Pallas op without hardware mileage; a
    Mosaic lowering failure inside the fused step program would abort
    startup. Probing in isolation costs one ~128x256x256 compile and
    turns a kernel regression into a logged XLA fallback (the decode
    perf win is lost, correctness is not). Returns True if the Pallas
    path is live."""
    if not _use_pallas():
        return False
    import numpy as np

    from vllm_tpu.logger import init_logger
    logger = init_logger(__name__)
    try:
        rng = np.random.default_rng(0)
        # in=512 -> TWO scale groups: single-group shapes cannot catch
        # group-indexing or de-bias bugs (everything collapses to
        # g=0), and the on-chip bf16-precision de-bias bug shipped
        # exactly because the probe ran ng=1.
        w = jnp.asarray(rng.standard_normal((512, 256)), jnp.float32)
        ql = quantize_linear_int4(w)
        # Both static variants: narrow rows (three-dot biased-byte,
        # decode) and wide rows (lo-nibble cancel, prefill) — an
        # unprobed variant would first compile inside a fused step
        # program, where a Mosaic rejection aborts engine startup.
        for t in (8, _WIDE_ROWS_MIN):
            x = jnp.asarray(rng.standard_normal((t, 512)), jnp.bfloat16)
            got = np.asarray(pallas_int4_matmul(x, ql), np.float32)
            want = np.asarray(int4_matmul_xla(x, ql), np.float32)
            np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
        return True
    except Exception as exc:  # Mosaic compile / numerics mismatch
        logger.warning(
            "int4 Pallas kernel failed its startup probe (%s: %s); "
            "falling back to the XLA int4 path for this process.",
            type(exc).__name__, exc)
        _KERNEL_BROKEN[0] = True
        return False


# Row count at/above which the kernel unpacks the high nibble on the
# VPU and runs TWO dots per group instead of the three-dot biased-byte
# identity. The tradeoff: the third dot costs T*G*BO extra MXU MACs,
# the unpack costs ~2*G*BO VPU ops — they cross near T ~ MXU/VPU
# throughput ratio (~100 on v5e). Below the threshold (decode rows)
# the kernel is weight-DMA-bound and the extra dot is free; above it
# (prefill rows) it is MXU-bound and the unpack hides under the dots.
# Env-overridable for on-chip sweeps (read at import time).
_WIDE_ROWS_MIN = int(os.environ.get("VLLM_TPU_INT4_WIDE_MIN", "256"))


def _int4_kernel(
    xq_ref,  # [T, in] int8 VMEM (whole array, resident)
    wp_ref,  # [in/2, BO] int8 VMEM (this output tile's packed strip)
    s_ref,  # [NG, 2, BO] f32 VMEM scales: [g, 0] = s_lo, [g, 1] = s_hi/16
    o_ref,  # [T, BO] out block
    *,
    group: int,
    num_groups: int,
    wide_rows: bool,
):
    T = xq_ref.shape[0]
    in2 = wp_ref.shape[0]

    def body(g, acc):
        off = g * group
        # Biased-low packing (ops/quant.py): the packed byte read as
        # signed int8 IS 16*hi + ulo with ulo = lo+8 in [1, 15]. So the
        # strip feeds the MXU raw, and the only per-byte VPU work is
        # ONE bitwise AND for ulo — the previous widen-to-int32 +
        # 3-shift sign-extension was ~6 vector ops per byte and made
        # the kernel VPU-bound (~4x off its DMA roofline at decode row
        # counts; tools/int4_matmul_microbench.py).
        praw = wp_ref[pl.ds(off, group), :]  # int8 [G, BO]
        ulo = jnp.bitwise_and(praw, 15)  # int8, = lo + 8
        # Slice the refs, not loaded values: Mosaic supports traced
        # tile-aligned starts on VMEM ref loads, but NOT dynamic
        # lane/sublane extraction from an already-loaded vector. Both
        # offsets are multiples of 128 lanes (group % 128 == 0 and
        # in2 % group == 0 gate the Pallas path).
        x_lo = xq_ref[:, pl.ds(off, group)]
        x_hi = xq_ref[:, pl.ds(in2 + off, group)]
        dot = functools.partial(jax.lax.dot_general,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # Scales arrive [NG, 2, BO] so the traced group index g lands
        # on the LEADING axis — the same dynamic-index shape the
        # validated decode kernel uses for page DMA. The +8*rowsum
        # bias from ulo is corrected OUTSIDE the kernel as one tiny
        # [T, NG] @ [NG, out] XLA dot (8 * rowsums @ s_lo).
        s_lo = s_ref[pl.ds(g, 1), 0, :]  # [1, BO] f32
        s_h = s_ref[pl.ds(g, 1), 1, :]  # [1, BO] f32
        a = dot(x_lo, ulo)  # = x_lo @ lo + 8*rowsum(x_lo)  [T, BO]
        if wide_rows:
            # MXU-bound regime: clear the low nibble on the VPU —
            # praw & 0xF0 == praw - ulo == 16*hi exactly (the top
            # nibble keeps its sign bit) — and run one dot for it:
            # 2 dots/group, same total MACs as the int8-w8a8 path's
            # single full-contraction dot. Bitwise AND is the one
            # elementwise op Mosaic legalizes on packed int8 vectors
            # here (subi and shifts both fail to lower).
            h16 = dot(x_hi, jnp.bitwise_and(praw, -16))  # = 16*(x_hi @ hi)
            return (acc + a.astype(jnp.float32) * s_lo +
                    h16.astype(jnp.float32) * s_h)
        # DMA-bound regime: no per-byte work on the hi side at all —
        # dot the raw bytes and subtract the low-nibble contribution
        # with a third dot.
        b = dot(x_hi, praw)  # = 16*(x_hi @ hi) + x_hi @ ulo
        c = dot(x_hi, ulo)
        return (acc + a.astype(jnp.float32) * s_lo +
                (b - c).astype(jnp.float32) * s_h)

    acc = jax.lax.fori_loop(0, num_groups,
                            body, jnp.zeros((T, o_ref.shape[1]),
                                            jnp.float32))
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_bo(t: int, in2: int, out: int, group: int) -> int:
    """Largest output tile that divides ``out``, keeps lane tiling
    (%128 == 0), and fits the kernel's VMEM working set: resident
    activations + double-buffered packed strips + output block, f32
    accumulator and one group's int32 partial (all [T, BO]) + the
    per-group unpack temps.

    Wide tiles beat strip double-buffering here: the old fixed ladder
    (512/256/128) gave the 7B MLP (out=11008, whose only %128 divisors
    are 128/256/5504/11008) BO=256 — 43 grid steps x 2*NG loop-carried
    [T,128]x[128,256] dots, measured +711 us vs the int8 path per
    decode matmul. BO=5504 runs the same matmul as 2 grid steps of
    wide dots and restores the kernel to its DMA budget. At prefill
    row counts the [T, BO] terms dominate and the pick shrinks
    itself back under the ceiling."""
    budget = 88 * 1024 * 1024  # headroom under the 100 MB Mosaic limit
    best = 128
    ng = in2 // group
    for bo in range(128, out + 1, 128):
        if out % bo:
            continue
        working = (t * 2 * in2            # resident int8 activations
                   + 2 * in2 * bo         # double-buffered packed strip
                   + 6 * t * bo * 4       # o_ref + f32 acc + int32 a/b/c/b-c
                   + group * bo * 4       # ulo (int8 + widening slack)
                   + 2 * ng * 2 * bo * 4)  # double-buffered f32 scale tile
        if working <= budget and bo > best:
            best = bo
    return best


@jax.jit
def pallas_int4_matmul(x: jnp.ndarray, ql: Int4Linear) -> jnp.ndarray:
    """x [T, in] @ int4-packed weight -> [T, out] in x.dtype."""
    in2, out = ql.w_packed.shape
    ng = ql.scale.shape[0]  # scale: [NG, 2, out], group axis leading
    group = in2 // ng
    if group % 128 != 0 or not _use_pallas():
        # Tiny models (tests) fall below the MXU tile; serve them with
        # the numerically-identical XLA formulation.
        return int4_matmul_xla(x, ql)
    xq, xs = quantize_activations_int8(x)
    wide = x.shape[0] >= _WIDE_ROWS_MIN
    # Kernel-side scales: plane 1 pre-divides by 16 — both variants'
    # hi partial is 16x the true hi-nibble dot.
    sk = ql.scale.astype(jnp.float32) * jnp.asarray(
        [1.0, 1.0 / 16.0], jnp.float32)[None, :, None]
    # The biased low nibble adds 8*rowsum(x_lo_g) per group to the
    # kernel's accumulator; subtract it with one tiny XLA dot.
    # Precision HIGHEST: TPU f32 dots default to a single bf16 pass,
    # and rs holds integers up to group*127 (~16k) that bf16 rounds by
    # up to ~64 — enough to corrupt the de-bias by whole code units
    # (caught on-chip: ~half the outputs off by up to one quant step;
    # CPU/interpret f32 is exact and never sees it).
    rs = jnp.sum(xq[:, :in2].reshape(x.shape[0], ng, group)
                 .astype(jnp.float32), axis=-1)  # [T, NG]
    bias = 8.0 * jax.lax.dot(rs, ql.scale[:, 0, :].astype(jnp.float32),
                             precision=jax.lax.Precision.HIGHEST)
    bo = _pick_bo(x.shape[0], in2, out, group)
    kernel = pl.pallas_call(
        functools.partial(_int4_kernel, group=group, num_groups=ng,
                          wide_rows=wide),
        grid=(out // bo,),
        in_specs=[
            pl.BlockSpec((x.shape[0], 2 * in2), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((in2, bo), lambda o: (0, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, 2, bo), lambda o: (0, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((x.shape[0], bo), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        # f32 out: the per-token activation scales multiply OUTSIDE the
        # kernel, and rounding the accumulator to bf16 before that
        # multiply would diverge from the XLA formulation the dispatch
        # falls back to (one rounding step, after the scale).
        out_shape=jax.ShapeDtypeStruct((x.shape[0], out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The resident activation block is 12 MB at the largest 7B
            # bucket (T=1152, in=11008); strips and scratch add ~4 MB.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )
    y = kernel(xq, ql.w_packed, sk)
    return ((y - bias) * xs).astype(x.dtype)
