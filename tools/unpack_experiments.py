"""Experiment harness: which nibble-unpack formulation reaches the DMA
roofline for the w4a8 int4 matmul kernel on v5e?

SUPERSEDED (round 5): the shipped kernel moved to biased-low packing
(quant.py stores lo+8, so the raw byte as signed int8 is 16*hi+lo+8)
with no unpack at all on the hi side — see ops/pallas/int4_matmul.py.
This harness predates that packing; its signed-code variants
(int32rt/i8shift) decode the CURRENT stored bytes incorrectly and its
timings stand only as the round-4 comparison they were. Also note two
Mosaic legalization facts learned on hardware: packed-int8 vectors
support bitwise AND but NOT shifts or subi.

Round-4 finding (README): the int4 kernel runs ~4x off its weight-DMA
budget. Hypothesis: the shipped unpack costs 6 VPU ops per packed byte
(astype int32, shift, astype int8 — twice), and the VPU processes
32-bit lanes, so at ~45M weight elements x 3 ops/element the VPU
(~4 Tops/s) needs ~70 us/matmul while the halved DMA needs only ~27 us.

Variants, by ops-per-packed-byte:
  int32rt — the shipped round-3/4 formulation (6 ops/byte), baseline
  i8shift — arithmetic shifts directly on int8 lanes (3 ops/byte)
  u4i8    — OFFSET-UNSIGNED codes (stored nibble = code + 8): unpack
            is 3 mask/shift ops per byte with NO sign extension; the
            +8 zero point folds into one tiny [T, 2NG] @ [2NG, out]
            XLA dot outside the kernel
  u4swar  — same unsigned codes, but bitcast 4 packed bytes into one
            32-bit lane and mask at 32-bit width: 3 ops per 4 BYTES
            (0.375 ops/element) — the projected roofline formulation
  int4dot — jnp.int4 operands fed straight at the MXU (Mosaic-native
            int4 support probe)

Run: python tools/unpack_experiments.py [--variants a,b] [--cpu]
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("VLLM_TPU_AOT_CACHE", "/tmp/vllm_tpu_aot_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/vllm_tpu_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if "--cpu" in sys.argv:
    # The container's sitecustomize pins JAX_PLATFORMS=axon; the config
    # route below is the only way to actually get the CPU backend.
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vllm_tpu.ops.quant import (int4_matmul_xla,
                                quantize_activations_int8,
                                quantize_linear_int4, unpack_int4)

GROUP = 128


# ---------- signed-code unpack variants (existing packing) ----------

def _unpack_int32rt(p):
    """Round-3/4 shipped formulation: int32 round trip, 6 ops/byte."""
    p32 = p.astype(jnp.int32)
    hi = jnp.right_shift(p32, 4).astype(jnp.int8)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.int8)
    return lo, hi


def _unpack_i8shift(p):
    """Arithmetic shifts directly on int8 lanes: 3 ops/byte."""
    hi = jnp.right_shift(p, 4)
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    return lo, hi


# ---------- unsigned-code unpack variants (offset packing) ----------

def _unpack_u4i8(p):
    """Unsigned nibbles at int8 width: 3 ops/byte, no sign handling.
    (int8 >> is arithmetic; the & 0x0F mask discards the smeared sign
    bits, leaving the unsigned high nibble.)"""
    lo = jnp.bitwise_and(p, jnp.int8(0x0F))
    hi = jnp.bitwise_and(jnp.right_shift(p, 4), jnp.int8(0x0F))
    return lo, hi


def _unpack_u4swar(p):
    """Unsigned nibbles via 32-bit SWAR: bitcast packs 4 bytes per
    lane, one shift + two masks process them together (3 ops per 4
    bytes). Byte-position-preserving: the masks are uniform per byte
    and the >>4 cross-byte leakage is masked off, so the int8 round
    trip restores positions regardless of Mosaic's byte order."""
    w = pltpu.bitcast(p, jnp.int32)  # [G/4, BO]
    lo = pltpu.bitcast(jnp.bitwise_and(w, 0x0F0F0F0F), jnp.int8)
    hi = pltpu.bitcast(
        jnp.bitwise_and(jnp.right_shift(w, 4), 0x0F0F0F0F), jnp.int8)
    return lo, hi


UNPACKS = {
    "int32rt": (_unpack_int32rt, False),
    "i8shift": (_unpack_i8shift, False),
    "u4i8": (_unpack_u4i8, True),
    "u4swar": (_unpack_u4swar, True),
}


def make_kernel(unpack):
    def kern(xq_ref, wp_ref, s_ref, o_ref, *, group, num_groups):
        T = xq_ref.shape[0]
        in2 = wp_ref.shape[0]

        def body(g, acc):
            off = g * group
            p = wp_ref[pl.ds(off, group), :]
            lo, hi = unpack(p)
            for h, nib in ((0, lo), (1, hi)):
                xs = xq_ref[:, pl.ds(h * in2 + off, group)]
                z = jax.lax.dot_general(
                    xs, nib, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                sv = s_ref[pl.ds(g, 1), h, :]
                acc = acc + z.astype(jnp.float32) * sv
            return acc

        acc = jax.lax.fori_loop(0, num_groups, body,
                                jnp.zeros((T, o_ref.shape[1]),
                                          jnp.float32))
        o_ref[...] = acc.astype(o_ref.dtype)

    return kern


def make_int4dot_kernel():
    """Weights arrive as [2, in/2, out] jnp.int4 planes (XLA packs
    2/byte -> same HBM bytes). One astype to int8, then dot."""
    def kern(xq_ref, w4_ref, s_ref, o_ref, *, group, num_groups):
        T = xq_ref.shape[0]
        in2 = w4_ref.shape[1]

        def body(g, acc):
            off = g * group
            for h in (0, 1):
                nib = w4_ref[h, pl.ds(off, group), :].astype(jnp.int8)
                xs = xq_ref[:, pl.ds(h * in2 + off, group)]
                z = jax.lax.dot_general(
                    xs, nib, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                sv = s_ref[pl.ds(g, 1), h, :]
                acc = acc + z.astype(jnp.float32) * sv
            return acc

        acc = jax.lax.fori_loop(0, num_groups, body,
                                jnp.zeros((T, o_ref.shape[1]),
                                          jnp.float32))
        o_ref[...] = acc.astype(o_ref.dtype)

    return kern


def _pick_bo(t, in2, out, group):
    budget = 88 * 1024 * 1024
    best = 128
    for bo in range(128, out + 1, 128):
        if out % bo:
            continue
        working = (t * 2 * in2 + 2 * in2 * bo + 3 * t * bo * 4 +
                   group * bo * 12 + 8 * (in2 // group) * bo)
        if working <= budget and bo > best:
            best = bo
    return best


def to_offset_packed(ql):
    """Repack signed codes c in [-7,7] as unsigned u = c + 8."""
    lo, hi = unpack_int4(ql.w_packed)
    lo = (lo.astype(jnp.int32) + 8)
    hi = (hi.astype(jnp.int32) + 8)
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed


def int4_planes(ql):
    """[in/2, out] packed int8 -> [2, in/2, out] jnp.int4 planes."""
    lo, hi = unpack_int4(ql.w_packed)
    return jnp.stack([lo, hi]).astype(jnp.int4)


def build_matmul(variant, T, in_dim, out, interpret):
    in2 = in_dim // 2
    ng = in2 // GROUP
    bo = _pick_bo(T, in2, out, GROUP)

    if variant == "int4dot":
        body = functools.partial(make_int4dot_kernel(), group=GROUP,
                                 num_groups=ng)
        w_spec = pl.BlockSpec((2, in2, bo), lambda o: (0, 0, o),
                              memory_space=pltpu.VMEM)
        offset = False
    else:
        unpack, offset = UNPACKS[variant]
        body = functools.partial(make_kernel(unpack), group=GROUP,
                                 num_groups=ng)
        w_spec = pl.BlockSpec((in2, bo), lambda o: (0, o),
                              memory_space=pltpu.VMEM)

    kernel = pl.pallas_call(
        body,
        grid=(out // bo,),
        in_specs=[
            pl.BlockSpec((T, 2 * in2), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            w_spec,
            pl.BlockSpec((ng, 2, bo), lambda o: (0, 0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, bo), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    def mm(x, packed_and_scale):
        wp, scale = packed_and_scale
        xq, xs = quantize_activations_int8(x)
        s32 = scale.astype(jnp.float32)
        y = kernel(xq, wp, s32)
        if offset:
            # Zero-point correction: stored u = c + 8, so
            # z_u = z_c + 8 * sum(xq over the group); subtract
            # 8 * (group-sums @ scales) — one tiny XLA dot fused into
            # the epilogue.
            xsum = xq.astype(jnp.float32).reshape(T, 2, ng, GROUP).sum(-1)
            xsum = jnp.swapaxes(xsum, 1, 2).reshape(T, 2 * ng)
            y = y - 8.0 * (xsum @ s32.reshape(2 * ng, out))
        return (y * xs).astype(x.dtype)

    return mm


S = 8
R = 64


def bench(mm, x, wstack):
    @jax.jit
    def run(x, stack):
        def body(i, acc):
            w = jax.tree_util.tree_map(
                lambda s: jax.lax.dynamic_index_in_dim(
                    s, i % S, axis=0, keepdims=False), stack)
            y = mm(x, w)
            return acc + jnp.max(y.astype(jnp.float32))

        return jax.lax.fori_loop(0, R, body, jnp.zeros((), jnp.float32))

    np.asarray(run(x, wstack))
    t0 = time.perf_counter()
    np.asarray(run(x, wstack))
    return (time.perf_counter() - t0) / R


def prep_arg(variant, ql):
    if variant == "int4dot":
        return (int4_planes(ql), ql.scale)
    if UNPACKS.get(variant, (None, False))[1]:
        return (to_offset_packed(ql), ql.scale)
    return (ql.w_packed, ql.scale)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", type=str,
                    default="int32rt,i8shift,u4i8,u4swar,int4dot")
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode correctness only")
    ap.add_argument("--shapes", type=str,
                    default="64x4096x11008,64x11008x4096,"
                    "1024x4096x11008")
    args = ap.parse_args()
    interpret = args.cpu or jax.default_backend() != "tpu"
    variants = args.variants.split(",")
    shapes = [tuple(int(v) for v in s.split("x"))
              for s in args.shapes.split(",")]

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()} interpret={interpret}")
    for (T, IN, OUT) in shapes:
        w1 = jnp.asarray(rng.standard_normal((IN, OUT)) * 0.02,
                         jnp.float32)
        ql1 = quantize_linear_int4(w1)
        x = jnp.asarray(rng.standard_normal((T, IN)), jnp.bfloat16)
        want = np.asarray(int4_matmul_xla(x, ql1), np.float32)

        print(f"-- {T}x{IN}x{OUT} (DMA floor "
              f"{IN*OUT/2/820e9*1e6:.0f}us @820GB/s)", flush=True)
        for v in variants:
            try:
                mm = build_matmul(v, T, IN, OUT, interpret)
                got = np.asarray(mm(x, prep_arg(v, ql1)), np.float32)
                np.testing.assert_allclose(got, want, rtol=0.05,
                                           atol=0.05)
            except Exception as e:
                print(f"   {v:>8}: FAIL {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                continue
            if interpret:
                print(f"   {v:>8}: ok", flush=True)
                continue
            ws = jnp.asarray(
                rng.standard_normal((S, IN, OUT)) * 0.02, jnp.float32)
            qs = quantize_linear_int4(ws)
            del ws
            if v == "int4dot":
                arg = (jax.vmap(int4_planes)(qs), qs.scale)
            elif UNPACKS.get(v, (None, False))[1]:
                arg = (jax.vmap(to_offset_packed)(qs), qs.scale)
            else:
                arg = (qs.w_packed, qs.scale)
            t = bench(mm, x, arg)
            by = IN * OUT / 2
            print(f"   {v:>8}: {t*1e6:6.0f}us  {by/t/1e9:5.0f} GB/s eff",
                  flush=True)


if __name__ == "__main__":
    main()
