"""Ablate per-round costs of the w-SELL kernel on real TPU.

K0: stream val/lcol tiles, one big sum -> out[0:8] (stream ceiling, no round loop)
K1: round loop (fori over 32) with fixed slab write (loop overhead)
K2: K1 + scalar prefetch loads (wrow/obase reads)
K3: K2 + dynamic out RMW by obase (scatter cost)
K4: K3 + x2d slice + broadcast + gather (gather cost)
K5: K4 + per-round MXU dot HIGHEST (full v3 kernel)
K6: K4 + ONE per-tile dot via scratch accumulation (amortized dot variant)
"""
import sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/sblas_jax_cache")
sys.path.insert(0, "/root/repo")
from sblas.utils.timing import measure_seconds_per_iter, stream_bandwidth

P = lambda *a: print(*a, flush=True)

TH = 256
NS = TH // 8
T = 600
SUB = 16
LPS = 128 // SUB
YR = 4096
XR = 512

rng = np.random.default_rng(0)
val = jnp.asarray(rng.standard_normal((T * TH, 128)).astype(np.float32))
lcol = jnp.asarray(rng.integers(0, 128, (T * TH, 128), dtype=np.int32))
wrow = jnp.asarray(rng.integers(0, XR - 2, T * NS, dtype=np.int32))
obase = jnp.asarray(rng.integers(0, YR // 8 - 1, T * NS, dtype=np.int32))
x2d = jnp.asarray(rng.standard_normal((XR, 128)).astype(np.float32))

sbw = stream_bandwidth()
P(f"STREAM {sbw:.1f} GB/s; tile stream per iter = {T*TH*128*8/1e6:.0f} MB")


def make(kernel_body, name):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, 128), lambda t, wr, ob: (t, 0)),
            pl.BlockSpec((TH, 128), lambda t, wr, ob: (t, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TH, 128), jnp.float32)],
    )
    call = pl.pallas_call(
        kernel_body, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((YR, SUB), jnp.float32),
    )

    def step(carry, wrow, obase, x2d, val, lcol):
        y = call(wrow, obase, x2d + carry * 1e-30, val, lcol)
        return jnp.float32(1e-30) * y[0, 0]

    try:
        per = measure_seconds_per_iter(step, jnp.float32(0.0), wrow, obase,
                                       x2d, val, lcol, iters_lo=4, iters_hi=16,
                                       repeats=2)
        by = T * TH * 128 * 8
        P(f"{name}: {per*1e3:7.3f} ms  {by/per/1e9:6.1f} GB/s "
          f"({100*by/per/1e9/sbw:5.1f}%)  {per/T*1e9:6.0f} ns/tile")
    except Exception as e:
        P(f"{name}: FAIL {str(e)[:200]}")


def seg_mat():
    return (jax.lax.broadcasted_iota(jnp.int32, (128, SUB), 0) // LPS
            == jax.lax.broadcasted_iota(jnp.int32, (128, SUB), 1)
            ).astype(jnp.float32)


def k0(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    s = jnp.sum(v_ref[:] * c_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    o_ref[0:8, :] = o_ref[0:8, :] + s[0:8, 0:1]


def k1(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(i, carry):
        v = v_ref[pl.ds(i * 8, 8), :]
        c = c_ref[pl.ds(i * 8, 8), :]
        s = jnp.sum(v * c.astype(jnp.float32), axis=1, keepdims=True)
        o_ref[0:8, :] = o_ref[0:8, :] + s[:, 0:1]
        return carry

    jax.lax.fori_loop(0, NS, body, 0)


def k2(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(i, carry):
        w = wr[t * NS + i]
        b = ob[t * NS + i]
        v = v_ref[pl.ds(i * 8, 8), :]
        c = c_ref[pl.ds(i * 8, 8), :]
        s = jnp.sum(v * c.astype(jnp.float32), axis=1, keepdims=True)
        o_ref[0:8, :] = o_ref[0:8, :] + s[:, 0:1] * (w + b).astype(jnp.float32)
        return carry

    jax.lax.fori_loop(0, NS, body, 0)


def k3(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(i, carry):
        b = ob[t * NS + i]
        v = v_ref[pl.ds(i * 8, 8), :]
        c = c_ref[pl.ds(i * 8, 8), :]
        s = jnp.sum(v * c.astype(jnp.float32), axis=1, keepdims=True)
        slab = b * 8
        cur = o_ref[pl.ds(slab, 8), :]
        o_ref[pl.ds(slab, 8), :] = cur + s[:, 0:1]
        return carry

    jax.lax.fori_loop(0, NS, body, 0)


def k4(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(i, carry):
        w = wr[t * NS + i]
        b = ob[t * NS + i]
        v = v_ref[pl.ds(i * 8, 8), :]
        c = c_ref[pl.ds(i * 8, 8), :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (8, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        s = jnp.sum(v * g, axis=1, keepdims=True)
        slab = b * 8
        cur = o_ref[pl.ds(slab, 8), :]
        o_ref[pl.ds(slab, 8), :] = cur + s[:, 0:1]
        return carry

    jax.lax.fori_loop(0, NS, body, 0)


def k5(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)
    seg = seg_mat()

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(i, carry):
        w = wr[t * NS + i]
        b = ob[t * NS + i]
        v = v_ref[pl.ds(i * 8, 8), :]
        c = c_ref[pl.ds(i * 8, 8), :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (8, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        part = jnp.dot(v * g, seg, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        slab = b * 8
        cur = o_ref[pl.ds(slab, 8), :]
        o_ref[pl.ds(slab, 8), :] = cur + part
        return carry

    jax.lax.fori_loop(0, NS, body, 0)


def k6(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)
    seg = seg_mat()

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    def body(i, carry):
        w = wr[t * NS + i]
        v = v_ref[pl.ds(i * 8, 8), :]
        c = c_ref[pl.ds(i * 8, 8), :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (8, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        scr[pl.ds(i * 8, 8), :] = v * g
        return carry

    jax.lax.fori_loop(0, NS, body, 0)
    part = jnp.dot(scr[:], seg, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)   # (TH, SUB)

    def body2(i, carry):
        b = ob[t * NS + i]
        slab = b * 8
        cur = o_ref[pl.ds(slab, 8), :]
        o_ref[pl.ds(slab, 8), :] = cur + part[pl.ds(i * 8, 8), :]
        return carry

    jax.lax.fori_loop(0, NS, body2, 0)


make(k0, "K0 stream+bigsum      ")
make(k1, "K1 +round loop        ")
make(k2, "K2 +scalar loads      ")
make(k3, "K3 +dyn out RMW       ")
make(k4, "K4 +slice+gather      ")
make(k5, "K5 full v3 (+dot)     ")
make(k6, "K6 scratch + tile dot ")


def k7(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)
    seg = seg_mat()

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for i in range(NS):  # static unroll
        w = wr[t * NS + i]
        b = ob[t * NS + i]
        v = v_ref[i * 8:(i + 1) * 8, :]
        c = c_ref[i * 8:(i + 1) * 8, :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (8, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        part = jnp.dot(v * g, seg, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        slab = b * 8
        cur = o_ref[pl.ds(slab, 8), :]
        o_ref[pl.ds(slab, 8), :] = cur + part


def k8(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for i in range(NS):  # static unroll, no dot (SUB=1-style reduce)
        w = wr[t * NS + i]
        b = ob[t * NS + i]
        v = v_ref[i * 8:(i + 1) * 8, :]
        c = c_ref[i * 8:(i + 1) * 8, :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (8, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        s = jnp.sum(v * g, axis=1, keepdims=True)
        slab = b * 8
        cur = o_ref[pl.ds(slab, 8), :]
        o_ref[pl.ds(slab, 8), :] = cur + s[:, 0:1]


make(k7, "K7 unrolled full      ")
make(k8, "K8 unrolled no-dot    ")


def k9(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    # quad-rounds: 4 consecutive (8,128) rounds share (window, block)
    t = pl.program_id(0)
    seg = seg_mat()
    NQ = NS // 4

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for q in range(NQ):  # static unroll
        w = wr[t * NS + q * 4]
        b = ob[t * NS + q * 4]
        v = v_ref[q * 32:(q + 1) * 32, :]
        c = c_ref[q * 32:(q + 1) * 32, :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (32, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        prod = v * g                                   # (32,128)
        folded = (prod[0:8] + prod[8:16] + prod[16:24] + prod[24:32])
        part = jnp.dot(folded, seg, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        slab = b * 8
        cur = o_ref[pl.ds(slab, 8), :]
        o_ref[pl.ds(slab, 8), :] = cur + part


def k10(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    # oct-rounds: 8 rounds share (window, block) -> (64,128) unit
    t = pl.program_id(0)
    seg = seg_mat()
    NQ = NS // 8

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for q in range(NQ):
        w = wr[t * NS + q * 8]
        b = ob[t * NS + q * 8]
        v = v_ref[q * 64:(q + 1) * 64, :]
        c = c_ref[q * 64:(q + 1) * 64, :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (64, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        prod = v * g
        folded = (prod[0:8] + prod[8:16] + prod[16:24] + prod[24:32]
                  + prod[32:40] + prod[40:48] + prod[48:56] + prod[56:64])
        part = jnp.dot(folded, seg, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        slab = b * 8
        cur = o_ref[pl.ds(slab, 8), :]
        o_ref[pl.ds(slab, 8), :] = cur + part


def k11(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    # full-tile single window (upper bound: 1 slice/gather per tile)
    t = pl.program_id(0)
    seg = seg_mat()

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = wr[t * NS]
    b = ob[t * NS]
    xw = x_ref[pl.ds(w, 1), :]
    tab = jnp.broadcast_to(xw, (TH, 128))
    g = jnp.take_along_axis(tab, c_ref[:], axis=1)
    prod = v_ref[:] * g
    folded = prod[0:8]
    for i in range(1, NS):
        folded = folded + prod[i * 8:(i + 1) * 8]
    part = jnp.dot(folded, seg, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    slab = b * 8
    cur = o_ref[pl.ds(slab, 8), :]
    o_ref[pl.ds(slab, 8), :] = cur + part


make(k9, "K9 quad-rounds        ")
make(k10, "K10 oct-rounds        ")
make(k11, "K11 tile-wide window  ")


def k12(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    # quad shares window only; 4 individual dots+scatters
    t = pl.program_id(0)
    seg = seg_mat()
    NQ = NS // 4

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for q in range(NQ):
        w = wr[t * NS + q * 4]
        v = v_ref[q * 32:(q + 1) * 32, :]
        c = c_ref[q * 32:(q + 1) * 32, :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (32, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        prod = v * g
        for j in range(4):
            b = ob[t * NS + q * 4 + j]
            part = jnp.dot(prod[j * 8:(j + 1) * 8], seg,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            slab = b * 8
            cur = o_ref[pl.ds(slab, 8), :]
            o_ref[pl.ds(slab, 8), :] = cur + part


def k13(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    # oct shares window only; 8 individual dots+scatters
    t = pl.program_id(0)
    seg = seg_mat()
    NQ = NS // 8

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for q in range(NQ):
        w = wr[t * NS + q * 8]
        v = v_ref[q * 64:(q + 1) * 64, :]
        c = c_ref[q * 64:(q + 1) * 64, :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (64, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        prod = v * g
        for j in range(8):
            b = ob[t * NS + q * 8 + j]
            part = jnp.dot(prod[j * 8:(j + 1) * 8], seg,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            slab = b * 8
            cur = o_ref[pl.ds(slab, 8), :]
            o_ref[pl.ds(slab, 8), :] = cur + part


def k14(wr, ob, x_ref, v_ref, c_ref, o_ref, scr):
    # k13 + single big dot on (64,128) then static part slices
    t = pl.program_id(0)
    seg = seg_mat()
    NQ = NS // 8

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for q in range(NQ):
        w = wr[t * NS + q * 8]
        v = v_ref[q * 64:(q + 1) * 64, :]
        c = c_ref[q * 64:(q + 1) * 64, :]
        xw = x_ref[pl.ds(w, 1), :]
        tab = jnp.broadcast_to(xw, (64, 128))
        g = jnp.take_along_axis(tab, c, axis=1)
        part64 = jnp.dot(v * g, seg, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # (64, SUB)
        for j in range(8):
            b = ob[t * NS + q * 8 + j]
            slab = b * 8
            cur = o_ref[pl.ds(slab, 8), :]
            o_ref[pl.ds(slab, 8), :] = cur + part64[j * 8:(j + 1) * 8]


make(k12, "K12 quad win-only     ")
make(k13, "K13 oct win-only      ")
make(k14, "K14 oct big-dot       ")
