"""Double-single (two-f32-plane) f64-class Pallas SpMV over w-SELL.

Mosaic has no f64, and XLA's emulated-f64 gather path measured 0.93 GB/s on
cant (suite_r5 cant-f64 record) — a 600x slowdown against the f32 kernel.
This kernel recovers f64-CLASS accuracy (~deg * 2^-48 relative, measured
~1e-14 on the suite) at roughly 2x the f32 byte cost by carrying every
value as an UNEVALUATED SUM of two f32: val = vh + vl, x = xh + xl
(classic double-single / Dekker arithmetic; the TPU-native analogue of the
reference's native-f64 CUDA kernels, SURVEY.md C5 fp64 row).

Structure mirrors spmv_pallas (same w-SELL rounds/packer/blocked-y mode);
the differences, all forced by precision:

  * TWO value planes and TWO x tables (hi/lo) stream/stage instead of one.
  * products use Dekker two_prod (Veltkamp 4097-splits — no exposed FMA;
    if Mosaic contracts a*b-p into an FMA the error term only gets MORE
    exact) plus the vh*xl + vl*xh cross terms; vl*xl (~2^-96) is dropped.
  * the segment reduce CANNOT ride the MXU: a 0/1 segment dot accumulates
    in f32 and re-rounds every partial (and even bf16x3-split f32 dots
    round across >=40-bit spans), which would cap accuracy near 1e-7. The
    reduce is instead a lane butterfly: log2(lanes_per_seg) pltpu.roll
    stages (e10b pattern), each a two_sum that carries the rounding error
    into the lo plane. After the tree, each segment's START lane holds the
    exact two-plane sum; y is kept (y_rows, 128)-wide (the VMEM buffer
    lane-pads to 128 anyway, e10b roll_wide) and the readout strides ::lps.
  * hi/lo y accumulation across rounds is another two_sum per slab.

The split/merge between f64 and the two f32 planes happens on the HOST in
numpy: under JAX's default x64-disabled config an f64 jnp array silently
downcasts to f32 (caught round 5 — the suite's f64 "validation" at 1e-7),
and enabling x64 globally poisons index dtypes for every other kernel. The
jitted core is pure f32.

Error model: two_prod is exact; each two_sum chain keeps the running error
below 2^-48 per term, so rel err ~ max_row_deg * 2^-48 + n * 2^-96 — for
deg<=1000 that is <4e-12 worst case, measured 1e-14 on FEM matrices.
Veltkamp splitting overflows for |v| > ~4e34 (4097*v exceeds f32 range);
values that large are out of scope (document, don't mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...formats import CSR
from ...retile_wsell import pack_wsell, pick_sub, SUBLANES, LANES

# two of everything vs the f32 kernel -> halve the staging limits
_VMEM_X_LIMIT = 12 * (1 << 20)
_VMEM_Y_LIMIT = 4 * (1 << 20)
_YBLOCKS = 256                    # 2048 y2d rows * 128 lanes * 4 B * 2 planes


def _two_sum(a, b):
    s = a + b
    t = s - a
    return s, (a - (s - t)) + (b - t)


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _two_prod(a, b):
    p = a * b
    c = a * jnp.float32(4097.0)
    ah = c - (c - a)
    al = a - ah
    d = b * jnp.float32(4097.0)
    bh = d - (d - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _kernel_ds(th, sub, nwin, wgroup):
    lps = LANES // sub            # lanes per row segment
    ns = th // SUBLANES
    ngrp = ns // wgroup
    grows = wgroup * SUBLANES     # rows per window group

    def kern(wrow_ref, obase_ref, xh_ref, xl_ref, vh_ref, vl_ref, col_ref,
             outh_ref, outl_ref):
        t = pl.program_id(0)

        def rmeta(ref, i):
            return ref[t * ns + i]

        @pl.when(t == 0)
        def _():
            outh_ref[:] = jnp.zeros_like(outh_ref)
            outl_ref[:] = jnp.zeros_like(outl_ref)

        for q in range(ngrp):
            w = rmeta(wrow_ref, q * wgroup)
            vh = vh_ref[q * grows:(q + 1) * grows, :]
            vl = vl_ref[q * grows:(q + 1) * grows, :]
            c = col_ref[q * grows:(q + 1) * grows, :].astype(jnp.int32)

            def gather(ref):
                xw = ref[pl.ds(w, 1), :]
                tab = jnp.broadcast_to(xw, (grows, 128))
                if nwin == 1:
                    return jnp.take_along_axis(tab, c, axis=1)
                xw1 = ref[pl.ds(w + 1, 1), :]
                tab1 = jnp.broadcast_to(xw1, (grows, 128))
                g0 = jnp.take_along_axis(tab, jnp.minimum(c, 127), axis=1)
                g1 = jnp.take_along_axis(tab1, jnp.maximum(c - 128, 0),
                                         axis=1)
                return jnp.where(c < 128, g0, g1)

            gxh = gather(xh_ref)
            gxl = gather(xl_ref)
            ph, pe = _two_prod(vh, gxh)
            plo = pe + vh * gxl + vl * gxh
            # lane-butterfly segment sum: after stages 1,2,..,lps/2 lane l
            # holds sum(p[l:l+lps]) (cyclic; segment-start lanes never
            # wrap), with every add's rounding carried in plo
            s = 1
            while s < lps:
                rh = pltpu.roll(ph, 128 - s, 1)   # roll(x,128-s)[l]=x[l+s]
                rl = pltpu.roll(plo, 128 - s, 1)
                sh, e = _two_sum(ph, rh)
                plo = plo + rl + e
                ph, plo = _quick_two_sum(sh, plo)
                s *= 2
            for j in range(wgroup):
                b = rmeta(obase_ref, q * wgroup + j)
                slab = b * SUBLANES
                ah = ph[j * SUBLANES:(j + 1) * SUBLANES]
                al = plo[j * SUBLANES:(j + 1) * SUBLANES]
                ch = outh_ref[pl.ds(slab, SUBLANES), :]
                cl = outl_ref[pl.ds(slab, SUBLANES), :]
                sh, e = _two_sum(ch, ah)
                sh, sl = _quick_two_sum(sh, cl + al + e)
                outh_ref[pl.ds(slab, SUBLANES), :] = sh
                outl_ref[pl.ds(slab, SUBLANES), :] = sl

    return kern


class PallasSpmvDS:
    """Double-single f64-class w-SELL SpMV executor (single chip).

    Takes/returns numpy float64 at the boundary; device work is all f32.
    """

    def __init__(self, a: CSR, *, th: int = 0, sub: int = 0,
                 nwin: int = 2, wgroup: int = 4, min_fill: float = 0.2):
        if a.dtype != np.float64:
            raise ValueError("pallas_ds is the f64 path; use method="
                             "'pallas' for f32")
        m, n = a.shape
        x_bytes = (-(-n // 128) + 1) * 128 * 4
        if x_bytes > _VMEM_X_LIMIT:
            raise ValueError(
                f"x tables ({2 * x_bytes >> 20} MB) exceed the ds VMEM "
                "staging limit; use the XLA f64 path or the partitioner")
        sub_eff = sub if sub > 0 else pick_sub(a)
        y_rows_est = (-(-max(m, 1) // (SUBLANES * sub_eff))) * SUBLANES
        yblocks = _YBLOCKS if y_rows_est * LANES * 4 > _VMEM_Y_LIMIT else 0
        w = pack_wsell(a, th=th, sub=sub_eff, nwin=nwin, wgroup=wgroup,
                       yblocks=yblocks)
        if w.fill < min_fill:
            raise ValueError(
                f"w-SELL fill {w.fill:.2f} below {min_fill} (scattered "
                "columns); use the XLA f64 path")
        self.layout = w
        self.shape = a.shape
        self.dtype = a.dtype
        self.nnz = a.nnz
        # traffic: two val planes + lcol per padded slot, two-plane x and y
        self.bytes_per_iter = (
            w.val.size * (8 + w.lcol.itemsize) + n * 8 + m * 8)
        self.lcol_itemsize = w.lcol.itemsize
        self.blocked = w.tile_yblk is not None

        vh = w.val.astype(np.float32)
        vl = (w.val - vh.astype(np.float64)).astype(np.float32)
        if self.blocked:
            ns = w.th // SUBLANES
            tile_of = np.asarray(w.tile_yblk)
            bounds = np.searchsorted(tile_of, np.arange(w.num_yblks + 1))
            self._blk_tiles = tuple(int(bounds[g + 1] - bounds[g])
                                    for g in range(w.num_yblks))
            self._vh = tuple(jnp.asarray(vh[b * w.th: e * w.th])
                             for b, e in zip(bounds[:-1], bounds[1:]))
            self._vl = tuple(jnp.asarray(vl[b * w.th: e * w.th])
                             for b, e in zip(bounds[:-1], bounds[1:]))
            self._lcol = tuple(jnp.asarray(w.lcol[b * w.th: e * w.th])
                               for b, e in zip(bounds[:-1], bounds[1:]))
            self._wr = tuple(jnp.asarray(w.round_wrow[b * ns: e * ns])
                             for b, e in zip(bounds[:-1], bounds[1:]))
            self._ob = tuple(jnp.asarray(w.round_obase[b * ns: e * ns])
                             for b, e in zip(bounds[:-1], bounds[1:]))
            self._calls = tuple(self._build_one(T) for T in self._blk_tiles)
        else:
            self._vh = jnp.asarray(vh)
            self._vl = jnp.asarray(vl)
            self._lcol = jnp.asarray(w.lcol)
            self._wr = jnp.asarray(w.round_wrow)
            self._ob = jnp.asarray(w.round_obase)
            self._call = self._build_one(w.num_tiles)

    def _build_one(self, T):
        w = self.layout
        from ...utils.backend import on_cpu

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(T,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # xh table, whole
                pl.BlockSpec(memory_space=pltpu.VMEM),  # xl table, whole
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
                pl.BlockSpec((w.th, LANES), lambda t, wr, ob: (t, 0)),
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
        )
        out_rows = w.yb_rows if self.blocked else w.y_rows
        sds = jax.ShapeDtypeStruct((out_rows, LANES), jnp.float32)
        return pl.pallas_call(
            _kernel_ds(w.th, w.sub, w.nwin, w.wgroup),
            grid_spec=grid_spec,
            out_shape=(sds, sds),
            interpret=on_cpu(),
            cost_estimate=pl.CostEstimate(
                flops=int(40 * T * w.th * LANES),
                bytes_accessed=int(T * w.th * LANES
                                   * (8 + self.lcol_itemsize)
                                   + 2 * out_rows * LANES * 4),
                transcendentals=0,
            ),
        )

    def device_arrays(self):
        return {"wr": self._wr, "ob": self._ob,
                "vh": self._vh, "vl": self._vl, "lcol": self._lcol}

    def split_x(self, x):
        """Host-side f64 -> (xh, xl) f32 planes (numpy; see module doc)."""
        x = np.asarray(x, dtype=np.float64)
        xh = x.astype(np.float32)
        xl = (x - xh.astype(np.float64)).astype(np.float32)
        return xh, xl

    def apply_pure(self, arrs, xh, xl):
        """Jittable core: f32 planes in -> (y_hi, y_lo) f32 planes out."""
        m, n = self.shape
        w = self.layout
        pad = w.x2d_rows * 128 - n
        xh2 = jnp.pad(xh, (0, pad)).reshape(-1, 128)
        xl2 = jnp.pad(xl, (0, pad)).reshape(-1, 128)
        lps = LANES // w.sub
        if self.blocked:
            hs, ls = [], []
            for call, wr, ob, vh, vl, lc in zip(
                    self._calls, arrs["wr"], arrs["ob"], arrs["vh"],
                    arrs["vl"], arrs["lcol"]):
                yh, yl = call(wr, ob, xh2, xl2, vh, vl, lc)
                hs.append(yh[:, ::lps])
                ls.append(yl[:, ::lps])
            yh = jnp.concatenate(hs, axis=0)
            yl = jnp.concatenate(ls, axis=0)
        else:
            yh, yl = self._call(arrs["wr"], arrs["ob"], xh2, xl2,
                                arrs["vh"], arrs["vl"], arrs["lcol"])
            yh = yh[:, ::lps]
            yl = yl[:, ::lps]
        return yh.reshape(-1)[:m], yl.reshape(-1)[:m]

    def apply_traced(self, xh, xl):
        return self.apply_pure(self.device_arrays(), xh, xl)

    def __call__(self, x, alpha=1.0, beta=0.0, y=None, with_y=False):
        """Full f64 SpMV: numpy f64 in/out, jitted f32 core."""
        xh, xl = self.split_x(x)
        yh, yl = jax.jit(self.apply_traced)(xh, xl)
        out = (np.asarray(yh, dtype=np.float64)
               + np.asarray(yl, dtype=np.float64))
        out = float(alpha) * out
        if with_y and y is not None:
            out = out + float(beta) * np.asarray(y, dtype=np.float64)
        return out
