"""Truncated-variant timing of the BM strip kernel: pass1 only /
pass1+matmul / full, vmapped over 40 frames, floor-subtracted."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpuslam.runtime.cache import enable_persistent_cache
enable_persistent_cache()
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpuslam.config import SlamConfig
from tpuslam.kernels import stereo_bm_pallas as S
from tpuslam.io.dataset import StereoImageDataset

SEQ = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache", "kittigeo120")
ds = StereoImageDataset(left_dir=os.path.join(SEQ, "image_0"), right_dir=os.path.join(SEQ, "image_1"))
B = 40
lefts = jnp.asarray(np.stack([ds[i]["left"] for i in range(B)]))
rights = jnp.asarray(np.stack([ds[i]["right"] for i in range(B)]))
cfg = SlamConfig().bm
h, w = 376, 1241

def make(variant):
    ndisp = cfg.num_disparities; r = cfg.block_size // 2
    mindisp = cfg.min_disparity; ftzero = cfg.prefilter_cap
    tile_h = S.DEF_TILE_H; LANE = S.LANE
    n_strips = S._cdiv(h, tile_h); hp = n_strips * tile_h
    wp = S._cdiv(w, LANE) * LANE

    def kern(lraw_ref, rraw_ref, band_ref, disp_ref, sad_ref, apad_ref, bpad_ref):
        i = pl.program_id(0)
        row0 = i * tile_h
        sh = tile_h + 2 * r
        wtot = LANE + wp + LANE
        win = 2 * r + 1
        rows = (ndisp + 1) * tile_h
        NB = wp // LANE
        pdt = apad_ref.dtype
        @pl.when(i == 0)
        def _z():
            z = jnp.zeros((rows, LANE), pdt)
            apad_ref[:, :LANE] = z; apad_ref[:, LANE + wp:] = z
            bpad_ref[:, :LANE] = z; bpad_ref[:, LANE + wp:] = z
        lanex = jax.lax.broadcasted_iota(jnp.int32, (sh, wtot), 1) - LANE
        def prefilter(raw_ref):
            raw = raw_ref[pl.ds(row0, sh + 2), :].astype(jnp.int32)
            rt = pltpu.roll(raw, shift=wtot - 1, axis=1)
            lf = pltpu.roll(raw, shift=1, axis=1)
            dxa = rt - lf
            sob = dxa[:-2] + 2 * dxa[1:-1] + dxa[2:]
            v = jnp.clip(sob, -ftzero, ftzero) + ftzero
            v = jnp.where((lanex == 0) | (lanex == w - 1), ftzero, v)
            return jnp.where((lanex < 0) | (lanex >= w), 0, v)
        lps = prefilter(lraw_ref); rps32 = prefilter(rraw_ref)
        UNROLL = 4
        def vbox(a):
            parts = {1: a}; k = 1
            while k * 2 <= win:
                p = parts[k]; parts[k * 2] = p[:p.shape[0] - k] + p[k:]; k *= 2
            out = None; off = 0; rem = win
            while rem > 0:
                while k > rem: k //= 2
                seg = parts[k][off:off + tile_h]
                out = seg if out is None else out + seg
                off += k; rem -= k
            return out
        lane_img = lps[:, LANE:LANE + wp]
        def put_plane(group, v):
            a = (v >> 6).astype(pdt); b = (v & 63).astype(pdt)
            lo = group * tile_h
            apad_ref[lo:lo + tile_h, LANE:LANE + wp] = a
            bpad_ref[lo:lo + tile_h, LANE:LANE + wp] = b
        rcur = pltpu.roll(rps32, shift=ndisp - 1, axis=1)
        for g in range(ndisp // UNROLL):
            for t in range(UNROLL):
                rsh = rcur[:, LANE + t:LANE + t + wp]
                put_plane(g * UNROLL + t, vbox(jnp.abs(lane_img - rsh)))
            rcur = pltpu.roll(rcur, shift=wtot - UNROLL, axis=1)
        put_plane(ndisp, vbox(jnp.abs(lane_img - jnp.int32(ftzero))))
        if variant == "pass1":
            disp_ref[:] = apad_ref[:tile_h, LANE:LANE+wp].astype(jnp.int16)
            sad_ref[:] = bpad_ref[:tile_h, LANE:LANE+wp].astype(jnp.int16)
            return
        band = band_ref[:]
        jgrid = jax.lax.broadcasted_iota(jnp.int32, (ndisp, tile_h, LANE), 0)
        dn = (((1,), (0,)), ((), ()))
        ys = row0 + jax.lax.broadcasted_iota(jnp.int32, (tile_h, LANE), 0)
        xs0 = jax.lax.broadcasted_iota(jnp.int32, (tile_h, LANE), 1)
        filtered = jnp.int32((mindisp - 1) * S.FILTERED_SCALE)
        for k in range(NB):
            asl = apad_ref[:, k * LANE:k * LANE + 3 * LANE]
            bsl = bpad_ref[:, k * LANE:k * LANE + 3 * LANE]
            ca = jax.lax.dot_general(asl.astype(jnp.bfloat16), band, dn,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            cb = jax.lax.dot_general(bsl.astype(jnp.bfloat16), band, dn,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.DEFAULT)
            cost_all = (ca * 64 + cb).astype(jnp.int32)
            if variant == "mm":
                disp_ref[:, k * LANE:(k + 1) * LANE] = cost_all[:tile_h].astype(jnp.int16)
                sad_ref[:, k * LANE:(k + 1) * LANE] = cost_all[tile_h:2*tile_h].astype(jnp.int16)
                continue
            tex = cost_all[ndisp * tile_h:]
            cost = cost_all[:ndisp * tile_h].reshape(ndisp, tile_h, LANE)
            enc = cost * ndisp + jgrid
            m1 = jnp.min(enc, axis=0)
            best_j = m1 & (ndisp - 1); minsad = m1 >> (ndisp.bit_length() - 1)
            if variant == "p3min":
                disp_ref[:, k * LANE:(k + 1) * LANE] = best_j.astype(jnp.int16)
                sad_ref[:, k * LANE:(k + 1) * LANE] = minsad.astype(jnp.int16)
                continue
            bj = best_j[None]
            sad_n = jnp.sum(jnp.where(jgrid == bj - 1, cost, 0), axis=0)
            sad_p = jnp.sum(jnp.where(jgrid == bj + 1, cost, 0), axis=0)
            thresh = minsad + minsad * cfg.uniqueness_ratio // 100
            far = jnp.abs(jgrid - bj) > 1
            uniq_ok = ~jnp.any((cost <= thresh[None]) & far, axis=0)
            if variant == "p3sad":
                disp_ref[:, k * LANE:(k + 1) * LANE] = sad_n.astype(jnp.int16)
                sad_ref[:, k * LANE:(k + 1) * LANE] = sad_p.astype(jnp.int16)
                continue
            sad_n = jnp.where(best_j == 0, sad_p, sad_n)
            sad_p = jnp.where(best_j == ndisp - 1, sad_n, sad_p)
            if variant == "p3uniq":
                disp_ref[:, k * LANE:(k + 1) * LANE] = uniq_ok.astype(jnp.int16)
                sad_ref[:, k * LANE:(k + 1) * LANE] = minsad.astype(jnp.int16)
                continue
            tex_ok = tex >= cfg.texture_threshold
            denom = sad_p + sad_n - 2 * minsad + jnp.abs(sad_p - sad_n)
            num = (sad_p - sad_n) * 256
            frac = jnp.where(denom != 0, jnp.sign(num) * (jnp.abs(num) // jnp.where(denom == 0, 1, denom)), 0)
            d_act = ndisp - 1 - best_j
            disp16 = ((d_act + mindisp) * 256 + frac + 15) >> 4
            xs = xs0 + k * LANE
            valid = ((ys >= r) & (ys < h - r) & (xs >= mindisp + ndisp - 1 + r) & (xs < w - r) & tex_ok & uniq_ok)
            disp_ref[:, k * LANE:(k + 1) * LANE] = jnp.where(valid, disp16, filtered).astype(jnp.int16)
            sad_ref[:, k * LANE:(k + 1) * LANE] = minsad.astype(jnp.int16)

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * LANE, LANE), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (3 * LANE, LANE), 1)
    band = (jnp.abs(s_idx - c_idx - LANE) <= r).astype(jnp.bfloat16)
    def pad_raw(img):
        x = img.astype(jnp.int16)
        core = jnp.concatenate([x[1:2], x, x[h - 2:h - 1]], axis=0)
        out = jnp.zeros((hp + 2 * (r + 1), LANE + wp + LANE), jnp.int16)
        return jax.lax.dynamic_update_slice(out, core, (r, LANE))
    def one(l, rr):
        dp, sp = pl.pallas_call(
            kern, grid=(n_strips,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=(pl.BlockSpec((tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((tile_h, wp), lambda i: (i, 0), memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((hp, wp), jnp.int16),
                       jax.ShapeDtypeStruct((hp, wp), jnp.int16)),
            scratch_shapes=[pltpu.VMEM(((cfg.num_disparities + 1) * tile_h, 2 * LANE + wp), jnp.int8)] * 2,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(pad_raw(l), pad_raw(rr), band)
        return jnp.sum(dp.astype(jnp.int32)) + jnp.sum(sp.astype(jnp.int32))
    @jax.jit
    def f(seed, ls, rs):
        ls = ls ^ seed
        return jnp.sum(jax.vmap(one)(ls, rs))
    return f

g = jax.jit(lambda a: a + 1); y = jnp.ones((8, 8), jnp.float32)
def rewarm():
    r = None
    for _ in range(2000): r = g(y)
    jax.block_until_ready(r)

def timed(f, *a, reps=5):
    float(f(jnp.uint8(251), *a))
    rewarm()
    ts = []
    for rep in range(reps):
        t0 = time.perf_counter(); float(f(jnp.uint8(rep), *a)); ts.append(time.perf_counter()-t0)
    return float(np.median(ts)) * 1e3

floor = timed(jax.jit(lambda s, l: jnp.sum((l ^ s).astype(jnp.int32))), lefts)
print(f"floor {floor:.1f} ms")
for v in ("mm", "p3min", "p3sad", "p3uniq", "full"):
    ms = timed(make(v), lefts, rights)
    print(f"{v:6s} {ms:7.1f} ms/chunk  net {(ms-floor)/B:6.3f} ms/frame")
