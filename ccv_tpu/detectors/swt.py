"""SWT text detector (reference: lib/ccv_swt.c).

TPU-native redesign of the per-pixel Bresenham ray casting (_ccv_swt,
ccv_swt.c:41-230): every edge pixel's ray marches *simultaneously* as lanes
of a 70-step vectorized loop (the reference's `for (w = 0; w < 70; w++)`
bound becomes the static trip count), with masked state updates. Stroke
painting uses scatter-min (order-independent, exactly the reference's
min-write); the median rewrite pass computes all stroke medians from the
painted map at once and resolves overlaps max-width-wins (the reference
processes strokes in ascending width order sequentially — equivalent except
for rare read-after-write chains; fidelity is gated at detection level).

Connected components run as iterative min-label propagation on device;
letter statistics / textline pairing / word breakdown are small-n host math
(numpy), mirroring _ccv_swt_connected_letters / _merge_textline /
_break_words (ccv_swt.c:305/:499/:557).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ccv_tpu.detectors.common import Comp, group
from ccv_tpu.ops import basic, classic, resample


@dataclasses.dataclass
class SwtParams:
    """ccv_swt_default_params twin (ccv_swt.c:4)."""

    interval: int = 1
    same_word_thresh: Tuple[float, float] = (0.1, 0.8)
    min_neighbors: int = 1
    scale_invariant: bool = False
    size: int = 3
    low_thresh: int = 124
    high_thresh: int = 204
    max_height: int = 300
    min_height: int = 8
    min_area: int = 38
    letter_occlude_thresh: int = 3
    aspect_ratio: float = 8.0
    std_ratio: float = 0.83
    thickness_ratio: float = 1.5
    height_ratio: float = 1.7
    intensity_thresh: int = 31
    distance_ratio: float = 2.9
    intersect_ratio: float = 1.3
    letter_thresh: int = 3
    elongate_ratio: float = 1.9
    breakdown: bool = True
    breakdown_ratio: float = 1.0


MAX_RAY = 70
# 5-neighborhood search (cross) and 3x3 gradient check (ccv_swt.c:71-74)
_DX5 = np.array([-1, 0, 1, 0, 0], np.int32)
_DY5 = np.array([0, 0, 0, -1, 1], np.int32)
_DX9 = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], np.int32)
_DY9 = np.array([0, 0, 0, -1, -1, -1, 1, 1, 1], np.int32)


@partial(jax.jit, static_argnames=("direction",))
def swt_map(c: jax.Array, dx: jax.Array, dy: jax.Array, direction: int):
    """Stroke-width map for one polarity. c: closed edge map (H, W) nonzero;
    dx/dy: int32 sobel. Returns int32 (H, W) stroke widths (0 = none)."""
    H, W = c.shape
    edge = c != 0
    dxf = dx.astype(jnp.int32)
    dyf = dy.astype(jnp.int32)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cpad = jnp.pad(c, 1) != 0  # +1 offset indexing with clamp-free bounds
    dxp = jnp.pad(dxf, 1)
    dyp = jnp.pad(dyf, 1)

    swt = jnp.zeros((H, W), jnp.int32)

    for (xx, xy, yx, yy) in ((1, 0, 0, 1), (1, -1, 1, 1), (1, 1, -1, 1)):
        rdx = dxf * xx + dyf * xy
        rdy = dxf * yx + dyf * yy
        adx = jnp.abs(rdx)
        ady = jnp.abs(rdy)
        sx = jnp.where(rdx > 0, -direction, direction).astype(jnp.int32)
        sy = jnp.where(rdy > 0, -direction, direction).astype(jnp.int32)

        def increment(x0, y0, err):
            e2 = 2 * err
            stepx = e2 > -ady
            stepy = e2 < adx
            err = err - jnp.where(stepx, ady, 0) + jnp.where(stepy, adx, 0)
            return (x0 + jnp.where(stepx, sx, 0),
                    y0 + jnp.where(stepy, sy, 0), err)

        # -- march ---------------------------------------------------------
        def march_body(t, state):
            x0, y0, err, active, hit, hx, hy, hn = state
            x0n, y0n, errn = increment(x0, y0, err)
            inb = (x0n >= 1) & (x0n < W - 1) & (y0n >= 1) & (y0n < H - 1)
            far = (jnp.abs(ii - y0n) >= 2) | (jnp.abs(jj - x0n) >= 2)
            # 5-neighborhood probe; first match wins (order of _DX5)
            found = jnp.zeros_like(active)
            kx = x0n
            ky = y0n
            for k in range(5):
                nx = x0n + int(_DX5[k])
                ny = y0n + int(_DY5[k])
                val = cpad[(ny + 1).clip(0, H + 1), (nx + 1).clip(0, W + 1)]
                sel = val & ~found
                kx = jnp.where(sel, nx, kx)
                ky = jnp.where(sel, ny, ky)
                found = found | val
            hit_now = active & inb & far & found
            hx = jnp.where(hit_now, kx, hx)
            hy = jnp.where(hit_now, ky, hy)
            hn = jnp.where(hit_now, t + 1, hn)  # number of increments taken
            still = active & inb & ~hit_now
            x0 = jnp.where(active, x0n, x0)
            y0 = jnp.where(active, y0n, y0)
            err = jnp.where(active, errn, err)
            return x0, y0, err, still, hit | hit_now, hx, hy, hn

        err0 = adx - ady
        state = (jj, ii, err0, edge, jnp.zeros((H, W), bool),
                 jj, ii, jnp.zeros((H, W), jnp.int32))
        x1, y1, _, _, hit, hx, hy, hn = jax.lax.fori_loop(
            0, MAX_RAY, march_body, state)

        # -- gradient opposition check at the hit (ccv_swt.c:137-155) ------
        ok = hit & (hx > 0) & (hx < W - 1) & (hy > 0) & (hy < H - 1)
        opp = jnp.zeros((H, W), bool)
        for k in range(9):
            gx = dxp[(hy + 1 + int(_DY9[k])).clip(0, H + 1),
                     (hx + 1 + int(_DX9[k])).clip(0, W + 1)]
            gy = dyp[(hy + 1 + int(_DY9[k])).clip(0, H + 1),
                     (hx + 1 + int(_DX9[k])).clip(0, W + 1)]
            tn = dyf * gx - dxf * gy
            td = dxf * gx + dyf * gy
            opp = opp | ((tn * 7 < -td * 4) & (tn * 7 > td * 4))
        valid = ok & opp
        # stroke width: distance from start to the ray stop position (x1, y1)
        d2 = (x1 - jj) ** 2 + (y1 - ii) ** 2
        w = jnp.round(jnp.sqrt(d2.astype(jnp.float32))).astype(jnp.int32)

        # -- paint min(w) along the replayed path --------------------------
        flat_w = jnp.where(valid, w, jnp.iinfo(jnp.int32).max).reshape(-1)

        def paint_body(t, state):
            x0, y0, err, swt_flat = state
            pos = (y0 * W + x0).reshape(-1)
            upd = jnp.where((t <= hn).reshape(-1) & valid.reshape(-1),
                            flat_w, jnp.iinfo(jnp.int32).max)
            swt_flat = swt_flat.at[pos].min(upd, mode="drop")
            x0n, y0n, errn = increment(x0, y0, err)
            return x0n, y0n, errn, swt_flat

        big = jnp.full((H * W,), jnp.iinfo(jnp.int32).max, jnp.int32)
        _, _, _, painted = jax.lax.fori_loop(
            0, MAX_RAY + 1, paint_body, (jj, ii, err0, big))
        painted = painted.reshape(H, W)
        cur = jnp.where(swt == 0, jnp.iinfo(jnp.int32).max, swt)
        swt = jnp.where(painted < cur, painted, swt)

        # store per-ray geometry for the median pass
        if xx == 1 and xy == 0:
            rays = [(valid, w, hn, sx, sy, adx, ady)]
        else:
            rays.append((valid, w, hn, sx, sy, adx, ady))

    # -- median rewrite pass (approximate order; see module docstring) -----
    def median_pass(swt):
        swt_flat = swt.reshape(-1)
        # packed scatter-max: stroke with larger w wins; value = w*1024+median
        packed = jnp.zeros((H * W,), jnp.int32)
        for (valid, w, hn, sx, sy, adx, ady) in rays:
            err0 = adx - ady

            def gather_body(t, state):
                x0, y0, err, vals = state
                pos = (y0 * W + x0).reshape(-1)
                v = jnp.where((t <= hn).reshape(-1), swt_flat[pos], 0)
                vals = vals.at[t].set(v)
                e2 = 2 * err
                stepx = e2 > -ady
                stepy = e2 < adx
                err = err - jnp.where(stepx, ady, 0) + jnp.where(stepy, adx, 0)
                return (x0 + jnp.where(stepx, sx, 0),
                        y0 + jnp.where(stepy, sy, 0), err, vals)

            vals0 = jnp.zeros((MAX_RAY + 1, H * W), jnp.int32)
            _, _, _, vals = jax.lax.fori_loop(
                0, MAX_RAY + 1, gather_body, (jj, ii, err0, vals0))
            # median over the first hn+1 entries: sort with +inf padding
            n = (hn + 1).reshape(-1)
            t_idx = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0)
            padded = jnp.where(t_idx < n[None, :], vals, jnp.iinfo(jnp.int32).max)
            svals = jnp.sort(padded, axis=0)
            med = jnp.take_along_axis(svals, ((n - 1) // 2)[None, :], axis=0)[0]
            wflat = w.reshape(-1)
            pk = jnp.where(valid.reshape(-1), wflat * 1024 + med, 0)

            def scatter_body(t, state):
                x0, y0, err, packed = state
                pos = (y0 * W + x0).reshape(-1)
                upd = jnp.where((t <= hn).reshape(-1), pk, 0)
                packed = packed.at[pos].max(upd, mode="drop")
                e2 = 2 * err
                stepx = e2 > -ady
                stepy = e2 < adx
                err = err - jnp.where(stepx, ady, 0) + jnp.where(stepy, adx, 0)
                return (x0 + jnp.where(stepx, sx, 0),
                        y0 + jnp.where(stepy, sy, 0), err, packed)

            _, _, _, packed = jax.lax.fori_loop(
                0, MAX_RAY + 1, scatter_body, (jj, ii, err0, packed))
        med = (packed % 1024).reshape(H, W)
        return jnp.where(packed.reshape(H, W) > 0, med, swt)

    return median_pass(swt)


@jax.jit
def _connected_components(swt: jax.Array, ratio: int = 3):
    """8-connected labeling where neighbor widths are within `ratio` x.

    Iterative min-label propagation to fixpoint (the reference's BFS uses a
    running component average, ccv_swt.c:262-281; the pairwise rule is the
    standard SWT formulation and agrees on detection-level output).
    """
    H, W = swt.shape
    fg = swt > 0
    idx = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    big = H * W + 7
    labels = jnp.where(fg, idx, big)
    swp = jnp.pad(swt, 1)

    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1), (-1, -1), (-1, 1), (1, -1), (1, 1)]

    def nb(arr, di, dj, fill):
        ap = jnp.pad(arr, 1, constant_values=fill)
        return jax.lax.dynamic_slice(ap, (1 + di, 1 + dj), (H, W))

    def body(state):
        labels, _ = state
        new = labels
        for di, dj in shifts:
            nl = nb(labels, di, dj, big)
            nw = nb(swt, di, dj, 0)
            join = fg & (nw > 0) & (nw <= ratio * swt) & (nw * ratio >= swt)
            new = jnp.where(join, jnp.minimum(new, nl), new)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(lambda s: s[1], body,
                                   (labels, jnp.bool_(True)))
    return jnp.where(fg, labels, -1)


def _letters_from_components(image_gray: np.ndarray, swt: np.ndarray,
                             labels: np.ndarray, params: SwtParams):
    """_ccv_swt_connected_letters twin (host, vectorized numpy)."""
    H, W = swt.shape
    flat = labels.reshape(-1)
    fg = flat >= 0
    if not fg.any():
        return []
    ids, inv = np.unique(flat[fg], return_inverse=True)
    n = len(ids)
    ys, xs = np.divmod(np.nonzero(fg)[0], W)
    vals = swt.reshape(-1)[fg].astype(np.float64)
    size = np.bincount(inv, minlength=n)
    x0 = np.full(n, W, np.int64); np.minimum.at(x0, inv, xs)
    x1 = np.zeros(n, np.int64); np.maximum.at(x1, inv, xs)
    y0 = np.full(n, H, np.int64); np.minimum.at(y0, inv, ys)
    y1 = np.zeros(n, np.int64); np.maximum.at(y1, inv, ys)
    width = x1 - x0 + 1
    height = y1 - y0 + 1
    # size/area/height gates (_ccv_swt_connected_component tail)
    keep = ((height >= params.min_height) & (height <= params.max_height)
            & (size >= params.min_area))
    # aspect ratio of the bbox
    ar = width / height
    keep &= (ar >= 1.0 / params.aspect_ratio) & (ar <= params.aspect_ratio)
    # second-moment elongation ratio
    m10 = np.bincount(inv, xs, n); m01 = np.bincount(inv, ys, n)
    m20 = np.bincount(inv, xs.astype(np.float64) ** 2, n)
    m02 = np.bincount(inv, ys.astype(np.float64) ** 2, n)
    m11 = np.bincount(inv, xs.astype(np.float64) * ys, n)
    xc, yc = m10 / size, m01 / size
    af = m20 / size - xc * xc
    bf = 2 * (m11 / size - xc * yc)
    cf = m02 / size - yc * yc
    delta = np.sqrt(bf * bf + (af - cf) ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        mom_ratio = np.sqrt((af + cf + delta) / np.maximum(af + cf - delta, 1e-12))
    keep &= (mom_ratio >= 1.0 / params.aspect_ratio) & (mom_ratio <= params.aspect_ratio)
    # stroke-width statistics
    mean = np.bincount(inv, vals, n) / size
    var = np.bincount(inv, vals * vals, n) / size - mean ** 2
    std = np.sqrt(np.maximum(var, 0))
    keep &= std <= mean * params.std_ratio

    kept_ids = np.nonzero(keep)[0]
    if len(kept_ids) == 0:
        return []
    # occlusion filter: letter bbox may contain pixels of at most
    # letter_occlude_thresh other letters (ccv_swt.c:368-399)
    remap = np.full(n, -1)
    remap[kept_ids] = np.arange(len(kept_ids))
    lab_img = np.full((H, W), -1, np.int64)
    lab_img.reshape(-1)[fg] = remap[inv]
    final = []
    gray = image_gray
    # intensity per component (mean gray over pixels)
    inten = np.bincount(inv, gray.reshape(-1)[fg].astype(np.float64), n)
    inten = (inten / size).astype(np.int64)
    # thickness: median stroke width per component
    order = np.lexsort((vals, inv))
    sorted_vals = vals[order]
    starts = np.searchsorted(inv[order], np.arange(n))
    for row, comp in enumerate(kept_ids):
        bx0, bx1, by0, by1 = x0[comp], x1[comp], y0[comp], y1[comp]
        sub = lab_img[by0:by1 + 1, bx0:bx1 + 1]
        others = np.unique(sub[(sub >= 0) & (sub != row)])
        if params.letter_occlude_thresh and len(others) > params.letter_occlude_thresh:
            continue
        s, c = starts[comp], size[comp]
        med = sorted_vals[s + (c - 1) // 2]
        final.append(dict(
            x=int(bx0), y=int(by0), width=int(width[comp]), height=int(height[comp]),
            cx=int(bx0) + int(width[comp]) // 2, cy=int(by0) + int(height[comp]) // 2,
            thickness=int(med), intensity=int(inten[comp]),
            mean=float(mean[comp]), std=float(std[comp])))
    return final


def _merge_textline(letters: List[dict], params: SwtParams) -> List[dict]:
    """_ccv_swt_merge_textline twin (ccv_swt.c:499)."""
    pairs = []
    for i in range(len(letters) - 1):
        li = letters[i]
        for j in range(i + 1, len(letters)):
            lj = letters[j]
            r = li["thickness"] / max(lj["thickness"], 1e-9)
            if r > params.thickness_ratio or r < 1.0 / params.thickness_ratio:
                continue
            r = li["height"] / lj["height"]
            if r > params.height_ratio or r < 1.0 / params.height_ratio:
                continue
            if abs(li["intensity"] - lj["intensity"]) > params.intensity_thresh:
                continue
            dx = li["x"] - lj["x"] + (li["width"] - lj["width"]) // 2
            dy = li["y"] - lj["y"] + (li["height"] - lj["height"]) // 2
            if abs(dx) > params.distance_ratio * max(li["width"], lj["width"]):
                continue
            oy = min(li["y"] + li["height"], lj["y"] + lj["height"]) - max(li["y"], lj["y"])
            if oy * params.intersect_ratio < min(li["height"], lj["height"]):
                continue
            pairs.append(dict(left=i, right=j, dx=dx, dy=dy))
    if not pairs:
        return []

    def same(p1, p2):
        tn = p1["dy"] * p2["dx"] - p1["dx"] * p2["dy"]
        td = p1["dx"] * p2["dx"] + p1["dy"] * p2["dy"]
        if p1["left"] == p2["left"] or p1["right"] == p2["right"]:
            return tn * 7 < -td * 4 and tn * 7 > td * 4
        if p1["left"] == p2["right"] or p1["right"] == p2["left"]:
            return tn * 7 < td * 4 and tn * 7 > -td * 4
        return False

    idx = group(pairs, same)
    nchains = max(idx) + 1
    chains = [dict(members=set()) for _ in range(nchains)]
    for p, g in zip(pairs, idx):
        chains[g]["members"].add(p["left"])
        chains[g]["members"].add(p["right"])
    out = []
    for ch in chains:
        mem = [letters[m] for m in ch["members"]]
        if len(mem) < params.letter_thresh:
            continue
        x0 = min(l["x"] for l in mem)
        y0 = min(l["y"] for l in mem)
        x1 = max(l["x"] + l["width"] for l in mem)
        y1 = max(l["y"] + l["height"] for l in mem)
        if (x1 - x0) <= (y1 - y0) * params.elongate_ratio:
            continue
        out.append(dict(x=x0, y=y0, width=x1 - x0, height=y1 - y0,
                        letters=sorted(mem, key=lambda l: l["cx"])))
    return out


def _same_textline(t1, t2, thresh) -> bool:
    w = min(t1["x"] + t1["width"], t2["x"] + t2["width"]) - max(t1["x"], t2["x"])
    h = min(t1["y"] + t1["height"], t2["y"] + t2["height"]) - max(t1["y"], t2["y"])
    a1 = t1["width"] * t1["height"]
    a2 = t2["width"] * t2["height"]
    return (w > 0 and h > 0 and w * h > thresh[0] * max(a1, a2)
            and w * h > thresh[1] * min(a1, a2))


def _break_words(textlines: List[dict], params: SwtParams) -> List[dict]:
    """_ccv_swt_break_words twin: otsu over inter-letter gaps."""
    from ccv_tpu.ops.classic import otsu

    words = []
    for t in textlines:
        ls = t["letters"]
        if len(ls) < 2:
            words.append({k: t[k] for k in ("x", "y", "width", "height")})
            continue
        gaps = np.array([max(0, ls[j + 1]["x"] - (ls[j]["x"] + ls[j]["width"]))
                         for j in range(len(ls) - 1)], np.int32)
        rng = int(gaps.max()) + 1
        th, var = otsu(jnp.asarray(gaps), rng)
        th, var = int(th), float(var)
        mean = gaps.mean()
        if math.sqrt(var) > mean * params.breakdown_ratio:
            cur = [ls[0]]
            for j in range(len(ls) - 1):
                if gaps[j] > th:
                    words.append(_bbox(cur))
                    cur = []
                cur.append(ls[j + 1])
            words.append(_bbox(cur))
        else:
            words.append({k: t[k] for k in ("x", "y", "width", "height")})
    return words


def _bbox(ls):
    x0 = min(l["x"] for l in ls)
    y0 = min(l["y"] for l in ls)
    x1 = max(l["x"] + l["width"] for l in ls)
    y1 = max(l["y"] + l["height"] for l in ls)
    return dict(x=x0, y=y0, width=x1 - x0, height=y1 - y0)


def detect_words(a, params: Optional[SwtParams] = None) -> List[Comp]:
    """ccv_swt_detect_words twin (ccv_swt.c:625), single scale by default."""
    from ccv_tpu.core.dense_matrix import as_array

    params = params or SwtParams()
    img = as_array(a)
    if img.ndim == 3:
        img = img[..., 0]
    all_words: List[dict] = []
    scale = 2.0 ** (1.0 / (params.interval + 1.0))
    if params.scale_invariant:
        hr = img.shape[0] * 2 // (params.min_height + params.max_height)
        wr = img.shape[1] * 2 // (params.min_height + params.max_height)
        scale_upto = int(math.log(min(hr, wr)) / math.log(scale))
    else:
        scale_upto = 1
    next_ = params.interval + 1
    phx = img
    cscale = 1.0
    for k in range(scale_upto):
        if k % next_:
            j = k % next_
            pyr = resample.resample(
                phx, rows=int(phx.shape[0] / scale ** j),
                cols=int(phx.shape[1] / scale ** j),
                rows_scale=1 / scale ** j, cols_scale=1 / scale ** j,
                interp=resample.INTER_AREA)
        elif k > 0:
            phx = resample.sample_down(phx)
            pyr = phx
        else:
            pyr = phx
        cc = classic.canny(pyr, params.size, params.low_thresh, params.high_thresh)
        c = classic.close_outline(cc)
        dx = basic.sobel(pyr, params.size, 0)
        dy = basic.sobel(pyr, 0, params.size)
        gray_np = np.asarray(pyr)
        textlines = []
        for direction in (1, -1):  # DARK_TO_BRIGHT, BRIGHT_TO_DARK
            smap = swt_map(c, dx, dy, direction)
            labels = _connected_components(smap)
            letters = _letters_from_components(
                gray_np, np.asarray(smap), np.asarray(labels), params)
            textlines += _merge_textline(letters, params)
        # group overlapping textlines, keep the widest per group
        if textlines:
            idx = group(textlines, lambda a, b: _same_textline(
                a, b, params.same_word_thresh))
            ngroups = max(idx) + 1
            best = [None] * ngroups
            for t, g in zip(textlines, idx):
                if best[g] is None or t["width"] > best[g]["width"]:
                    best[g] = t
            textlines = best
        words = _break_words(textlines, params) if params.breakdown else [
            {kk: t[kk] for kk in ("x", "y", "width", "height")} for t in textlines]
        if params.scale_invariant:
            for wd in words:
                all_words.append(dict(
                    x=int(wd["x"] * cscale + 0.5), y=int(wd["y"] * cscale + 0.5),
                    width=int(wd["width"] * cscale + 0.5),
                    height=int(wd["height"] * cscale + 0.5)))
            cscale *= scale
        else:
            all_words = words
    comps = [Comp(w["x"], w["y"], w["width"], w["height"]) for w in all_words]
    if params.scale_invariant and params.min_neighbors:
        idx = group(comps, lambda a, b: _same_textline(
            dict(x=a.x, y=a.y, width=a.width, height=a.height),
            dict(x=b.x, y=b.y, width=b.width, height=b.height),
            params.same_word_thresh))
        ngroups = max(idx) + 1 if comps else 0
        best = [None] * ngroups
        counts = [0] * ngroups
        for c_, g in zip(comps, idx):
            counts[g] += 1
            if best[g] is None or c_.width * c_.height > best[g].width * best[g].height:
                best[g] = c_
        comps = [dataclasses.replace(b, neighbors=n)
                 for b, n in zip(best, counts) if n >= params.min_neighbors]
    return comps
