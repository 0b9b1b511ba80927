"""ORB feature extraction pipeline (TPU-native ComputeKeyPointsOld).

Reproduces the semantics of the reference's active extraction path
(ORBextractor.cc:880-1296 + operator() 1224-1296):

  pyramid -> per-level FAST per grid cell (iniTh, fall back to minTh when a
  cell yields <= 3 corners) -> introspection-weighted per-cell budgets ->
  one budget-redistribution pass -> per-cell retain-best -> per-level global
  retain-best -> IC orientation -> 7x7/sigma2 Gaussian blur -> rBRIEF ->
  coordinates scaled to level 0.

TPU design: the per-cell scalar loops become dense whole-level score maps
tiled into a (nCells, cellH, cellW) view. Because the reference's cell
windows overlap by exactly twice the 3-px FAST border, per-cell detection
equals whole-image detection restricted to disjoint tiles; per-cell NMS is
tile-local NMS (corners at tile edges are not suppressed by neighbors in
other cells — faithfully reproduced). Everything is static-shaped: each
level emits exactly `features_per_level[l]` slots with a validity mask.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ORBConfig
from . import brief, fast, image, orient, pyramid

EDGE_THRESHOLD = 19


class Keypoints(NamedTuple):
    """Padded per-image keypoint bundle (total capacity = sum of per-level
    budgets = cfg.n_features). Invalid slots have valid=False."""

    xy: jnp.ndarray        # (N, 2) float32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # (N,) float32 (quality-scaled when introspection on)
    octave: jnp.ndarray    # (N,) int32 pyramid level
    angle: jnp.ndarray     # (N,) float32 degrees
    desc: jnp.ndarray      # (N, 32) uint8 rBRIEF
    valid: jnp.ndarray     # (N,) bool
    yx_level: jnp.ndarray  # (N, 2) int32 integer coords at native level (row, col)

    @property
    def n(self) -> jnp.ndarray:
        return jnp.sum(self.valid)


@dataclass(frozen=True)
class LevelLayout:
    """Static per-level extraction geometry (ORBextractor.cc:884-927)."""

    h: int
    w: int
    n_desired: int
    level_cols: int
    level_rows: int
    cell_w: int
    cell_h: int

    @property
    def n_cells(self) -> int:
        return self.level_rows * self.level_cols

    @property
    def max_border_x(self) -> int:
        return self.w - EDGE_THRESHOLD

    @property
    def max_border_y(self) -> int:
        return self.h - EDGE_THRESHOLD

    @property
    def top_k(self) -> int:
        return min(self.cell_w * self.cell_h, max(self.n_desired, 1))

    @property
    def active(self) -> bool:
        return (
            self.n_desired > 0
            and self.level_cols >= 1
            and self.level_rows >= 1
            and self.max_border_x - EDGE_THRESHOLD >= 7
            and self.max_border_y - EDGE_THRESHOLD >= 7
        )


def make_layouts(cfg: ORBConfig, height: int, width: int) -> List[LevelLayout]:
    shapes = pyramid.pyramid_shapes(height, width, cfg.scale_factor, cfg.n_levels)
    budgets = cfg.features_per_level()
    ratio = float(width) / float(height)
    layouts = []
    for (h, w), nd in zip(shapes, budgets):
        nd = int(nd)
        level_cols = int(math.sqrt(nd / (5.0 * ratio))) if nd > 0 else 0
        level_rows = int(ratio * level_cols)
        W = (w - EDGE_THRESHOLD) - EDGE_THRESHOLD
        H = (h - EDGE_THRESHOLD) - EDGE_THRESHOLD
        cell_w = math.ceil(W / level_cols) if level_cols >= 1 else 0
        cell_h = math.ceil(H / level_rows) if level_rows >= 1 else 0
        layouts.append(
            LevelLayout(h, w, nd, level_cols, level_rows, cell_w, cell_h)
        )
    return layouts


def _tile_view(score: jnp.ndarray, lay: LevelLayout) -> jnp.ndarray:
    """Slice the detection band into disjoint (nCells, cellH, cellW) tiles."""
    can_h = lay.level_rows * lay.cell_h
    can_w = lay.level_cols * lay.cell_w
    pad_h = max(0, EDGE_THRESHOLD + can_h - lay.h)
    pad_w = max(0, EDGE_THRESHOLD + can_w - lay.w)
    s = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    s = s[EDGE_THRESHOLD:EDGE_THRESHOLD + can_h, EDGE_THRESHOLD:EDGE_THRESHOLD + can_w]
    # zero outside the [minBorder, maxBorder) detection band
    yy = jnp.arange(can_h)[:, None]
    xx = jnp.arange(can_w)[None, :]
    band = (yy < lay.max_border_y - EDGE_THRESHOLD) & (
        xx < lay.max_border_x - EDGE_THRESHOLD
    )
    s = jnp.where(band, s, 0)
    tiles = s.reshape(lay.level_rows, lay.cell_h, lay.level_cols, lay.cell_w)
    return tiles.transpose(0, 2, 1, 3).reshape(lay.n_cells, lay.cell_h, lay.cell_w)


def _tile_nms(tiles: jnp.ndarray) -> jnp.ndarray:
    """3x3 NMS inside each tile (zero boundary — matches per-cell cv::FAST)."""
    p = jnp.pad(tiles, ((0, 0), (1, 1), (1, 1)))
    h, w = tiles.shape[1], tiles.shape[2]
    nmax = None
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            n = p[:, dy:dy + h, dx:dx + w]
            nmax = n if nmax is None else jnp.maximum(nmax, n)
    return jnp.where(tiles > nmax, tiles, 0)


def _cell_windows(lay: LevelLayout) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static FAST cell windows (iniY, iniX, hY, hX) per cell, row-major
    (ORBextractor.cc:986-1020): origin minBorder-3, size cell+6, last
    row/col clipped to maxBorder+3."""
    iniY = EDGE_THRESHOLD + np.arange(lay.level_rows) * lay.cell_h - 3
    iniX = EDGE_THRESHOLD + np.arange(lay.level_cols) * lay.cell_w - 3
    hY = np.full(lay.level_rows, lay.cell_h + 6)
    hX = np.full(lay.level_cols, lay.cell_w + 6)
    hY[-1] = lay.max_border_y + 3 - iniY[-1]
    hX[-1] = lay.max_border_x + 3 - iniX[-1]
    yy, xx = np.meshgrid(np.arange(lay.level_rows), np.arange(lay.level_cols),
                         indexing="ij")
    return (iniY[yy.ravel()], iniX[xx.ravel()], hY[yy.ravel()], hX[xx.ravel()])


def _cell_quality_weights(qual: jnp.ndarray, lay: LevelLayout) -> jnp.ndarray:
    """Mean cost per FAST window -> normalized quality in [0, 1]
    (ORBextractor.cc:946-985): qual = 2/(1 + mean_cost/255) - 1."""
    iy, ix, hy, hx = _cell_windows(lay)
    # integral image for arbitrary clipped windows
    q = qual.astype(jnp.float32)
    sat = jnp.pad(jnp.cumsum(jnp.cumsum(q, axis=0), axis=1), ((1, 0), (1, 0)))
    y0 = jnp.asarray(iy)
    x0 = jnp.asarray(ix)
    y1 = jnp.asarray(iy + hy)
    x1 = jnp.asarray(ix + hx)
    sums = sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0]
    mean_cost = sums / jnp.asarray((hy * hx).astype(np.float32))
    return 2.0 * (1.0 / (1.0 + mean_cost / 255.0)) - 1.0


def _redistribute(
    n_total: jnp.ndarray, budgets: jnp.ndarray, n_cells: int
) -> jnp.ndarray:
    """The reference's single budget-redistribution pass
    (ORBextractor.cc:1090-1132): row-major sequential scan where cells that
    cannot absorb their share push the deficit onto later cells."""
    over = n_total > budgets
    retain0 = jnp.where(over, budgets, n_total)
    d0 = jnp.sum(jnp.where(over, 0, budgets - n_total))
    no_more0 = ~over
    n_no_more0 = jnp.sum(no_more0.astype(jnp.int32))
    run = (d0 > 0) & (n_no_more0 < n_cells)

    def body(carry, x):
        d, n_no_more = carry
        tot, budget, no_more, ret0 = x
        share = jnp.ceil(d.astype(jnp.float32) / jnp.maximum(n_cells - n_no_more, 1))
        new_budget = budget + share.astype(jnp.int32)
        can = tot > new_budget
        ret = jnp.where(no_more, ret0, jnp.where(can, new_budget, tot))
        d_next = jnp.where(no_more | can, d, d + new_budget - tot)
        n_no_more_next = n_no_more + jnp.where(no_more | can, 0, 1)
        return (d_next, n_no_more_next), ret

    (_, _), retain1 = jax.lax.scan(
        body, (d0, n_no_more0), (n_total, budgets, no_more0, retain0)
    )
    return jnp.where(run, retain1, retain0)


def _level_score_tiles(score_min: jnp.ndarray, lay: LevelLayout, ini_th: int):
    """Phase A of histogram selection: band mask + cell-local 3x3 NMS in
    IMAGE layout (no tile transpose) + the iniTh/minTh per-cell choice.

    Cell-local NMS == the tile-view NMS (_tile_nms): neighbors across cell
    borders are masked to 0, which is exactly the zero padding each tile
    sees there. Returns (t (rows, cellH, cols, cellW) int32 score tiles,
    n_total (n_cells,) detected count per cell)."""
    rows, cols = lay.level_rows, lay.level_cols
    ch, cw = lay.cell_h, lay.cell_w
    can_h, can_w = rows * ch, cols * cw
    pad_h = max(0, EDGE_THRESHOLD + can_h - lay.h)
    pad_w = max(0, EDGE_THRESHOLD + can_w - lay.w)
    s = jnp.pad(score_min, ((0, pad_h), (0, pad_w)))
    s = s[EDGE_THRESHOLD:EDGE_THRESHOLD + can_h,
          EDGE_THRESHOLD:EDGE_THRESHOLD + can_w]
    yy = jnp.arange(can_h)[:, None]
    xx = jnp.arange(can_w)[None, :]
    band = (yy < lay.max_border_y - EDGE_THRESHOLD) & (
        xx < lay.max_border_x - EDGE_THRESHOLD
    )
    s = jnp.where(band, s, 0).astype(jnp.int32)

    p = jnp.pad(s, ((1, 1), (1, 1)))
    ys = jnp.arange(can_h)
    xs = jnp.arange(can_w)
    top_e = (ys % ch) == 0
    bot_e = (ys % ch) == ch - 1
    left_e = (xs % cw) == 0
    right_e = (xs % cw) == cw - 1
    nmax = jnp.zeros_like(s)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = p[1 + dy:1 + dy + can_h, 1 + dx:1 + dx + can_w]
            if dy == -1:
                n = jnp.where(top_e[:, None], 0, n)
            if dy == 1:
                n = jnp.where(bot_e[:, None], 0, n)
            if dx == -1:
                n = jnp.where(left_e[None, :], 0, n)
            if dx == 1:
                n = jnp.where(right_e[None, :], 0, n)
            nmax = jnp.maximum(nmax, n)
    t_min = jnp.where(s > nmax, s, 0)
    t_ini = jnp.where(t_min >= ini_th, t_min, 0)

    def cells(x):  # free reshape, no transpose
        return x.reshape(rows, ch, cols, cw)

    cnt_ini = cells((t_ini > 0).astype(jnp.int32)).sum(axis=(1, 3))
    use_min = (cnt_ini <= 3)[:, None, :, None]  # ORBextractor.cc:1054-1059
    t = jnp.where(use_min, cells(t_min), cells(t_ini))
    n_total = (t > 0).astype(jnp.int32).sum(axis=(1, 3)).reshape(-1)
    return t, n_total


def _select_from_tiles_hist(t: jnp.ndarray, n_retain: jnp.ndarray,
                            lay: LevelLayout):
    """Phase B of histogram selection: per-cell and per-level retain-best
    via threshold binary search on INTEGER scores, reproducing lax.top_k's
    result (including index-order tie-breaking) without the large sorts.

    t: (rows, cellH, cols, cellW) int32 NMS'd scores (0 = not detected);
    n_retain: (n_cells,) per-cell retention budgets after redistribution.
    Returns (y, x, resp, valid) identical to _select_level_keypoints."""
    rows, cols = lay.level_rows, lay.level_cols
    ch, cw = lay.cell_h, lay.cell_w
    nr = n_retain.reshape(rows, cols)
    # optimization barriers: without them XLA fuses the whole phase into
    # one mega-kernel that RECOMPUTES the per-cell reductions per output
    # element (measured 7.4 ms for level 0 vs ~0.3 ms materialized)
    barrier = jax.lax.optimization_barrier
    t = barrier(t)
    detected = t > 0

    def count_gt(th_rc):
        return barrier(
            (t > th_rc[:, None, :, None]).astype(jnp.int32).sum(axis=(1, 3))
        )

    # smallest threshold with count_gt <= n_retain (counts are monotone
    # non-increasing in the threshold; FAST scores are < 256)
    lo = jnp.zeros((rows, cols), jnp.int32)
    hi = jnp.full((rows, cols), 255, jnp.int32)
    for _ in range(8):
        mid = (lo + hi) // 2
        ok = count_gt(mid) <= nr
        hi = jnp.where(ok, mid, hi)
        lo = jnp.where(ok, lo, mid + 1)
    t_c = barrier(hi)
    need = jnp.maximum(nr - count_gt(t_c), 0)

    # ties at the cell threshold kept in pixel (row-major) order — the
    # order lax.top_k's stable sort uses for equal responses
    is_tie = t == t_c[:, None, :, None]
    row_c = jnp.cumsum(is_tie.astype(jnp.int32), axis=3)
    row_pfx = jnp.cumsum(row_c[:, :, :, -1], axis=1) - row_c[:, :, :, -1]
    rank = row_c + row_pfx[:, :, :, None]
    keep = (t > t_c[:, None, :, None]) | (
        is_tie & (rank <= need[:, None, :, None])
    )
    keep = barrier(keep & detected)

    # per-level retain-best over the kept set, same construction globally
    def g_count_gt(th):
        return barrier((keep & (t > th)).astype(jnp.int32).sum())

    glo = jnp.int32(0)
    ghi = jnp.int32(255)
    for _ in range(8):
        mid = (glo + ghi) // 2
        ok = g_count_gt(mid) <= lay.n_desired
        ghi = jnp.where(ok, mid, ghi)
        glo = jnp.where(ok, glo, mid + 1)
    s_star = ghi
    fill = jnp.maximum(lay.n_desired - g_count_gt(s_star), 0)

    # global ties ordered by (cell, pixel) — for equal responses the
    # top_k path's (cell, per-cell-sorted-rank) order reduces to exactly
    # this, since equal scores sort within a cell by pixel index
    is_gtie = keep & (t == s_star)
    m_c = is_gtie.astype(jnp.int32).sum(axis=(1, 3))
    pfx_c = (jnp.cumsum(m_c.reshape(-1)) - m_c.reshape(-1)).reshape(rows, cols)
    growc = jnp.cumsum(is_gtie.astype(jnp.int32), axis=3)
    growpfx = jnp.cumsum(growc[:, :, :, -1], axis=1) - growc[:, :, :, -1]
    grank = growc + growpfx[:, :, :, None] + pfx_c[:, None, :, None]
    final = barrier(keep & ((t > s_star) | (is_gtie & (grank <= fill))))

    # compact (<= n_desired kept by construction of s_star/fill) with a
    # "k-th set bit" binary search over the canvas-order prefix counts —
    # jnp.nonzero lowers to a full-size TPU scatter (424K elements serial,
    # measured 7.4 ms at level 0); this is cumsum + 19 tiny gathers
    can_h, can_w = rows * ch, cols * cw
    final_c = final.reshape(can_h, can_w)          # free: tiles ARE canvas
    rowc = jnp.cumsum(final_c.astype(jnp.int32), axis=1)
    rowtot = rowc[:, -1]
    rowpfx = jnp.cumsum(rowtot) - rowtot
    kcum = (rowc + rowpfx[:, None]).reshape(-1)    # inclusive kept count
    total = rowpfx[-1] + rowtot[-1]
    target = jnp.arange(lay.n_desired, dtype=jnp.int32) + 1
    flat_n = can_h * can_w
    lo_i = jnp.zeros(lay.n_desired, jnp.int32)
    hi_i = jnp.full(lay.n_desired, flat_n - 1, jnp.int32)
    n_steps = max(1, math.ceil(math.log2(max(flat_n, 2))))
    for _ in range(n_steps):
        mid = (lo_i + hi_i) // 2
        ge = kcum[mid] >= target
        hi_i = jnp.where(ge, mid, hi_i)
        lo_i = jnp.where(ge, lo_i, mid + 1)
    pos = hi_i                                      # canvas-flat position
    valid = target <= total
    yc = pos // can_w
    xc = pos % can_w
    flat_tc = t.reshape(-1)                         # canvas order (free)
    resp_i = flat_tc[pos]
    # order by (response desc, cell asc, pixel-in-cell asc) — lax.top_k's
    # tie order — with ONE n_desired-sized sort
    CELLSZ = ch * cw
    cell = (yc // ch) * cols + (xc // cw)
    within = (yc % ch) * cw + (xc % cw)
    tie_idx = cell * CELLSZ + within
    # composite integer key: resp < 2^9, tie index < 2^22 -> fits int32
    key = jnp.where(valid, resp_i * (1 << 22) + ((1 << 22) - 1 - tie_idx),
                    -1)
    okey, order = jax.lax.top_k(key, lay.n_desired)
    valid = okey >= 0
    yo = jnp.where(valid, yc[order], 0)
    xo = jnp.where(valid, xc[order], 0)
    y = jnp.where(valid, EDGE_THRESHOLD + yo, EDGE_THRESHOLD).astype(jnp.int32)
    x = jnp.where(valid, EDGE_THRESHOLD + xo, EDGE_THRESHOLD).astype(jnp.int32)
    resp = jnp.where(valid, resp_i[order].astype(jnp.float32), -jnp.inf)
    return y, x, resp, valid


def _select_level_keypoints_hist(score_min, lay: LevelLayout, ini_th: int):
    """Single-level histogram selection (phase A + plain budgets +
    redistribution + phase B) — the drop-in equivalent of
    _select_level_keypoints(score_min, None, lay, ini_th)."""
    t, n_total = _level_score_tiles(score_min, lay, ini_th)
    budgets = jnp.full((lay.n_cells,),
                       math.ceil(lay.n_desired / lay.n_cells), jnp.int32)
    n_retain = _redistribute(n_total, budgets, lay.n_cells)
    return _select_from_tiles_hist(t, n_retain, lay)


def _fast_score(img_l: jnp.ndarray, th: int) -> jnp.ndarray:
    """FAST scoring: fused Pallas kernel on TPU, XLA elsewhere (identical
    results — tests/test_fast_pallas.py)."""
    if jax.default_backend() != "cpu":
        from . import fast_pallas

        return fast_pallas.fast_score_pallas(img_l, th)
    return fast.fast_score(img_l, th)


def _extract_level(
    img_l: jnp.ndarray,
    qual_l: Optional[jnp.ndarray],
    lay: LevelLayout,
    ini_th: int,
    min_th: int,
):
    """One pyramid level -> (n_desired,) slots of (y, x, response, valid)."""
    score_min = _fast_score(img_l, min_th)
    return _select_level_keypoints(score_min, qual_l, lay, ini_th)


def _select_level_keypoints(
    score_min: jnp.ndarray,
    qual_l: Optional[jnp.ndarray],
    lay: LevelLayout,
    ini_th: int,
):
    """Keypoint selection from ONE precomputed FAST score map at minThFAST
    (split out so a batch axis can be vmapped over it while the Pallas FAST
    kernel runs per image).

    The FAST score is the max threshold at which the segment test passes,
    so the iniTh map is the minTh map masked at >= iniTh — and NMS commutes
    with that mask: a suppressor of a pixel with score >= iniTh has a
    strictly greater score, hence also survives the iniTh zeroing. One
    FAST + NMS pass therefore serves both thresholds (ORBextractor.cc's two
    cv::FAST calls, 1046-1059)."""
    tiles_min = _tile_nms(_tile_view(score_min, lay))
    # fast.fast_score stores score-1 and gates score >= th, so the iniTh
    # re-mask uses the same convention: score - 1 >= th <=> corner at th
    tiles_ini = jnp.where(tiles_min >= ini_th, tiles_min, 0)
    cnt_ini = jnp.sum((tiles_ini > 0).astype(jnp.int32), axis=(1, 2))
    use_min = cnt_ini <= 3  # ORBextractor.cc:1054-1059
    tiles = jnp.where(use_min[:, None, None], tiles_min, tiles_ini)
    resp = tiles.astype(jnp.float32)

    if qual_l is not None:
        # scale responses by per-pixel quality (ORBextractor.cc:1058-1080)
        qnorm = 2.0 * (1.0 / (1.0 + qual_l.astype(jnp.float32) / 255.0)) - 1.0
        resp = resp * _tile_view(qnorm, lay)
        cell_w_norm = _cell_quality_weights(qual_l, lay)
        budgets = jnp.maximum(
            1.0,
            jnp.ceil(lay.n_desired * cell_w_norm / jnp.sum(cell_w_norm)),
        ).astype(jnp.int32)
    else:
        budgets = jnp.full(
            (lay.n_cells,), math.ceil(lay.n_desired / lay.n_cells), jnp.int32
        )

    detected = tiles > 0
    n_total = jnp.sum(detected.astype(jnp.int32), axis=(1, 2))
    n_retain = _redistribute(n_total, budgets, lay.n_cells)

    # per-cell retain-best (KeyPointsFilter::retainBest by response)
    flat = jnp.where(detected, resp, -jnp.inf).reshape(lay.n_cells, -1)
    k = lay.top_k
    vals, idxs = jax.lax.top_k(flat, k)
    keep = jnp.arange(k)[None, :] < jnp.minimum(n_retain, k)[:, None]
    keep &= jnp.isfinite(vals)

    # per-level global retain-best to n_desired (ORBextractor.cc:1160-1164)
    gvals = jnp.where(keep, vals, -jnp.inf).reshape(-1)
    top_vals, top_slots = jax.lax.top_k(gvals, lay.n_desired)
    valid = jnp.isfinite(top_vals)
    cell = top_slots // k
    within = idxs[cell, top_slots % k]
    ty = within // lay.cell_w
    tx = within % lay.cell_w
    y = EDGE_THRESHOLD + (cell // lay.level_cols) * lay.cell_h + ty
    x = EDGE_THRESHOLD + (cell % lay.level_cols) * lay.cell_w + tx
    y = jnp.where(valid, y, EDGE_THRESHOLD)
    x = jnp.where(valid, x, EDGE_THRESHOLD)
    return y.astype(jnp.int32), x.astype(jnp.int32), top_vals, valid


class OrbExtractor:
    """Extraction pipeline for a fixed image geometry + ORB config.

    Build once per (height, width, config); __call__ is jit-compiled.
    `quality` (uint8 cost map, 255 = worst) enables the introspection
    weighting exactly as ORBextractor::operator() does when a non-empty
    mask is passed (ORBextractor.cc:1224-1248).
    """

    def __init__(self, cfg: ORBConfig, height: int, width: int):
        self.cfg = cfg
        self.height = height
        self.width = width
        self.layouts = make_layouts(cfg, height, width)
        self.shapes = [(l.h, l.w) for l in self.layouts]
        self.scale_factors = cfg.scale_factors()
        self.capacity = int(sum(l.n_desired for l in self.layouts))
        self._desc_fn = (
            brief.descriptors_onehot_mxu
            if getattr(cfg, "desc_path", "flat") == "onehot"
            else brief.descriptors_global_gather
        )
        self._jit_plain = jax.jit(functools.partial(self._extract, with_quality=False))
        self._jit_qual = jax.jit(functools.partial(self._extract, with_quality=True))

    def __call__(
        self, img: jnp.ndarray, quality: Optional[jnp.ndarray] = None
    ) -> Keypoints:
        if quality is None:
            return self._jit_plain(img)
        return self._jit_qual(img, quality)

    def _extract(self, img, quality=None, *, with_quality: bool):
        levels = pyramid.build_pyramid(img, self.shapes)
        qlevels = (
            pyramid.build_pyramid(quality, self.shapes) if with_quality else None
        )
        return self.extract_from_pyramid(levels, qlevels)

    def extract_from_pyramid_batched(self, levels, qlevels=None,
                                     return_canvas=False):
        """Batched extraction over B images at once (levels[l]: (B, H, W)).

        The reference extracts left/right on two CPU threads
        (Frame.cc:116-124); here the pair is ONE batch axis. Selection runs
        per level, but the gather-bound finishing stage (IC orientation +
        rBRIEF) runs ONCE over the flattened pyramid canvas of ALL batch
        elements: per-keypoint gathers pay a large fixed per-op cost on
        TPU (~3 ms each, measured), and the per-level formulation issued
        ~24 of them per image; the canvas formulation issues ~3 per FRAME.
        Pixels are identical (levels are blurred before flattening, patches
        never cross level boundaries thanks to the 19 px EDGE_THRESHOLD
        margin), so results are bit-identical to the per-level path.

        return_canvas=True additionally returns the (B, sum_h, w0) raw
        canvas so callers (stereo matching) can reuse it."""
        from . import stereo as stereo_ops

        B = levels[0].shape[0]
        use_hist = (
            qlevels is None
            and getattr(self.cfg, "select_path", "hist") == "hist"
        )
        outs = []
        if use_hist:
            # histogram selection: phase A per level, then ONE batched
            # redistribution scan for all (level, image) pairs (the
            # per-level scans were ~0.35 ms of while-loop overhead each),
            # then phase B per level
            stage_a = []
            for lvl, lay in enumerate(self.layouts):
                if not lay.active:
                    continue
                imgs = levels[lvl]
                score_min = jnp.stack(
                    [_fast_score(imgs[b], self.cfg.min_th_fast)
                     for b in range(B)]
                )
                t, n_tot = jax.vmap(
                    lambda sm, lay=lay: _level_score_tiles(
                        sm, lay, self.cfg.ini_th_fast
                    )
                )(score_min)
                stage_a.append((lvl, lay, t, n_tot))
            ncmax = max(lay.n_cells for _, lay, _, _ in stage_a)
            tot_rows = jnp.concatenate(
                [jnp.pad(n_tot, ((0, 0), (0, ncmax - lay.n_cells)))
                 for _, lay, _, n_tot in stage_a]
            )                                      # (n_active * B, ncmax)
            bud_rows = jnp.concatenate([
                jnp.asarray(np.tile(np.pad(
                    np.full(lay.n_cells,
                            math.ceil(lay.n_desired / lay.n_cells), np.int32),
                    (0, ncmax - lay.n_cells)), (B, 1)))
                for _, lay, _, _ in stage_a
            ])
            ret_rows = jax.vmap(
                lambda t_, b_: _redistribute(t_, b_, ncmax)
            )(tot_rows, bud_rows)
            for i, (lvl, lay, t, _) in enumerate(stage_a):
                n_ret = ret_rows[i * B:(i + 1) * B, : lay.n_cells]
                y, x, resp, valid = jax.vmap(
                    lambda t_, r_, lay=lay: _select_from_tiles_hist(
                        t_, r_, lay
                    )
                )(t, n_ret)
                yx = jnp.stack([y, x], axis=-1)
                scale = jnp.float32(self.scale_factors[lvl])
                xy0 = jnp.stack([x, y], axis=-1).astype(jnp.float32) * scale
                outs.append((lvl, lay, yx, resp, valid, xy0))
        for lvl, lay in enumerate(self.layouts) if not use_hist else []:
            if not lay.active:
                continue
            imgs = levels[lvl]
            score_min = jnp.stack(
                [_fast_score(imgs[b], self.cfg.min_th_fast) for b in range(B)]
            )
            if qlevels is not None:
                y, x, resp, valid = jax.vmap(
                    lambda sm, q: _select_level_keypoints(
                        sm, q, lay, self.cfg.ini_th_fast
                    )
                )(score_min, qlevels[lvl])
            else:
                y, x, resp, valid = jax.vmap(
                    lambda sm: _select_level_keypoints(
                        sm, None, lay, self.cfg.ini_th_fast
                    )
                )(score_min)
            yx = jnp.stack([y, x], axis=-1)                    # (B, n_l, 2)
            scale = jnp.float32(self.scale_factors[lvl])
            xy0 = jnp.stack([x, y], axis=-1).astype(jnp.float32) * scale
            outs.append((lvl, lay, yx, resp, valid, xy0))

        # ---- canvas finishing: one orientation + one BRIEF for the batch
        offsets = np.cumsum([0] + [s[0] for s in self.shapes[:-1]])
        canvas_raw, _ = stereo_ops.flatten_pyramid(levels)     # (B, sumH, w0)
        blurred = [image.gaussian_blur(l, 7, 2.0) for l in levels]
        canvas_blur, _ = stereo_ops.flatten_pyramid(blurred)
        sum_h = canvas_raw.shape[-2]

        yx_canvas = jnp.concatenate(
            [o[2] + jnp.asarray([int(offsets[o[0]]), 0], jnp.int32)
             for o in outs], axis=1,
        )                                                       # (B, N, 2)
        N = yx_canvas.shape[1]
        brow = jax.lax.broadcasted_iota(jnp.int32, (B, N), 0) * sum_h
        yx_flat = yx_canvas.reshape(B * N, 2).at[:, 0].add(brow.reshape(-1))

        flat_raw = canvas_raw.reshape(B * sum_h, -1)
        flat_blur = canvas_blur.reshape(B * sum_h, -1)
        use_pallas = (
            getattr(self.cfg, "finish_path", "pallas") == "pallas"
            and jax.default_backend() != "cpu"
        )
        if use_pallas:
            from . import finish_pallas

            ang, desc = finish_pallas.orient_brief_pallas(
                flat_raw, flat_blur, yx_flat
            )
        else:
            ang = orient.ic_angles_integral(flat_raw, yx_flat)  # ONE gather set
            desc = self._desc_fn(flat_blur, yx_flat, ang)       # ONE patch set
        kp = Keypoints(
            xy=jnp.concatenate([o[5] for o in outs], axis=1),
            response=jnp.concatenate([o[3] for o in outs], axis=1),
            octave=jnp.concatenate(
                [jnp.full(o[2].shape[:2], o[0], jnp.int32) for o in outs],
                axis=1,
            ),
            angle=ang.reshape(B, N),
            desc=desc.reshape(B, N, 32),
            valid=jnp.concatenate([o[4] for o in outs], axis=1),
            yx_level=jnp.concatenate([o[2] for o in outs], axis=1),
        )
        if return_canvas:
            return kp, canvas_raw
        return kp

    def extract_octtree(self, img) -> Keypoints:
        """Quadtree-distributed extraction (ComputeKeyPointsOctTree +
        DistributeOctTree, ORBextractor.cc:545-878) — the reference's
        alternative selection path, present there but inactive (call site
        commented out at ORBextractor.cc:1247). Ported for completeness.

        Split: dense FAST scoring and orientation/BRIEF run as two jitted
        device programs; the quadtree recursion (data-dependent pointer
        chasing) runs on the host (ops/octtree.py). If distribution retains
        more than a level's budget (it may overshoot by ~2, see
        ops/octtree.py), the best-response extras are kept to preserve the
        padded layout."""
        from . import octtree

        if not hasattr(self, "_jit_scores"):
            def scores(im):
                levels = pyramid.build_pyramid(im, self.shapes)
                return [
                    fast.fast_score(levels[l], self.cfg.min_th_fast)
                    for l, lay in enumerate(self.layouts) if lay.active
                ]
            self._jit_scores = jax.jit(scores)

            def describe(im, yx_list):
                levels = pyramid.build_pyramid(im, self.shapes)
                angs, descs = [], []
                i = 0
                for l, lay in enumerate(self.layouts):
                    if not lay.active:
                        continue
                    ang = orient.ic_angles_integral(levels[l], yx_list[i])
                    blurred = image.gaussian_blur(levels[l], 7, 2.0)
                    descs.append(self._desc_fn(blurred, yx_list[i], ang))
                    angs.append(ang)
                    i += 1
                return jnp.concatenate(angs), jnp.concatenate(descs, axis=0)
            self._jit_describe = jax.jit(describe)

        active = [(l, lay) for l, lay in enumerate(self.layouts) if lay.active]
        score_maps = jax.device_get(self._jit_scores(img))
        yx_list, xy0, resp, octv, valid = [], [], [], [], []
        for (l, lay), smap in zip(active, score_maps):
            y, x, r = octtree.compute_keypoints_octtree(
                np.asarray(smap), self.cfg.ini_th_fast, lay.n_desired
            )
            if y.size > lay.n_desired:  # overshoot: keep best-response
                order = np.argsort(-r)[: lay.n_desired]
                y, x, r = y[order], x[order], r[order]
            n, cap = y.size, lay.n_desired
            yx = np.full((cap, 2), EDGE_THRESHOLD, np.int32)
            yx[:n, 0], yx[:n, 1] = y, x
            rr = np.zeros(cap, np.float32)
            rr[:n] = r
            yx_list.append(jnp.asarray(yx))
            scale = float(self.scale_factors[l])
            xy0.append(np.stack([yx[:, 1], yx[:, 0]], axis=1).astype(np.float32) * scale)
            resp.append(rr)
            octv.append(np.full(cap, l, np.int32))
            valid.append(np.arange(cap) < n)
        ang, desc = self._jit_describe(img, yx_list)
        return Keypoints(
            xy=jnp.asarray(np.concatenate(xy0)),
            response=jnp.asarray(np.concatenate(resp)),
            octave=jnp.asarray(np.concatenate(octv)),
            angle=ang,
            desc=desc,
            valid=jnp.asarray(np.concatenate(valid)),
            yx_level=jnp.concatenate(yx_list, axis=0),
        )

    def extract_from_pyramid(self, levels, qlevels=None):
        """Extraction given prebuilt pyramid levels (lets callers share one
        pyramid between extraction and stereo matching in a single jit).
        Thin B=1 wrapper over the batched canvas path (bit-identical to the
        historical per-level formulation; see extract_from_pyramid_batched)."""
        kb = self.extract_from_pyramid_batched(
            [l[None] for l in levels],
            [q[None] for q in qlevels] if qlevels is not None else None,
        )
        return jax.tree.map(lambda a: a[0], kb)
