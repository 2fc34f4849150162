"""MSER: maximally stable extremal regions (reference: lib/ccv_mser.c,
_ccv_set_union_mser :59).

Faithful reimplementation of the reference's set-union variant: pixels are
inserted in gray-level order (bucket sort), merged by union-find while an
extremal-region history tree records (value, size) growth; stability is the
relative growth over `delta` gray levels, pruned by max_variance /
min_diversity / area bounds.

The evolution is inherently sequential (a component tree build), so it runs
at the host edge — the reference is equally serial; only the bucket sort is
vectorized. MSCR (the color variant) is left to a later round.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

DARK_TO_BRIGHT = 1
BRIGHT_TO_DARK = -1


@dataclasses.dataclass
class MserParams:
    delta: int = 5
    min_area: int = 60
    max_area: int = 1 << 28
    max_variance: float = 0.25
    min_diversity: float = 0.2
    direction: int = DARK_TO_BRIGHT
    range: int = 255


@dataclasses.dataclass
class MserKeypoint:
    x: int
    y: int
    width: int
    height: int
    size: int
    keypoint: tuple


class _Region:
    __slots__ = ("rank", "size", "value", "shortcut", "parent", "head",
                 "stable", "variance")

    def __init__(self, rank, size, value, shortcut, parent, head):
        self.rank = rank
        self.size = size
        self.value = value
        self.shortcut = shortcut
        self.parent = parent
        self.head = head
        self.stable = False
        self.variance = 0.0


def mser(a, params: Optional[MserParams] = None):
    """ccv_mser twin for single-channel 8U input.

    Returns (keypoints, label_map int32) where label_map assigns 1-based
    region ids to pixels of stable regions (first writer wins).
    """
    params = params or MserParams()
    img = np.asarray(a)
    if img.ndim == 3:
        img = img[..., 0]
    H, W = img.shape
    n = H * W
    flat = img.reshape(-1).astype(np.int32)
    if params.direction == BRIGHT_TO_DARK:
        keys = params.range - flat
    else:
        keys = flat
    order = np.argsort(keys, kind="stable")

    # union-find with linked-list region membership (next pointers)
    shortcut = np.full(n, -1, np.int64)   # -1 = not yet inserted
    nxt = np.arange(n, dtype=np.int64)    # circular linked list
    prv = np.arange(n, dtype=np.int64)
    root_of = np.full(n, -1, np.int64)    # node -> region history index
    regions: List[_Region] = []

    def find(i: int) -> int:
        path = []
        while shortcut[i] != i:
            path.append(i)
            i = shortcut[i]
        for p in path:
            shortcut[p] = i
        return i

    neigh = ((-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1))
    sorted_keys = keys[order]
    for idx_pos in range(n):
        p = int(order[idx_pos])
        v = int(sorted_keys[idx_pos])
        shortcut[p] = p
        py, px = divmod(p, W)
        for dx, dy in neigh:
            x, y = px + dx, py + dy
            if not (0 <= x < W and 0 <= y < H):
                continue
            q = y * W + x
            if shortcut[q] == -1:
                continue
            node0 = find(p)
            node1 = find(q)
            if node0 == node1:
                continue
            r0 = regions[root_of[node0]] if root_of[node0] >= 0 else None
            r1 = regions[root_of[node1]] if root_of[node1] >= 0 else None
            swap = False
            if r0 is not None and r1 is not None:
                if (r1.value > r0.value
                        or (r1.value == r0.value and r1.rank > r0.rank)
                        or (r1.value == r0.value and r1.rank == r0.rank
                            and r1.size > r0.size)):
                    swap = True
            elif r1 is not None and r0 is None:
                swap = True
            if swap:
                node0, node1 = node1, node0
                r0, r1 = r1, r0
            if r0 is None:
                ridx = len(regions)
                regions.append(_Region(0, 1, v, ridx, ridx, node0))
                root_of[node0] = ridx
                r0 = regions[ridx]
            elif r0.value < v:
                old_idx = root_of[node0]
                old = regions[old_idx]
                ridx = len(regions)
                old.shortcut = old.parent = ridx
                nr = _Region(old.rank, old.size, v, ridx, ridx, old.head)
                regions.append(nr)
                root_of[node0] = ridx
                r0 = nr
                r0.rank = max(r0.rank, (r1.rank if r1 else 0)) + 1
            if r1 is not None:
                r1idx = root_of[node1]
                if r1.value < r0.value:
                    r1.parent = root_of[node0]
                r1.shortcut = root_of[node0]
            shortcut[node1] = node0
            r0.size += r1.size if r1 else 1
            # splice circular lists
            prv_n0 = prv[node0]
            nxt[prv_n0] = node1
            prv[node0] = prv[node1]
            nxt[prv[node1]] = node0
            prv[node1] = prv_n0
            r0.head = node0

    # void non-extremal regions
    for i, er in enumerate(regions):
        er.stable = not (er.parent == i and er.shortcut != i)
    # variations over delta levels
    for i, er in enumerate(regions):
        if not er.stable:
            continue
        top_val = er.value + params.delta
        top = er.shortcut
        while True:
            ter = regions[top]
            nxt_i = ter.parent
            ner = regions[nxt_i]
            if nxt_i == top or ner.value > top_val:
                break
            top = nxt_i
        ter = regions[top]
        er.variance = (ter.size - er.size) / er.size
        ner = regions[er.parent]
        ner.shortcut = max(top, ner.shortcut)
    # keep only the locally most stable along parent chains
    for i, er in enumerate(regions):
        if not er.stable or i == er.parent:
            continue
        per = regions[er.parent]
        if per.value > er.value + 1:
            continue
        if per.variance > er.variance:
            per.stable = False
        else:
            er.stable = False
    # filter by params + diversity
    for i in range(len(regions) - 1, -1, -1):
        er = regions[i]
        if (not er.stable or er.variance > params.max_variance
                or er.size > params.max_area or er.size < params.min_area):
            er.stable = False
            continue
        if er.parent != i:
            per = regions[er.parent]
            while not per.stable:
                ner = regions[per.parent]
                if ner is per:
                    break
                per = ner
            if per.stable:
                div = (per.size - er.size) / per.size
                if div < params.min_diversity:
                    er.stable = False

    label = np.zeros((H, W), np.int32)
    keypoints: List[MserKeypoint] = []
    seq_no = 1
    for er in regions:
        if not er.stable:
            continue
        node = er.head
        minx = maxx = node % W
        miny = maxy = node // W
        kp_node = node
        for _ in range(er.size):
            y, x = divmod(node, W)
            if label[y, x] == 0:
                label[y, x] = seq_no
            minx, maxx = min(minx, x), max(maxx, x)
            miny, maxy = min(miny, y), max(maxy, y)
            node = int(nxt[node])
        keypoints.append(MserKeypoint(
            x=int(minx), y=int(miny), width=int(maxx - minx + 1),
            height=int(maxy - miny + 1), size=er.size,
            keypoint=(int(kp_node % W), int(kp_node // W))))
        seq_no += 1
    return keypoints, label
