// Width-ratio-gated 8-connected components over a stroke-width map.
//
// Semantics twin of the reference's letter-component BFS
// (/root/reference/lib/ccv_swt.c:238-303) with the standard pairwise SWT
// join rule (neighbor widths within ratio x of each other) — identical to
// detectors/swt.py::_cc_host, which it replaces: scipy's sparse-graph
// union-find measured 16 ms per 640x480 polarity; this runs in ~1 ms.
//
// swt:    (h, w) uint8 stroke widths, 0 = background
// labels: (h, w) int32 out, -1 = background, else compact component id
// returns the number of components (or -1 on bad args)

#include <cstddef>
#include <cstdint>
#include <vector>

using std::size_t;

namespace {

int32_t find_root(std::vector<int32_t>& parent, int32_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];  // path halving
    x = parent[x];
  }
  return x;
}

inline void join(std::vector<int32_t>& parent, int32_t a, int32_t b) {
  a = find_root(parent, a);
  b = find_root(parent, b);
  if (a < b)
    parent[b] = a;
  else if (b < a)
    parent[a] = b;
}

}  // namespace

extern "C" int ccv_tpu_swt_cc(const uint8_t* swt, int h, int w, int ratio,
                              int32_t* labels) {
  if (!swt || !labels || h <= 0 || w <= 0 || ratio <= 0) return -1;
  const int n = h * w;
  std::vector<int32_t> parent(n);
  for (int i = 0; i < n; i++) parent[i] = i;
  // forward 8-neighborhood: E, S, SE, SW
  static const int dy[4] = {0, 1, 1, 1};
  static const int dx[4] = {1, 0, 1, -1};
  for (int y = 0; y < h; y++) {
    const uint8_t* row = swt + (size_t)y * w;
    for (int x = 0; x < w; x++) {
      const int a = row[x];
      if (!a) continue;
      const int32_t ia = y * w + x;
      for (int k = 0; k < 4; k++) {
        const int ny = y + dy[k], nx = x + dx[k];
        if (ny >= h || nx < 0 || nx >= w) continue;
        const int b = swt[(size_t)ny * w + nx];
        if (!b) continue;
        if (b <= ratio * a && a <= ratio * b) join(parent, ia, ny * w + nx);
      }
    }
  }
  // compact relabel
  std::vector<int32_t> remap(n, -1);
  int next = 0;
  for (int i = 0; i < n; i++) {
    if (!swt[i]) {
      labels[i] = -1;
      continue;
    }
    const int32_t r = find_root(parent, i);
    if (remap[r] < 0) remap[r] = next++;
    labels[i] = remap[r];
  }
  return next;
}
