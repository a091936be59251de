// Native host-side finishers for binary-image analysis.
//
// Reference analogs (BoofCV, /root/reference):
//   - connected-component labeling: main/boofcv-ip .../alg/filter/binary/
//     LinearContourLabelChang2004.java:59 (union-find labeling)
//   - external contour tracing: .../alg/filter/binary/LinearExternalContours.java
//
// These are the inherently sequential parts of the binary pipeline; the
// TPU-side path (thresholding, morphology, min-label propagation CCL) stays
// in JAX, and this module is the fast host finisher for detectors that need
// per-blob contours (fiducials, QR, calibration targets).  It is loaded via
// ctypes (boofcv_tpu/native/__init__.py) and is a drop-in equivalent of the
// pure-Python fallbacks in boofcv_tpu/ip/binary.py — the BOverride idiom
// (boofcv-ip override/BOverrideManager.java:29) done as a build-time hook.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Two-pass union-find connected-component labeling.
//   img:  h*w uint8 (0 = background, nonzero = foreground)
//   out:  h*w int32 labels; 0 background, components numbered 1..N in
//         raster order of their first (top-left-most) pixel.
// Returns N (number of components).
int32_t boofcv_ccl(const uint8_t* img, int32_t h, int32_t w, int32_t eight,
                   int32_t* out) {
  std::vector<int32_t> parent(1, 0);  // parent[0] unused (background)
  auto find = [&](int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  };
  auto unite = [&](int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
  };

  // first pass: provisional labels from W / NW / N / NE neighbors
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int64_t i = (int64_t)y * w + x;
      if (!img[i]) { out[i] = 0; continue; }
      int32_t lbl = 0;
      if (x > 0 && out[i - 1]) lbl = out[i - 1];
      if (y > 0) {
        const int64_t up = i - w;
        if (out[up]) { if (lbl) unite(lbl, out[up]); else lbl = out[up]; }
        if (eight) {
          if (x > 0 && out[up - 1]) {
            if (lbl) unite(lbl, out[up - 1]); else lbl = out[up - 1];
          }
          if (x + 1 < w && out[up + 1]) {
            if (lbl) unite(lbl, out[up + 1]); else lbl = out[up + 1];
          }
        }
      }
      if (!lbl) {
        lbl = (int32_t)parent.size();
        parent.push_back(lbl);
      }
      out[i] = lbl;
    }
  }

  // second pass: resolve + renumber in raster order of first appearance
  std::vector<int32_t> remap(parent.size(), 0);
  int32_t next = 0;
  for (int64_t i = 0; i < (int64_t)h * w; ++i) {
    if (!out[i]) continue;
    const int32_t r = find(out[i]);
    if (!remap[r]) remap[r] = ++next;
    out[i] = remap[r];
  }
  return next;
}

// External contour tracing (Moore neighborhood, clockwise radial sweep),
// byte-for-byte equivalent to boofcv_tpu.ip.binary.contour_external.
//   img:        h*w uint8 binary
//   out_xy:     capacity*2 int32 buffer, filled with (x, y) pairs
//   out_starts: (max_contours+1) int32; contour c is
//               out_xy[out_starts[c] .. out_starts[c+1])
//   returns number of contours, or -1 if a capacity was exceeded.
int32_t boofcv_external_contours(const uint8_t* img, int32_t h, int32_t w,
                                 int32_t* out_xy, int64_t capacity,
                                 int32_t* out_starts, int32_t max_contours) {
  const int32_t H = h + 2, W = w + 2;
  // padded foreground + per-pixel "traced" flag + per-(pixel,dir) seen bits
  std::vector<uint8_t> pad((size_t)H * W, 0);
  std::vector<uint8_t> traced((size_t)H * W, 0);
  std::vector<uint8_t> seen((size_t)H * W, 0);  // bit d set = state visited
  for (int32_t y = 0; y < h; ++y)
    for (int32_t x = 0; x < w; ++x)
      pad[(size_t)(y + 1) * W + (x + 1)] = img[(int64_t)y * w + x] != 0;

  // Moore neighborhood (dy, dx), clockwise starting from W — must match the
  // Python tracer's table exactly.
  static const int32_t DY[8] = {0, -1, -1, -1, 0, 1, 1, 1};
  static const int32_t DX[8] = {-1, -1, 0, 1, 1, 1, 0, -1};

  int64_t np_total = 0;
  int32_t nc = 0;
  for (int32_t y = 1; y <= h; ++y) {
    for (int32_t x = 1; x <= w; ++x) {
      const size_t p = (size_t)y * W + x;
      if (!pad[p] || traced[p] || pad[p - 1]) continue;
      if (nc >= max_contours) return -1;
      // first fg neighbor, searching NW,N,NE,E,SE,S,SW,W (i = 1..8 mod 8)
      int32_t first = -1;
      for (int32_t i = 1; i <= 8; ++i) {
        const int32_t dd = i % 8;
        if (pad[(size_t)(y + DY[dd]) * W + (x + DX[dd])]) { first = dd; break; }
      }
      out_starts[nc] = (int32_t)np_total;
      if (first < 0) {  // isolated pixel
        traced[p] = 1;
        if (np_total + 1 > capacity) return -1;
        out_xy[np_total * 2] = x - 1;
        out_xy[np_total * 2 + 1] = y - 1;
        ++np_total;
        ++nc;
        continue;
      }
      int32_t cy = y, cx = x, d = first;
      while (!(seen[(size_t)cy * W + cx] & (1u << d))) {
        seen[(size_t)cy * W + cx] |= (uint8_t)(1u << d);
        if (np_total + 1 > capacity) return -1;
        out_xy[np_total * 2] = cx - 1;
        out_xy[np_total * 2 + 1] = cy - 1;
        ++np_total;
        traced[(size_t)cy * W + cx] = 1;
        cy += DY[d];
        cx += DX[d];
        for (int32_t i = 0; i < 8; ++i) {
          const int32_t dd = (d + 6 + i) % 8;
          if (pad[(size_t)(cy + DY[dd]) * W + (cx + DX[dd])]) { d = dd; break; }
        }
      }
      ++nc;
    }
  }
  if (nc < max_contours + 1) out_starts[nc] = (int32_t)np_total;
  return nc;
}

}  // extern "C"
