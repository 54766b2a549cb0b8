// Multi-scale deformable attention — C++ CPU kernel.
//
// Native counterpart of omgsr_tpu/ops/ms_deform_attn.py (capability parity
// with the reference's pybind11 CUDA/CPU extension under
// dinov3/eval/segmentation/models/utils/ops/). Exposed with a plain C ABI
// and bound from Python via ctypes (no pybind11 in this image).
//
// Semantics: bilinear sampling, zero padding, align_corners=False
// (pix = loc * size - 0.5), weighted sum over levels and points.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp msda.cpp -o libmsda.so

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// value:  (B, S, M, D) float32, S = sum(Hl*Wl)
// shapes: (L, 2) int64 (Hl, Wl)
// locs:   (B, Q, M, L, P, 2) float32 in [0,1]
// weights:(B, Q, M, L, P) float32
// out:    (B, Q, M*D) float32 (pre-zeroed by caller or overwritten here)
void ms_deform_attn_forward_cpu(
    const float* value, const int64_t* shapes, const float* locs,
    const float* weights, float* out,
    int64_t B, int64_t S, int64_t M, int64_t D,
    int64_t Q, int64_t L, int64_t P) {
  // level start offsets
  int64_t starts[64];
  int64_t acc = 0;
  for (int64_t l = 0; l < L; ++l) {
    starts[l] = acc;
    acc += shapes[2 * l] * shapes[2 * l + 1];
  }

#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t q = 0; q < Q; ++q) {
      for (int64_t m = 0; m < M; ++m) {
        float* o = out + ((b * Q + q) * M + m) * D;
        std::memset(o, 0, sizeof(float) * D);
        for (int64_t l = 0; l < L; ++l) {
          const int64_t H = shapes[2 * l];
          const int64_t W = shapes[2 * l + 1];
          const float* vbase = value + ((b * S + starts[l]) * M + m) * D;
          for (int64_t p = 0; p < P; ++p) {
            const int64_t li =
                ((((b * Q + q) * M + m) * L + l) * P + p) * 2;
            const float w = weights[(((b * Q + q) * M + m) * L + l) * P + p];
            const float x = locs[li] * W - 0.5f;
            const float y = locs[li + 1] * H - 0.5f;
            const int64_t x0 = (int64_t)std::floor(x);
            const int64_t y0 = (int64_t)std::floor(y);
            const float tx = x - x0;
            const float ty = y - y0;
            for (int corner = 0; corner < 4; ++corner) {
              const int64_t yy = y0 + (corner >> 1);
              const int64_t xx = x0 + (corner & 1);
              if (xx < 0 || xx >= W || yy < 0 || yy >= H) continue;
              const float cw = ((corner >> 1) ? ty : 1.0f - ty) *
                               ((corner & 1) ? tx : 1.0f - tx) * w;
              const float* v = vbase + (yy * W + xx) * M * D;
              for (int64_t dd = 0; dd < D; ++dd) o[dd] += cw * v[dd];
            }
          }
        }
      }
    }
  }
}

}  // extern "C"
