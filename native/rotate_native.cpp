// Native in-plane rotation resample — C++ fast path for the train-time
// augmentation (veloxseg_tpu/data/transforms.py::rand_rotate_z).
//
// Reference analogue: MONAI RandRotated (range_z, bilinear/nearest,
// keep_size, border padding) applied per sampled patch
// (/root/reference/utils/train_autopet.py:132-152). The Python
// implementation rides scipy.ndimage.rotate(axes=(0,1), reshape=False,
// mode="nearest"); this kernel reproduces those semantics exactly
// (rotation about the (dim-1)/2 center, coordinate clamp at the border)
// and exploits the key structural fact scipy cannot: the rotation never
// involves axis 2, so for a fixed output (i, j) the source plane
// coordinate is fixed across the whole axis-2 row. Bilinear output rows
// are a 4-row weighted sum; nearest-neighbor rows are a straight gather
// — both stream at memory bandwidth instead of scipy's generic
// per-voxel spline machinery.
//
// Exported C ABI (see veloxseg_tpu/data/native_ops.py):
//   int vs_rotate_axes01_f32(src, nx, ny, nz, sx, sy, sz,
//                            angle_rad, order, dst)
//     -> dst[i,j,k] = resample(src, R(angle) about plane center), with
//        strides in ELEMENTS (any layout; dst uses the same strides),
//        order 0 (nearest) or 1 (bilinear), border clamp. Returns 0 on
//        success, negative on bad arguments. src and dst must not alias.
// Thread-safe; no global state.

#include <cmath>
#include <cstdint>

namespace {

inline double clampd(double v, double lo, double hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

int vs_rotate_axes01_f32(const float* src, int64_t nx, int64_t ny,
                         int64_t nz, int64_t sx, int64_t sy, int64_t sz,
                         double angle_rad, int order, float* dst) {
    if (!src || !dst || nx <= 0 || ny <= 0 || nz <= 0) return -1;
    if (order != 0 && order != 1) return -2;
    // scipy.ndimage.rotate: in_coord = R @ (out_coord - out_center)
    // + in_center with R = [[cos, sin], [-sin, cos]]; reshape=False
    // makes both centers (n - 1) / 2.
    const double c = std::cos(angle_rad), s = std::sin(angle_rad);
    const double cx = 0.5 * static_cast<double>(nx - 1);
    const double cy = 0.5 * static_cast<double>(ny - 1);

    for (int64_t i = 0; i < nx; ++i) {
        const double di = static_cast<double>(i) - cx;
        for (int64_t j = 0; j < ny; ++j) {
            const double dj = static_cast<double>(j) - cy;
            // mode="nearest": out-of-range samples take the edge value,
            // which for order<=1 equals clamping the coordinate.
            double u = clampd(c * di + s * dj + cx, 0.0,
                              static_cast<double>(nx - 1));
            double v = clampd(-s * di + c * dj + cy, 0.0,
                              static_cast<double>(ny - 1));
            float* out = dst + i * sx + j * sy;
            if (order == 0) {
                // scipy order-0: floor(x + 0.5), then the boundary mode.
                const int64_t iu = static_cast<int64_t>(
                    std::floor(u + 0.5));
                const int64_t iv = static_cast<int64_t>(
                    std::floor(v + 0.5));
                const float* row = src + iu * sx + iv * sy;
                for (int64_t k = 0; k < nz; ++k) out[k * sz] = row[k * sz];
            } else {
                const int64_t i0 = static_cast<int64_t>(std::floor(u));
                const int64_t j0 = static_cast<int64_t>(std::floor(v));
                const int64_t i1 = i0 + 1 < nx ? i0 + 1 : nx - 1;
                const int64_t j1 = j0 + 1 < ny ? j0 + 1 : ny - 1;
                const double fu = u - static_cast<double>(i0);
                const double fv = v - static_cast<double>(j0);
                const float w00 = static_cast<float>((1 - fu) * (1 - fv));
                const float w01 = static_cast<float>((1 - fu) * fv);
                const float w10 = static_cast<float>(fu * (1 - fv));
                const float w11 = static_cast<float>(fu * fv);
                const float* p00 = src + i0 * sx + j0 * sy;
                const float* p01 = src + i0 * sx + j1 * sy;
                const float* p10 = src + i1 * sx + j0 * sy;
                const float* p11 = src + i1 * sx + j1 * sy;
                for (int64_t k = 0; k < nz; ++k) {
                    const int64_t o = k * sz;
                    out[o] = w00 * p00[o] + w01 * p01[o] +
                             w10 * p10[o] + w11 * p11[o];
                }
            }
        }
    }
    return 0;
}

}  // extern "C"
